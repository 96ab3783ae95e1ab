package graft

import graft.operators.Indexing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The point of z-ordering is FILE PRUNING for multi-dimensional
  * range predicates: each file's parquet footer min/max box must be
  * compact in BOTH dimensions. Asserted directly on per-file min/max
  * (one scan grouped by input_file_name — identical to what the
  * footer stats record), against a single-column-sorted layout of
  * the same data where every file spans the full other dimension. */
class ZorderSpec extends AnyFunSuite {
  import TestSession._

  test("z-ordered layout prunes files on both dims; rows survive intact") {
    // 100x100 uniform grid, 40k rows
    val df = spark.range(40000).select(
      col("id"),
      (col("id") % 100).as("x"),
      ((col("id") / 100).cast("long") % 100).as("y"))
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString + "/t"
    val xDir = java.nio.file.Files.createTempDirectory("graft_x").toString + "/t"
    Indexing.zorderWrite(df, Indexing.zValue(col("x"), col("y"), 7), zDir, 64)
    // contrast layout: single-dimension sort, same file count
    df.repartitionByRange(64, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)

    def fileBoxes(dir: String) =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect()
    def intersecting(dir: String, x0: Long, x1: Long, y0: Long, y1: Long) =
      fileBoxes(dir).count(r =>
        r.getLong(1) <= x1 && r.getLong(2) >= x0 &&
          r.getLong(3) <= y1 && r.getLong(4) >= y0)

    val nFilesZ = fileBoxes(zDir).length
    val nFilesX = fileBoxes(xDir).length
    assert(nFilesZ >= 32 && nFilesX >= 32, "both layouts must actually shard")

    // y-only predicate: the x-sorted layout cannot prune at all
    val zY = intersecting(zDir, 0, 99, 10, 15)
    val xY = intersecting(xDir, 0, 99, 10, 15)
    assert(xY == nFilesX, "x-sorted files all span the full y range")
    assert(zY * 2 <= nFilesZ,
      s"z-order must prune most files on a y-only predicate ($zY of $nFilesZ)")

    // 2-d box: z-order prunes to the covered curve cells
    val zBox = intersecting(zDir, 10, 20, 10, 20)
    assert(zBox * 4 <= nFilesZ,
      s"z-order must prune hard on a 2-d box ($zBox of $nFilesZ)")

    // correctness: the laid-out table is the same table
    val back = spark.read.parquet(zDir)
      .filter(col("x").between(10, 20) && col("y").between(10, 20))
      .select("id").collect().map(_.getLong(0)).toSet
    val want = df
      .filter(col("x").between(10, 20) && col("y").between(10, 20))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(back == want)
  }
}
