package graft

import graft.operators.Harvest
import graft.sources.{Compaction, Sources}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction executor: the batched sink's small files rewritten per
  * compaction-plan group — count/content parity, file-count
  * reduction, groups never split across output files. */
class CompactionSpec extends AnyFunSuite {
  import TestSession._

  test("compacted table preserves content and cuts the file count") {
    val out = java.nio.file.Files.createTempDirectory("graft_cmp_in").toString
    val compacted = java.nio.file.Files.createTempDirectory("graft_cmp_out").toString
    // the h5 sink shape: per-status recordsPerFile batches -> one
    // directory (and parquet file) per (status, file_idx)
    val batched = Harvest.batchAssign(
      Harvest.flagDeleted(Tables.events(spark, sf), col("event_type"), "error"),
      Seq(col("is_deleted")), col("event_id"), recordsPerFile = 50)
    Sources.writeBatched(batched.repartition(col("is_deleted"), col("file_idx")),
      "is_deleted", "file_idx", out)

    val stats = Compaction.compactTable(spark, out,
      partCols = Seq("is_deleted"), targetBytes = 512 * 1024, outDir = compacted)
    assert(stats.filesBefore > 10, s"fixture too small: $stats")
    assert(stats.filesAfter < stats.filesBefore, s"no reduction: $stats")
    assert(stats.filesAfter <= stats.plannedGroups, s"more files than groups: $stats")

    // content parity: same rows, same schema surface (file_idx folds
    // from a directory level into an ordinary column)
    val before = spark.read.parquet(out)
    val after = spark.read.parquet(compacted)
    assert(before.columns.sorted.sameElements(after.columns.sorted),
      s"${before.columns.toSeq} vs ${after.columns.toSeq}")
    val cols = before.columns.sorted.map(col)
    val b = before.select(cols: _*)
    val a = after.select(cols: _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "compacted content diverged from the input table")

    // status partition dirs survive for scanner pruning
    val dirs = new java.io.File(compacted).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("is_deleted=true", "is_deleted=false"), dirs)
  }

  test("a group never splits: each output file holds whole plan groups") {
    val out = java.nio.file.Files.createTempDirectory("graft_cmp_in2").toString
    val compacted = java.nio.file.Files.createTempDirectory("graft_cmp_out2").toString
    val batched = Harvest.batchAssign(
      Harvest.flagDeleted(Tables.events(spark, sf), col("event_type"), "error"),
      Seq(col("is_deleted")), col("event_id"), recordsPerFile = 100)
    // one physical file per (status, file_idx) dir, so a source file
    // and a file_idx batch are 1:1 and the spread check is sound
    Sources.writeBatched(batched.repartition(col("is_deleted"), col("file_idx")),
      "is_deleted", "file_idx", out)
    Compaction.compactTable(spark, out,
      partCols = Seq("is_deleted"), targetBytes = 64 * 1024, outDir = compacted)
    // every source file_idx batch must land whole in one output file:
    // a split group would show one file_idx spread over two files
    val spread = spark.read.parquet(compacted)
      .withColumn("__f", input_file_name())
      .groupBy("is_deleted", "file_idx")
      .agg(countDistinct("__f").as("nf"))
      .filter(col("nf") > 1)
    assert(spread.isEmpty,
      s"plan groups split across files: ${spread.take(3).toSeq}")
  }
}
