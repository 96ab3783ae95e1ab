package graft.tools

import graft.Tables
import graft.dedup.Dedup
import graft.streaming.DedupStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic for DedupStreamSpec divergence. */
object DedupStreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    def stage(df: DataFrame, dir: java.nio.file.Path, name: String, t: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.resolve("w").toString)
      val part = java.nio.file.Files.list(tmp.resolve("w"))
        .filter(p => p.getFileName.toString.startsWith("part-")
          && p.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = dir.resolve(s"$name.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(t))
      ()
    }
    val src = java.nio.file.Files.createTempDirectory("graft_incr_src")
    val state = java.nio.file.Files.createTempDirectory("graft_incr_st")
      .resolve("state").toString
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang"),
        col("n_chars").cast("long").as("n_chars"))
    val delta = Dedup.augmentedDocs(spark, sf)
      .filter(col("doc_id") >= Dedup.NearOffset)
      .select(col("doc_id"), col("text"), col("lang"),
        col("n_chars").cast("long").as("n_chars"))
    val t0 = System.currentTimeMillis() - 600000
    stage(base, src, "a", t0)
    stage(delta, src, "b", t0 + 120000)
    val q = DedupStream.incrementalDedup(
      DedupStream.readDocs(spark, src.toString), state)
    q.processAllAvailable(); q.stop()
    val got = DedupStream.links(spark, state).select("new_id", "dup_of", "jaccard")
    val want = Dedup.minhashLshIncremental(base, delta, 8, 4, 0.8)
      .select("new_id", "dup_of", "jaccard")
    println(s"PROBE got=${got.count()} want=${want.count()}")
    println("PROBE got-want:")
    got.exceptAll(want).show(10, false)
    println("PROBE want-got:")
    want.exceptAll(got).show(10, false)
    println("PROBE links by batch:")
    DedupStream.links(spark, state).groupBy("batch_id").count().show()
    spark.stop()
  }
}
