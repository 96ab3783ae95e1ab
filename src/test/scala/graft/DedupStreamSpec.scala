package graft

import graft.dedup.Dedup
import graft.streaming.DedupStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming incremental dedup: two micro-batches (originals, then
  * their near/exact copies) against the accumulating corpus state. */
class DedupStreamSpec extends AnyFunSuite {
  import TestSession._

  /** Write df as a single parquet file at dir/name.parquet with a
    * controlled modification time so the file source processes
    * batches in the intended order. */
  private def stage(df: DataFrame, dir: java.nio.file.Path, name: String,
      mtimeMs: Long): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.resolve("w").toString)
    val part = java.nio.file.Files.list(tmp.resolve("w"))
      .filter(p => p.getFileName.toString.startsWith("part-")
        && p.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    val dst = dir.resolve(s"$name.parquet")
    java.nio.file.Files.move(part, dst)
    java.nio.file.Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    ()
  }

  test("incremental dedup ingests novel docs only and links match the batch twin") {
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

    // links must equal the batch incremental pipeline's verdicts
    val got = DedupStream.links(spark, state)
      .select("new_id", "dup_of", "jaccard")
    val want = Dedup.minhashLshIncremental(base, delta, 8, 4, 0.8)
      .select("new_id", "dup_of", "jaccard")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streaming links diverged from the batch incremental pipeline")

    // corpus state = all of batch A plus only the novel part of batch B
    val corpusIds = DedupStream.corpusState(spark, state)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val baseIds = base.select("doc_id").collect().map(_.getLong(0)).toSet
    val linked = want.select("new_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val deltaIds = delta.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(corpusIds == baseIds ++ (deltaIds -- linked),
      s"corpus state holds ${corpusIds.size} ids, expected " +
        s"${(baseIds ++ (deltaIds -- linked)).size}")
    // every exact copy was caught, so none entered the corpus
    assert(corpusIds.intersect(deltaIds.filter(_ >= Dedup.ExactOffset)).isEmpty)
  }
}
