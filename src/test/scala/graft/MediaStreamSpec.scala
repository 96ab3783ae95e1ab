package graft

import graft.multimodal.Multimodal
import graft.streaming.MediaStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MediaStream: m8's activity segmentation run at the door — batch
  * parity on the real corpus, the too-short audit routing, and
  * marker-skipped replay. */
class MediaStreamSpec extends AnyFunSuite {
  import TestSession._

  private def stage(dir: String, name: String, df: DataFrame): Unit = {
    val scratch =
      java.nio.file.Files.createTempDirectory("graft_ms_s").toString + "/out"
    df.coalesce(1).write.parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(dir, s"$name.parquet"))
  }

  private def drive(inDir: String, stateDir: String, lineage: String): Unit = {
    val q = MediaStream.segmentGate(
      MediaStream.readDocs(spark, inDir), stateDir, lineage = lineage)
    q.processAllAvailable()
    q.stop()
  }

  test("two-batch drive reproduces batch m8 exactly; short payloads audited") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_ms1").toString
    val stateDir = java.nio.file.Files.createTempDirectory("graft_ms1s").toString
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "n_chars").cache()
    stage(inDir, "b1", docs.filter(col("doc_id") % 2 === 0))
    stage(inDir, "b2", docs.filter(col("doc_id") % 2 === 1))
    drive(inDir, stateDir, "ms_par")
    val got = MediaStream.segments(spark, stateDir)
    val want = Multimodal.audioSegments(
      docs.select(col("doc_id"), trim(col("text")).as("payload")),
      "doc_id", "payload", windowBytes = 50, threshold = 4720L)
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
    // every sub-window payload is audited, none segmented
    val short = MediaStream.tooShort(spark, stateDir)
    val wantShort = docs.filter(length(trim(col("text"))) < 50)
      .select("doc_id")
    assert(short.select("doc_id").exceptAll(wantShort).count() == 0
      && wantShort.exceptAll(short.select("doc_id")).count() == 0)
    assert(got.join(short, "doc_id").count() == 0)
    docs.unpersist()
    ()
  }

  test("fresh-checkpoint replay is marker-skipped (no duplicate segments)") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_ms2").toString
    val stateDir = java.nio.file.Files.createTempDirectory("graft_ms2s").toString
    import spark.implicits._
    stage(inDir, "b1", Seq((1L, "z" * 120))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long")))
    drive(inDir, stateDir, "ms_replay")
    val once = MediaStream.segments(spark, stateDir).count()
    drive(inDir, stateDir, "ms_replay")
    assert(MediaStream.segments(spark, stateDir).count() == once)
    assert(once == 1L, "one loud payload = one segment")
  }
}
