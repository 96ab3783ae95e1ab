package graft

import graft.dedup.Dedup
import graft.streaming.BoilerplateStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BoilerplateStream: d25's repeated-chunk rewrite run at the door —
  * single-batch parity with the batch operator, the door semantics
  * across batches (a chunk hot only later never retroactively cleans
  * earlier docs), and marker-skipped replay of the additive state. */
class BoilerplateStreamSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def stage(dir: String, name: String, df: DataFrame): Unit = {
    val scratch =
      java.nio.file.Files.createTempDirectory("graft_bp_s").toString + "/out"
    df.coalesce(1).write.parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(dir, s"$name.parquet"))
  }

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  private def drive(inDir: String, stateDir: String,
      lineage: String): Unit = {
    val q = BoilerplateStream.boilerplateGate(
      BoilerplateStream.readDocs(spark, inDir), stateDir,
      width = 3, minOcc = 3L, lineage = lineage)
    q.processAllAvailable()
    q.stop()
  }

  test("single-batch drive reproduces batch d25 exactly") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_bp1").toString
    val stateDir = java.nio.file.Files.createTempDirectory("graft_bp1s").toString
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "n_chars")
    stage(inDir, "all", docs)
    drive(inDir, stateDir, "bp_one")
    val got = BoilerplateStream.cleaned(spark, stateDir)
    val want = Dedup.boilerplateStrip(docs, width = 3, minOcc = 3L)
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("door semantics: a chunk hot only later cleans only later docs") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_bp2").toString
    val stateDir = java.nio.file.Files.createTempDirectory("graft_bp2s").toString
    // 'h h h' occurs twice in batch 1 (below the cut at its door) and
    // reaches 3 in batch 2 — only doc 3 sheds it
    stage(inDir, "b1", docsDf(Seq(
      (1L, "h h h a1 a2 a3"), (2L, "h h h b1 b2 b3"))))
    stage(inDir, "b2", docsDf(Seq(
      (3L, "h h h c1 c2 c3"))))
    drive(inDir, stateDir, "bp_door")
    val got = BoilerplateStream.cleaned(spark, stateDir)
      .orderBy("doc_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq ==
      Seq((1L, 0L, "h h h a1 a2 a3"), (2L, 0L, "h h h b1 b2 b3"),
        (3L, 1L, "c1 c2 c3")))
    // the state totals are the additive fold across both batches
    val occ = BoilerplateStream.chunkOcc(spark, stateDir)
      .filter(col("chunk") === "h h h").head.getLong(1)
    assert(occ == 3L)
  }

  test("fresh-checkpoint replay is marker-skipped: no double-add") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_bp3").toString
    val stateDir = java.nio.file.Files.createTempDirectory("graft_bp3s").toString
    stage(inDir, "b1", docsDf(Seq(
      (1L, "h h h x1 x2 x3"), (2L, "h h h y1 y2 y3"), (3L, "h h h z1 z2 z3"))))
    drive(inDir, stateDir, "bp_replay")
    val once = BoilerplateStream.chunkOcc(spark, stateDir)
      .agg(sum("occ")).head.getLong(0)
    // fresh checkpoint, same lineage: batch 0 replays, markers skip it
    drive(inDir, stateDir, "bp_replay")
    val twice = BoilerplateStream.chunkOcc(spark, stateDir)
      .agg(sum("occ")).head.getLong(0)
    assert(once == twice, s"replay double-added state: $once -> $twice")
    // and the hot verdict stood: every doc shed its header chunk
    val got = BoilerplateStream.cleaned(spark, stateDir)
    assert(got.filter(col("n_removed") =!= 1).count() == 0)
  }
}
