package graft

import graft.operators.Validate
import graft.streaming.DriftStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming profile-drift monitoring: two micro-batches (the corpus,
  * then v8's deterministic perturbation of it) must produce exactly
  * the batch profileDrift report, and replay must not duplicate or
  * self-compare. */
class DriftStreamSpec extends AnyFunSuite {
  import TestSession._

  private val cols = Seq("doc_id", "lang", "source", "n_chars")

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def stage(df: DataFrame, dir: java.nio.file.Path, name: String,
      mtimeMs: Long): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dstage")
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

  test("streamed drift report equals the batch profileDrift and replay is idempotent") {
    val prev = Tables.documents(spark, sf)
      .select(col("doc_id").cast("long"), col("lang"), col("source"),
        col("n_chars").cast("long").as("n_chars"))
    // v8's deterministic perturbation: 20% dropped, lang nulled on a
    // 1-in-7 stripe
    val cur = prev.filter(col("doc_id") % 5 =!= 0)
      .withColumn("lang", when(col("doc_id") % 7 === 0,
        lit(null).cast("string")).otherwise(col("lang")))

    val src = java.nio.file.Files.createTempDirectory("graft_dsrc")
    val state = java.nio.file.Files.createTempDirectory("graft_dstate")
      .resolve("drift").toString
    val t0 = System.currentTimeMillis() - 600000
    stage(prev, src, "a", t0)
    stage(cur, src, "b", t0 + 60000)

    val stream = spark.readStream.schema(schema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(src.toString)
    val q = DriftStream.maintainDrift(stream, state, cols)
    q.processAllAvailable(); q.stop()

    val got = DriftStream.driftReports(spark, state)
    assert(got.select("batch").distinct().collect().map(_.getLong(0))
      .toSeq == Seq(1L), "expected exactly one report, for batch 1")
    val want = Validate.profileDrift(prev, cur, cols)
    val gotR = got.drop("batch")
    assert(gotR.exceptAll(want).isEmpty && want.exceptAll(gotR).isEmpty,
      "streamed drift report diverged from the batch twin")
    // the perturbation must actually be flagged
    assert(got.filter(col("drifted")).count() >= 2)

    // replay: fresh checkpoint, same lineage — markers skip both
    // batches; no new profile version, no new/changed reports
    val vBefore = graft.sources.VersionedTable
      .latestVersion(s"$state/profile").get
    val stream2 = spark.readStream.schema(schema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(src.toString)
    val q2 = DriftStream.maintainDrift(stream2, state, cols)
    q2.processAllAvailable(); q2.stop()
    assert(graft.sources.VersionedTable
      .latestVersion(s"$state/profile").get == vBefore)
    val again = DriftStream.driftReports(spark, state).drop("batch")
    assert(again.exceptAll(want).isEmpty && want.exceptAll(again).isEmpty)
  }

  test("quantile-drift family: streamed qdrift equals the batch twin; history stays bounded") {
    val prev = Tables.documents(spark, sf)
      .select(col("doc_id").cast("long"), col("lang"), col("source"),
        col("n_chars").cast("long").as("n_chars"))
    // v12's perturbation: interior mass collapses while bounds hold
    val cur = prev.filter(col("doc_id") % 5 =!= 0)
      .withColumn("n_chars", when(col("doc_id") % 2 === 0,
        expr("n_chars DIV 2")).otherwise(col("n_chars")))
    val qcols = Seq("doc_id", "n_chars")

    val src = java.nio.file.Files.createTempDirectory("graft_qdsrc")
    val state = java.nio.file.Files.createTempDirectory("graft_qdstate")
      .resolve("drift").toString
    val t0 = System.currentTimeMillis() - 600000
    stage(prev, src, "a", t0)
    stage(cur, src, "b", t0 + 60000)
    stage(cur, src, "c", t0 + 120000)

    val stream = spark.readStream.schema(schema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(src.toString)
    val q = DriftStream.maintainDrift(stream, state, cols,
      quantileCols = qcols, keepVersions = 1, keepReports = 1)
    q.processAllAvailable(); q.stop()

    // keepReports=1: only the newest report survives, and it must
    // equal the batch twin of its own pair (cur vs cur — no shift)
    val got = DriftStream.quantileDriftReports(spark, state)
    assert(got.select("batch").distinct().collect().map(_.getLong(0))
      .toSeq == Seq(2L), "expected only the batch-2 report to survive")
    val want = Validate.quantileDrift(cur, cur, qcols)
    val gotR = got.drop("batch")
    assert(gotR.exceptAll(want).isEmpty && want.exceptAll(gotR).isEmpty,
      "streamed qdrift report diverged from the batch twin")
    assert(got.filter(col("shifted")).count() == 0,
      "identical batches cannot shift")

    // and the PRUNED batch-1 report (recomputed as a batch query)
    // must have flagged the planted collapse — the family works
    val b1 = Validate.quantileDrift(prev, cur, qcols)
    assert(b1.filter(col("shifted")).count() >= 2)

    // bounded history: one version per profile family (the serving
    // one), one report dir per drift family
    assert(graft.sources.VersionedTable
      .listVersions(s"$state/profile").size == 1)
    assert(graft.sources.VersionedTable
      .listVersions(s"$state/qprofile").size == 1)
    def nBatchDirs(d: String): Int = {
      val f = new java.io.File(d)
      if (!f.exists()) 0
      else f.listFiles().count(x => x.isDirectory && x.getName.startsWith("batch="))
    }
    assert(nBatchDirs(s"$state/drift") == 1)
    assert(nBatchDirs(s"$state/qdrift") == 1)
  }
}
