package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedTable
import graft.streaming.RankStream

/** Convergence + replay-idempotence for the streaming weighted-rank
  * maintainer (the VocabStream-style proof): after a corpus streams
  * in batches, the served rank table must equal g2's from-scratch
  * batch computation, and a full re-delivery of the stream must
  * change nothing. */
class RankStreamSpec extends AnyFunSuite {
  import TestSession._

  private val docSchema = StructType(Seq(
    StructField("source", StringType),
    StructField("text", StringType)))

  private def stage(df: DataFrame, dir: java.nio.file.Path, name: String,
      mtimeMs: Long): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_rstage")
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

  private def batchRanks(docs: DataFrame): DataFrame = {
    val pairs = graft.dedup.Dedup.sourceOverlap(docs, col("source"),
        col("text"), width = 20, stride = 20, maxDf = None)
      .select(col("source_a"), col("source_b"), col("n_shared").as("w"))
    graft.operators.Graph.weightedPageRank(
      docs.select("source").distinct(), pairs, iters = 3)
  }

  test("streamed weighted rank converges to the batch g2 computation " +
      "and replay is idempotent") {
    val docs = Tables.documents(spark, sf).select(col("source"), col("text"))
    val parts = Seq(
      docs.filter(crc32(col("text")) % 3 === 0),
      docs.filter(crc32(col("text")) % 3 === 1),
      docs.filter(crc32(col("text")) % 3 === 2))
    val src = java.nio.file.Files.createTempDirectory("graft_rsrc")
    val state = java.nio.file.Files.createTempDirectory("graft_rstate")
      .resolve("rank").toString
    val t0 = System.currentTimeMillis() - 600000
    parts.zipWithIndex.foreach { case (p, i) =>
      stage(p, src, s"b$i", t0 + i * 60000) }

    val stream = spark.readStream.schema(docSchema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(src.toString)
    val q = RankStream.maintainRank(stream, state)
    q.processAllAvailable(); q.stop()

    val got = RankStream.servingRanks(spark, state)
    val want = batchRanks(docs)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "served ranks diverge from the from-scratch g2 computation")
    // edge state equals d16's weighted pair matrix
    val gotE = VersionedTable.readLatest(spark, RankStream.edgesDir(state))
    val wantE = graft.dedup.Dedup.sourceOverlap(docs, col("source"),
        col("text"), width = 20, stride = 20, maxDf = None)
      .select(col("source_a"), col("source_b"), col("n_shared").as("w"))
    assert(gotE.exceptAll(wantE).isEmpty && wantE.exceptAll(gotE).isEmpty,
      "accumulated edge weights diverge from the batch overlap matrix")

    // replay: same lineage, fresh stream checkpoint — markers must
    // no-op every batch (no new versions, same served ranks)
    val vBefore = VersionedTable
      .latestVersion(RankStream.ranksDir(state)).get
    val stream2 = spark.readStream.schema(docSchema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(src.toString)
    val q2 = RankStream.maintainRank(stream2, state)
    q2.processAllAvailable(); q2.stop()
    assert(VersionedTable.latestVersion(RankStream.ranksDir(state)).get
        == vBefore,
      "replayed batches were re-applied despite markers")
  }

  test("posting compaction cadence bounds dirs/versions and is invisible to ranks") {
    val docs = Tables.documents(spark, sf).select(col("source"), col("text"))
    val nb = 12
    val src = java.nio.file.Files.createTempDirectory("graft_rcomp")
    val state = java.nio.file.Files.createTempDirectory("graft_rcompstate")
      .resolve("rank").toString
    val t0 = System.currentTimeMillis() - 1200000
    (0 until nb).foreach { i =>
      stage(docs.filter(crc32(col("text")) % nb === i), src, s"b$i",
        t0 + i * 60000) }
    val stream = spark.readStream.schema(docSchema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(src.toString)
    val q = RankStream.maintainRank(stream, state,
      maxBatchDirs = 3, keepVersions = 2)
    q.processAllAvailable(); q.stop()

    // the fold happened and bounded the per-batch dir count
    val batchDirs = new java.io.File(RankStream.postingsRoot(state))
      .listFiles().toSeq.filter(f => f.isDirectory
        && f.getName.startsWith("batch="))
    assert(batchDirs.size <= 3,
      s"compaction must bound batch dirs, got ${batchDirs.size}")
    assert(VersionedTable
      .latestVersion(RankStream.postingsBaseDir(state)).nonEmpty,
      "a compacted base must exist after 12 batches at cadence 3")
    // version history pruned at every batch boundary
    Seq(RankStream.postingsBaseDir(state), RankStream.edgesDir(state),
        RankStream.ranksDir(state)).foreach { d =>
      assert(VersionedTable.listVersions(d).size <= 2,
        s"version history under $d must be pruned to keepVersions")
    }
    // and the served state is unchanged by any of it
    val got = RankStream.servingRanks(spark, state)
    val want = batchRanks(docs)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "compaction must be invisible to the served ranks")
  }

  test("boosted retrieval serves from the stream-maintained authority") {
    // closes the x21 loop: the boost signal can be maintained by
    // RankStream instead of rebuilt per dataset change — after the
    // corpus streams in, searchIndexBoosted fed by servingRanks must
    // equal the batch x21 query (whose authority is the one-shot
    // graft_authority build over the same corpus)
    val full = Tables.documents(spark, sf)
    val docs = full.select(col("source"), col("text"))
    val src = java.nio.file.Files.createTempDirectory("graft_rboost")
    val state = java.nio.file.Files.createTempDirectory("graft_rbooststate")
      .resolve("rank").toString
    val t0 = System.currentTimeMillis() - 600000
    Seq(docs.filter(crc32(col("text")) % 2 === 0),
        docs.filter(crc32(col("text")) % 2 === 1))
      .zipWithIndex.foreach { case (p, i) =>
        stage(p, src, s"b$i", t0 + i * 60000) }
    val stream = spark.readStream.schema(docSchema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(src.toString)
    val q = RankStream.maintainRank(stream, state)
    q.processAllAvailable(); q.stop()

    val idx = graft.operators.Retrieval.ensureIndex(
      full.filter(col("doc_id") >= 5), "doc_id", "text", sf)
    val boosts = full.filter(col("doc_id") >= 5)
      .select(col("doc_id").as("n_id"), col("source"))
      .join(RankStream.servingRanks(spark, state)
        .select(col("source"), col("rank_i3").as("bw")), "source")
      .select("n_id", "bw")
    val got = graft.operators.Retrieval.searchIndexBoosted(spark, idx,
      full.filter(col("doc_id") < 5), "doc_id", "text", k = 5, boosts)
    val want = SparkEntry.queries("x21_boosted_search")(spark, sf)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "stream-authority boosting diverged from the batch x21 query")
    assert(got.count() > 0)
  }

  test("appends update the stream-served authority with no graph rebuild") {
    // the r11 front door: Graph.authorityRanks prefers a RankStream-
    // owned state dir; after an APPEND flows through maintainRank the
    // served boost signal moves to the full-corpus ranks without the
    // batch artifact ever being (re)built — proven by handing the
    // batch path a poisoned docs frame that throws if evaluated
    val full = Tables.documents(spark, sf)
    val docs = full.select(col("source"), col("text"))
    val src = java.nio.file.Files.createTempDirectory("graft_rappend")
    val state = java.nio.file.Files.createTempDirectory("graft_rappstate")
      .resolve("rank").toString
    val t0 = System.currentTimeMillis() - 600000
    stage(docs.filter(crc32(col("text")) % 2 === 0), src, "b0", t0)

    def poisoned: DataFrame = docs.filter(
      raise_error(lit("authorityRanks fell back to a batch rebuild"))
        .cast("boolean"))
    def serve(): DataFrame = graft.operators.Graph.authorityRanks(
      spark, poisoned, sf, Some(state))
    def drain(): Unit = {
      val stream = spark.readStream.schema(docSchema).format("parquet")
        .option("maxFilesPerTrigger", 1).load(src.toString)
      val q = RankStream.maintainRank(stream, state)
      q.processAllAvailable(); q.stop()
    }
    drain()
    val before = serve().collect().toSet

    stage(docs.filter(crc32(col("text")) % 2 === 1), src, "b1", t0 + 60000)
    drain()
    val after = serve()
    val want = batchRanks(docs)
    assert(after.exceptAll(want).isEmpty && want.exceptAll(after).isEmpty,
      "post-append stream authority diverged from the full-corpus ranks")
    assert(after.collect().toSet != before,
      "the append did not move the served signal")
  }

  test("interrupted fold (duplicate prior rows) cannot double edge weights") {
    val docs = Tables.documents(spark, sf).select(col("source"), col("text"))
    val b0 = docs.filter(crc32(col("text")) % 2 === 0)
    val b1 = docs.filter(crc32(col("text")) % 2 === 1)
    val state = java.nio.file.Files.createTempDirectory("graft_rfold")
      .resolve("rank").toString
    RankStream.applyBatch(b0, state, "t-0")
    assert(RankStream.maintain(spark, state, maxBatchDirs = 0).nonEmpty)
    // simulate a crash between the base fold and the subdir deletes:
    // a leftover batch dir carrying rows the base ALREADY holds
    val baseV = VersionedTable
      .latestVersion(RankStream.postingsBaseDir(state)).get
    val src = java.nio.file.Paths.get(
      RankStream.postingsBaseDir(state), s"v=$baseV")
    val dst = java.nio.file.Paths.get(
      RankStream.postingsRoot(state), "batch=leftover")
    java.nio.file.Files.createDirectories(dst)
    java.nio.file.Files.list(src).forEach { p =>
      if (p.getFileName.toString.endsWith(".parquet"))
        java.nio.file.Files.copy(p, dst.resolve(p.getFileName.toString))
      ()
    }
    RankStream.applyBatch(b1, state, "t-1")
    val gotE = VersionedTable.readLatest(spark, RankStream.edgesDir(state))
    val wantE = graft.dedup.Dedup.sourceOverlap(docs, col("source"),
        col("text"), width = 20, stride = 20, maxDf = None)
      .select(col("source_a"), col("source_b"), col("n_shared").as("w"))
    assert(gotE.exceptAll(wantE).isEmpty && wantE.exceptAll(gotE).isEmpty,
      "duplicate prior rows from an interrupted fold doubled edge weights")
  }

  test("crash-window replay of the edge merge does not double weights") {
    val docs = Tables.documents(spark, sf).select(col("source"), col("text"))
      .filter(col("source").isin("src0", "src1", "src2"))
    val src = java.nio.file.Files.createTempDirectory("graft_rcrash")
    val state = java.nio.file.Files.createTempDirectory("graft_rcstate")
      .resolve("rank").toString
    stage(docs, src, "b0", System.currentTimeMillis() - 600000)
    val stream = spark.readStream.schema(docSchema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(src.toString)
    val q = RankStream.maintainRank(stream, state)
    q.processAllAvailable(); q.stop()
    // simulate the crash window: marker lost AFTER all writes landed
    val marker = java.nio.file.Paths.get(state, "_batch-run0-0")
    assert(java.nio.file.Files.deleteIfExists(marker))
    val eBefore = VersionedTable.readLatest(
      spark, RankStream.edgesDir(state)).collect().toSet
    val stream2 = spark.readStream.schema(docSchema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(src.toString)
    val q2 = RankStream.maintainRank(stream2, state)
    q2.processAllAvailable(); q2.stop()
    val eAfter = VersionedTable.readLatest(
      spark, RankStream.edgesDir(state)).collect().toSet
    assert(eAfter == eBefore,
      "markerless replay re-merged the edge delta (tag guard failed)")
  }
}
