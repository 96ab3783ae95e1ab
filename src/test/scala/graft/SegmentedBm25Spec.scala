package graft

import graft.operators.{Retrieval, SegmentedBm25}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle contract for the segmented BM25 index: incremental
  * appends with replacement must serve EXACTLY what a from-scratch
  * index over the logical live corpus serves — scores included
  * (which also proves the manifest's stats corrections, since nDocs
  * and avgdl feed every score) — and compaction must be invisible. */
class SegmentedBm25Spec extends AnyFunSuite {
  import TestSession._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_segbm25").toString

  test("append+replace serves the live corpus exactly; compact is invisible") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val queries = docs.filter(col("doc_id") < 5)
    val corpus = docs.filter(col("doc_id") >= 5)
    // batch1: ids not ≡1 mod 3; batch2: the rest, PLUS replacements
    // (changed text) for ids ≡0 mod 7 already present in batch1
    val batch1 = corpus.filter(col("doc_id") % 3 =!= 1)
    val replaced = corpus.filter(col("doc_id") % 3 =!= 1 && col("doc_id") % 7 === 0)
      .withColumn("text", concat(col("text"), lit(" appendix")))
    val batch2 = corpus.filter(col("doc_id") % 3 === 1).unionByName(replaced)

    val idx = tmp()
    val s1 = SegmentedBm25.append(batch1, "doc_id", "text", idx)
    val s2 = SegmentedBm25.append(batch2, "doc_id", "text", idx)
    assert(s1 == 1 && s2 == 2)

    // logical live corpus after both appends
    val live = corpus.withColumn("text",
      when(col("doc_id") % 3 =!= 1 && col("doc_id") % 7 === 0,
        concat(col("text"), lit(" appendix"))).otherwise(col("text")))
    val scratch = tmp()
    Retrieval.buildIndex(live, "doc_id", "text", scratch)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    val want = rows(Retrieval.searchIndex(spark, scratch, queries, "doc_id", "text", 5))
    val got = rows(SegmentedBm25.search(spark, idx, queries, "doc_id", "text", 5))
    assert(got == want, "segmented search must equal the from-scratch index")
    assert(got.nonEmpty)

    // a replaced doc's OLD postings must be dead: no score may differ
    // when the replaced docs' old text contained a query term — the
    // equality above already proves it; spot-check the tombstone count
    val manifest = graft.sources.VersionedTable.readLatest(
      spark, s"$idx/manifest")
    val nTombs = manifest.filter(col("kind") === "tomb").count()
    val nReplaced = replaced.count()
    assert(nTombs == nReplaced, s"one tombstone per replaced doc ($nTombs vs $nReplaced)")

    // compaction: one segment, zero tombstones, identical results
    SegmentedBm25.compact(spark, idx)
    val m2 = graft.sources.VersionedTable.readLatest(spark, s"$idx/manifest")
    assert(m2.filter(col("kind") === "seg").count() == 1)
    assert(m2.filter(col("kind") === "tomb").count() == 0)
    val afterCompact = rows(SegmentedBm25.search(spark, idx, queries, "doc_id", "text", 5))
    assert(afterCompact == want, "compaction must not change results")

    // re-replacing an already-replaced doc tombstones the COMPACTED
    // copy (the only live one) — stats stay exact
    val again = replaced.limit(3)
      .withColumn("text", concat(col("text"), lit(" more")))
    SegmentedBm25.append(again, "doc_id", "text", idx)
    val live2 = live.join(again.select(col("doc_id").as("r_id")),
        col("doc_id") === col("r_id"), "left_anti")
      .unionByName(again)
    val scratch2 = tmp()
    Retrieval.buildIndex(live2, "doc_id", "text", scratch2)
    val want2 = rows(Retrieval.searchIndex(spark, scratch2, queries, "doc_id", "text", 5))
    val got2 = rows(SegmentedBm25.search(spark, idx, queries, "doc_id", "text", 5))
    assert(got2 == want2, "post-compaction replacement must still be exact")
  }

  test("orphan segment dirs from a crashed append are invisible to the replacement probe") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val queries = docs.filter(col("doc_id") < 5)
    val corpus = docs.filter(col("doc_id") >= 5)
    val batch1 = corpus.filter(col("doc_id") % 2 === 0)
    val batch2 = corpus.filter(col("doc_id") % 2 === 1)

    val idx = tmp()
    assert(SegmentedBm25.append(batch1, "doc_id", "text", idx) == 1)

    // simulate a crash AFTER the seg-2 data writes but BEFORE the
    // manifest flip: segdata/docmeta for batch2 exist on disk, the
    // manifest has never served them
    val tfO = Retrieval.termFrequencies(batch2,
        col("doc_id").cast("long"), col("text"))
      .withColumn("tok_bucket",
        pmod(xxhash64(col("tok")), lit(Retrieval.TfBuckets.toLong)))
    tfO.write.partitionBy("tok_bucket").parquet(s"$idx/segdata/seg=2")
    tfO.select("doc_id", "dl").distinct()
      .withColumn("doc_bucket",
        pmod(xxhash64(col("doc_id")), lit(SegmentedBm25.DocBuckets.toLong)))
      .write.partitionBy("doc_bucket").parquet(s"$idx/docmeta/seg=2")

    // the replayed append of the same batch must skip the orphan id
    // AND create zero tombstones: the orphan's docmeta rows are not
    // prior live copies (a tombstone for them would permanently
    // over-subtract nDocs/avgdl)
    assert(SegmentedBm25.append(batch2, "doc_id", "text", idx) == 3)
    val manifest = graft.sources.VersionedTable.readLatest(spark, s"$idx/manifest")
    assert(manifest.filter(col("kind") === "tomb").count() == 0,
      "orphan docmeta must not produce tombstones")

    // stats correctness is observable through scores: segmented search
    // must equal a from-scratch index over the logical live corpus
    val scratch = tmp()
    Retrieval.buildIndex(corpus, "doc_id", "text", scratch)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    assert(rows(SegmentedBm25.search(spark, idx, queries, "doc_id", "text", 5)) ==
      rows(Retrieval.searchIndex(spark, scratch, queries, "doc_id", "text", 5)),
      "orphan segments must not perturb nDocs/avgdl")
  }

  test("append refuses a mismatched n_buckets (pruning would silently drop postings)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val idx = tmp()
    SegmentedBm25.append(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", idx)
    val e = intercept[IllegalArgumentException] {
      SegmentedBm25.append(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        idx, nBuckets = Retrieval.TfBuckets / 2)
    }
    assert(e.getMessage.contains("n_buckets"))
  }

  test("maintain bounds the manifest over any append history; search stays exact") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val queries = docs.filter(col("doc_id") < 5)
    val corpus = docs.filter(col("doc_id") >= 5)
    val idx = tmp()
    // 12 micro-batches where every doc is re-appended three times
    // (i % 4 slices repeat) — heavy replacement traffic, the worst
    // case for tombstone growth — with the maintain cadence after
    // each append, as the streaming maintainer runs it
    var compactions = 0
    (0 until 12).foreach { i =>
      SegmentedBm25.append(corpus.filter(col("doc_id") % 4 === i % 4),
        "doc_id", "text", idx)
      if (SegmentedBm25.maintain(spark, idx, maxSegments = 3,
          maxTombPct = 20).nonEmpty) compactions += 1
      // the bound holds AFTER EVERY batch, not just at the end: seg
      // rows never exceed maxSegments+1 (compact itself adds one)
      val m = graft.sources.VersionedTable.readLatest(spark, s"$idx/manifest")
      assert(m.filter(col("kind") === "seg").count() <= 4)
    }
    assert(compactions >= 2, "the cadence should have fired repeatedly")
    // tombstones were cleared by the last compact-cycle, so the whole
    // manifest is O(maxSegments + replacements-since-last-compact),
    // independent of the 12-batch history
    val m = graft.sources.VersionedTable.readLatest(spark, s"$idx/manifest")
    assert(m.count() <= 4 + corpus.count(),
      "manifest must not accumulate history-proportional rows")
    // and the served index is still exactly the live corpus
    val scratch = tmp()
    Retrieval.buildIndex(corpus, "doc_id", "text", scratch)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    assert(rows(SegmentedBm25.search(spark, idx, queries, "doc_id", "text", 5)) ==
      rows(Retrieval.searchIndex(spark, scratch, queries, "doc_id", "text", 5)),
      "compaction cadence must be invisible to search results")

    // vacuum (runs inside maintain at each compaction): on-disk state
    // is bounded by LIVENESS, not append history — 12 appends plus
    // compactions wrote 14+ segment dirs ever, but only those
    // referenced by the retained manifest window may remain
    def segDirs(root: String) = new java.io.File(s"$idx/$root")
      .listFiles().toSeq.filter(f => f.isDirectory && f.getName.startsWith("seg="))
    val nEver = 12 + compactions
    assert(segDirs("segdata").size < nEver - 2,
      s"vacuum must delete superseded segment dirs (${segDirs("segdata").size} of $nEver remain)")
    assert(segDirs("docmeta").size == segDirs("segdata").size,
      "segdata and docmeta must vacuum in lockstep")
    val versions = graft.sources.VersionedTable.listVersions(s"$idx/manifest")
    assert(versions.size <= 3 + 4,
      s"manifest history must be pruned to the keep window (+appends since), got ${versions.size}")

    // rollback stays live WITHIN the keep window: every seg a retained
    // manifest version references survived the vacuum, so pointing the
    // alias at the oldest retained version still serves results
    val serving = graft.sources.VersionedTable.latestVersion(s"$idx/manifest").get
    graft.sources.VersionedTable.swapTo(s"$idx/manifest", versions.min)
    assert(SegmentedBm25.search(spark, idx, queries, "doc_id", "text", 5)
      .count() > 0, "rollback within the keep window must still serve")
    graft.sources.VersionedTable.swapTo(s"$idx/manifest", serving)
  }

  test("streaming maintenance appends one segment per micro-batch, replay-safe") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val queries = docs.filter(col("doc_id") < 5)
    val corpus = docs.filter(col("doc_id") >= 5)
    val batch1 = corpus.filter(col("doc_id") % 3 =!= 1)
    val replaced = corpus.filter(col("doc_id") % 3 =!= 1 && col("doc_id") % 7 === 0)
      .withColumn("text", concat(col("text"), lit(" appendix")))
    val batch2 = corpus.filter(col("doc_id") % 3 === 1).unionByName(replaced)

    // stage two single-file batches with ordered mtimes so the file
    // source delivers them as two micro-batches in order
    val sdir = java.nio.file.Files.createTempDirectory("graft_bm25stream")
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmpOut = java.nio.file.Files.createTempDirectory("graft_stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmpOut)
      val part = new java.io.File(tmpOut).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = sdir.resolve(name)
      java.nio.file.Files.copy(part.toPath, dst)
      dst.toFile.setLastModified(mtime)
      ()
    }
    val t0 = System.currentTimeMillis() - 60000
    stage(batch1, "b1.parquet", t0)
    stage(batch2, "b2.parquet", t0 + 30000)

    val idx = tmp()
    val stream = spark.readStream.schema(batch1.schema)
      .option("maxFilesPerTrigger", 1).parquet(sdir.toString)
    val q = graft.streaming.Bm25Stream.maintainBm25(
      stream, idx, "doc_id", "text", lineage = "t1")
    q.processAllAvailable(); q.stop()

    val manifest = graft.sources.VersionedTable.readLatest(spark, s"$idx/manifest")
    assert(manifest.filter(col("kind") === "seg").count() == 2)

    val live = corpus.withColumn("text",
      when(col("doc_id") % 3 =!= 1 && col("doc_id") % 7 === 0,
        concat(col("text"), lit(" appendix"))).otherwise(col("text")))
    val scratch = tmp()
    Retrieval.buildIndex(live, "doc_id", "text", scratch)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    assert(rows(SegmentedBm25.search(spark, idx, queries, "doc_id", "text", 5)) ==
      rows(Retrieval.searchIndex(spark, scratch, queries, "doc_id", "text", 5)))

    // replay: a fresh query (new checkpoint) over the same files and
    // lineage restarts batch ids at 0 — the markers must skip both
    // batches, leaving the segment count untouched
    val stream2 = spark.readStream.schema(batch1.schema)
      .option("maxFilesPerTrigger", 1).parquet(sdir.toString)
    val q2 = graft.streaming.Bm25Stream.maintainBm25(
      stream2, idx, "doc_id", "text", lineage = "t1")
    q2.processAllAvailable(); q2.stop()
    val m2 = graft.sources.VersionedTable.readLatest(spark, s"$idx/manifest")
    assert(m2.filter(col("kind") === "seg").count() == 2,
      "replayed batches must be skipped by the marker protocol")
  }
}
