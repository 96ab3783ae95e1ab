package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DecontamStream

/** The streaming decontamination gate (round-11 verdict item 6):
  * batch parity vs the d7 verdicts, span evidence vs d23, and the
  * (lineage, batchId) replay protocol. */
class DecontamStreamSpec extends AnyFunSuite {
  import TestSession._

  test("streaming decontam gate splits corpus/quarantine with d7 parity and d23 evidence") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") >= 10)
    val bench = docs.filter(col("doc_id") < 10)
    val src = java.nio.file.Files.createTempDirectory("graft_dc_src")
    // two staged halves + maxFilesPerTrigger=1 → the verdict must
    // hold across micro-batches
    Seq(corpus.filter(col("doc_id") % 2 === 0),
        corpus.filter(col("doc_id") % 2 === 1))
      .zipWithIndex.foreach { case (p, i) =>
        p.select("doc_id", "text", "lang", "n_chars").coalesce(1)
          .write.mode("overwrite").parquet(src.resolve(s"w$i").toString)
        val part = java.nio.file.Files.list(src.resolve(s"w$i"))
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        java.nio.file.Files.move(part, src.resolve(s"b$i.parquet"))
      }
    val out = java.nio.file.Files.createTempDirectory("graft_dc_out").toString
    val q = DecontamStream.decontamGate(
      DecontamStream.readDocs(spark, src.toString), bench, out,
      minSharedShingles = 3)
    q.processAllAvailable(); q.stop()

    // routing parity with the batch d7 verdicts
    val want = graft.dedup.Dedup.decontaminate(corpus, bench, 3)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    val gotCorpus = DecontamStream.corpus(spark, out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val gotQuar = DecontamStream.quarantine(spark, out)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(gotCorpus == want.filterNot(_._2).keySet,
      "admitted corpus != batch clean set")
    assert(gotQuar == want.filter(_._2).keySet,
      "quarantine != batch contaminated set")
    assert(gotQuar.nonEmpty, "fixture produced no contaminated docs")
    assert(gotCorpus.intersect(gotQuar).isEmpty)

    // span evidence: for quarantined docs, the pair rows equal d23's
    // threshold-1 audit restricted to those docs, and n_hits carries
    // the d7 occurrence count
    val wantSpans = graft.dedup.Dedup.contaminationSpans(corpus, bench, 1)
      .filter(col("doc_id").isInCollection(gotQuar))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val gotSpans = DecontamStream.quarantine(spark, out)
      .select("doc_id", "bench_id", "n_shared", "first_pos", "last_pos")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(gotSpans == wantSpans, "quarantine span evidence != batch d23")
    // every quarantined doc has provenance (the lossless-join claim)
    assert(gotSpans.map(_._1) == gotQuar)

    // replay: a fresh query over the same source + sinks (fresh
    // checkpoint → batch ids restart at 0) must be marker-skipped
    val nCorpus = DecontamStream.corpus(spark, out).count()
    val nQuar = DecontamStream.quarantine(spark, out).count()
    val q2 = DecontamStream.decontamGate(
      DecontamStream.readDocs(spark, src.toString), bench, out,
      minSharedShingles = 3,
      checkpointDir = Some(java.nio.file.Files
        .createTempDirectory("graft_dc_ckpt2").toString))
    q2.processAllAvailable(); q2.stop()
    assert(DecontamStream.corpus(spark, out).count() == nCorpus
      && DecontamStream.quarantine(spark, out).count() == nQuar,
      "replayed batches duplicated sink rows")
  }

  test("sink readers return empty typed frames before any batch lands (r12 advice)") {
    // the sink dirs are only created by batches that have rows for
    // them — before any batch, or when every batch routed entirely
    // to the other sink, the reader must not fail schema inference
    val out = java.nio.file.Files
      .createTempDirectory("graft_dc_empty").toString
    val corpus = DecontamStream.corpus(spark, out)
    val quar = DecontamStream.quarantine(spark, out)
    assert(corpus.count() == 0)
    assert(corpus.columns.toSeq == Seq("doc_id", "text", "lang", "n_chars"))
    assert(quar.count() == 0)
    assert(quar.columns.toSeq == Seq("doc_id", "n_hits", "bench_id",
      "n_shared", "first_pos", "last_pos"))
  }

  test("strip gate: multi-batch union equals batch d29 EXACTLY (stateless twin)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val bench = docs.filter(col("doc_id") < 10).select("doc_id", "text")
    // corpus with planted leaks (the d29 fixture shape): each eval
    // doc's tokens 8..47 appear verbatim inside a corpus doc
    val planted = bench.select((col("doc_id") + 7000000L).as("doc_id"),
      concat_ws(" ", lit("uq"), lit("ur"), lit("us"),
        array_join(slice(split(trim(col("text")), "\\s+"), 8, 40), " "))
        .as("text"))
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
    val corpus = docs.filter(col("doc_id") >= 10 && col("doc_id") < 200)
      .select("doc_id", "text", "lang", "n_chars")
      .unionByName(planted)
      .localCheckpoint(true)
    val src = java.nio.file.Files.createTempDirectory("graft_ds_src")
    Seq(corpus.filter(col("doc_id") % 2 === 0),
        corpus.filter(col("doc_id") % 2 === 1))
      .zipWithIndex.foreach { case (p, i) =>
        p.coalesce(1)
          .write.mode("overwrite").parquet(src.resolve(s"w$i").toString)
        val part = java.nio.file.Files.list(src.resolve(s"w$i"))
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        java.nio.file.Files.move(part, src.resolve(s"b$i.parquet"))
      }
    val out = java.nio.file.Files.createTempDirectory("graft_ds_out").toString
    val q = DecontamStream.stripGate(
      DecontamStream.readDocs(spark, src.toString), bench, out)
    q.processAllAvailable(); q.stop()
    val got = DecontamStream.cleaned(spark, out)
      .collect().map(_.toSeq).toSet
    val want = graft.dedup.Dedup
      .stripEvalSubstrings(corpus, bench, k = 10, minLen = 20)
      .collect().map(_.toSeq).toSet
    assert(got == want,
      s"strip gate != batch d29: missing ${(want -- got).take(2)}, " +
        s"extra ${(got -- want).take(2)}")
    // the fixture genuinely strips: every long-enough planted doc cut
    val struck = DecontamStream.cleaned(spark, out)
      .filter(col("doc_id") >= 7000000L && col("n_stripped") > 0).count()
    assert(struck > 0, "no planted strip fired")
    // replay with a fresh checkpoint: markers skip, outputs unchanged
    val q2 = DecontamStream.stripGate(
      DecontamStream.readDocs(spark, src.toString), bench, out,
      checkpointDir = Some(
        java.nio.file.Files.createTempDirectory("graft_ds_cp2").toString))
    q2.processAllAvailable(); q2.stop()
    assert(DecontamStream.cleaned(spark, out)
      .collect().map(_.toSeq).toSet == want, "replay changed the sink")
  }
}
