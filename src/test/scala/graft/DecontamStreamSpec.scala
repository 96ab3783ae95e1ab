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
}
