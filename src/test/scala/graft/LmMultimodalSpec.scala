package graft

import graft.multimodal.Multimodal
import graft.operators.Events
import graft.text.LangModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for ta11 bigram-LM scoring, e11 interval-overlap join,
  * and the m3 decode-features pipeline. */
class LmMultimodalSpec extends AnyFunSuite {
  import TestSession._

  test("bigram logprob is 0 for all-unique continuations, negative for split ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),      // every w1 continues uniquely -> lp 0
      (2L, "x y"),          // x splits between y and z below
      (3L, "x z")
    ).toDF("doc_id", "text")
    val got = LangModel.bigramLogProb(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L)._2 == 0.0, s"unique continuations must score 0, got ${got(1L)}")
    // ln(1/2) = -0.6931...
    assert(got(2L)._2 == -0.6931 && got(3L)._2 == -0.6931,
      s"split continuation must score ln(0.5), got ${got(2L)} / ${got(3L)}")
    assert(got(1L)._1 == 3 && got(2L)._1 == 1)
    // corpus-wide: scores never positive (probabilities <= 1)
    val corpus = LangModel.bigramLogProb(
      Tables.documents(spark, sf), col("doc_id"), col("text"))
    assert(corpus.filter(col("avg_logprob") > 0).count() == 0)
  }

  test("interval overlap join equals the naive theta join, without duplicates") {
    val ev = Tables.events(spark, sf)
    def daily(t: String, s: String, e: String) =
      ev.filter(col("event_type") === t)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("__day"))
        .agg(min("ts").as(s), max("ts").as(e)).drop("__day")
    val a = daily("view", "a_s", "a_e")
    val b = daily("click", "b_s", "b_e")
    val got = Events.intervalOverlapJoin(a, b, "user_id",
      "a_s", "a_e", "b_s", "b_e", bucketSeconds = 21600)
    val naive = a.join(b, "user_id")
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select(got.columns.map(col): _*)
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "bucketized overlap join must equal the theta join exactly")
    // first-shared-bucket rule leaves no duplicate pairs
    assert(got.count() == got.distinct().count())
  }

  test("decode pipeline emits one frame of 8 in-range features per record") {
    import spark.implicits._
    val ds = Tables.documents(spark, sf)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("payload"),
        col("source").as("kind"))
      .as[Multimodal.BinaryRecord]
    val decoded = Multimodal.decodeBatch(ds, Multimodal.StubDecoder).cache()
    assert(decoded.count() == ds.count())
    val df = decoded.toDF()
    assert(df.filter(col("width") < 64 || col("width") > 255
      || col("height") < 64 || col("height") > 255).count() == 0)
    assert(df.filter(size(col("features")) =!= 8).count() == 0)
    assert(df.filter(col("format") =!= "stub").count() == 0)
    decoded.unpersist()
    ()
  }

  test("phash near-dup recall: every planted one-byte perturbation is found") {
    import graft.multimodal.Multimodal
    val df = SparkEntry.queries("m5_phash_dedup")(spark, sf)
    val planted = df.filter(col("b_id") >= 1000000L &&
      col("a_id") === col("b_id") - 1000000L)
    val expected = Tables.documents(spark, sf)
      .filter(col("n_chars") >= 64 && col("doc_id") < 50).count()
    assert(planted.count() == expected,
      s"expected $expected planted pairs, found ${planted.count()}")
    // the pigeonhole guarantee: a one-byte change flips at most the
    // bits sampling that byte, always <= maxHamming
    assert(planted.filter(col("hamming") > 5).count() == 0)
  }

  test("blockHash60 stays in [0, 2^60) — positive in any signed 64-bit engine") {
    import graft.multimodal.Multimodal
    val h = Tables.documents(spark, sf)
      .select(Multimodal.blockHash60(col("text").cast("binary")).as("ph"))
    assert(h.filter(col("ph") < 0L || col("ph") >= (1L << 60)).count() == 0)
  }
}
