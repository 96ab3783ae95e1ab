package graft

import graft.operators.{Corpus, Retrieval}
import graft.text.Classifier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the retrieval/filter surface added this round:
  * x7 BM25 more-like-this, p8 per-domain cap, ta10 hashed linear
  * classifier scoring. */
class SearchPipelineSpec extends AnyFunSuite {
  import TestSession._

  test("bm25 ranks term overlap and rewards rarity") {
    import spark.implicits._
    val corpus = Seq(
      (10L, "alpha beta gamma delta"),   // shares both query terms
      (11L, "alpha zeta zeta zeta"),     // shares the COMMON term only
      (12L, "beta eta theta iota"),      // shares the RARE term only
      (13L, "kappa lambda mu nu"),       // shares nothing
      (14L, "alpha kappa lambda mu"),    // common term again (df boost)
      (15L, "alpha pi rho sigma")        // and again
    ).toDF("doc_id", "text")
    val queries = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val got = Retrieval.bm25MoreLikeThis(corpus, queries,
      "doc_id", "text", k = 6).collect()
    val ranked = got.sortBy(_.getInt(3)).map(_.getLong(1))
    // doc 13 shares nothing -> absent; both-term doc first
    assert(!ranked.contains(13L))
    assert(ranked.head == 10L, s"both-term doc must rank first, got ${ranked.toSeq}")
    // beta (df=2) outscores alpha (df=4): the rare-term-only doc beats
    // every common-term-only doc
    val pos = ranked.zipWithIndex.toMap
    assert(pos(12L) < pos(11L) && pos(12L) < pos(14L) && pos(12L) < pos(15L),
      s"rare-term doc must beat common-term docs, got ${ranked.toSeq}")
    // scores are positive and ranks dense from 1
    assert(got.forall(r => r.getDouble(2) > 0))
    assert(got.map(_.getInt(3)).sorted.sameElements(1 to got.length))
  }

  test("bm25 length normalization favors the shorter of two equal-tf docs") {
    import spark.implicits._
    val corpus = Seq(
      (20L, "target one two"),
      (21L, "target one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val queries = Seq((1L, "target")).toDF("doc_id", "text")
    val got = Retrieval.bm25MoreLikeThis(corpus, queries, "doc_id", "text", k = 2)
      .orderBy("rank").collect()
    assert(got(0).getLong(1) == 20L,
      "same tf, shorter doc must score higher (b=0.75 length normalization)")
  }

  test("domain cap keeps exactly min(cap, total) per domain, reproducibly") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source")
    val capped = Corpus.domainCap(docs, col("source"), col("doc_id"),
      maxPerDomain = 7).cache()
    // audit pass: nothing dropped from the frame itself
    assert(capped.count() == docs.count())
    val perDomain = capped.groupBy("source").agg(
      sum(when(col("kept"), 1).otherwise(0)).as("n_kept"),
      max("domain_total").as("total")).collect()
    perDomain.foreach { r =>
      assert(r.getLong(1) == math.min(7L, r.getLong(2)),
        s"source ${r.getString(0)}: kept ${r.getLong(1)} of ${r.getLong(2)}")
    }
    // deterministic: the same kept set on a fresh computation
    val again = Corpus.domainCap(docs, col("source"), col("doc_id"), 7)
      .filter(col("kept")).select("doc_id")
    val first = capped.filter(col("kept")).select("doc_id")
    assert(first.exceptAll(again).isEmpty && again.exceptAll(first).isEmpty)
    capped.unpersist()
    ()
  }

  test("classifier scores are mean-weight bounded and token-exact") {
    val docs = Tables.documents(spark, sf)
    val scored = Classifier.score(docs, col("doc_id"), col("text"),
      Classifier.demoWeights(spark, 256), nBuckets = 256).cache()
    assert(scored.count() == docs.count())
    // mean of weights in [-1000,1000] scaled by 1e-3 -> score in [-1,1]
    assert(scored.filter(abs(col("score")) > 1.0).count() == 0)
    // n_tokens matches the independent tokenizer count
    val tok = docs.select(col("doc_id"),
      size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("n"))
    val joined = scored.join(tok, "doc_id")
      .filter(col("n_tokens") =!= col("n"))
    assert(joined.count() == 0, "n_tokens must equal whitespace token count")
    scored.unpersist()
    ()
  }
}
