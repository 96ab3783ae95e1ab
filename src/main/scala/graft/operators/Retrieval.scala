package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked full-text retrieval over the corpus — the query side of the
  * x5 inverted index (the reference's Solr collections exist to be
  * SEARCHED; solr_api_utils.py:14-60 only manages their lifecycle).
  *
  * Scale posture: the query set is small and broadcast; the corpus
  * term-frequency table is the big side and is touched map-side by
  * the broadcast join, so scoring shuffles only (q_id, doc) partial
  * scores — never postings. The final per-query top-k is the
  * rank-dropping row_number shape that TopKRewriteRule turns into a
  * bounded heap (no per-query sort). Corpus statistics (N, avgdl)
  * are two exact long aggregates computed once.
  *
  * Determinism: per-term BM25 contributions are quantized to 1e-6
  * before summing (round → long), so the per-document score is an
  * exact integer sum — order-independent under any partitioning —
  * and replays bit-identically in the DuckDB oracle. The float
  * rounding loses nothing at ranking granularity (scores are
  * O(1..50); 1e-6 is far below any real score gap).
  */
object Retrieval {

  /** Corpus term frequencies: (doc_id, tok, tf, dl) with dl = total
    * token count of the document (BM25's length normalizer). dl is
    * computed MAP-SIDE from the token array and carried through the
    * groupBy key (constant per doc, so the key extension is free) —
    * no per-doc re-aggregation, no dl self-join, one shuffle total. */
  def termFrequencies(corpus: DataFrame, idCol: Column, textCol: Column): DataFrame =
    corpus.select(idCol.as("doc_id"), split(trim(lower(textCol)), "\\s+").as("tks"))
      .select(col("doc_id"), size(col("tks")).cast("long").as("dl"),
        explode(col("tks")).as("tok"))
      .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))

  /** BM25 more-like-this: rank corpus documents against each query
    * document's distinct token set, top `k` per query.
    *
    * score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * with idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (Robertson/Lucene form).
    */
  def bm25MoreLikeThis(corpus: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = termFrequencies(corpus, col(idCol), col(textCol))
      .localCheckpoint(false) // df + scoring both read it; one token pass
    // two exact long aggregates -> one double each (deterministic)
    val stats = tf.groupBy().agg(
      countDistinct("doc_id").as("n_docs"), sum("tf").as("total_len")).head()
    val nDocs = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / nDocs
    val qTerms = queries.select(col(idCol).as("q_id"),
        explode(array_distinct(split(trim(lower(col(textCol))), "\\s+"))).as("tok"))
    // df only for terms the queries actually use: the full-vocabulary
    // df table is corpus-sized at 100 TB and must never broadcast —
    // semi-restricting the aggregation first keeps the broadcast side
    // O(|query terms|)
    val dfreq = tf.join(broadcast(qTerms.select("tok").distinct()), "tok")
      .groupBy("tok").agg(count(lit(1)).as("df"))
    // contribution in a fixed scalar expression order, quantized to a
    // long BEFORE the sum so the aggregate is exact integer math
    val contrib =
      log(((lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5)) + 1.0) *
        (col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl)))
    val scored = tf.join(broadcast(qTerms), "tok")
      .join(broadcast(dfreq), "tok")
      .groupBy(col("q_id"), col("doc_id").as("n_id"))
      .agg(sum(round(contrib * 1e6).cast("long")).as("score_q"))
      .select(col("q_id"), col("n_id"),
        round(col("score_q") / 1e6, 4).as("score"))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("q_id", "n_id", "score", "rank")
  }
}
