package graft.text

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature linear text classifier scoring — the fastText-style
  * quality/model-filter pass (a trained linear model over hashed
  * token features) as a pure Spark plan. The model here is a weight
  * table indexed by feature bucket; training happens elsewhere — this
  * operator is the SCORING pass a pipeline runs over the full corpus,
  * which is the part that must scale.
  *
  * Scale posture: the model is O(nBuckets) and broadcasts (a few KB
  * to a few MB — fastText-scale models hash to 2M buckets); tokens
  * explode map-side, join the broadcast weights map-side, and the
  * only shuffle is the per-document sum — whose key is doc_id, so
  * it's the same shuffle any per-doc aggregate pays. No UDF in the
  * hot path: bucketing is md5 (codegen'd), the dot product is a sum.
  *
  * Determinism: weights are INTEGER (trained weights quantized at
  * 1e-3 — standard inference quantization), so the per-document
  * accumulation is an exact long sum — order-independent, replayable
  * in any engine. The demo weight table is itself md5-derived from
  * the bucket id, so the oracle reconstructs the identical model with
  * no side channel.
  */
object Classifier {

  /** Feature bucket of a token: h32("<seed>:" + tok) mod nBuckets. */
  def featureBucket(tok: Column, nBuckets: Int): Column =
    pmod(Hashing.h32(21, tok), lit(nBuckets))

  /** Deterministic demo model: bucket b → integer weight in
    * [-1000, 1000], derived from md5 of the bucket id (a stand-in for
    * trained weights; the contract — integer weights, broadcast
    * lookup — is what the real model would use). */
  def demoWeights(spark: org.apache.spark.sql.SparkSession,
      nBuckets: Int): DataFrame =
    spark.range(nBuckets).select(col("id").cast("int").as("bucket"),
      (pmod(Hashing.h32(22, col("id").cast("string")), lit(2001)) - 1000)
        .cast("long").as("w"))

  /** Score every document: mean quantized weight over token
    * occurrences, `positive` = rounded score > 0. Output columns:
    * (doc_id, n_tokens, score, positive). */
  def score(docs: DataFrame, idCol: Column, textCol: Column,
      weights: DataFrame, nBuckets: Int): DataFrame = {
    val toks = docs.select(idCol.as("doc_id"),
      explode(split(trim(lower(textCol)), "\\s+")).as("tok"))
    val bucketed = toks.select(col("doc_id"),
      featureBucket(col("tok"), nBuckets).cast("int").as("bucket"))
    bucketed.join(broadcast(weights), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("w").as("s"))
      // score = round(s/(n·1000), 4) computed as EXACT integer
      // rounding: q = half-away-from-zero(s·10/n) in 1e-4 units on
      // the absolute value (positive integer div is floor in every
      // engine; float round() at a .5 decimal boundary is not —
      // s/(n·1000)=0.14075 is binarily 0.14074999…, which Spark's
      // string-based round sends up and DuckDB's binary round sends
      // down; sf0.1 doc 736 hit exactly this)
      .withColumn("q",
        expr("CASE WHEN s < 0 THEN -1 ELSE 1 END * ((abs(s) * 20 + n_tokens) div (2 * n_tokens))"))
      .select(col("doc_id"), col("n_tokens"),
        (col("q") / lit(10000.0)).as("score"))
      .withColumn("positive", col("score") > 0)
  }
}
