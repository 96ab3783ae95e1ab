package graft.similarity

import graft.functions.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Hybrid retrieval: fuse a lexical score (token-set jaccard) with a
  * vector score (embedding cosine) into one ranking — the standard
  * retrieval shape for RAG/training-data curation where neither
  * signal alone suffices.
  *
  * Both scores ride the same candidate join, so the cost is one
  * pass over (query × candidate) with the cheap prefilters of the
  * underlying operators available (LSH buckets / IVF lists for the
  * vector side, length blocking for the lexical side). Here the
  * fused form is exact over the candidate set; the approximate
  * candidate generators compose in front of it unchanged.
  */
object Hybrid {

  def tokenSet(text: Column): Column =
    array_distinct(split(trim(lower(text)), "\\s+"))

  def tokenJaccard(a: Column, b: Column): Column = {
    val i = size(array_intersect(a, b))
    i / (size(a) + size(b) - i).cast("double")
  }

  private def fusedScore(alpha: Double): Column =
    round(
      lit(alpha) * (Vectors.dot(col("q_v"), col("n_v"))
        / (Vectors.norm(col("q_v")) * Vectors.norm(col("n_v"))))
        + lit(1.0 - alpha) * tokenJaccard(col("q_toks"), col("n_toks")),
      4).as("score")

  /** Fused score + per-query top-k over an already-joined
    * (q_id, q_toks, q_v, n_id, n_toks, n_v) candidate set. Partial
    * top-k heaps truncate each partition before the only shuffle. */
  private def rankCandidates(pairs: DataFrame, k: Int, alpha: Double): DataFrame = {
    val scored = pairs.select(col("q_id"), col("n_id"), fusedScore(alpha))
    val ord = Seq(("score", true), ("n_id", false))
    val local = graft.plans.TopKPerKey.topKPerKey(
      scored, Seq("q_id"), ord, k, partial = true)
    val global = graft.plans.TopKPerKey.topKPerKey(local, Seq("q_id"), ord, k)
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("n_id").asc)
    global.withColumn("rank", row_number().over(w).cast("int"))
  }

  /** Exact form: every query scores every candidate. The (small)
    * QUERY side broadcasts; the corpus streams map-only and is never
    * broadcast or shuffled — per-partition top-k heaps bound the one
    * shuffle at partitions·|q|·k rows (same shape as Knn.bruteForce).
    * `queries`/`candidates`: (id, text, v: array<double>). Returns
    * top-k per query by `alpha·cosine + (1-alpha)·jaccard`, rounded
    * to 4 dp for engine-stable ranking, ties broken by id. */
  def search(queries: DataFrame, candidates: DataFrame, k: Int,
      alpha: Double): DataFrame = {
    val q = queries.select(col("id").as("q_id"),
      tokenSet(col("text")).as("q_toks"), col("v").as("q_v"))
    val c = candidates.select(col("id").as("n_id"),
      tokenSet(col("text")).as("n_toks"), col("v").as("n_v"))
    rankCandidates(c.join(broadcast(q), lit(true)), k, alpha)
  }

  /** Scale form: an LSH candidate generator in front of the same
    * fused scoring. Both sides bucket by random-hyperplane signature
    * (Knn.hyperplaneBucket — deterministic md5-derived planes, so the
    * oracle can mirror the buckets); a query only scores candidates
    * in its own bucket, an equi-join on the bucket key. Cost per
    * query is |bucket| instead of |corpus|, and there is no cross
    * join and no corpus broadcast anywhere in the plan. */
  def searchBucketed(queries: DataFrame, candidates: DataFrame, k: Int,
      alpha: Double, nPlanes: Int, dim: Int): DataFrame = {
    val planes = Knn.derivePlanes(nPlanes, dim)
    val q = queries.select(col("id").as("q_id"),
      tokenSet(col("text")).as("q_toks"), col("v").as("q_v"),
      Knn.hyperplaneBucket(col("v"), planes).as("bucket"))
    val c = candidates.select(col("id").as("n_id"),
      tokenSet(col("text")).as("n_toks"), col("v").as("n_v"),
      Knn.hyperplaneBucket(col("v"), planes).as("bucket"))
    rankCandidates(q.join(c, "bucket"), k, alpha)
  }
}
