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

  /** `corpus`: (id, text, v: array<double>). Returns top-k candidates
    * per query by `alpha·cosine + (1-alpha)·jaccard`, rounded to 4 dp
    * for engine-stable ranking, ties broken by id. */
  def search(queries: DataFrame, candidates: DataFrame, k: Int,
      alpha: Double): DataFrame = {
    val q = queries.select(col("id").as("q_id"),
      tokenSet(col("text")).as("q_toks"), col("v").as("q_v"))
    val c = candidates.select(col("id").as("n_id"),
      tokenSet(col("text")).as("n_toks"), col("v").as("n_v"))
    val scored = q.join(broadcast(c), lit(true))
      .select(col("q_id"), col("n_id"),
        round(
          lit(alpha) * (Vectors.dot(col("q_v"), col("n_v"))
            / (Vectors.norm(col("q_v")) * Vectors.norm(col("n_v"))))
            + lit(1.0 - alpha) * tokenJaccard(col("q_toks"), col("n_toks")),
          4).as("score"))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }
}
