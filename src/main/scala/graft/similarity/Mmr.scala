package graft.similarity

import graft.functions.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein '98):
  * from each query's candidate list, greedily pick the item
  * maximizing λ·relevance − (1−λ)·max-similarity-to-already-picked —
  * the standard diversification pass RAG retrieval runs after ANN.
  *
  * Scale shape: the expensive, corpus-sized stage is candidate
  * GENERATION (any of s1/s2/s4 in front); re-ranking only ever
  * touches |queries| × nCands rows, so the k-step greedy loop — k
  * blocking rounds of (anti-join, max-sim aggregate, argmax window),
  * all partitioned by q_id — shuffles a bounded frame no matter how
  * big the corpus is. Candidate and pairwise-sim frames are eagerly
  * checkpointed: both are consumed by every round of the loop.
  *
  * Determinism: relevance and pairwise sims are round(cos, 4); the
  * MMR score is two exact-halving multiplies and one subtraction on
  * those values, bitwise identical in any IEEE engine, and ties
  * break on n_id — so the greedy trajectory replays exactly in the
  * DuckDB oracle's recursive CTE. */
object Mmr {

  /** cands: (q_id, n_id, cos, n_v). Returns (q_id, n_id, cos, rank)
    * with rank = pick order, 1..k. Queries with fewer than k
    * candidates return them all. */
  def rerank(cands: DataFrame, k: Int, lam: Double = 0.5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val c = cands.localCheckpoint()
    val sims = c.as("x").join(c.as("y"),
        col("x.q_id") === col("y.q_id") && col("x.n_id") =!= col("y.n_id"))
      .select(col("x.q_id").as("q_id"), col("x.n_id").as("a"),
        col("y.n_id").as("b"), Vectors.cosine4(col("x.n_v"), col("y.n_v")).as("sim"))
      .localCheckpoint()
    val w1 = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    var selected = c.withColumn("r", row_number().over(w1))
      .filter(col("r") === 1)
      .select(col("q_id"), col("n_id"), col("cos"), lit(1).as("rank"))
      .localCheckpoint()
    var step = 1
    while (step < k) {
      step += 1
      val maxSim = sims
        .join(selected.select(col("q_id"), col("n_id").as("b")), Seq("q_id", "b"))
        .groupBy(col("q_id"), col("a").as("n_id")).agg(max("sim").as("msim"))
      val remaining = c.select("q_id", "n_id", "cos")
        .join(selected.select("q_id", "n_id"), Seq("q_id", "n_id"), "left_anti")
      val ws = Window.partitionBy("q_id").orderBy(col("mmr").desc, col("n_id").asc)
      val pick = remaining.join(maxSim, Seq("q_id", "n_id"))
        .withColumn("mmr", lit(lam) * col("cos") - lit(1.0 - lam) * col("msim"))
        .withColumn("r", row_number().over(ws)).filter(col("r") === 1)
        .select(col("q_id"), col("n_id"), col("cos"), lit(step).as("rank"))
      selected = selected.unionByName(pick).localCheckpoint()
    }
    selected
  }
}
