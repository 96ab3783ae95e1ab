package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein '98):
  * from each query's candidate list, greedily pick the item
  * maximizing λ·relevance − (1−λ)·max-similarity-to-already-picked —
  * the standard diversification pass RAG retrieval runs after ANN.
  *
  * Scale shape: the expensive, corpus-sized stage is candidate
  * GENERATION (any of s1/s2/s4 in front); re-ranking only ever
  * touches |queries| × nCands rows. One groupByKey shuffle moves
  * each query's bounded candidate set to one task, and the whole
  * k-step greedy loop runs in-memory per group — ONE Spark job for
  * any k, no per-round anti-join/aggregate/checkpoint cycle (the
  * previous shape launched k blocking jobs; per-job overhead
  * dominated the bounded compute). Groups distribute across the
  * cluster, so a billion queries parallelize; per-group cost is
  * O(nCands²·dim) worst case, constant in corpus size.
  *
  * Determinism: candidate relevance arrives rounded (cos4) and
  * pairwise sims are rounded with the same BigDecimal HALF_UP
  * arithmetic Spark's `round` uses, dot products accumulate in
  * forward index order exactly like the DotProduct codegen — the
  * greedy trajectory is bitwise identical to the declarative plan it
  * replaces, to MmrPropertySpec's sequential reference, and to the
  * DuckDB oracle's recursive CTE. Ties break on n_id. */
object Mmr {

  private def round4(x: Double): Double =
    BigDecimal.valueOf(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** cands: (q_id, n_id, cos, n_v) with long ids, double cos,
    * array<double> vectors. Returns (q_id, n_id, cos, rank) with
    * rank = pick order, 1..k. Queries with fewer than k candidates
    * return them all. */
  def rerank(cands: DataFrame, k: Int, lam: Double = 0.5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = cands.sparkSession
    import spark.implicits._
    cands
      .select(col("q_id").cast("long"), col("n_id").cast("long"),
        col("cos").cast("double"), col("n_v").cast("array<double>"))
      .as[(Long, Long, Double, Array[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Double, Array[Double])]) =>
        val cs = it.toArray // bounded: nCands rows per query
        val n = cs.length
        val kk = math.min(k, n)
        val norms = new Array[Double](n)
        var i = 0
        while (i < n) {
          val v = cs(i)._4; var s = 0.0; var x = 0
          while (x < v.length) { s += v(x) * v(x); x += 1 }
          norms(i) = math.sqrt(s)
          i += 1
        }
        // pairwise sims computed on first use; only pairs against
        // already-picked items are ever needed (≤ k·n of the n²)
        val simCache = Array.fill(n, n)(Double.NaN)
        def sim(a: Int, b: Int): Double = {
          if (simCache(a)(b).isNaN) {
            val u = cs(a)._4; val w = cs(b)._4
            var d = 0.0; var x = 0
            while (x < u.length) { d += u(x) * w(x); x += 1 }
            val s = round4(d / (norms(a) * norms(b)))
            simCache(a)(b) = s; simCache(b)(a) = s
          }
          simCache(a)(b)
        }
        val picked = new Array[Boolean](n)
        val order = new Array[Int](math.max(kk, 1))
        // pick 1: (cos desc, n_id asc)
        var best = -1
        i = 0
        while (i < n) {
          if (best < 0 || cs(i)._3 > cs(best)._3 ||
              (cs(i)._3 == cs(best)._3 && cs(i)._2 < cs(best)._2)) best = i
          i += 1
        }
        if (n > 0) { order(0) = best; picked(best) = true }
        var step = 1
        while (step < kk) {
          var bestI = -1
          var bestScore = 0.0
          i = 0
          while (i < n) {
            if (!picked(i)) {
              var msim = Double.NegativeInfinity
              var s = 0
              while (s < step) {
                val sm = sim(i, order(s)); if (sm > msim) msim = sm; s += 1
              }
              val score = lam * cs(i)._3 - (1.0 - lam) * msim
              if (bestI < 0 || score > bestScore ||
                  (score == bestScore && cs(i)._2 < cs(bestI)._2)) {
                bestI = i; bestScore = score
              }
            }
            i += 1
          }
          order(step) = bestI; picked(bestI) = true
          step += 1
        }
        (0 until kk).iterator.map(r => (qid, cs(order(r))._2, cs(order(r))._3, r + 1))
      }
      .toDF("q_id", "n_id", "cos", "rank")
  }
}
