package graft

import graft.similarity.Mmr
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Property test for MMR re-ranking determinism: the Spark greedy
  * trajectory must equal a plain in-memory reference implementation
  * on RANDOM candidate sets — not just the oracled fixture. Vectors
  * draw components from a tiny discrete set so rounded cosines
  * collide constantly: ties are exactly where a distributed engine
  * could diverge from a sequential one (the n_id tiebreak is the
  * contract under test). Seeded RNG — deterministic across runs.
  */
class MmrPropertySpec extends AnyFunSuite {
  import TestSession._

  private def round4(x: Double): Double =
    BigDecimal.valueOf(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos4(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    round4(d / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Sequential reference MMR: same score formula, same (score desc,
    * n_id asc) tiebreak, λ = 0.5. Returns (n_id, rank) per query. */
  private def referenceMmr(cands: Seq[(Long, Double, Array[Double])],
      k: Int, lam: Double): Seq[(Long, Int)] = {
    if (cands.isEmpty) return Seq.empty
    val first = cands.minBy { case (id, cos, _) => (-cos, id) }
    var selected = Vector(first)
    var remaining = cands.filterNot(_._1 == first._1)
    while (selected.size < k && remaining.nonEmpty) {
      val pick = remaining.map { case (id, cos, v) =>
        val msim = selected.map(s => cos4(v, s._3)).max
        (id, cos, v, lam * cos - (1.0 - lam) * msim)
      }.minBy { case (id, _, _, mmr) => (-mmr, id) }
      selected = selected :+ ((pick._1, pick._2, pick._3))
      remaining = remaining.filterNot(_._1 == pick._1)
    }
    selected.zipWithIndex.map { case ((id, _, _), i) => (id, i + 1) }
  }

  test("MMR trajectory equals the sequential reference on random tie-heavy candidate sets") {
    val schema = StructType(Seq(
      StructField("q_id", LongType), StructField("n_id", LongType),
      StructField("cos", DoubleType),
      StructField("n_v", ArrayType(DoubleType))))
    for (seed <- Seq(1, 7, 42, 1337)) {
      val rnd = new scala.util.Random(seed)
      val dim = 4
      // components from {0,1,2}: heavy cosine collisions by design
      def vec(): Array[Double] = {
        val v = Array.fill(dim)(rnd.nextInt(3).toDouble)
        if (v.forall(_ == 0.0)) v(rnd.nextInt(dim)) = 1.0
        v
      }
      val perQuery = (0L until 3L).map { q =>
        val qv = vec()
        val n = 5 + rnd.nextInt(8)
        val cands = (0 until n).map { i =>
          val nv = vec()
          (q * 100L + i, cos4(qv, nv), nv)
        }
        q -> cands
      }
      val rows = perQuery.flatMap { case (q, cs) =>
        cs.map { case (id, c, v) => Row(q, id, c, v.toSeq) }
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 3), schema)
      val k = 4
      val got = Mmr.rerank(df, k, lam = 0.5)
        .select("q_id", "n_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = perQuery.flatMap { case (q, cs) =>
        referenceMmr(cs, k, 0.5).map { case (id, rank) => (q, id, rank) }
      }.toSet
      assert(got == want, s"seed=$seed: MMR trajectory diverged\n got=${got.toSeq.sorted}\nwant=${want.toSeq.sorted}")
    }
  }
}
