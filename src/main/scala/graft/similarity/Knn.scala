package graft.similarity

import graft.functions.{Hashing, Vectors}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteForce` is the correctness baseline: the (small) query set is
  * broadcast against the data side, cosine computed map-only, then
  * per-query top-k. At scale the data side never shuffles — the
  * window on (q_id) ranks a q×k-bounded intermediate, and Spark's
  * TakeOrdered handles the per-partition pre-truncation.
  *
  * `lshBuckets` is the scale path: random-hyperplane signatures give
  * each vector a small bucket id; queries only scan their bucket.
  * Planes derive from md5 (graft.functions.Hashing.uniformFromKey),
  * so bucketing is deterministic across engines and runs.
  */
object Knn {

  /** Exact top-k cosine neighbors per query vector.
    * `queries`/`data`: (id, v: array<double>).
    *
    * Scale shape: the QUERY set (small by contract) broadcasts; the
    * corpus streams map-only through its own partitions and is never
    * shuffled or broadcast. Per-partition k-bounded heaps (partial
    * TopKPerKey) truncate before the only shuffle, so at most
    * partitions·|q|·k survivor rows cross the wire — the q×n score
    * matrix never does. The final window ranks ≤ |q|·k rows. */
  def bruteForce(queries: DataFrame, data: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("q_id"), col("v").as("q_v"))
    val d = data.select(col("id").as("n_id"), col("v").as("n_v"))
    val scored = d.join(broadcast(q), lit(true))
      .select(col("q_id"), col("n_id"), Vectors.cosine4(col("q_v"), col("n_v")).as("cos"))
    val ord = Seq(("cos", true), ("n_id", false))
    val local = graft.plans.TopKPerKey.topKPerKey(
      scored, Seq("q_id"), ord, k, partial = true)
    val global = graft.plans.TopKPerKey.topKPerKey(local, Seq("q_id"), ord, k)
    // rank on the rounded cosine for determinism; ties broken by id
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    global.withColumn("rank", row_number().over(w))
  }

  /** Random-hyperplane signature: `planes` rows of the same dim as
    * the vectors; bit p = sign(v · plane_p). Returns the bucket id
    * as a bit string column. */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.map { p =>
      val pl = array(p.map(lit): _*)
      when(Vectors.dot(v, pl) >= 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** Deterministic plane derivation (engine-portable). A non-empty
    * `salt` derives an INDEPENDENT plane set (multi-table LSH); the
    * empty default reproduces the historical keys exactly, so every
    * existing oracle replays unchanged. */
  def derivePlanes(nPlanes: Int, dim: Int, salt: String = ""): Seq[Seq[Double]] =
    (0 until nPlanes).map(p => (0 until dim).map(i =>
      Hashing.uniformFromKey(if (salt.isEmpty) s"$p:$i" else s"$salt:$p:$i")))

  /** LSH-bucketed ANN: both sides bucketed by signature; candidate
    * neighbors share one of the query's probed buckets; exact cosine
    * + top-k within. `nProbes=1` scans only the query's own bucket;
    * higher values also probe buckets at Hamming distance 1 in
    * signature space (flip one plane bit) — the standard multi-probe
    * trade: recall rises with probe count while cost stays
    * |bucket| × probes per query instead of |data|. */
  def lshBucketed(queries: DataFrame, data: DataFrame, k: Int,
      nPlanes: Int, dim: Int, nProbes: Int = 1): DataFrame = {
    require(nProbes >= 1 && nProbes <= nPlanes + 1,
      "nProbes ranges over the home bucket + one per flippable plane bit")
    val planes = derivePlanes(nPlanes, dim)
    val qBase = queries.select(col("id").as("q_id"), col("v").as("q_v"),
      hyperplaneBucket(col("v"), planes).as("home"))
    // probe buckets: home, then home with bit i flipped (i < nProbes-1)
    val probeCols = col("home") +: (0 until nProbes - 1).map { i =>
      concat(
        substring(col("home"), 1, i),
        when(substring(col("home"), i + 1, 1) === "1", "0").otherwise("1"),
        substring(col("home"), i + 2, nPlanes))
    }
    val q = qBase.select(col("q_id"), col("q_v"),
      explode(array(probeCols: _*)).as("bucket"))
    val d = data.select(col("id").as("n_id"), col("v").as("n_v"),
      hyperplaneBucket(col("v"), planes).as("bucket"))
    val scored = q.join(d, "bucket")
      .select(col("q_id"), col("n_id"), Vectors.cosine4(col("q_v"), col("n_v")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** MULTI-TABLE LSH — the recall lever ORTHOGONAL to multi-probe
    * (and the standard fix for the single-table miss rate the r11
    * soak chart measured on a hard corpus): `nTables` INDEPENDENT
    * plane sets (salted derivations), a candidate is any (q, n) pair
    * sharing a bucket in ANY table — recall ≈ 1−(1−p)^L for
    * per-table collision probability p — union-distinct'd before ONE
    * exact cosine re-rank. Scale shape: L bucket-keyed equi-joins
    * (each |bucket|-bounded, never q×n), the pair distinct and the
    * two vector re-joins are candidate-bounded and keyed; nothing
    * quadratic materializes. Deterministic end to end, so the whole
    * search replays in SQL (s13's oracle re-derives every table's
    * planes). */
  def lshMultiTable(queries: DataFrame, data: DataFrame, k: Int,
      nPlanes: Int, dim: Int, nTables: Int): DataFrame = {
    require(nTables >= 1, "need at least one table")
    val q0 = queries.select(col("id").as("q_id"), col("v").as("q_v"))
    val d0 = data.select(col("id").as("n_id"), col("v").as("n_v"))
    // all tables' signatures in ONE map-side pass per side, exploded
    // to (table, bucket) rows — so the candidate stage is a single
    // (t, bucket)-keyed equi-join, not L separate corpus scans and
    // shuffles (per-table bucket equality ⟺ (t, bucket) equality)
    val tables = (0 until nTables).map(t =>
      derivePlanes(nPlanes, dim, salt = s"t$t"))
    def bucketed(df: DataFrame, idc: String, vc: String): DataFrame =
      df.select(col(idc), explode(array(tables.zipWithIndex.map {
          case (pl, t) => struct(lit(t).as("t"),
            hyperplaneBucket(col(vc), pl).as("bucket")) }: _*)).as("tb"))
        .select(col(idc), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    val pairs = bucketed(q0, "q_id", "q_v")
      .join(bucketed(d0, "n_id", "n_v"), Seq("t", "bucket"))
      .select("q_id", "n_id").distinct()
    val scored = pairs.join(q0, "q_id").join(d0, "n_id")
      .select(col("q_id"), col("n_id"),
        Vectors.cosine4(col("q_v"), col("n_v")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
