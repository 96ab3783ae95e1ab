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
    * `queries`/`data`: (id, v: array<double>). */
  def bruteForce(queries: DataFrame, data: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("q_id"), col("v").as("q_v"))
    val d = data.select(col("id").as("n_id"), col("v").as("n_v"))
    val scored = q.join(broadcast(d).hint("broadcast"), lit(true))
      .select(col("q_id"), col("n_id"), Vectors.cosine4(col("q_v"), col("n_v")).as("cos"))
    // queries are few: broadcast DATA against queries would invert at
    // scale; the cross join here broadcasts the smaller side chosen
    // by Catalyst. Rank on the rounded cosine for determinism.
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
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

  /** Deterministic plane derivation (engine-portable). */
  def derivePlanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map(p => (0 until dim).map(i => Hashing.uniformFromKey(s"$p:$i")))

  /** LSH-bucketed ANN: both sides bucketed by signature; candidate
    * neighbors share the query's bucket; exact cosine + top-k within.
    * Recall < 1 by construction (tested against bruteForce); cost is
    * |bucket| per query instead of |data|. */
  def lshBucketed(queries: DataFrame, data: DataFrame, k: Int,
      nPlanes: Int, dim: Int): DataFrame = {
    val planes = derivePlanes(nPlanes, dim)
    val q = queries.select(col("id").as("q_id"), col("v").as("q_v"),
      hyperplaneBucket(col("v"), planes).as("bucket"))
    val d = data.select(col("id").as("n_id"), col("v").as("n_v"),
      hyperplaneBucket(col("v"), planes).as("bucket"))
    val scored = q.join(d, "bucket")
      .select(col("q_id"), col("n_id"), Vectors.cosine4(col("q_v"), col("n_v")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
