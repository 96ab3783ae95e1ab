package graft.dedup

import graft.functions.Vectors
import graft.similarity.Ivf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic deduplication (the SemDeDup pass, Abbas et al. 2023):
  * embed → cluster → drop all but one of every within-cluster group
  * of semantically near-identical documents. Unlike d5's pair LIST,
  * this emits the per-document KEEP/DROP decision a pipeline applies.
  *
  * The whole point of the clustering stage is scale: pairwise cosine
  * happens only WITHIN a cluster, so the quadratic term is bounded by
  * the largest cluster, never the corpus — k-means cluster count is
  * the knob that trades cluster size against centroid-broadcast size.
  *
  * Drop rule (greedy, SemDeDup's own): a document is dropped iff a
  * LOWER-id document in its cluster sits within cosine ≥ tau. This
  * needs no connected components — one within-cluster pair join and
  * one distinct on the dropped side — and is deterministic: the
  * minimum id of every dup group always survives; chained groups keep
  * exactly their id-minima.
  *
  * Determinism across engines: centroids come from
  * [[graft.similarity.Ivf.centroidsQuantized]] (exact integer sums →
  * identical under any partitioning), assignment ranks on
  * round(cos, 4) with centroid-id tiebreak, and the drop threshold
  * compares the ROUNDED cosine — so the d11 query hash-matches its
  * DuckDB oracle.
  */
object SemDedup {

  /** vecs: (id, v, <seedKey>) — seedKey seeds the coarse clusters
    * (any partition works; k-means refinement via Ivf.lloydStep
    * composes in front when no natural key exists).
    * Returns (id, cluster_id, is_kept). */
  def semDedup(vecs: DataFrame, seedKey: String, tau: Double,
      centroidScale: Long = 1000000L): DataFrame = {
    val cents = Ivf.centroidsQuantized(vecs, seedKey, "v", centroidScale)
    // nearest-centroid assignment: centroids broadcast (tiny), one
    // row_number per vector
    val scored = vecs.select(col("id"), col("v"))
      .crossJoin(broadcast(cents))
      .select(col("id"), col("v"), col("list_id"),
        Vectors.cosine4(col("v"), col("centroid")).as("c_cos"))
    val w = Window.partitionBy("id").orderBy(col("c_cos").desc, col("list_id").asc)
    val assigned = scored.withColumn("p", row_number().over(w))
      .filter(col("p") === 1)
      .select(col("id"), col("v"), col("list_id").as("cluster_id"))
      .localCheckpoint(false) // read 3x: both pair sides + output spine
    val a = assigned.select(col("id").as("a_id"), col("v").as("a_v"),
      col("cluster_id"))
    val b = assigned.select(col("id").as("b_id"), col("v").as("b_v"),
      col("cluster_id"))
    val dropped = a.join(b,
        Seq("cluster_id"))
      .filter(col("a_id") < col("b_id")
        && Vectors.cosine4(col("a_v"), col("b_v")) >= tau)
      .select(col("b_id").as("id")).distinct()
      .withColumn("is_dropped", lit(true))
    assigned.select("id", "cluster_id")
      .join(dropped, Seq("id"), "left")
      .select(col("id"), col("cluster_id"),
        coalesce(!col("is_dropped"), lit(true)).as("is_kept"))
  }
}
