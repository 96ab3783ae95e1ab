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
  * exactly their id-minima. Note the variant semantics: b is dropped
  * if ANY lower-id neighbor is within tau, even one that was itself
  * dropped — a deterministic, oracle-replayable reading of SemDeDup's
  * sequential greedy, slightly MORE aggressive than a
  * survivors-only pass (which would keep b when its only close
  * lower-id neighbor had already been removed).
  *
  * Determinism across engines: centroids come from
  * [[graft.similarity.Ivf.centroidsQuantized]] (exact integer sums →
  * identical under any partitioning), assignment ranks on
  * round(cos, 4) with centroid-id tiebreak, and the drop threshold
  * compares the ROUNDED cosine — so the d11 query hash-matches its
  * DuckDB oracle.
  */
object SemDedup {

  /** Nearest-centroid assignment as an ARGMIN AGGREGATE (r18): score
    * every (vector, centroid) pair against the broadcast centroid
    * frame, then take each id's best as `min(struct(-cos, list_id))`
    * — (rounded cosine DESC, centroid id ASC), bit-identical to the
    * row_number-window rank both SemDedup passes used before (the
    * cosine is rounded to 4 dp BEFORE the comparison, so ties break
    * on list_id exactly as the window's orderBy did; min over equal
    * doubles is negation-stable). The window shape shuffled the FULL
    * |vecs|·k scored fan-out — embedding array included — and sorted
    * every id-group; the aggregate combines map-side (each id's
    * fan-out lives in one partition of the broadcast join's streamed
    * side), so the exchange carries |vecs| rows and no sort runs.
    * Same rewrite as [[graft.similarity.Ivf.lloydStep]]'s r18 form.
    * Returns (id, v, cluster_id[, c_cos when keepCos]). */
  private[graft] def assignNearest(vecs: DataFrame, cents: DataFrame,
      keepCos: Boolean = false): DataFrame = {
    val scored = vecs
      .crossJoin(broadcast(cents))
      .select(col("id"), col("v"), col("list_id"),
        Vectors.cosine4(col("v"), col("centroid")).as("c_cos"))
    val best = scored.groupBy(col("id"))
      .agg(min(struct((-col("c_cos")).as("nc"), col("list_id"))).as("m"),
        first(col("v")).as("v")) // v is constant per id — deterministic
    val base = best.select(col("id"), col("v"),
      col("m.list_id").as("cluster_id"),
      (-col("m.nc")).as("c_cos"))
    if (keepCos) base else base.drop("c_cos")
  }

  /** vecs: (id, v, <seedKey>) — seedKey seeds the coarse clusters
    * (any partition works; k-means refinement via Ivf.lloydStep
    * composes in front when no natural key exists).
    * Returns (id, cluster_id, is_kept). */
  def semDedup(vecs: DataFrame, seedKey: String, tau: Double,
      centroidScale: Long = 1000000L): DataFrame = {
    val cents = Ivf.centroidsQuantized(vecs, seedKey, "v", centroidScale)
    // nearest-centroid assignment: centroids broadcast (tiny), one
    // argmin aggregate per vector (r18 — was a row_number window:
    // that shape shuffles |vecs|·k rows INCLUDING the embedding
    // array and sorts every id-group; the min-struct aggregate
    // combines map-side, so only |vecs| rows ever shuffle and no
    // sort runs — the k× fan-out dies in the map stage, which is
    // also what retired d11's contention sensitivity)
    val assigned = assignNearest(vecs.select(col("id"), col("v")), cents)
      .localCheckpoint(false) // read 3x: both pair sides + output spine
    // shuffle_hash, deliberately (the d4/m5 pigeonhole rule, r18):
    // both pair sides are the SAME corpus-proportional membership
    // frame — a broadcast is a small-corpus artifact that cannot
    // exist at 100 TB (it would ship every embedding to every
    // executor); the hinted cluster-keyed shuffle join is the
    // at-scale plan and AQE's exchange reuse collapses the two
    // identical sides to one exchange.
    val a = assigned.select(col("id").as("a_id"), col("v").as("a_v"),
      col("cluster_id")).hint("shuffle_hash")
    val b = assigned.select(col("id").as("b_id"), col("v").as("b_v"),
      col("cluster_id")).hint("shuffle_hash")
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

  /** SemDeDup cluster REPRESENTATIVE selection — the keep-list
    * reduction of [[semDedup]] (the d18-for-d11 shape): per coarse
    * cluster, the CENTROID-NEAREST surviving member (rank on the
    * rounded assignment cosine desc, id asc — rank-on-rounded is the
    * cross-engine-deterministic technique the assignment itself
    * uses), plus member/kept/dropped counts. Only clusters where the
    * greedy pass dropped at least one member are emitted — the rows
    * where the keep decision did something. One extra
    * cluster_id-keyed aggregate + window over the membership frame;
    * the quadratic term stays bounded by the largest cluster exactly
    * as in [[semDedup]]. Returns
    * (cluster_id, rep_id, n_members, n_kept, n_dropped). */
  def semDedupRep(vecs: DataFrame, seedKey: String, tau: Double,
      centroidScale: Long = 1000000L): DataFrame = {
    val cents = Ivf.centroidsQuantized(vecs, seedKey, "v", centroidScale)
    val assigned = assignNearest(vecs.select(col("id"), col("v")), cents,
        keepCos = true)
      .localCheckpoint(false) // single plan reads it 3x: pair sides + membership
    // shuffle_hash on both pair sides — see semDedup above (the
    // d4/m5 rule: corpus-proportional self-join sides never broadcast)
    val a = assigned.select(col("id").as("a_id"), col("v").as("a_v"),
      col("cluster_id")).hint("shuffle_hash")
    val b = assigned.select(col("id").as("b_id"), col("v").as("b_v"),
      col("cluster_id")).hint("shuffle_hash")
    val dropped = a.join(b, Seq("cluster_id"))
      .filter(col("a_id") < col("b_id")
        && Vectors.cosine4(col("a_v"), col("b_v")) >= tau)
      .select(col("b_id").as("id")).distinct()
      .withColumn("is_dropped", lit(true))
    val mem = assigned.select("id", "cluster_id", "c_cos")
      .join(dropped, Seq("id"), "left")
      .select(col("id"), col("cluster_id"), col("c_cos"),
        coalesce(!col("is_dropped"), lit(true)).as("is_kept"))
      .localCheckpoint(false) // single plan reads it 2x: counts + rep window
    val counts = mem.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        sum(col("is_kept").cast("long")).as("n_kept"),
        sum((!col("is_kept")).cast("long")).as("n_dropped"))
    val rw = Window.partitionBy("cluster_id")
      .orderBy(col("c_cos").desc, col("id").asc)
    mem.filter(col("is_kept"))
      .withColumn("rn", row_number().over(rw)).filter(col("rn") === 1)
      .join(counts, Seq("cluster_id"))
      .filter(col("n_dropped") >= 1)
      .select(col("cluster_id"), col("id").as("rep_id"),
        col("n_members"), col("n_kept"), col("n_dropped"))
  }
}
