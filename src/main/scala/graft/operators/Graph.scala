package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-signal operators over source/document link tables.
  *
  * The reference has no graph pass, but a training-data engine
  * ranking sources by reprint authority does (g1/g2): PageRank over
  * the d16 source-overlap graph. Everything here is EXACT integer
  * arithmetic so the oracle can replay it as an unrolled CTE — no
  * float damping that could round differently across engines.
  */
object Graph {

  /** Weighted PageRank over an undirected weighted pair list.
    *
    * `nodes`: one column `source` (every node, including isolated
    * ones — they hold the 150_000 floor). `pairs`:
    * (source_a, source_b, w) with each undirected edge ONCE; w is an
    * integer weight (g2 feeds n_shared passages from d16). Ranks
    * start at 1_000_000; each of the `iters` unrolled iterations
    * sends (rank(u) · w(u,v)) DIV wdeg(u) along every directed edge
    * and damps r' = 150_000 + (85 · Σ contributions) DIV 100 — the
    * g1 formula with the uniform split generalized to weight
    * proportion. All shuffles are keyed on edge endpoints; each
    * iteration is one join-aggregate round over the EDGE table
    * (|sources|²-bounded under d16/d17's df cap, never corpus-sized),
    * so the fixed unroll costs iters × an edge-keyed pass at any
    * corpus scale. Unweighted g1 is the w ≡ 1 special case
    * ((r·1) DIV wdeg = r DIV outdeg, bit-identical).
    *
    * Output: (source, wdeg, rank_i3). */
  def weightedPageRank(nodes: DataFrame, pairs: DataFrame,
      iters: Int = 3): DataFrame = {
    // single-plan multi-read checkpoints (r18): the unrolled
    // iterations reference nodes/edges/wdeg once per round — un-
    // checkpointed, each reference re-expanded its whole upstream
    // (the pairs pipeline per round). Every read is a branch of the
    // ONE final plan, so the lazy checkpoints are safe per the
    // crosses-executions rule. The per-round RANK frame is
    // deliberately NOT checkpointed: it is |sources| rows and its
    // chain is linear (not the hits nesting), and checkpointing it
    // measured WORSE (g1 1.10 vs 0.73 s, g2 1.49 vs 0.86 s at sf0.1
    // reps=8) — block-manager materialization of a 20-row frame
    // costs more than recomputing the tiny join chain.
    val n = nodes.localCheckpoint(false)
    val edges = pairs
      .select(col("source_a").as("u"), col("source_b").as("v"), col("w"))
      .unionByName(pairs
        .select(col("source_b").as("u"), col("source_a").as("v"), col("w")))
      .localCheckpoint(false)
    val wdeg = n
      .join(edges.groupBy("u").agg(sum("w").as("wd"))
          .withColumnRenamed("u", "source"),
        Seq("source"), "left")
      .select(col("source"), coalesce(col("wd"), lit(0L)).as("wdeg"))
      .localCheckpoint(false)
    var r = n.withColumn("r", lit(1000000L))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(r.select(col("source").as("u"), col("r")), Seq("u"))
        .join(wdeg.select(col("source").as("u"), col("wdeg")), Seq("u"))
        .select(col("v"), expr("(r * w) DIV wdeg").as("c"))
        .groupBy("v").agg(sum("c").as("m"))
      r = n
        .join(contrib.withColumnRenamed("v", "source"), Seq("source"), "left")
        .select(col("source"),
          expr("CAST(150000 AS BIGINT)"
            + " + (85 * coalesce(m, CAST(0 AS BIGINT))) DIV 100").as("r"))
    }
    r.join(wdeg, Seq("source"))
      .select(col("source"), col("wdeg"), col("r").as("rank_i3"))
  }

  /** HITS hubs & authorities over the DIRECTED reprint graph — the
    * other classic link-analysis signal next to [[weightedPageRank]]:
    * a good HUB reprints from many good authorities, a good AUTHORITY
    * is reprinted by many good hubs (Kleinberg's mutual recursion).
    * Direction comes from the caller's pair orientation: each
    * (source_a, source_b, w) pair is read as source_b → source_a
    * (the lexicographically later source points at the earlier — a
    * deterministic stand-in for the crawl-time direction a real
    * pipeline would use).
    *
    * Exact integer arithmetic like the PageRank twin, with HITS's
    * per-phase NORMALIZATION made engine-exact: after each phase the
    * scores rescale to sum 1_000_000 by integer division against the
    * phase total (floored via DIV on nonnegative values — identical
    * in any engine), so the unrolled oracle CTE replays bit-for-bit
    * and no float norm can diverge. Each phase is one edge-keyed
    * join-aggregate + a one-row total broadcast — O(edges) per
    * iteration at any corpus size, the g1/g2 posture.
    *
    * Output: (source, hub, auth) after `iters` full iterations;
    * isolated nodes hold 0 on both scores. */
  def hits(nodes: DataFrame, pairs: DataFrame, iters: Int = 2): DataFrame = {
    // single-plan multi-read checkpoints (r18) — see
    // [[weightedPageRank]]: each rescale reads its raw frame twice
    // (phase total + join), every phase re-reads nodes/edges, and
    // the hub/auth recursion nests phase plans inside each other
    // (g3's dumped plan carried 92 parquet scans at iters=2); the
    // checkpoints flatten that to one materialization per frame
    // within the ONE final plan.
    val n = nodes.localCheckpoint(false)
    val edges = pairs.select(col("source_b").as("u"),
      col("source_a").as("v"), col("w")).localCheckpoint(false)
    def rescale(raw0: DataFrame, out: String): DataFrame = {
      val raw = raw0.localCheckpoint(false)
      val tot = raw.agg(greatest(sum("m"), lit(1L)).as("s"))
      n.join(raw, Seq("source"), "left")
        .crossJoin(broadcast(tot))
        .select(col("source"),
          expr("(coalesce(m, CAST(0 AS BIGINT)) * 1000000) DIV s").as(out))
        .localCheckpoint(false)
    }
    var hub = n.withColumn("h", lit(1000000L))
    var auth = n.withColumn("a", lit(0L))
    for (_ <- 1 to iters) {
      auth = rescale(
        edges.join(hub.select(col("source").as("u"), col("h")), Seq("u"))
          .select(col("v").as("source"), (col("h") * col("w")).as("x"))
          .groupBy("source").agg(sum("x").as("m")), "a")
      hub = rescale(
        edges.join(auth.select(col("source").as("v"), col("a")), Seq("v"))
          .select(col("u").as("source"), (col("a") * col("w")).as("x"))
          .groupBy("source").agg(sum("x").as("m")), "h")
    }
    hub.join(auth, Seq("source"))
      .select(col("source"), col("h").as("hub"), col("a").as("auth"))
  }

  /** Authority-rank resolution with a STREAM-MAINTAINED preference —
    * the x21 boost signal's front door. When a
    * [[graft.streaming.RankStream]] maintainer owns the signal (its
    * state dir has published rank versions), serve its CURRENT ranks:
    * the incrementally-maintained signal needs no rebuild when the
    * corpus changes — appends flow through `maintainRank` and the next
    * probe reads the updated table. The batch build-if-absent
    * [[ensureSourceAuthority]] artifact is the fallback for corpora no
    * maintainer owns (`docs`/`dataDir` are only touched on that
    * path). Both routes produce the identical (source, wdeg, rank_i3)
    * schema; RankStreamSpec proves stream-served boosting equals the
    * batch x21 query and that appends update it with ZERO graph
    * rebuild. */
  def authorityRanks(spark: org.apache.spark.sql.SparkSession,
      docs: => DataFrame, dataDir: String,
      streamStateDir: Option[String] = None): DataFrame = {
    val owned = streamStateDir.filter(d => graft.sources.VersionedTable
      .latestVersion(graft.streaming.RankStream.ranksDir(d)).nonEmpty)
    owned match {
      case Some(d) => graft.streaming.RankStream.servingRanks(spark, d)
      case None =>
        val dir = ensureSourceAuthority(docs, dataDir)
        graft.sources.VersionedTable.readLatest(spark, s"$dir/rank")
    }
  }

  /** Build-if-absent PERSISTED source authority for a corpus derived
    * from one data directory — the serving posture of an authority
    * signal (Solr's ExternalFileField is a file computed offline,
    * not a per-query graph pass): the d16 source-overlap graph +
    * [[weightedPageRank]] land once as a VersionedTable behind the
    * `graft_authority` fingerprint cache (orphan-swept like every
    * other build-if-absent family), and query-time boosting reads
    * the tiny rank table. Returns the cache dir; read with
    * `VersionedTable.readLatest(spark, s"$dir/rank")`. */
  def ensureSourceAuthority(docs: DataFrame, dataDir: String,
      width: Int = 20, stride: Int = 20, iters: Int = 3): String =
    synchronized {
      val f = new java.io.File(s"$dataDir/documents.parquet")
      val live = ":auth:v1"
      val key = Retrieval.corpusFingerprintKey(f) +
        s":$width:$stride:$iters" + live
      val dir = graft.sources.FingerprintCache
        .prepare("graft_authority", key, live)
      if (graft.sources.VersionedTable.latestVersion(s"$dir/rank").isEmpty) {
        val pairs = graft.dedup.Dedup.sourceOverlap(docs, col("source"),
            col("text"), width = width, stride = stride, maxDf = None)
          .select(col("source_a"), col("source_b"), col("n_shared").as("w"))
          .localCheckpoint(false)
        graft.sources.VersionedTable.write(
          weightedPageRank(docs.select("source").distinct(), pairs, iters),
          s"$dir/rank")
      }
      dir
    }
}
