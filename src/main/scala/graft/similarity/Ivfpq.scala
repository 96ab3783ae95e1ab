package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF × PQ — the composed billion-scale ANN index (Jégou et al.
  * 2011 §V, "IVFADC"; FAISS `IndexIVFPQ` with `by_residual=false`):
  * a coarse quantizer prunes the search to `nProbe` inverted lists,
  * and within the probed lists distances come from PQ asymmetric
  * distance computation over m one-byte codes per vector, with an
  * exact-refine pass on the shortlist. [[Ivf]] supplies the coarse
  * stage (quantized-integer centroids, per-list partitioned storage
  * → file-level pruning) and [[Pq]] the fine stage (integer-exact
  * codebooks, ADC, refine sidecar); this object is only the
  * composition plus the persisted-index lifecycle.
  *
  * Scale shape: a probe touches (a) the tiny centroid table, (b) the
  * codes table pruned to the probed `list_id=` directories — a
  * static IN filter from at most nProbe×|queries| driver-collected
  * ids, so at 1000 lists a 2-probe query plan READS 0.2% of the code
  * files — and (c) the shortlist's refine-sidecar rows. The
  * per-(query, probed-list) distance tables are |q|·nProbe·m·|cb|
  * rows, broadcast by construction. Memory per corpus vector served:
  * m codes ≈ 8 bytes, the rung that makes 100 TB of embeddings
  * RAM-resident; the wvecs sidecar stays on disk and is only joined
  * for the top-`rerank` shortlist.
  *
  * Numeric contract: every stage inherits the ALL-INTEGER posture
  * ([[Pq]] codebooks/ADC/refine; [[Ivf.centroidsQuantized]] coarse
  * means), so the full train→encode→probe→ADC→refine trajectory
  * replays bit-identically in the DuckDB oracle (s11_ivfpq).
  *
  * Serving defaults (chosen from the r11 soak operating chart on a
  * 39.8k replica-dense corpus — `graft.Soak`'s ann_matrix): probe
  * count binds first (IVF recall@5 0.34→0.94 across 2→8 probes), so
  * serve at nProbe ≈ 8 for ~8–32 lists probed-share equivalents;
  * past that, on a NEAR-DUP-DENSE corpus the rerank cut — not code
  * fidelity — binds, because duplicate families quantize to
  * identical codes and ADC cannot order within a family: size
  * `rerank` ≥ k × the expected duplicate-family size (8probe recall
  * moved 0.34/0.22 at rerank=80 to 0.44/0.48 raw/residual at 400,
  * residual pulling ahead only once shortlists hold whole
  * families). Better still, dedup (SemDedup d11/d20) BEFORE
  * indexing — the pipeline's own posture — which collapses families
  * and returns the rerank knob to its k×small default.
  */
object Ivfpq {

  /** Train + persist: coarse centroids (from `listKey`'s seed
    * partition), PQ codebook, per-list-partitioned code table, and
    * the quantized-vector refine sidecar — versioned tables behind
    * atomic latest-pointers, the x7/s4/s10 lifecycle.
    *
    * `byResidual = true` is FAISS's default IVFPQ accuracy rung: the
    * PQ stage encodes x − c(list(x)) instead of x, so the codebooks
    * spend their entropy on WITHIN-list structure the coarse
    * quantizer already localized, not on re-describing list means.
    * The list centroid used for residuals is a SECOND, integer
    * representation — per-dim half-away-from-zero integer mean of
    * the quantized coordinates (`icent`, stored beside the float
    * probe centroids) — so residuals are exact integer vectors and
    * the whole residual pipeline (training included, via scale=1 on
    * the already-integer residuals) stays oracle-replayable. The
    * presence of `icent` is what marks an index residual for
    * [[searchIndex]]/[[appendToIndex]]. */
  def buildIndex(corpus: DataFrame, listKey: String, idCol: String,
      vecCol: String, dir: String, nCodes: Int = 32, iters: Int = 1,
      dsub: Int = 8, scale: Long = 10000L,
      centroidScale: Long = 1000000L, byResidual: Boolean = false): Unit = {
    val cents = Ivf.centroidsQuantized(
      corpus.select(col(idCol).as("id"), col(vecCol).as("v"), col(listKey)),
      listKey, "v", centroidScale)
    graft.sources.VersionedTable.write(cents, s"$dir/centroids")
    if (!byResidual) {
      val cb = Pq.fitCodebooks(corpus, idCol, vecCol, nCodes, dsub, scale, iters)
        .localCheckpoint()
      graft.sources.VersionedTable.write(cb, s"$dir/cb")
      val codes = Pq.encode(corpus, cb, idCol, vecCol, dsub, scale)
        .join(corpus.select(col(idCol).as("id"), col(listKey).as("list_id")), "id")
      graft.sources.VersionedTable.writePartitioned(
        codes.select("id", "sub", "code", "list_id"), s"$dir/codes", "list_id")
    } else {
      val w = corpus.select(col(idCol).as("id"),
        col(listKey).as("list_id"), Pq.quantize(col(vecCol), scale).as("w"))
      val icent = integerCentroids(w)
      graft.sources.VersionedTable.write(icent, s"$dir/icent")
      // EAGER checkpoint: the residual frame feeds the iterative
      // codebook fit AND the encode — separate executions
      val resid = residuals(w, icent).localCheckpoint()
      val cb = Pq.fitCodebooks(resid, "id", "rv", nCodes, dsub, 1L, iters)
        .localCheckpoint()
      graft.sources.VersionedTable.write(cb, s"$dir/cb")
      val codes = Pq.encode(resid, cb, "id", "rv", dsub, 1L)
        .join(resid.select("id", "list_id"), "id")
      graft.sources.VersionedTable.writePartitioned(
        codes.select("id", "sub", "code", "list_id"), s"$dir/codes", "list_id")
    }
    graft.sources.VersionedTable.write(
      corpus.select(col(idCol).as("n_id"),
        Pq.quantize(col(vecCol), scale).as("nw")), s"$dir/wvecs")
  }

  /** Per-list integer centroid of the quantized coordinates:
    * half-away-from-zero integer mean per dim ([[Pq.intRoundDiv]]),
    * reassembled as one array per list — exact, order-independent,
    * replayable. */
  private def integerCentroids(w: DataFrame): DataFrame =
    w.select(col("list_id"), posexplode(col("w")).as(Seq("dim", "x")))
      .groupBy("list_id", "dim")
      .agg(sum("x").as("s"), count(lit(1)).as("n"))
      .select(col("list_id"), col("dim"), Pq.intRoundDiv.as("cm"))
      .groupBy("list_id")
      .agg(array_sort(collect_list(struct(col("dim"), col("cm")))).as("dc"))
      .select(col("list_id"),
        transform(col("dc"), s => s.getField("cm")).as("c"))

  /** (id, list_id, rv): exact integer residual vectors w − c(list). */
  private def residuals(w: DataFrame, icent: DataFrame): DataFrame =
    w.join(broadcast(icent), "list_id")
      .select(col("id"), col("list_id"),
        zip_with(col("w"), col("c"), (a, b) => a - b).as("rv"))

  /** Append a batch of vectors WITHOUT retraining (FAISS's
    * add-after-train contract, composed: coarse-assign against the
    * FROZEN centroids, PQ-encode against the FROZEN codebook): the
    * delta lands as an append-only code segment
    * `segments/seg=<N>/list_id=<l>/` — the same per-list partitioning
    * as the base, so probe pruning works identically on segments —
    * plus its refine-sidecar rows under `wsegments/seg=<N>`. The
    * (tiny) segment manifest is a VersionedTable whose version
    * carries the `(lineage, batchId)` tag, making the append
    * IDEMPOTENT under streaming replay exactly like
    * [[Ivf.appendToIndex]] (a replay whose manifest already committed
    * is detected and skipped — without the tag a crash between the
    * manifest flip and the stream's batch marker would serve
    * duplicate codes forever). Returns the (new or already-committed)
    * segment id. */
  def appendToIndex(spark: SparkSession, dir: String, delta: DataFrame,
      idCol: String = "id", vecCol: String = "v",
      tag: Option[String] = None, dsub: Int = 8,
      scale: Long = 10000L): Long = {
    val manifestDir = s"$dir/segmanifest"
    tag.flatMap(t =>
        graft.sources.VersionedTable.taggedVersion(manifestDir, t)) match {
      case Some(v) =>
        if (graft.sources.VersionedTable.latestVersion(manifestDir).forall(_ < v))
          graft.sources.VersionedTable.swapTo(manifestDir, v)
        return spark.read.parquet(s"$manifestDir/v=$v")
          .agg(max("seg_id")).head.getLong(0)
      case None => ()
    }
    // metadata-class reads (centroids/cb/icent/manifest) use the
    // per-version LOCAL cache (r19) — bounded by design knobs,
    // immutable per version, previously one scan job each per call
    val cents = graft.sources.VersionedTable
      .readLatestLocal(spark, s"$dir/centroids")
    val scored = delta
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(cents))
      .select(col("id"), col("v"), col("list_id"),
        graft.functions.Vectors.cosine4(col("v"), col("centroid")).as("c_cos"))
    val w = Window.partitionBy("id").orderBy(col("c_cos").desc, col("list_id").asc)
    val assigned = scored.withColumn("r", row_number().over(w))
      .filter(col("r") === 1).select("id", "v", "list_id")
      .localCheckpoint() // EAGER: feeds the codes write AND the sidecar write
    val cb = graft.sources.VersionedTable.readLatestLocal(spark, s"$dir/cb")
    // residual index (icent present): encode x − c(list) against the
    // frozen codebook, same contract as the raw path
    val codes =
      (if (graft.sources.VersionedTable.latestVersion(s"$dir/icent").isEmpty)
        Pq.encode(assigned.select("id", "v"), cb, "id", "v", dsub, scale)
      else {
        val icent = graft.sources.VersionedTable
          .readLatestLocal(spark, s"$dir/icent")
        val wq = assigned.select(col("id"), col("list_id"),
          Pq.quantize(col("v"), scale).as("w"))
        Pq.encode(residuals(wq, icent).select("id", "rv"), cb,
          "id", "rv", dsub, 1L)
      }).join(assigned.select("id", "list_id"), "id")
    val prior: Seq[Long] = graft.sources.VersionedTable.latestVersion(manifestDir)
      .map(_ => graft.sources.VersionedTable.readLatestLocal(spark, manifestDir)
        .collect().map(_.getLong(0)).toSeq)
      .getOrElse(Seq.empty)
    // skip past orphan seg dirs from crashed appends (the Ivf lesson:
    // deriving segId from the manifest alone recomputes the same id
    // and dies forever on errorifexists, wedging the stream's replay)
    val onDisk: Seq[Long] = {
      val d = new java.io.File(s"$dir/segments")
      if (!d.exists()) Seq.empty
      else d.listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("seg="))
        .map(_.getName.stripPrefix("seg=").toLong)
    }
    val segId = ((prior ++ onDisk) :+ 0L).max + 1
    codes.select("id", "sub", "code", "list_id")
      .write.mode("errorifexists").partitionBy("list_id")
      .parquet(s"$dir/segments/seg=$segId")
    assigned.select(col("id").as("n_id"), Pq.quantize(col("v"), scale).as("nw"))
      .write.mode("errorifexists").parquet(s"$dir/wsegments/seg=$segId")
    import spark.implicits._
    graft.sources.VersionedTable.write(
      (prior :+ segId).toDF("seg_id"), manifestDir, tag)
    segId
  }

  /** Compaction cadence (the [[Ivf.maintain]] contract): fold
    * segments into the base tables once the manifest exceeds
    * `maxSegments`, keeping manifest collects and per-probe segment
    * unions O(maxSegments) forever. */
  def maintain(spark: SparkSession, dir: String,
      maxSegments: Int = 8): Option[Long] = {
    val manifestDir = s"$dir/segmanifest"
    graft.sources.VersionedTable.latestVersion(manifestDir).flatMap { _ =>
      val n = graft.sources.VersionedTable
        .readLatestLocal(spark, manifestDir).count()
      if (n > maxSegments) Some(compactSegments(spark, dir)) else None
    }
  }

  /** Fold appended code/sidecar segments into the base versioned
    * tables: one new codes version (base ∪ segments, re-partitioned
    * by list) + one new wvecs version, then an empty manifest.
    * Superseded segment trees stay on disk for manifest rollback.
    *
    * Both fold writes are TAGGED with the folded segment-id set (the
    * [[Ivf.compactSegments]] idempotence protocol, needed twice here
    * because this index has two base tables): a crash anywhere
    * between the first fold write and the manifest flip re-enters on
    * the next maintain() call, finds whichever folds already
    * committed (finishing lost pointer swaps), performs only the
    * missing ones, and empties the manifest. Live readers subtract
    * the serving version's folded ids from the manifest
    * ([[Ivf.foldedSegIds]]), so there is NO duplicate-serving window
    * at all — a probe racing the swap-to-manifest-flip gap, or a
    * retry whose manifest gained an out-of-band append since the
    * crashed fold, both read exactly base ∪ unfolded segments. */
  def compactSegments(spark: SparkSession, dir: String): Long = {
    val segs = graft.sources.VersionedTable
      .readLatestLocal(spark, s"$dir/segmanifest")
      .collect().map(_.getLong(0)).toSeq.sorted
    val tag = "compact:" + segs.mkString(",")
    def foldOnce(tableDir: String, fold: => Long): Long =
      graft.sources.VersionedTable.taggedVersion(tableDir, tag) match {
        case Some(v) =>
          if (graft.sources.VersionedTable.latestVersion(tableDir).forall(_ < v))
            graft.sources.VersionedTable.swapTo(tableDir, v)
          v
        case None => fold
      }
    val cv = foldOnce(s"$dir/codes",
      graft.sources.VersionedTable.writePartitioned(
        liveCodes(spark, dir).select("id", "sub", "code", "list_id"),
        s"$dir/codes", "list_id", Some(tag)))
    foldOnce(s"$dir/wvecs",
      graft.sources.VersionedTable.write(
        liveWvecs(spark, dir).select("n_id", "nw"), s"$dir/wvecs", Some(tag)))
    import spark.implicits._
    graft.sources.VersionedTable.write(
      Seq.empty[Long].toDF("seg_id"), s"$dir/segmanifest")
    cv
  }

  private def liveSegs(spark: SparkSession, dir: String): Seq[Long] =
    graft.sources.VersionedTable.latestVersion(s"$dir/segmanifest") match {
      case None => Seq.empty
      case Some(_) => graft.sources.VersionedTable
        .readLatestLocal(spark, s"$dir/segmanifest")
        .collect().map(_.getLong(0)).toSeq
    }

  private def liveCodes(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.sources.VersionedTable.readLatest(spark, s"$dir/codes")
    val segs = liveSegs(spark, dir).filterNot(Ivf.foldedSegIds(s"$dir/codes"))
    if (segs.isEmpty) base
    else base.unionByName(spark.read.parquet(s"$dir/segments")
      .filter(col("seg").isin(segs: _*))
      .select("id", "sub", "code", "list_id"))
  }

  private def liveWvecs(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.sources.VersionedTable.readLatest(spark, s"$dir/wvecs")
    val segs = liveSegs(spark, dir).filterNot(Ivf.foldedSegIds(s"$dir/wvecs"))
    if (segs.isEmpty) base
    else base.unionByName(spark.read.parquet(s"$dir/wsegments")
      .filter(col("seg").isin(segs: _*))
      .select("n_id", "nw"))
  }

  /** Probe a persisted index: coarse probe against the stored
    * centroids, ADC over the probed lists' codes only (static
    * partition filter — on the base AND any appended segment trees,
    * which share the per-list layout), exact refine of the
    * top-`rerank` shortlist against the stored sidecar. The probe
    * frame is EAGERLY checkpointed — it feeds two executions (the
    * probed-id collect and the ADC join). The probed-id collect is
    * DISTINCT list ids — bounded by the list count, not the query
    * batch — and `maxInFilterLists` is the join-route fallback for
    * corpus-sized batches (the [[Ivf.searchIndex]] contract): past
    * the threshold the static IN filter is dropped and the inner ADC
    * join on (list_id, sub, code) restricts rows instead. */
  def searchIndex(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 2,
      rerank: Int = 0, dsub: Int = 8, scale: Long = 10000L,
      maxInFilterLists: Int = 1000): DataFrame = {
    // per-version LOCAL metadata reads (r19): centroids/cb/icent are
    // bounded by design knobs (nLists, 256·m codebook rows) and
    // immutable per version — each was a parquet scan job per probe
    val cents = graft.sources.VersionedTable
      .readLatestLocal(spark, s"$dir/centroids")
    val probes = Ivf.probeLists(
      queries.select(col(idCol).as("id"), col(vecCol).as("v")),
      cents, nProbe).localCheckpoint()
    val probedIds = probes.select("list_id").distinct()
      .collect().map(_.get(0))
    val cb = graft.sources.VersionedTable.readLatestLocal(spark, s"$dir/cb")
    // per-(query, probed-list) distance tables: |q|·nProbe·m·|cb|
    // rows, broadcast-by-contract. Raw indexes share one table per
    // query across its probed lists; residual indexes genuinely need
    // one per (query, list) — the residual q − c(list) differs per
    // list, the known nProbe× table cost of by_residual
    val qdp =
      if (graft.sources.VersionedTable.latestVersion(s"$dir/icent").isEmpty) {
        val qd = Pq.subDistances(queries, cb, idCol, vecCol, dsub, scale)
          .select(col("id").as("q_id"), col("sub"), col("code"), col("d2"))
        qd.join(probes.select("q_id", "list_id"), "q_id")
      } else {
        val icent = graft.sources.VersionedTable
          .readLatestLocal(spark, s"$dir/icent")
        val qw = queries.select(col(idCol).as("id"),
          Pq.quantize(col(vecCol), scale).as("w"))
        val qr = probes.select(col("q_id").as("id"), col("list_id"))
          .join(qw, "id")
          .join(broadcast(icent), "list_id")
          .select(col("id").as("q_id"), col("list_id"),
            zip_with(col("w"), col("c"), (a, b) => a - b).as("rv"))
        qr.select(col("q_id"), col("list_id"),
            posexplode(transform(
              sequence(lit(0), (size(col("rv")) / dsub).cast("int") - 1),
              s => slice(col("rv"), s * dsub + 1, lit(dsub))))
              .as(Seq("sub", "sv")))
          .join(broadcast(Pq.cbSubVectors(cb)), "sub")
          .select(col("q_id"), col("list_id"), col("sub"), col("code"),
            aggregate(zip_with(col("sv"), col("cv"),
              (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x)
              .as("d2"))
      }
    val codes =
      if (probedIds.length <= maxInFilterLists)
        liveCodes(spark, dir).filter(col("list_id").isin(probedIds: _*))
      else liveCodes(spark, dir)
    val adc = codes
      .select(col("id").as("n_id"), col("sub"), col("code"), col("list_id"))
      .join(broadcast(qdp), Seq("list_id", "sub", "code"))
      .groupBy("q_id", "n_id")
      .agg(sum("d2").as("adist"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("adist").asc, col("n_id").asc)
    if (rerank <= 0)
      adc.withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= k)
    else
      Pq.refine(adc, queries, liveWvecs(spark, dir),
        idCol, vecCol, k, rerank, scale)
  }

  /** Build-if-absent for a corpus derived from one data directory:
    * fingerprint-keyed on embeddings.parquet plus every knob,
    * orphan-swept via [[graft.sources.FingerprintCache]]. */
  def ensureIndex(corpus: DataFrame, listKey: String, idCol: String,
      vecCol: String, dataDir: String, nCodes: Int = 32, iters: Int = 1,
      dsub: Int = 8, scale: Long = 10000L,
      centroidScale: Long = 1000000L,
      byResidual: Boolean = false): String = synchronized {
    val f = new java.io.File(s"$dataDir/embeddings.parquet")
    val live = ":ivfpq:v1"
    val key = graft.operators.Retrieval.corpusFingerprintKey(f) +
      s":$listKey:$nCodes:$iters:$dsub:$scale:$centroidScale:$byResidual" + live
    val dir = graft.sources.FingerprintCache.prepare("graft_ivfpq", key, live)
    val tables = Seq("centroids", "cb", "codes", "wvecs") ++
      (if (byResidual) Seq("icent") else Seq.empty)
    if (tables.exists(t =>
        graft.sources.VersionedTable.latestVersion(s"$dir/$t").isEmpty))
      buildIndex(corpus, listKey, idCol, vecCol, dir,
        nCodes, iters, dsub, scale, centroidScale, byResidual)
    dir
  }
}
