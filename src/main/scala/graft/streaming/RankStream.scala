package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the weighted source-authority rank
  * (g2: `operators.Graph.weightedPageRank` over the d16 passage-
  * overlap graph) — the DedupStream-style incremental twin: each
  * micro-batch of documents
  *
  *  1. lands its NOVEL (source, passage-hash) postings into a
  *     deterministic per-(lineage,batchId) subdirectory (overwrite
  *     semantics, so a crash-window replay rewrites the same files),
  *  2. computes the edge-weight DELTA from touched hashes only — a
  *     self-join restricted to hashes the batch introduced, with at
  *     least one new-posting side, which is exactly
  *     |H'(a)∩H'(b)| − |H(a)∩H(b)| because novel postings are
  *     anti-joined against prior state (batch work is bounded by
  *     batch fanout, never corpus²),
  *  3. merges the delta into the persisted edge table and republishes
  *     ranks from the merged edges (rank iterations run on the
  *     |sources|²-bounded EDGE table, never the corpus — so the
  *     expensive passage scan is incremental and the global rank
  *     recompute is cheap at any corpus size),
  *
  * under the `(lineage, batchId)` marker + tagged-version protocol of
  * the other index maintainers (VocabStream/Bm25Stream): the
  * non-idempotent edge merge is guarded by a VersionedTable tag, so
  * every crash point replays to the same state. */
object RankStream {

  def postingsRoot(stateDir: String): String = s"$stateDir/postings"
  def postingsBaseDir(stateDir: String): String =
    s"${postingsRoot(stateDir)}/base"
  def edgesDir(stateDir: String): String = s"$stateDir/edges"
  def ranksDir(stateDir: String): String = s"$stateDir/ranks"

  /** Current served ranks (whatever version the alias points at). */
  def servingRanks(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    graft.sources.VersionedTable.readLatest(spark, ranksDir(stateDir))

  private def listPostingDirs(stateDir: String,
      except: String): Seq[String] = {
    val root = new java.io.File(postingsRoot(stateDir))
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch=")
        && f.getName != except)
      .map(_.getAbsolutePath).toSeq
  }

  /** All prior-state posting paths: the compacted base version (if
    * any) plus the not-yet-folded batch subdirs. */
  private def priorPaths(stateDir: String, except: String): Seq[String] =
    graft.sources.VersionedTable.latestVersion(postingsBaseDir(stateDir))
      .map(v => s"${postingsBaseDir(stateDir)}/v=$v").toSeq ++
      listPostingDirs(stateDir, except)

  /** Compaction cadence for the rank maintainer's posting state —
    * the same liveness-not-age bound every other index maintainer
    * carries (SegmentedBm25/VocabIndex/Ivf.maintain): once more than
    * `maxBatchDirs` per-batch subdirs have accumulated, fold them
    * (plus the previous base) into one fresh versioned base table and
    * delete the folded subdirs, then prune edge/rank/base version
    * history to `keepVersions`. Without this the postings root grows
    * one directory per micro-batch forever, and every batch's prior
    * read re-lists all of them. A crash between the base write and
    * the subdir deletes leaves rows present in BOTH — harmless: the
    * novelty anti-join is duplicate-insensitive, the delta pair scan
    * distincts its (tiny, touched-hash-bounded) candidate frame, and
    * the next maintain folds the leftovers again. Single-writer, like
    * the maintainers it mirrors. Returns the new base version when
    * compaction ran. */
  def maintain(spark: org.apache.spark.sql.SparkSession, stateDir: String,
      maxBatchDirs: Int = 8, keepVersions: Int = 3): Option[Long] = {
    val dirs = listPostingDirs(stateDir, except = "")
    val out = if (dirs.size <= maxBatchDirs) None
    else {
      val baseDir = postingsBaseDir(stateDir)
      val all = graft.sources.VersionedTable.latestVersion(baseDir)
        .map(v => s"$baseDir/v=$v").toSeq ++ dirs
      val folded = spark.read.parquet(all: _*).distinct()
      val v = graft.sources.VersionedTable.write(folded, baseDir)
      dirs.foreach(d => graft.sources.VersionedTable
        .deleteRecursively(java.nio.file.Paths.get(d)))
      Some(v)
    }
    Seq(postingsBaseDir(stateDir), edgesDir(stateDir), ranksDir(stateDir))
      .foreach { d =>
        if (graft.sources.VersionedTable.latestVersion(d).nonEmpty)
          graft.sources.VersionedTable.pruneVersions(d, keepVersions)
      }
    out
  }

  /** One batch's worth of maintenance (steps 1-3 of the class doc),
    * idempotent under `tag` — the foreachBatch body minus marker IO,
    * callable directly (graft.Soak measures per-batch walls with it). */
  def applyBatch(batch: DataFrame, stateDir: String, tag: String,
      width: Int = 20, stride: Int = 20, iters: Int = 3): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stateDir))
    val spark = batch.sparkSession
    val own = s"batch=$tag"
    // batch postings: distinct (source, passage-hash) — EAGER
    // checkpoint: the frame is reused across the novel write
    // and the delta plan (the CLAUDE.md cross-plan rule)
    val bp = graft.text.TextAnalysis.explodeChunks(
        batch.select(col("source"), col("text")),
        col("text"), width, stride)
      .select(col("source"), md5(col("chunk_text")).as("h"))
      .distinct().localCheckpoint()
    val priorDirs = priorPaths(stateDir, own)
    val prior =
      if (priorDirs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], bp.schema)
      else spark.read.schema(bp.schema).parquet(priorDirs: _*)
    // novel postings only — re-landed sources/hashes add no
    // pairs, which is what makes the delta expansion exact.
    // EAGER: read before the overwrite below, reused after.
    val novel = bp.join(prior, Seq("source", "h"), "left_anti")
      .localCheckpoint()
    novel.write.mode("overwrite")
      .parquet(s"${postingsRoot(stateDir)}/$own")
    val eDir = edgesDir(stateDir)
    val applied = graft.sources.VersionedTable.taggedVersion(eDir, tag)
    if (applied.isEmpty) {
      val touched = novel.select("h").distinct()
      // distinct: a crash between maintain's base fold and its subdir
      // deletes leaves prior rows present TWICE (base + leftover
      // batch dir) — harmless for the anti-join above, but the pair
      // count below must not double-count them. Bounded by touched-
      // hash fanout, so the shuffle is small by construction.
      val cand = prior.withColumn("__new", lit(false))
        .unionByName(novel.withColumn("__new", lit(true)))
        .join(touched, Seq("h"), "left_semi")
        .distinct()
      val delta = cand.select(col("h"), col("source").as("source_a"),
          col("__new").as("na"))
        .join(cand.select(col("h"), col("source").as("source_b"),
          col("__new").as("nb")), "h")
        .filter(col("source_a") < col("source_b")
          && (col("na") || col("nb")))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("dw"))
      val prev = graft.sources.VersionedTable.latestVersion(eDir)
        .map(_ => graft.sources.VersionedTable.readLatest(spark, eDir))
        .getOrElse(spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], delta.schema
            .add("w", org.apache.spark.sql.types.LongType))
          .select(col("source_a"), col("source_b"), col("w")))
      val merged = prev
        .join(delta, Seq("source_a", "source_b"), "full_outer")
        .select(col("source_a"), col("source_b"),
          (coalesce(col("w"), lit(0L))
            + coalesce(col("dw"), lit(0L))).as("w"))
      graft.sources.VersionedTable.write(merged, eDir, Some(tag))
    }
    // ranks: recomputed from the merged edge table — pure
    // function of state, tagged for replay-skip symmetry
    if (graft.sources.VersionedTable
        .taggedVersion(ranksDir(stateDir), tag).isEmpty) {
      val nodes = prior.select("source")
        .unionByName(novel.select("source")).distinct()
      val ranks = graft.operators.Graph.weightedPageRank(nodes,
        graft.sources.VersionedTable.readLatest(spark, eDir)
          .select(col("source_a"), col("source_b"), col("w")),
        iters)
      graft.sources.VersionedTable.write(
        ranks, ranksDir(stateDir), Some(tag))
    }
  }

  def maintainRank(docs: DataFrame, stateDir: String,
      width: Int = 20, stride: Int = 20, iters: Int = 3,
      lineage: String = "run0", maxBatchDirs: Int = 8,
      keepVersions: Int = 3): StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        import java.nio.file.{Files, Paths}
        Files.createDirectories(Paths.get(stateDir))
        val marker = Paths.get(stateDir, s"_batch-$lineage-$batchId")
        if (!Files.exists(marker) && !batch.isEmpty) {
          applyBatch(batch.toDF(), stateDir, s"$lineage-$batchId",
            width, stride, iters)
          // cadence: bounds posting-dir count and version history for
          // any number of micro-batches (see maintain). Crash-safe:
          // an interrupted fold leaves duplicate-but-harmless rows.
          maintain(batch.sparkSession, stateDir, maxBatchDirs, keepVersions)
          ()
        }
        if (!Files.exists(marker)) {
          val tmp = Paths.get(stateDir, s"_batch-$lineage-$batchId.tmp")
          Files.writeString(tmp, "done")
          Files.move(tmp, marker,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
        ()
      }
      .start()
}
