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

  def maintainRank(docs: DataFrame, stateDir: String,
      width: Int = 20, stride: Int = 20, iters: Int = 3,
      lineage: String = "run0"): StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        import java.nio.file.{Files, Paths}
        Files.createDirectories(Paths.get(stateDir))
        val marker = Paths.get(stateDir, s"_batch-$lineage-$batchId")
        if (!Files.exists(marker) && !batch.isEmpty) {
          val spark = batch.sparkSession
          val own = s"batch=$lineage-$batchId"
          // batch postings: distinct (source, passage-hash) — EAGER
          // checkpoint: the frame is reused across the novel write
          // and the delta plan (the CLAUDE.md cross-plan rule)
          val bp = graft.text.TextAnalysis.explodeChunks(
              batch.toDF().select(col("source"), col("text")),
              col("text"), width, stride)
            .select(col("source"), md5(col("chunk_text")).as("h"))
            .distinct().localCheckpoint()
          val priorDirs = listPostingDirs(stateDir, own)
          val prior =
            if (priorDirs.isEmpty)
              spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
                bp.schema)
            else spark.read.schema(bp.schema).parquet(priorDirs: _*)
          // novel postings only — re-landed sources/hashes add no
          // pairs, which is what makes the delta expansion exact.
          // EAGER: read before the overwrite below, reused after.
          val novel = bp.join(prior, Seq("source", "h"), "left_anti")
            .localCheckpoint()
          novel.write.mode("overwrite")
            .parquet(s"${postingsRoot(stateDir)}/$own")
          val tag = s"$lineage-$batchId"
          val eDir = edgesDir(stateDir)
          val applied = graft.sources.VersionedTable
            .taggedVersion(eDir, tag)
          if (applied.isEmpty) {
            val touched = novel.select("h").distinct()
            val cand = prior.withColumn("__new", lit(false))
              .unionByName(novel.withColumn("__new", lit(true)))
              .join(touched, Seq("h"), "left_semi")
            val delta = cand.select(col("h"), col("source").as("source_a"),
                col("__new").as("na"))
              .join(cand.select(col("h"), col("source").as("source_b"),
                col("__new").as("nb")), "h")
              .filter(col("source_a") < col("source_b")
                && (col("na") || col("nb")))
              .groupBy("source_a", "source_b")
              .agg(count(lit(1)).as("dw"))
            val prev = graft.sources.VersionedTable.latestVersion(eDir)
              .map(_ => graft.sources.VersionedTable
                .readLatest(spark, eDir))
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
