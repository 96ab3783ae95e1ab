package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming boilerplate removal — d25's repeated-chunk rewrite run
  * at the door: every micro-batch of arriving documents folds its
  * chunk occurrences into the accumulated state, is cleaned against
  * the hot set AS OF ITS OWN BATCH (a batch's own repetitions count —
  * a single-batch drive over a whole corpus reproduces batch d25
  * exactly, spec-pinned), and the cleaned rows land in the output
  * sink. Chunking and rewrite are the SAME operators as the batch
  * query ([[Dedup.docChunks]] / [[Dedup.stripAgainstHot]]), so stream
  * and batch can never drift on the definition.
  *
  * Batch-vs-stream deviation, stated: a chunk that becomes hot only
  * in a LATER batch does not retroactively clean earlier documents —
  * the gate cleans on arrival (the door posture every streaming gate
  * here takes); a periodic batch d25 sweep is the retroactive
  * complement.
  *
  * State is the additive chunk-occurrence table, one deterministic
  * `batch=<lineage>-<batchId>` partition per micro-batch: a replayed
  * batch OVERWRITES its own partition instead of double-adding, so
  * the non-idempotent additive merge is exactly-once without tagged
  * versions (the QualityStream subdir trick applied to state).
  * Totals are one (chunk)-keyed sum over the state table — distinct
  * chunks, metadata-sized relative to the corpus; long-lived streams
  * compact the partition tree periodically (counts are associative,
  * any fold of old partitions is safe).
  *
  * Per-batch cost: O(|batch| tokens) fan-out + one sum over
  * O(|distinct chunks|) state rows — never the corpus. */
object BoilerplateStream {

  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(DedupStream.docSchema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(dir)

  /** Accumulated chunk occurrences (chunk, occ), summed across the
    * per-batch partitions. */
  def chunkOcc(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/chunk_occ")
      .groupBy("chunk").agg(sum("occ").as("occ"))

  /** Cleaned output rows (doc_id, n_chunks, n_removed, clean_text). */
  def cleaned(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/clean").drop("batch")

  def boilerplateGate(docs: DataFrame, stateDir: String,
      width: Int = 3, minOcc: Long = 3L,
      lineage: String = "run0"): StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        import java.nio.file.{Files, Paths}
        Files.createDirectories(Paths.get(stateDir))
        val marker = Paths.get(stateDir, s"_batch-$lineage-$batchId")
        if (!Files.exists(marker)) {
          val spark = batch.sparkSession
          val sub = s"batch=$lineage-$batchId"
          // EAGER checkpoint: the fan-out feeds the state write AND
          // the rewrite, and the rewrite's hot set reads the state
          // directory this very batch appends to (the CLAUDE.md
          // crosses-executions rule — a lazy plan replayed at write
          // time would re-list the mutated directory)
          val ex = Dedup.docChunks(batch.toDF(), width).localCheckpoint()
          ex.groupBy("chunk").agg(count(lit(1)).as("occ"))
            .write.mode("overwrite").parquet(s"$stateDir/chunk_occ/$sub")
          val hot = chunkOcc(spark, stateDir)
            .filter(col("occ") >= minOcc)
            .select(col("chunk"), lit(true).as("hot"))
          Dedup.stripAgainstHot(ex, hot)
            .write.mode("overwrite").parquet(s"$stateDir/clean/$sub")
          val tmp = Paths.get(stateDir, s"_batch-$lineage-$batchId.tmp")
          Files.writeString(tmp, "done")
          Files.move(tmp, marker,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
        ()
      }
      .start()
}
