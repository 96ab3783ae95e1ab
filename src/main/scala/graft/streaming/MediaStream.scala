package graft.streaming

import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming media segmentation — m8's activity detector run at the
  * door (the ASR-ingest shape: recordings segment into voiced spans
  * on arrival, so downstream transcription/packing consumes segments,
  * never whole payloads): every micro-batch of arriving payloads runs
  * the SAME [[Multimodal.audioSegments]] operator as the batch query
  * (stream and batch can never drift), segment rows append to the
  * segments sink, and payloads too short for even one detector window
  * route to a `short` audit sink (silently dropping them would hide
  * ingest loss — the quarantine posture every gate here takes).
  *
  * Segmentation is per-payload, so the gate is keyless across batches
  * — no streaming state, no watermark, O(|batch| bytes) forever.
  * Exactly-once: both sinks write deterministic
  * `batch=<lineage>-<batchId>` subdirectories with overwrite
  * semantics plus the shared marker protocol (the QualityStream
  * idempotence shape). Payload bytes never shuffle — only
  * (doc_id, window, energy) triples do, and only segment METADATA
  * lands in the sinks. */
object MediaStream {

  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(DedupStream.docSchema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(dir)

  def segments(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/segments").drop("batch")

  def tooShort(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/short").drop("batch")

  def segmentGate(docs: DataFrame, stateDir: String,
      windowBytes: Int = 50, threshold: Long = 4720L,
      lineage: String = "run0"): StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        import java.nio.file.{Files, Paths}
        Files.createDirectories(Paths.get(stateDir))
        val marker = Paths.get(stateDir, s"_batch-$lineage-$batchId")
        if (!Files.exists(marker)) {
          val sub = s"batch=$lineage-$batchId"
          // EAGER checkpoint: the payload frame feeds the segment
          // write AND the too-short split (two executions of one
          // derived frame — the crosses-executions rule)
          val pl = batch.toDF()
            .select(col("doc_id"), trim(col("text")).as("payload"))
            .localCheckpoint()
          Multimodal.audioSegments(pl, "doc_id", "payload",
              windowBytes, threshold)
            .write.mode("overwrite").parquet(s"$stateDir/segments/$sub")
          pl.filter(length(col("payload")) < windowBytes)
            .select(col("doc_id"),
              length(col("payload")).cast("long").as("n_bytes"))
            .write.mode("overwrite").parquet(s"$stateDir/short/$sub")
          val tmp = Paths.get(stateDir, s"_batch-$lineage-$batchId.tmp")
          Files.writeString(tmp, "done")
          Files.move(tmp, marker,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
        ()
      }
      .start()
}
