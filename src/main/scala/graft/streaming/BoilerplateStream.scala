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
  * versions (the QualityStream subdir trick applied to state) —
  * COMPACTED every `compactEvery` batches by the crash-safe manifest
  * fold in [[StatePartitions]] (counts are associative), so live
  * partitions stay bounded by the cadence, not the stream lifetime.
  *
  * Per-batch cost: O(|batch| tokens) fan-out + one sum over the
  * Bloom-thinned state rows — since r15 the hot-set probe carries
  * the d9 Bloom front (filter over the batch's own distinct chunks
  * BEFORE the chunk-keyed sum), so only state rows whose chunk
  * (probably) recurs in the batch shuffle; a surviving chunk keeps
  * ALL its state rows, so its occ is exact, and false positives are
  * harmless in [[Dedup.stripAgainstHot]]'s left join. */
object BoilerplateStream {

  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(DedupStream.docSchema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(dir)

  /** Accumulated chunk occurrences (chunk, occ), summed across the
    * LIVE per-batch partitions (compaction-aware read). */
  def chunkOcc(spark: SparkSession, stateDir: String): DataFrame =
    StatePartitions.read(spark, s"$stateDir/chunk_occ")
      .groupBy("chunk").agg(sum("occ").as("occ"))

  /** Cleaned output rows (doc_id, n_chunks, n_removed, clean_text). */
  def cleaned(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/clean").drop("batch")

  def boilerplateGate(docs: DataFrame, stateDir: String,
      width: Int = 3, minOcc: Long = 3L,
      lineage: String = "run0", compactEvery: Int = 8,
      bloomFpp: Double = 0.01): StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        import java.nio.file.{Files, Paths}
        Files.createDirectories(Paths.get(stateDir))
        StatePartitions.requireLineage(stateDir, lineage)
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
          if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
            StatePartitions.compact(spark, s"$stateDir/chunk_occ",
              s"$lineage-$batchId", sub,
              st => st.groupBy("chunk").agg(sum("occ").as("occ")))
          ex.groupBy("chunk").agg(count(lit(1)).as("occ"))
            .write.mode("overwrite").parquet(s"$stateDir/chunk_occ/$sub")
          val bc = ex.select("chunk").distinct()
          val nBc = bc.count()
          val hot =
            if (nBc == 0) ex.select(col("chunk"), lit(true).as("hot")).limit(0)
            else {
              // the d9 Bloom front, NATIVE since r16 (the
              // SubstringStream twin): bloom_filter_agg over
              // xxhash64(chunk) — string keys ride as their 64-bit
              // hash; a hash collision only adds a false positive,
              // which the chunk-keyed left join downstream ignores —
              // probed in codegen, fpp scaled with state size so the
              // leak stays ≤ |batch chunks| rows as history grows
              val stateRows =
                StatePartitions.read(spark, s"$stateDir/chunk_occ").count()
              val fpp = BloomFront.scaledFpp(bloomFpp, nBc, stateRows)
              val bf = BloomFront.build(bc, xxhash64(col("chunk")), nBc, fpp)
              StatePartitions.read(spark, s"$stateDir/chunk_occ")
                .filter(BloomFront.probe(bf, xxhash64(col("chunk"))))
                .groupBy("chunk").agg(sum("occ").as("occ"))
                .filter(col("occ") >= minOcc)
                .select(col("chunk"), lit(true).as("hot"))
            }
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
