package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming incremental corpus dedup — the d12 shape run as ingest:
  * every micro-batch of new documents probes the accumulated corpus's
  * MinHash state, emits its near-dup links for audit, and appends
  * only its NOVEL documents to the state. The corpus state is the
  * (doc_id, hashed-shingle-set) frame itself — history is shingled
  * exactly once, on arrival, never again; per batch the work is
  * O(|batch| + matches), so ingest cost does not grow with corpus
  * age (the property that makes continuous dedup feasible at all).
  *
  * In-batch duplicates are intentionally NOT linked here (the probe
  * is delta-vs-base); run [[graft.dedup.Dedup.minhashLsh]] over the
  * batch first if a single micro-batch can contain its own dups.
  *
  * Exactly-once: the same `(lineage, batchId)` marker protocol as
  * [[EventsStream.maintainIndex]] — a replayed micro-batch (restart
  * between the state append and the checkpoint commit) is skipped; a
  * crash between the two appends can duplicate at most one batch's
  * links, never corpus rows (the marker is written after both).
  */
object DedupStream {

  /** documents.parquet subset the stream carries. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("n_chars", LongType)))

  private val shSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sh", ArrayType(LongType))))

  private val linkSchema = StructType(Seq(
    StructField("new_id", LongType),
    StructField("dup_of", LongType),
    StructField("jaccard", DoubleType),
    StructField("batch_id", LongType)))

  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(dir)

  def corpusState(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.schema(shSchema).parquet(s"$stateDir/corpus_sh")

  def links(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.schema(linkSchema).parquet(s"$stateDir/links")

  def incrementalDedup(docs: DataFrame, stateDir: String,
      k: Int = 8, bands: Int = 4, threshold: Double = 0.8,
      lineage: String = "run0"): StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        import java.nio.file.{Files, Paths}
        Files.createDirectories(Paths.get(stateDir))
        val marker = Paths.get(stateDir, s"_batch-$lineage-$batchId")
        if (!Files.exists(marker)) {
          val spark = batch.sparkSession
          val corpusDir = s"$stateDir/corpus_sh"
          val ds = Dedup.withHashedShingles(batch.toDF())
            .select("doc_id", "sh").localCheckpoint()
          // EAGER checkpoint (not lazy persist): the links frame reads
          // the corpus-state directory, which this very batch appends
          // to below — a lazily-cached plan re-executed at write time
          // would re-list the mutated directory and emit self-links
          // for its own novel docs (the CLAUDE.md lazy-checkpoint
          // hazard, observed in exactly this shape)
          val newLinks =
            if (Files.exists(Paths.get(corpusDir)))
              Dedup.minhashLshIncrementalShingled(
                  corpusState(spark, stateDir), ds, k, bands, threshold)
                .withColumn("batch_id", lit(batchId))
                .localCheckpoint()
            else
              spark.createDataFrame(
                spark.sparkContext.emptyRDD[Row], linkSchema)
          val novel = ds.join(
            newLinks.select(col("new_id").as("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
          novel.write.mode("append").parquet(corpusDir)
          if (!newLinks.isEmpty)
            newLinks.write.mode("append").parquet(s"$stateDir/links")
          val tmp = Paths.get(stateDir, s"_batch-$lineage-$batchId.tmp")
          Files.writeString(tmp, "done")
          Files.move(tmp, marker,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
        ()
      }
      .start()
}
