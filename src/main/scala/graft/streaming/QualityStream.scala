package graft.streaming

import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming quality-gated ingest — the ta16 Gopher gate run at the
  * door instead of as a batch sweep: every micro-batch of arriving
  * documents is scored against the composite quality rules
  * ([[TextAnalysis.gopherRules]] — the SAME definition the batch
  * query and its DuckDB oracle use, so stream and batch can never
  * drift), passing docs append to the corpus sink, failing docs to a
  * quarantine sink that keeps the per-rule verdicts for triage (the
  * reference's validate-then-filter harvest shape — validate.py's
  * filter_s3_schematron writes failures aside the same way).
  *
  * The rule aggregation is per-batch and keyless across batches — no
  * streaming state, no watermark, ingest cost is O(|batch|) forever.
  * Exactly-once: each batch writes to a DETERMINISTIC
  * `batch=<lineage>-<batchId>` subdirectory of each sink with
  * overwrite semantics, so a replayed micro-batch (crash anywhere
  * between the writes and the checkpoint commit) rewrites the same
  * two subdirectories with identical content instead of appending a
  * second copy — no crash window can duplicate corpus OR quarantine
  * rows. The `(lineage, batchId)` marker (the protocol shared with
  * [[DedupStream]]/[[EventsStream.maintainIndex]]) is a fast-skip on
  * the clean path, not the correctness mechanism. */
object QualityStream {

  /** docSchema = the documents subset the gate needs. */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(DedupStream.docSchema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(dir)

  // readers drop the batch=<lineage>-<batchId> partition-discovery
  // column — it is the idempotence mechanism, not payload
  def corpus(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/corpus").drop("batch")

  def quarantine(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/quarantine").drop("batch")

  /** Start the gate: `docs` (streaming frame with doc_id/text/lang/
    * n_chars) → `$outDir/corpus` (passing rows, original columns) +
    * `$outDir/quarantine` (failing rows + rule verdicts). */
  def qualityGate(docs: DataFrame, outDir: String,
      lineage: String = "run0",
      checkpointDir: Option[String] = None): StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        import java.nio.file.{Files, Paths}
        Files.createDirectories(Paths.get(outDir))
        val marker = Paths.get(outDir, s"_batch-$lineage-$batchId")
        if (!Files.exists(marker)) {
          // EAGER checkpoint: verdicts feed BOTH the corpus and the
          // quarantine writes — two executions of one derived frame
          // (the CLAUDE.md crosses-executions rule). gopherRules is
          // total over the batch (NULL text coalesces to a failing
          // verdict), so the inner join loses no rows.
          val scored = batch.toDF()
            .join(TextAnalysis.gopherRules(batch.toDF()
                .select("doc_id", "text")),
              Seq("doc_id"))
            .localCheckpoint()
          // deterministic per-batch subdir + overwrite = idempotent
          // replay; `batch=` naming keeps the tree one
          // partition-discovered parquet table for the readers
          val sub = s"batch=$lineage-$batchId"
          scored.filter(col("pass"))
            .select("doc_id", "text", "lang", "n_chars")
            .write.mode("overwrite").parquet(s"$outDir/corpus/$sub")
          scored.filter(!col("pass"))
            .select("doc_id", "lang", "n_chars", "n_tokens",
              "rule_wc", "rule_mwl", "rule_stop", "rule_rep")
            .write.mode("overwrite").parquet(s"$outDir/quarantine/$sub")
          Files.createFile(marker)
        }
        ()
      }
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$outDir/_checkpoint"))
      .start()
}
