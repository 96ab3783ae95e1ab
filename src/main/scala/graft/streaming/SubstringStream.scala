package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming exact-substring dedup — d28's rewrite run at the door:
  * every arriving document is stripped of ≥ `minLen`-token runs
  * whose k-grams were already seen (in an earlier batch, or earlier
  * within its own batch in (doc_id, pos) order — a single-batch
  * drive over a whole corpus reproduces batch d28 EXACTLY,
  * spec-pinned, because the batch-id component of the first-
  * occurrence order is constant). Anchoring, span construction and
  * the token cut are the SAME operators as the batch query
  * ([[Dedup.positionalHashedKgrams]] via the shared anchor fan-out,
  * [[Dedup.stripSpans]]), so stream and batch can never drift on
  * the definition.
  *
  * Batch-vs-stream deviation, stated (the BoilerplateStream door
  * posture): "first occurrence" is ARRIVAL-ordered — min(batch_id,
  * doc_id, pos) — so a gram first seen in batch 1 keeps batch 1's
  * occurrence even when a later batch brings a smaller doc_id, and
  * an already-emitted document is never retroactively re-stripped
  * when its runs become duplicated later; the periodic batch d28
  * sweep is the retroactive complement.
  *
  * State is the per-gram occurrence table (g, cnt, first) with one
  * deterministic `batch=<lineage>-<batchId>` partition per
  * micro-batch — a replayed batch OVERWRITES its own partition
  * (exactly-once without tagged versions, the BoilerplateStream
  * trick); totals are one g-keyed sum + min over state rows.
  *
  * State size, stated honestly: distinct grams ≈ corpus tokens (most
  * k-grams are unique), so the state is CORPUS-PROPORTIONAL — that is
  * the inherent lower bound of exact cross-history substring dedup
  * (a suffix array carries the same information). It is disk-backed
  * parquet, never driver- or executor-resident, and the per-batch
  * aggregate is one g-keyed shuffle over it; the scale posture past
  * that is (a) periodic partition compaction — cnt is associative
  * and min(first) is associative, so any fold of old partitions is
  * safe, exactly the BoilerplateStream cadence — and (b) a
  * d9-pattern Bloom front on the batch's grams to thin the state
  * probe to likely-duplicates. Per-batch cost: O(|batch| tokens)
  * fan-out + that bounded-shape aggregate. */
object SubstringStream {

  /** Batch anchor fan-out: (doc_id, pos, g) — shared shape with
    * [[Dedup.exactSubstringSpans]]. */
  private def anchors(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"),
        Dedup.positionalHashedKgrams(col("text"), k).as("gs"))
      .select(col("doc_id"), posexplode(col("gs")).as(Seq("pos", "g")))

  /** Accumulated per-gram state: (g, occ, first{bid, doc_id, pos}). */
  def gramState(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/grams")
      .groupBy("g").agg(sum("cnt").as("occ"), min("first").as("first"))

  /** Cleaned output rows (doc_id, n_tokens, n_stripped, clean_text). */
  def cleaned(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/clean").drop("batch")

  def substringGate(docs: DataFrame, stateDir: String,
      k: Int = 10, minLen: Int = 20,
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
          // the strip join that reads the directory this batch
          // appends to (the CLAUDE.md crosses-executions rule)
          val ex = anchors(batch.toDF(), k).localCheckpoint()
          ex.groupBy("g")
            .agg(count(lit(1)).as("cnt"),
              min(struct(lit(batchId).as("bid"), col("doc_id"),
                col("pos"))).as("first"))
            .write.mode("overwrite").parquet(s"$stateDir/grams/$sub")
          val st = gramState(spark, stateDir).filter(col("occ") >= 2)
          val later = ex.join(st, Seq("g"))
            .filter(!(col("first.bid") === batchId
              && col("first.doc_id") === col("doc_id")
              && col("first.pos") === col("pos")))
            .select("doc_id", "pos")
          val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          val spans = later
            .withColumn("grp", col("pos") - row_number().over(w))
            .groupBy(col("doc_id"), col("grp"))
            .agg(min("pos").cast("long").as("span_start"),
              (max("pos") - min("pos") + k).cast("long").as("span_len"))
            .filter(col("span_len") >= minLen)
            .select("doc_id", "span_start", "span_len")
          Dedup.stripSpans(batch.toDF(), spans)
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
