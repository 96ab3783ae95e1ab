package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming over the events table: the same logical
  * shapes as the batch operators (graft.operators.Events), run
  * incrementally with watermarks bounding state.
  *
  * At scale this reads a file/kafka source; here the parquet dir
  * drives it (file source), and `runTumblingOnce` drains it
  * synchronously into a memory sink for tests.
  */
object EventsStream {

  /** events schema for the streaming file source, parameterized on
    * the on-disk `ts` layout (the testdata has shipped both
    * TIMESTAMP(NANOS) read as raw-nanos long, and timestamp[us] read
    * as TIMESTAMP_NTZ — same adaptivity as graft.Tables.events). */
  def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Legacy ns-long layout schema (kept for callers that stage their
    * own raw-nanos fixtures). */
  val rawSchemaNanos: StructType = rawSchema(LongType)

  /** File-source stream of events with a proper timestamp column.
    * Streaming sources need an explicit schema, so probe the actual
    * on-disk layout with a one-off batch footer read (driver-side,
    * metadata only), then branch exactly like Tables.events:
    * ns-epoch long → exact integer `div 1000` (double division loses
    * precision at ~2^60); TIMESTAMP_NTZ → cast to the UTC session
    * TimestampType (wall-clock preserving). */
  def readEvents(spark: SparkSession, dir: String,
                 options: Map[String, String] = Map.empty): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val diskTs = spark.read.parquet(dir).schema("ts").dataType
    val raw = options.foldLeft(spark.readStream.schema(rawSchema(diskTs))) {
        case (r, (k, v)) => r.option(k, v)
      }
      .format("parquet")
      .load(dir)
    diskTs match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Watermarked tumbling-window aggregation: counts and sums per
    * (1-hour window, event_type). The 2-hour watermark bounds state:
    * windows older than max(event time) - 2h are finalized and
    * evicted — this is what keeps a 100 TB/day stream's state O(1). */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** Streaming windowed quantile monitoring: value percentiles per
    * (1-hour window, event_type) THROUGH the KLL sketch aggregate
    * (plans/QuantileSketch.scala) — the latency/size-distribution
    * dashboard shape. Because the sketch is a
    * TypedImperativeAggregate, per-group streaming state is the
    * serialized BOUNDED sketch, never the window's raw values — the
    * property that keeps a 100 TB/day stream's state O(groups), not
    * O(rows); the watermark evicts finalized windows. With capacity
    * ≥ window volume the output is exact (StreamMultiSpec's batch
    * parity); at real scale the same plan degrades to the
    * QuantileSpec-bounded approximation. */
  def quantileAgg(events: DataFrame, k: Int = 4096): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        graft.plans.QuantileSketch.quantiles(col("value"), k, Seq(50, 99)).as("qs"),
        count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"),
        round(element_at(col("qs"), 1), 4).as("p50"),
        round(element_at(col("qs"), 2), 4).as("p99"))

  /** Streaming windowed heavy hitters through the Misra–Gries sketch
    * (plans/FreqSketch.scala) — the trending-keys dashboard shape,
    * quantileAgg's counting sibling: per-group streaming state is the
    * serialized k-counter sketch, never the window's raw keys, and
    * the pairwise MG merge keeps the undercount bound additive across
    * micro-batches (mergeable summaries). With k ≥ the window's key
    * universe the sketch never decrements and the counts are exact
    * (StreamMultiSpec's batch parity — the ta12 trick incrementally);
    * at real scale the same plan returns the bounded approximation. */
  def heavyHittersAgg(events: DataFrame, keyCol: String, k: Int = 64): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.plans.FreqSketch.freq(col(keyCol), k).as("m"),
        count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("n"),
        explode(col("m")).as(Seq("item", "est")))

  /** Streaming re-harvest dedup (OAI semantics: the same identifier
    * re-appears across harvests; keep one). State is bounded by the
    * watermark — identifiers older than the horizon are evicted,
    * which is what makes exactly-once-per-identifier feasible on an
    * unbounded stream. */
  def dedupedByIdentifier(events: DataFrame, idCol: String): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark(idCol)

  /** Streaming index maintenance: every micro-batch lands as a new
    * version of a VersionedTable with an atomic alias swap — the
    * streaming form of the reference's rebuild-collection-then-swap
    * cycle (readers always see a complete version, never a
    * half-written batch). Exactly-once per batch id: a
    * `_batch-<id>` marker records batchId → version, so a replayed
    * micro-batch (restart between version write and checkpoint
    * commit) is skipped instead of writing a duplicate version. The
    * transformed batch is persisted so the emptiness probe and the
    * version write run the transform once, not twice.
    *
    * Markers are scoped `(lineage, batchId)`: batch ids restart at 0
    * for every fresh checkpoint, so a marker keyed on batchId alone
    * would make a NEW query over NEW source data silently skip its
    * first batches. A `(tableDir, lineage)` pair is bound to exactly
    * one checkpoint lineage — restart/replay of the SAME run (same
    * lineage) deduplicates, a genuinely new run passes a new lineage
    * id and starts its own marker namespace. */
  def maintainIndex(events: DataFrame, tableDir: String,
      lineage: String = "run0")(
      transform: DataFrame => DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import java.nio.file.{Files, Paths}
        val marker = Paths.get(tableDir, s"_batch-$lineage-$batchId")
        if (!Files.exists(marker)) {
          val out = transform(batch).persist()
          try {
            val version =
              if (out.isEmpty) -1L
              else graft.sources.VersionedTable.write(out, tableDir)
            Files.createDirectories(Paths.get(tableDir))
            // Atomic marker publish (same temp+ATOMIC_MOVE pattern as
            // VersionedTable's _LATEST pointer): a reader/replay never
            // observes a half-written marker. A crash between the
            // version write and this move can still replay the batch
            // once — at most one duplicate version, with identical
            // content, invisible behind the _LATEST pointer.
            val tmp = Paths.get(tableDir, s"_batch-$lineage-$batchId.tmp")
            Files.writeString(tmp, version.toString)
            Files.move(tmp, marker,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          } finally { out.unpersist(); () }
        }
        ()
      }
      .start()

  /** Stream-stream interval join: every purchase paired with the
    * same user's clicks from the preceding `horizon` (attribution
    * candidates, streaming form of the e5 as-of shape). Both sides
    * carry a watermark and the join condition bounds click_ts to a
    * finite interval around purchase_ts, so Spark can prove when a
    * buffered row can never match again and evict it — state stays
    * O(horizon · rate), not O(stream). Append-mode safe: a joined
    * row is emitted once both watermarks pass it. */
  def clickPurchaseJoin(events: DataFrame,
      horizon: String = "30 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks,
      col("c_user") === col("user_id")
        && col("click_ts") <= col("purchase_ts")
        && col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** MERGE-shaped streaming index maintenance: each micro-batch is
    * split into an upsert set and a delete set (the reference's
    * new-updated/ and deleted/ record sets, harvest.py:185-208),
    * applied to the current serving version with the SCD-1 anti-join
    * merge (Indexing.applyChanges), and published as a NEW version
    * behind the atomic alias swap — the full collection-build-then-
    * alias-swap lifecycle (solr_api_utils.py:14-60) run incrementally.
    * Readers always see a complete version; a replayed micro-batch is
    * skipped via the same `(lineage, batchId)` marker protocol as
    * maintainIndex (see there for why batchId alone is unsafe).
    * At scale the merge is one shuffle per side on the id (or a
    * Delta/Iceberg MERGE INTO with identical semantics). */
  def maintainMerged(events: DataFrame, tableDir: String, idCol: String,
      lineage: String = "run0")(
      updates: DataFrame => DataFrame)(
      deletes: DataFrame => DataFrame): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import java.nio.file.{Files, Paths}
        val marker = Paths.get(tableDir, s"_batch-$lineage-$batchId")
        if (!Files.exists(marker)) {
          val spark = batch.sparkSession
          val ups = updates(batch).persist()
          val dels = deletes(batch).persist()
          try {
            val version =
              if (ups.isEmpty && dels.isEmpty) -1L
              else {
                val merged = graft.sources.VersionedTable.latestVersion(tableDir) match {
                  case Some(_) => graft.operators.Indexing.applyChanges(
                    graft.sources.VersionedTable.readLatest(spark, tableDir),
                    ups, dels.select(idCol), idCol)
                  case None => graft.operators.Indexing.applyChanges(
                    ups.limit(0), ups, dels.select(idCol), idCol)
                }
                graft.sources.VersionedTable.write(merged, tableDir)
              }
            Files.createDirectories(Paths.get(tableDir))
            val tmp = Paths.get(tableDir, s"_batch-$lineage-$batchId.tmp")
            Files.writeString(tmp, version.toString)
            Files.move(tmp, marker,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          } finally { ups.unpersist(); dels.unpersist(); () }
        }
        ()
      }
      .start()

  /** Drain the stream synchronously into an in-memory table and
    * return the result (complete mode: all windows). */
  def runTumblingOnce(spark: SparkSession, dir: String,
      queryName: String): DataFrame = {
    val q: StreamingQuery = tumblingAgg(readEvents(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
