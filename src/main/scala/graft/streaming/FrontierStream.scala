package graft.streaming

import graft.dedup.UrlDedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming crawl-frontier gate — the d24 canonical-URL dedup run as
  * ingest: every arriving (id, url) row normalizes through
  * [[UrlDedup.canonicalizeUrl]] map-side, then a stateful first-seen
  * check keyed by the CANONICAL url admits the first sighting and
  * flags every later variant as a duplicate hit (with the admitted
  * id, for the audit trail a fetch scheduler wants). State per key is
  * one (first_id, n_seen) pair — O(distinct canonical URLs), the
  * frontier set itself.
  *
  * Batch-vs-stream deviation, stated: batch d24 keeps the MINIMUM id
  * per canonical URL; the stream keeps the FIRST-ARRIVED (within a
  * micro-batch, ties resolve in id order, so an in-order feed
  * reproduces the batch keep exactly — FrontierStreamSpec pins it).
  * A frontier cannot do better: the first fetch has already been
  * scheduled when the smaller id arrives late.
  *
  * `stateTtlMs > 0` turns the frontier into a RE-CRAWL window
  * (the production posture — an unbounded seen-set is O(all URLs
  * ever)): a canonical URL idle longer than the TTL is evicted and
  * its next sighting is admitted again, which is exactly the
  * re-fetch-after-expiry semantics a crawler wants.
  */
object FrontierStream {

  final case class UrlIn(id: Long, url: String, canonical_url: String)
  final case class Seen(first_id: Long, n_seen: Long)
  final case class Sighting(id: Long, url: String, canonical_url: String,
      admitted: Boolean, first_id: Long, n_seen: Long)

  def firstSeen(rows: DataFrame, stateTtlMs: Long = 0L): Dataset[Sighting] = {
    import rows.sparkSession.implicits._
    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    rows
      .select(col("id"), col("url"),
        UrlDedup.canonicalizeUrl(col("url")).as("canonical_url"))
      .as[UrlIn]
      .groupByKey(_.canonical_url)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (key: String, it: Iterator[UrlIn], state: GroupState[Seen]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // id order within the batch: an in-order feed then keeps
            // exactly the batch d24 min-id representative
            val sorted = it.toSeq.sortBy(_.id)
            val out = Seq.newBuilder[Sighting]
            var seen = state.getOption
            sorted.foreach { r =>
              seen match {
                case None =>
                  seen = Some(Seen(r.id, 1L))
                  out += Sighting(r.id, r.url, key, admitted = true,
                    first_id = r.id, n_seen = 1L)
                case Some(s) =>
                  seen = Some(Seen(s.first_id, s.n_seen + 1))
                  out += Sighting(r.id, r.url, key, admitted = false,
                    first_id = s.first_id, n_seen = s.n_seen + 1)
              }
            }
            seen.foreach(state.update)
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            out.result().iterator
          }
      }
  }

  /** Drain a staged dir of (id, url) parquet batches synchronously;
    * returns the sighting rows (frontier state stays in the query —
    * one runOnce call is one frontier lifetime). */
  def runOnce(spark: org.apache.spark.sql.SparkSession, dir: String,
      queryName: String, stateTtlMs: Long = 0L,
      stateStore: StreamConfig.StateStore =
        StreamConfig.StateStore.RocksDb): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("url",
        org.apache.spark.sql.types.StringType)))
    val in = spark.readStream.schema(schema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(dir)
    // RocksDb by default since r16 (see SessionStream.runOnce)
    StreamConfig.withStateStore(spark, stateStore) {
      val q = firstSeen(in, stateTtlMs)
        .writeStream.outputMode("append")
        .format("memory").queryName(queryName).start()
      q.processAllAvailable()
      q.stop()
    }
    spark.table(queryName)
  }
}
