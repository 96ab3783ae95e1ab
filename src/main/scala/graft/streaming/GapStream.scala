package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming inter-event gaps: the incremental form of
  * graft.operators.Events.gapHistogram's gap extraction — the
  * monitoring stream that keeps the sessionization-gap histogram
  * current as events arrive.
  *
  * State per user is one (ts, event_id) pair (the last event seen).
  * Without a TTL that is O(distinct users ever observed) — fine for
  * bounded user populations, unbounded for open-world ones — so
  * production monitoring configs should pass `stateTtlMs > 0`:
  * a processing-time timeout then evicts any user idle longer than
  * the TTL, bounding state to O(users active within the TTL window).
  * An evicted user's next event re-seeds state and emits no gap —
  * the same posture as the cross-batch straggler below, and the
  * right one: a gap longer than the eviction TTL is a session
  * boundary, not a gap the e13 histogram should count. Same
  * integer-microsecond math as the batch operator (`/` on Scala
  * longs IS floor division for the non-negative gaps emitted here).
  *
  * Out-of-order caveat (the SessionStream posture): events within a
  * micro-batch are sorted (ts, event_id) before gap extraction; a
  * cross-batch straggler OLDER than the stored last event emits no
  * gap — batch would have spliced it into the order — so bound
  * lateness with a watermark in production configs to cap the
  * divergence window. In-order feeds reproduce the batch gaps
  * exactly (spec-proven). Since r14 the watermark is WIRED, not just
  * documented: pass `watermarkDelay = Some("10 minutes")` and rows
  * older than max(event time) − delay are DROPPED before the state
  * function (Spark's standard late-data filter on the stateful
  * operator), so the straggler divergence window is bounded by the
  * delay instead of open-ended; the `ts` field rides the typed row
  * specifically so column pruning can never strip the watermark
  * attribute out from under the filter. Round14OpsSpec pins the
  * late-row drop (a straggler older than the watermark emits
  * nothing and does not regress state) and the in-horizon parity
  * (same feed, watermark on vs off, identical gaps).
  */
object GapStream {

  final case class Ev(user_id: Long, ts_us: Long, event_id: Long,
      ts: java.sql.Timestamp)
  final case class Last(ts_us: Long, event_id: Long)
  final case class Gap(user_id: Long, gap_s: Long)

  def gaps(events: DataFrame, stateTtlMs: Long = 0L,
      watermarkDelay: Option[String] = None): Dataset[Gap] = {
    import events.sparkSession.implicits._
    // Spark applies the stateful operator's late-row filter only in
    // EventTimeTimeout mode (measured r14: under NoTimeout/
    // ProcessingTimeTimeout the watermark predicate never drops), so
    // a watermarked stream runs event-time-timed. With a TTL on top,
    // the TTL becomes EVENT-TIME: the session cut is enforced
    // in-function (deterministic — a comeback event in the same
    // batch as the deadline must still start a fresh session) and
    // setTimeoutTimestamp bounds state memory behind the watermark.
    val eventTime = watermarkDelay.isDefined
    val timeout =
      if (eventTime) GroupStateTimeout.EventTimeTimeout
      else if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    val src = watermarkDelay match {
      case Some(d) => events.withWatermark("ts", d)
      case None    => events
    }
    src
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("ts"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[Last]) =>
          if (state.hasTimedOut) {
            // idle past the TTL: evict; the user's next event re-seeds
            state.remove()
            Iterator.empty
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
            val out = Seq.newBuilder[Gap]
            var last = state.getOption
            sorted.foreach { e =>
              last match {
                case Some(l) if e.ts_us >= l.ts_us =>
                  // event-time session cut: an idle span past the TTL
                  // is a session boundary, never a gap — enforced on
                  // the data path so it holds even when the comeback
                  // event shares a batch with the deadline
                  if (eventTime && stateTtlMs > 0
                      && e.ts_us - l.ts_us > stateTtlMs * 1000L) ()
                  else out += Gap(uid, (e.ts_us - l.ts_us) / 1000000L)
                  last = Some(Last(e.ts_us, e.event_id))
                case Some(_) => // older-than-state straggler: no gap (see scaladoc)
                case None =>
                  last = Some(Last(e.ts_us, e.event_id))
              }
            }
            last.foreach(state.update)
            if (eventTime && stateTtlMs > 0) last.foreach { l =>
              // memory bound: evict behind the watermark (timeout must
              // sit strictly above the current watermark or Spark
              // throws — clamp for re-seeds near the horizon)
              state.setTimeoutTimestamp(math.max(
                l.ts_us / 1000L + stateTtlMs,
                state.getCurrentWatermarkMs() + 1L))
            }
            else if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            out.result().iterator
          }
      }
  }

  /** Drain a staged events dir synchronously; returns the emitted
    * gap rows (each user's last event remains in state). */
  def runOnce(spark: org.apache.spark.sql.SparkSession, dir: String,
      queryName: String, stateTtlMs: Long = 0L,
      watermarkDelay: Option[String] = None,
      stateStore: StreamConfig.StateStore =
        StreamConfig.StateStore.RocksDb): DataFrame = {
    // RocksDb by default since r16 (see SessionStream.runOnce)
    StreamConfig.withStateStore(spark, stateStore) {
      val q = gaps(EventsStream.readEvents(spark, dir), stateTtlMs,
        watermarkDelay)
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    spark.table(queryName)
  }
}
