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
  * exactly (spec-proven).
  */
object GapStream {

  final case class Ev(user_id: Long, ts_us: Long, event_id: Long)
  final case class Last(ts_us: Long, event_id: Long)
  final case class Gap(user_id: Long, gap_s: Long)

  def gaps(events: DataFrame, stateTtlMs: Long = 0L): Dataset[Gap] = {
    import events.sparkSession.implicits._
    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
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
                  out += Gap(uid, (e.ts_us - l.ts_us) / 1000000L)
                  last = Some(Last(e.ts_us, e.event_id))
                case Some(_) => // older-than-state straggler: no gap (see scaladoc)
                case None =>
                  last = Some(Last(e.ts_us, e.event_id))
              }
            }
            last.foreach(state.update)
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            out.result().iterator
          }
      }
  }

  /** Drain a staged events dir synchronously; returns the emitted
    * gap rows (each user's last event remains in state). */
  def runOnce(spark: org.apache.spark.sql.SparkSession, dir: String,
      queryName: String, stateTtlMs: Long = 0L): DataFrame = {
    val q = gaps(EventsStream.readEvents(spark, dir), stateTtlMs)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
