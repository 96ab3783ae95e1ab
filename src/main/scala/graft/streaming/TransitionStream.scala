package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming event transitions: the incremental form of
  * graft.operators.Events.transitionCounts' lag extraction — the
  * monitoring stream that keeps the e14 Markov path matrix current
  * as events arrive (the consumer aggregates the emitted pairs;
  * counts only ever grow, so the running (prev, next) tallies are a
  * plain additive rollup of this append stream).
  *
  * State per user is one (ts, event_id, type) triple — the last
  * event seen. The same open-world posture as GapStream: without a
  * TTL that is O(distinct users ever observed), so production
  * monitoring configs should pass `stateTtlMs > 0`; a
  * processing-time timeout then evicts any user idle longer than
  * the TTL and that user's next event re-seeds state emitting no
  * pair (a gap longer than the eviction TTL is a session boundary —
  * the transition across it is the one path analysis should NOT
  * count).
  *
  * Out-of-order caveat (the GapStream/SessionStream posture): events
  * within a micro-batch are sorted (ts, event_id) before pair
  * extraction; a cross-batch straggler OLDER than the stored last
  * event — in the full (ts, event_id) order, so equal-ts ties
  * included — emits no pair — batch would have spliced it into the
  * order — so bound lateness with a watermark in production configs
  * to cap the divergence window. In-order feeds reproduce the batch
  * lag pairs exactly (spec-proven against e14's window extraction).
  */
object TransitionStream {

  final case class Ev(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String, ts: java.sql.Timestamp)
  final case class LastEv(ts_us: Long, event_id: Long, event_type: String)
  final case class Pair(user_id: Long, prev_type: String, next_type: String)

  def transitions(events: DataFrame, stateTtlMs: Long = 0L,
      watermarkDelay: Option[String] = None): Dataset[Pair] = {
    import events.sparkSession.implicits._
    // watermark => EventTimeTimeout (the GapStream r14 measurement:
    // the stateful late-row filter only engages in event-time mode);
    // TTL + watermark => event-time session cut in-function plus
    // watermark-driven state eviction
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
        col("event_id"), col("event_type"), col("ts"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[LastEv]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
            val out = Seq.newBuilder[Pair]
            var last = state.getOption
            sorted.foreach { e =>
              last match {
                // full (ts, event_id) tie-break: an equal-ts straggler
                // with a smaller event_id is still "older than state"
                // under the batch order — no pair, like any straggler
                case Some(l) if e.ts_us > l.ts_us ||
                    (e.ts_us == l.ts_us && e.event_id > l.event_id) =>
                  // event-time session cut (the GapStream rule): the
                  // transition across an idle span past the TTL is
                  // the one path analysis must NOT count
                  if (eventTime && stateTtlMs > 0
                      && e.ts_us - l.ts_us > stateTtlMs * 1000L) ()
                  else out += Pair(uid, l.event_type, e.event_type)
                  last = Some(LastEv(e.ts_us, e.event_id, e.event_type))
                case Some(_) => // older-than-state straggler: no pair (see scaladoc)
                case None =>
                  last = Some(LastEv(e.ts_us, e.event_id, e.event_type))
              }
            }
            last.foreach(state.update)
            if (eventTime && stateTtlMs > 0) last.foreach { l =>
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
    * pair rows (each user's last event remains in state). */
  def runOnce(spark: org.apache.spark.sql.SparkSession, dir: String,
      queryName: String, stateTtlMs: Long = 0L,
      watermarkDelay: Option[String] = None,
      stateStore: StreamConfig.StateStore =
        StreamConfig.StateStore.RocksDb): DataFrame = {
    // RocksDb by default since r16 (see SessionStream.runOnce)
    StreamConfig.withStateStore(spark, stateStore) {
      val q = transitions(EventsStream.readEvents(spark, dir), stateTtlMs,
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
