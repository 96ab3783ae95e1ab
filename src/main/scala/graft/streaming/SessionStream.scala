package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization: the incremental form of
  * graft.operators.Events.sessionize, via flatMapGroupsWithState.
  *
  * State per user is one open session (24 bytes); closed sessions
  * emit as soon as a gap-exceeding event arrives. At 100 TB/day the
  * state size is O(active users), not O(events) — the watermark/
  * timeout evicts idle users in a production config.
  */
object SessionStream {

  final case class Ev(user_id: Long, ts_us: Long, event_id: Long)
  final case class Open(start_us: Long, end_us: Long, n: Long)
  final case class Session(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long)

  /** events (with `ts` timestamp, `user_id`, `event_id`) →
    * closed sessions. The per-user open session stays in state. */
  def sessionize(events: DataFrame, gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[Open]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
          val closed = Seq.newBuilder[Session]
          var open = state.getOption
          sorted.foreach { e =>
            open match {
              case Some(o) if e.ts_us - o.end_us > gapUs =>
                closed += Session(uid, o.start_us, o.end_us, o.n)
                open = Some(Open(e.ts_us, e.ts_us, 1))
              case Some(o) if o.start_us - e.ts_us > gapUs =>
                // a straggler more than one gap BEFORE the open
                // session can never merge with it (batch sessionize
                // over sorted input would put a session boundary
                // between them) — emit it as its own closed session
                // instead of dragging the open session's start back.
                // Residual divergence vs batch: two such stragglers
                // within one gap of each other arriving in separate
                // late batches emit separately where batch would merge
                // them; bound lateness with a watermark in production
                // configs to cap this window.
                closed += Session(uid, e.ts_us, e.ts_us, 1)
              case Some(o) =>
                // min/max, not plain e.ts_us: an out-of-order event
                // from a later micro-batch (events within one batch
                // are sorted above) must not regress the open
                // session's end and corrupt later gap comparisons
                open = Some(Open(math.min(o.start_us, e.ts_us),
                  math.max(o.end_us, e.ts_us), o.n + 1))
              case None =>
                open = Some(Open(e.ts_us, e.ts_us, 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }

  /** Drain a staged events dir synchronously; returns closed
    * sessions (each user's final open session remains in state,
    * exactly as a live deployment would hold it). */
  def runOnce(spark: org.apache.spark.sql.SparkSession, dir: String,
      queryName: String, gapSeconds: Long,
      stateStore: StreamConfig.StateStore =
        StreamConfig.StateStore.RocksDb): DataFrame = {
    // RocksDb by default since r16 (the open-world keyed-state
    // posture; heap retained as the option) — the provider binds at
    // query start, so the scope wrapper is the whole wiring
    StreamConfig.withStateStore(spark, stateStore) {
      val q = sessionize(EventsStream.readEvents(spark, dir), gapSeconds)
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
