package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream analytics over the batch table; the streaming module
  * (graft.streaming) runs the same logical shapes incrementally with
  * watermarks. Each operator is a single shuffle on its natural key.
  */
object Events {

  /** Tumbling-window aggregation: one hash shuffle on
    * (window, type); partial aggregation happens map-side. */
  def tumbling(df: DataFrame, tsCol: Column, unit: String, keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    df.groupBy((date_trunc(unit, tsCol).as("window_start") +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Gap-based sessionization: a new session starts when the gap to
    * the previous event of the same key exceeds `gapSeconds`.
    * Exactly one shuffle (on the key); both windows share it.
    * Time math in integer microseconds — never floating epoch. */
  def sessionize(df: DataFrame, keyCol: Column, tsCol: Column, tieBreak: Column,
      gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(keyCol).orderBy(tsCol, tieBreak)
    val prev = lag(tsCol, 1).over(order)
    val isNew = when(prev.isNull ||
      (unix_micros(tsCol) - unix_micros(prev)) > gapSeconds * 1000000L, 1).otherwise(0)
    df.withColumn("__new", isNew)
      .withColumn("session_id",
        sum(col("__new")).over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new")
  }

  /** As-of attribution: for every row, the id of the most recent
    * prior row (same key) satisfying `sourcePred` — e.g. last-click
    * attribution for purchases. One shuffle on the key; the carry is
    * a last(ignoreNulls) running window, which is how an as-of join
    * against the same stream collapses into a single pass (no
    * per-row range probe). */
  def asOfAttribute(df: DataFrame, keyCol: Column, tsCol: Column,
      tieBreak: Column, idCol: Column, sourcePred: Column,
      outName: String): DataFrame = {
    val order = Window.partitionBy(keyCol).orderBy(tsCol, tieBreak)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn(outName,
      last(when(sourcePred, idCol), ignoreNulls = true).over(order))
  }

  /** Range join: match point events to [start, end] intervals of the
    * same key. The scalable plan is NOT a theta join (which Spark
    * executes as BroadcastNestedLoop): intervals explode into the
    * time buckets they cover, points map to their bucket, and an
    * equi-join on (key, bucket) + a residual BETWEEN filter does the
    * rest. Bucket width should approximate the median interval
    * length so the explosion factor stays small. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
      ptTs: String, startTs: String, endTs: String,
      bucketSeconds: Long): DataFrame = {
    val us = bucketSeconds * 1000000L
    val p = points.withColumn("__bkt", expr(s"unix_micros($ptTs) div $us"))
    val iv = intervals.withColumn("__bkt",
      explode(sequence(expr(s"unix_micros($startTs) div $us"),
        expr(s"unix_micros($endTs) div $us"))))
    p.join(iv, Seq(key, "__bkt"))
      .filter(col(ptTs) >= col(startTs) && col(ptTs) <= col(endTs))
      .drop("__bkt")
  }

  /** Session roll-up on top of sessionize: bounds + size per session. */
  def sessionStats(sessions: DataFrame, keyCol: Column, tsCol: Column): DataFrame =
    sessions.groupBy(keyCol, col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(tsCol).as("session_start"),
        max(tsCol).as("session_end"))
}
