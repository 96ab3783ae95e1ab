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

  /** Inter-event gap histogram — the distribution that TUNES
    * [[sessionize]]'s gap knob (pick the valley between the
    * within-session and between-session modes): per-key consecutive
    * gaps in exact integer seconds, bucketed by fixed thresholds
    * (one boundary at each candidate session gap), reduced to one
    * tiny per-bucket row. Scale shape: the lag window partitions by
    * the event key — bounded per key, never a global sort — and the
    * bucket aggregation is map-side-combining on ≤ |buckets| groups.
    * Bucket labels carry an ordering prefix so a plain ORDER BY
    * yields threshold order. */
  def gapHistogram(df: DataFrame, keyCol: Column, tsCol: Column,
      tieBreak: Column,
      boundaries: Seq[(Long, String)] = Seq(
        60L -> "a_under_1m", 300L -> "b_1m_5m", 900L -> "c_5m_15m",
        1800L -> "d_15m_30m", 3600L -> "e_30m_1h", 21600L -> "f_1h_6h"),
      overflowLabel: String = "g_over_6h"): DataFrame = {
    require(boundaries.map(_._1) == boundaries.map(_._1).sorted
        && boundaries.map(_._1).distinct.size == boundaries.size,
      "gap boundaries must be strictly ascending — an unsorted chain " +
        "would bucket silently wrong (first matching WHEN wins)")
    val order = Window.partitionBy(keyCol).orderBy(tsCol, tieBreak)
    val prevUs = lag(unix_micros(tsCol), 1).over(order)
    // integer microsecond math end to end (`DIV`, never a float
    // divide): gaps are non-negative, so integer division floors
    // identically in Spark and DuckDB
    val gaps = df
      .withColumn("__gap_us", unix_micros(tsCol) - prevUs)
      .withColumn("__gap_s", expr("__gap_us DIV 1000000"))
      .filter(col("__gap_s").isNotNull)
    val bucket = boundaries.foldRight(lit(overflowLabel): Column) {
      case ((bound, label), rest) =>
        when(col("__gap_s") < bound, label).otherwise(rest)
    }
    gaps.select(bucket.as("gap_bucket"), col("__gap_s").as("gap_s"))
      .groupBy("gap_bucket")
      .agg(count(lit(1)).as("n_gaps"),
        min("gap_s").as("min_gap_s"),
        max("gap_s").as("max_gap_s"))
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

  /** Generic as-of (backward) join: every left row matched to the
    * most recent right row with `rightTs <= leftTs` on the same key.
    * Not a range probe: both sides union into one stream tagged by
    * side, sorted (ts, side) with right rows first at ties, and a
    * running last(ignoreNulls) carries the latest right payload into
    * each left row — ONE shuffle on the key, state linear in rows,
    * no per-row interval search (the asOfAttribute collapse,
    * generalized to two tables with disjoint schemas). Right rows
    * must be unique per (key, ts) — pre-reduce the right side so the
    * match is deterministic. Inner semantics: left rows preceding
    * every right row drop. Column names must not collide across the
    * two inputs (both payloads re-expand into one row), so the join
    * key is named per side. */
  def asOfJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String): DataFrame = {
    val lStruct = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rStruct = org.apache.spark.sql.types.StructType(right.schema.fields)
    val lu = left.select(col(leftKey).as("__k"), col(leftTs).as("__ts"),
      lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rStruct).as("__r"))
    val ru = right.select(col(rightKey).as("__k"), col(rightTs).as("__ts"),
      lit(0).as("__side"),
      lit(null).cast(lStruct).as("__l"),
      struct(right.columns.map(col): _*).as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lu.unionByName(ru)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__m").isNotNull)
      .select(col("__l.*"), col("__m.*"))
  }

  /** Ordered funnel: per key, the earliest timestamp each stage is
    * reached AT OR AFTER the previous stage's first occurrence, then
    * the per-stage reach counts. All stage carries are min-windows
    * over the same key partitioning, so they share one exchange, and
    * the per-key reduction that follows reuses that partitioning —
    * one shuffle total for any number of stages, output O(stages). */
  def funnel(df: DataFrame, keyCol: Column, tsCol: Column,
      stages: Seq[(String, Column)]): DataFrame = {
    val w = Window.partitionBy(keyCol)
    var cur = df
    var prevTs: Column = null
    stages.foreach { case (name, pred) =>
      val hit = if (prevTs == null) when(pred, tsCol)
        else when(pred && tsCol >= prevTs, tsCol)
      cur = cur.withColumn(s"__ts_$name", min(hit).over(w))
      prevTs = col(s"__ts_$name")
    }
    val perKey = cur.groupBy(keyCol.as("__k"))
      .agg(min(col(s"__ts_${stages.head._1}")).as(s"__t0"),
        stages.tail.zipWithIndex.map { case ((n, _), i) =>
          min(col(s"__ts_$n")).as(s"__t${i + 1}") }: _*)
    val counts = perKey.agg(
      count(col("__t0")).as("c0"),
      stages.tail.zipWithIndex.map { case (_, i) =>
        count(col(s"__t${i + 1}")).as(s"c${i + 1}") }: _*)
    val rows = stages.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i + 1).as("stage_idx"), lit(name).as("stage"),
        col(s"c$i").as("n_keys"))
    }
    counts.select(explode(array(rows: _*)).as("f"))
      .select(col("f.stage_idx"), col("f.stage"), col("f.n_keys"))
  }

  /** Conversion-window funnel — [[funnel]] with the product-analytics
    * conversion window: a key converts stage k only if the stage-k
    * event is at-or-after its stage-(k−1) hit AND within `windowUs`
    * of its FIRST-stage hit (first-touch anchoring, the common
    * analytics default — deterministic, though a later first-touch
    * could in principle convert where the earliest misses; that
    * greedy caveat is inherent to the anchor choice and documented).
    * Window arithmetic is integer microseconds (`unix_micros` — the
    * ns-epoch oracle rule), never timestamp floats. Same plan shape
    * as [[funnel]]: |stages| window-min passes per key partition,
    * one per-key rollup, output |stages| rows. */
  def funnelWindowed(df: DataFrame, keyCol: Column, tsCol: Column,
      stages: Seq[(String, Column)], windowUs: Long): DataFrame = {
    val w = Window.partitionBy(keyCol)
    var cur = df
    var prevTs: Column = null
    var t0: Column = null
    stages.foreach { case (name, pred) =>
      val hit =
        if (prevTs == null) when(pred, tsCol)
        else when(pred && tsCol >= prevTs
          && unix_micros(tsCol) - unix_micros(t0) <= windowUs, tsCol)
      cur = cur.withColumn(s"__ts_$name", min(hit).over(w))
      prevTs = col(s"__ts_$name")
      if (t0 == null) t0 = prevTs
    }
    val perKey = cur.groupBy(keyCol.as("__k"))
      .agg(min(col(s"__ts_${stages.head._1}")).as(s"__t0"),
        stages.tail.zipWithIndex.map { case ((n, _), i) =>
          min(col(s"__ts_$n")).as(s"__t${i + 1}") }: _*)
    val counts = perKey.agg(
      count(col("__t0")).as("c0"),
      stages.tail.zipWithIndex.map { case (_, i) =>
        count(col(s"__t${i + 1}")).as(s"c${i + 1}") }: _*)
    val rows = stages.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i + 1).as("stage_idx"), lit(name).as("stage"),
        col(s"c$i").as("n_keys"))
    }
    counts.select(explode(array(rows: _*)).as("f"))
      .select(col("f.stage_idx"), col("f.stage"), col("f.n_keys"))
  }

  /** First-order transition counts (the Markov path matrix) over each
    * key's time-ordered stream — the "what happens right after a view"
    * primitive behind path analysis, next-action models and flow
    * anomaly checks. `lag` over the per-key (ts, tieBreak) order names
    * each event's predecessor type; the (prev, next) reduction then
    * counts transitions and the distinct keys exhibiting each.
    * Scale shape: the lag window partitions by the event key (bounded
    * per key, never a global sort); the pair aggregate is map-side
    * partial on ≤ |types|² groups, and the distinct-key count is
    * bounded by |types|²·|keys| pre-aggregated rows — output is
    * O(|types|²) regardless of corpus size. All-integer columns. */
  def transitionCounts(df: DataFrame, keyCol: Column, tsCol: Column,
      tieBreak: Column, typeCol: Column): DataFrame = {
    val order = Window.partitionBy(keyCol).orderBy(tsCol, tieBreak)
    df.select(keyCol.as("__k"), typeCol.as("next_type"),
        lag(typeCol, 1).over(order).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col("__k")).as("n_keys"))
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

  /** Interval-overlap join: all pairs of [aStart,aEnd] × [bStart,bEnd]
    * intervals of the same key that overlap. Same bucketization idea
    * as [[rangeJoin]], on BOTH sides — each interval explodes into
    * the time buckets it covers, the join is an equi-join on
    * (key, bucket), and the overlap predicate is a residual filter.
    * A pair sharing several buckets would match once per shared
    * bucket; instead of a distinct pass, each pair is emitted ONLY in
    * its first shared bucket (max of the two start buckets) — a pure
    * filter, no extra shuffle. Bucket width ≈ typical interval length
    * bounds the explosion factor. */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame, key: String,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucketSeconds: Long): DataFrame = {
    val us = bucketSeconds * 1000000L
    val ax = a.withColumn("__abkt", expr(s"unix_micros($aStart) div $us"))
      .withColumn("__bkt", explode(sequence(col("__abkt"),
        expr(s"unix_micros($aEnd) div $us"))))
    val bx = b.withColumn("__bbkt", expr(s"unix_micros($bStart) div $us"))
      .withColumn("__bkt", explode(sequence(col("__bbkt"),
        expr(s"unix_micros($bEnd) div $us"))))
    ax.join(bx, Seq(key, "__bkt"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd)
        && col("__bkt") === greatest(col("__abkt"), col("__bbkt")))
      .drop("__bkt", "__abkt", "__bbkt")
  }

  /** Cohort retention: users cohorted by their first-activity week;
    * output = (cohort_week, weeks_since, n_active). Shuffle shape:
    * exactly three exchanges at ANY scale — the (user, week)
    * distinct, a min-window on the user key (replacing the
    * join-back a cohort lookup would need), and the O(weeks²)-row
    * final reduction. Both dates are week-truncated, so the
    * weeks_since division is exact; counting rows equals counting
    * distinct users because (user, week) is distinct by
    * construction — no count-distinct aggregate, no join. */
  def retention(df: DataFrame, userCol: Column, tsCol: Column): DataFrame = {
    val weeks = df.select(userCol.as("u"),
      date_trunc("week", tsCol).cast("date").as("wk")).distinct()
    val cohort = min("wk").over(Window.partitionBy("u"))
    weeks.withColumn("cohort_week", cohort)
      .select(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("int").as("weeks_since"))
      .groupBy("cohort_week", "weeks_since")
      .agg(count(lit(1)).as("n_active"))
  }

  /** Session roll-up on top of sessionize: bounds + size per session. */
  def sessionStats(sessions: DataFrame, keyCol: Column, tsCol: Column): DataFrame =
    sessions.groupBy(keyCol, col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(tsCol).as("session_start"),
        max(tsCol).as("session_end"))
}
