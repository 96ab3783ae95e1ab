package graft

import graft.operators.Events
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** e16 contract checks the oracle hash can't express: the conversion
  * window's per-stage gating on a hand-built stream, the documented
  * greedy first-touch caveat, and the degenerate-window equivalence
  * to the unwindowed e9 funnel. */
class FunnelWindowSpec extends AnyFunSuite {
  import TestSession._

  private val HourUs = 3600L * 1000000L
  private val stages = Seq[(String, org.apache.spark.sql.Column)](
    ("view", col("event_type") === "view"),
    ("click", col("event_type") === "click"),
    ("purchase", col("event_type") === "purchase"))

  private def ev(rows: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    rows.toDF("user_id", "h", "event_type")
      .withColumn("ts", timestamp_micros(col("h") * HourUs))
  }

  test("e16 hand-built stream: each window verdict lands as designed") {
    // u1 converts everything inside 24 h; u2's click lands at +25 h
    // (outside); u3 clicks in-window but purchases at +30 h; u4 has
    // no first-stage hit at all, so nothing counts.
    val df = ev(Seq(
      (1L, 0L, "view"), (1L, 1L, "click"), (1L, 2L, "purchase"),
      (2L, 0L, "view"), (2L, 25L, "click"),
      (3L, 0L, "view"), (3L, 1L, "click"), (3L, 30L, "purchase"),
      (4L, 1L, "click"), (4L, 2L, "purchase")))
    val got = Events.funnelWindowed(df, col("user_id"), col("ts"),
        stages, windowUs = 24L * HourUs)
      .orderBy("stage_idx")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("view", 3L), ("click", 2L), ("purchase", 1L)))
  }

  test("e16 greedy first-touch caveat: the earliest anchor is the anchor") {
    // u5 views at 0 h and again at 10 h, clicks at 30 h. Anchoring on
    // the 10 h view would convert (+20 h <= 24 h), but first-touch
    // anchors at 0 h and the click misses — the documented semantics.
    val df = ev(Seq((5L, 0L, "view"), (5L, 10L, "view"), (5L, 30L, "click")))
    val got = Events.funnelWindowed(df, col("user_id"), col("ts"),
        stages, windowUs = 24L * HourUs)
      .orderBy("stage_idx")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("view", 1L), ("click", 0L), ("purchase", 0L)))
  }

  test("e16 with an unbounded window equals the e9 funnel on the real table") {
    val events = Tables.events(spark, sf)
    val windowed = Events.funnelWindowed(events, col("user_id"), col("ts"),
      stages, windowUs = Long.MaxValue / 4)
    val plain = Events.funnel(events, col("user_id"), col("ts"), stages)
    assert(windowed.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(windowed).count() == 0)
  }

  test("e16 24 h window BINDS on the real table: every stage strictly below e9") {
    val events = Tables.events(spark, sf)
    val w = Events.funnelWindowed(events, col("user_id"), col("ts"),
        stages, windowUs = 24L * HourUs)
      .withColumnRenamed("n_keys", "n_w")
    val p = Events.funnel(events, col("user_id"), col("ts"), stages)
      .withColumnRenamed("n_keys", "n_p")
    val joined = w.join(p, Seq("stage_idx", "stage")).cache()
    // stage 1 is the anchor itself — identical by construction; every
    // later stage must drop below the unwindowed count yet stay live
    assert(joined.filter(col("stage_idx") === 1 && col("n_w") =!= col("n_p"))
      .count() == 0)
    assert(joined.filter(col("stage_idx") > 1 &&
      (col("n_w") >= col("n_p") || col("n_w") <= 0)).count() == 0)
    joined.unpersist()
    ()
  }
}
