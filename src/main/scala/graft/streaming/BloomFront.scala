package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** The d9 Bloom front for streaming state scans, native since r16
  * (r15 verdict items 5 + 7): the filter is built with Spark's own
  * `bloom_filter_agg` (distributed, map-side partial — the batch
  * gram set never collects as objects) and probed with
  * `might_contain` over a binary LITERAL, so the state-scan filter
  * stays inside whole-stage codegen — no ScalaUDF boundary, no
  * broadcast variable lifecycle.
  *
  * fpp SCALES DOWN WITH STATE SIZE: the leak term of a fixed-fpp
  * front is fpp·|state| rows per batch — linear in corpus history.
  * Scaling fpp to ≤ |batch| / |state| pins EXPECTED false positives
  * at ≤ |batch| rows, keeping the per-batch shuffle O(batch) forever;
  * the price is logarithmic (bits/item ∝ −log fpp), bounded by
  * [[maxBits]] (Spark's own runtime-filter ceiling, 8 MB — past it
  * the fpp floor rises honestly). */
object BloomFront {

  /** Spark's default runtime bloom-filter ceiling (67,108,864 bits =
    * 8 MB) — past this the filter would dominate task memory. */
  val maxBits: Long = 1L << 26

  /** fpp for a batch of `nBatch` distinct keys probing `stateRows`
    * accumulated state rows: the base fpp, tightened so that expected
    * false positives stay ≤ nBatch (floored at 1e-8 — 27 bits/item,
    * past any practical gain). */
  def scaledFpp(baseFpp: Double, nBatch: Long, stateRows: Long): Double =
    math.max(1e-8,
      math.min(baseFpp, nBatch.toDouble / math.max(stateRows, 1L).toDouble))

  /** Standard Bloom sizing: m = −n·ln p / (ln 2)², capped at
    * [[maxBits]]. */
  def bits(n: Long, fpp: Double): Long =
    math.min(maxBits, math.max(64L,
      math.ceil(-n.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong))

  /** Build the filter over `longKey` (one distributed aggregate; the
    * single binary result is the only thing that reaches the driver).
    * BloomFilterAggregate is not SQL-registered — it is the engine's
    * own runtime-filter aggregate — so it is constructed directly and
    * wrapped through the Column shim. */
  def build(df: DataFrame, longKey: Column, n: Long, fpp: Double): Array[Byte] =
    df.select(GraftShims.column(
        new BloomFilterAggregate(GraftShims.expression(longKey),
          Literal(n), Literal(bits(n, fpp))).toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]]("bf")

  /** Codegen probe: `might_contain(<literal filter>, key)`. The
    * binary literal satisfies might_contain's constant-bloom
    * requirement and rides the plan like Spark's own injected
    * runtime filters. */
  def probe(bf: Array[Byte], longKey: Column): Column =
    GraftShims.column(
      BloomFilterMightContain(Literal(bf), GraftShims.expression(longKey)))
}
