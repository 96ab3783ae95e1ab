package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns, built from codegen'd
  * higher-order functions (zip_with/aggregate) — no UDFs, so the
  * whole similarity pipeline stays inside WholeStageCodegen.
  *
  * Accumulation is sequential left-to-right in element order, which
  * is what the DuckDB oracle does too — combined with round(...,4)
  * at every comparison point, float noise can never flip a result.
  */
object Vectors {

  /** Cast a float embedding to double once, up front: element-wise
    * products must be computed in double on both engines. */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Native codegen expression (graft.plans.DotProduct) — same
    * left-to-right accumulation as the composable form below, ~10×
    * cheaper per pair. */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpr.dotNative(a, b)

  /** Composable-functions form, kept as the cross-check reference
    * for DotProduct (see VectorExprSpec). */
  def dotComposable(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, rounded to 4 dp — the rounding is part of the
    * operator contract (threshold comparisons happen on the rounded
    * value so they are engine-stable). */
  def cosine4(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 4)
}
