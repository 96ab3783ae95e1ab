package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native SimHash fold: array<long> of shingle hashes → one 64-bit
  * signature by per-bit majority vote over the splitmix64-mixed
  * hashes. Replaces the interpreted `simhashUdf` fold that sat on
  * d4's hot path since r2 — same playbook as [[ShingleHash]] (the
  * r14 switch that took x19 2.10→1.44 s): the algorithm is
  * BIT-IDENTICAL to the legacy UDF and to the typed Aggregator twin
  * (graft.dedup.SimHash.signaturesAgg — DedupSpec cross-checks all
  * on the real corpus), but evaluation is a Catalyst expression with
  * `doGenCode`, so the per-document fold stays inside the
  * WholeStageCodegen span with no ScalaUDF converter boundary
  * (Seq[Long] boxing per document was the tax).
  *
  * The mix+vote loop is the single source of truth for the fold —
  * graft.dedup.SimHash delegates both its map-pass and its
  * Aggregator to [[mix64]]. */
case class SimHashFold(child: Expression) extends UnaryExpression
    with NullBothWays {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHashFold.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHashFold.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashFold =
    copy(child = newChild)
}

object SimHashFold {

  /** splitmix64 finalizer — spreads the 32-bit seed-0 shingle hash
    * across all 64 signature bits. */
  def mix64(h: Long): Long = {
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Shared by interpreted eval and generated code: per-bit ±1 votes
    * over the mixed hashes, positive-majority bits set. */
  def compute(hashes: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = mix64(hashes.getLong(i))
      var j = 0
      while (j < 64) {
        votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** Column form: fold an array<long> of shingle hashes to the
    * packed 64-bit SimHash signature. */
  def simhashFold(hashes: Column): Column =
    GraftShims.column(SimHashFold(GraftShims.expression(hashes)))
}
