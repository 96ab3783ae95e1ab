package graft.plans

import graft.functions.Hashing
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass shingle hasher: text → array<long> of 32-bit
  * seeded k-token-gram hashes, the front of EVERY dedup operator
  * (d2/d3/d7/d9/d10/d12/d14/d19/d23/d26, x19, ta15 …).
  *
  * This replaces the Scala UDFs that carried the same logic since
  * r2 (the r13 verdict's residual watch-list item): the algorithm is
  * BIT-IDENTICAL (same lower + whitespace-collapse normalization,
  * same short-tail window rule, same h32 = first-8-md5-hex hash the
  * DuckDB oracles mirror — ShingleHashSpec pins parity against the
  * legacy UDF logic on the real corpus plus adversarial edges), but
  * the evaluation is a Catalyst expression: no ScalaUDF
  * CatalystTypeConverters boundary (String in, wrapped
  * GenericArrayData out, re-copied to unsafe), no codegen fence —
  * the generated code calls one static helper and writes an
  * UnsafeArrayData, staying inside the WholeStageCodegen span like
  * Spark's own regexp expressions.
  *
  * Three modes cover the three legacy UDFs:
  *  - positional = false → DISTINCT hashes, ASCENDING (the set form
  *    the merge-intersect family requires sorted);
  *  - positional = true  → document order, one entry per start
  *    token, duplicates kept (the span-audit form);
  *  - fullOnly — k-gram windowing: only full k-token windows (a doc
  *    shorter than k emits NOTHING — the d26 anchor rule); legacy
  *    shingle windowing when false: max(len−k+1, 1) windows, the
  *    trailing short window standing in for tiny docs.
  */
case class ShingleHash(child: Expression, k: Int, positional: Boolean,
    fullOnly: Boolean) extends UnaryExpression with NullBothWays {

  // null in => null out (nullSafeEval): lets the optimizer infer
  // isnotnull(child) instead of re-evaluating this chain in a filter
  override def nullIntolerant: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      ShingleHash.compute(input.asInstanceOf[UTF8String], k, positional, fullOnly))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.plans.ShingleHash.compute($c, $k, $positional, $fullOnly));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

object ShingleHash {

  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  /** THE tokenization every gram operator shares (lower → collapse
    * whitespace → trim → split) — [[TokenGrams]] consumes the same
    * array, so string grams and hashed grams cannot drift (the d25
    * lesson: two tokenizations is a parity bug waiting to land). */
  def tokens(s: UTF8String): Array[String] = {
    val norm = wsPattern.matcher(s.toString.toLowerCase).replaceAll(" ").trim
    wsPattern.split(norm)
  }

  /** Shared by interpreted eval and generated code. Normalization
    * and hashing are byte-for-byte the legacy UDF chain:
    * lower → collapse whitespace → trim → split → k-token windows
    * (short-tail unless fullOnly) → h32(seed 0). */
  def compute(s: UTF8String, k: Int, positional: Boolean,
      fullOnly: Boolean): Array[Long] = {
    val tks = tokens(s)
    val n0 = tks.length - k + 1
    val n = if (fullOnly) n0 else math.max(n0, 1)
    if (n <= 0) return Array.emptyLongArray
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder(tks(i))
      var j = 1
      while (j < k && i + j < tks.length) {
        sb.append(' ').append(tks(i + j)); j += 1
      }
      out(i) = Hashing.h32jvm(0, sb.toString)
      i += 1
    }
    if (positional) out
    else {
      val d = out.distinct
      java.util.Arrays.sort(d)
      d
    }
  }

  /** Distinct ascending 3-shingle hashes (Dedup.hashedShingles). */
  def hashedShingles(text: Column): Column =
    GraftShims.column(ShingleHash(GraftShims.expression(text),
      k = 3, positional = false, fullOnly = false))

  /** Document-order positional 3-shingle hashes. */
  def positionalHashedShingles(text: Column): Column =
    GraftShims.column(ShingleHash(GraftShims.expression(text),
      k = 3, positional = true, fullOnly = false))

  /** Document-order positional k-gram hashes, full windows only. */
  def positionalKgrams(text: Column, k: Int): Column =
    GraftShims.column(ShingleHash(GraftShims.expression(text),
      k = k, positional = true, fullOnly = true))
}
