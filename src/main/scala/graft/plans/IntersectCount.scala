package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** |A ∩ B| for two SORTED, DISTINCT `array<long>` columns.
  *
  * `array_intersect` builds a hash set per pair; over millions of
  * candidate pairs that is the dominant dedup cost. With both sides
  * sorted once at shingle time, the intersection count is a single
  * merge pass — no allocation, full codegen. Only the *count* is
  * produced (jaccard needs sizes, never the elements).
  *
  * Precondition (caller-enforced, Dedup.hashedShingles sorts): both
  * arrays ascending and duplicate-free.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with NullBothWays {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      s"""
         |int $nx = $x.numElements(); int $ny = $y.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xi = $x.getLong($i); long $yj = $y.getLong($j);
         |  if ($xi == $yj) { $c++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {
  def intersectCount(a: Column, b: Column): Column =
    GraftShims.column(IntersectCount(
      GraftShims.expression(a), GraftShims.expression(b)))
}
