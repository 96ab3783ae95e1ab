package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}

/** `|A ∩ B| >= needed` for sorted distinct `array<long>` columns,
  * with bidirectional early exit: returns true the moment the count
  * reaches `needed`, false the moment the remaining elements cannot
  * reach it. On threshold-filter workloads most candidate pairs are
  * far from the boundary, so the merge usually terminates in a
  * fraction of a full pass — the fused predicate form of
  * IntersectCount for jaccard-threshold joins.
  */
case class IntersectAtLeast(left: Expression, right: Expression,
    needed: Expression) extends TernaryExpression with NullBothWays {

  override def nullIntolerant: Boolean = true

  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = needed
  override def dataType: DataType = BooleanType

  override def nullSafeEval(a: Any, b: Any, n: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val need = n.asInstanceOf[Int]
    if (need <= 0) return true
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      if (c + math.min(nx - i, ny - j) < need) return false
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1; if (c >= need) return true; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c >= need
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, n) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val res = ctx.freshName("res")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      val brk = ctx.freshName("done")
      s"""
         |int $nx = $x.numElements(); int $ny = $y.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |boolean $res = false;
         |if ($n <= 0) { $res = true; } else {
         |  $brk: while ($i < $nx && $j < $ny) {
         |    if ($c + java.lang.Math.min($nx - $i, $ny - $j) < $n) break $brk;
         |    long $xi = $x.getLong($i); long $yj = $y.getLong($j);
         |    if ($xi == $yj) {
         |      $c++;
         |      if ($c >= $n) { $res = true; break $brk; }
         |      $i++; $j++;
         |    } else if ($xi < $yj) { $i++; } else { $j++; }
         |  }
         |  if (!$res) { $res = $c >= $n; }
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): IntersectAtLeast =
    copy(left = f, right = s, needed = t)
}

object IntersectAtLeast {
  def intersectAtLeast(a: Column, b: Column, needed: Column): Column =
    GraftShims.column(IntersectAtLeast(
      GraftShims.expression(a), GraftShims.expression(b),
      GraftShims.expression(needed)))
}
