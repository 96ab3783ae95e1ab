package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression, IsNotNull,
  IsNull, Literal, Or}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Marker for graft expressions whose output is null IF AND ONLY IF
  * an input is null: nullSafeEval gives null-in → null-out, and every
  * implementation's compute() is total on non-null input (never
  * returns null). This is strictly stronger than Spark's
  * `nullIntolerant` (one direction only), and it is exactly the
  * property that licenses rewriting a null check ON the expression
  * into null checks on its children.
  *
  * Why it matters: Catalyst's InferFiltersFromConstraints turns join
  * keys derived from these expressions into
  * `isnotnull(simhashfold(shinglehash(text)))` filters pushed below
  * the join — re-evaluating the whole hash chain once more per row
  * per branch (Filter and Project are separate codegen consumers, no
  * cross-operator subexpression elimination). Constraints skip
  * ScalaUDFs, so the legacy UDFs never paid this; the native
  * expressions did — measured on d4: the inferred filter added ~25%
  * to the banded self-join's wall. [[SimplifyBothWaysNullChecks]]
  * rewrites those checks down to the cheap attribute form.
  */
trait NullBothWays { self: Expression => }

/** `IsNotNull(f(x…))` → `AND(isnotnull(xᵢ))` (nullable children) and
  * `IsNull(f(x…))` → `OR(isnull(xᵢ))`, for NullBothWays f, recursing
  * through nested marked expressions in one pass. Runs in the
  * operator-optimization batch via GraftExtensions (builder route)
  * or `spark.experimental.extraOptimizations` (live-session route —
  * what Verify/Bench/tests use since the driver owns their
  * sessions); both are fixed-point batches and the rewrite is
  * idempotent, so double registration is harmless. */
object SimplifyBothWaysNullChecks extends Rule[LogicalPlan] {

  private def notNullOf(e: Expression): Expression = e match {
    case b: NullBothWays =>
      b.children.filter(_.nullable).map(notNullOf)
        .reduceOption[Expression](And(_, _)).getOrElse(Literal.TrueLiteral)
    case other => IsNotNull(other)
  }

  private def nullOf(e: Expression): Expression = e match {
    case b: NullBothWays =>
      b.children.filter(_.nullable).map(nullOf)
        .reduceOption[Expression](Or(_, _)).getOrElse(Literal.FalseLiteral)
    case other => IsNull(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case IsNotNull(e: NullBothWays) => notNullOf(e)
      case IsNull(e: NullBothWays)    => nullOf(e)
    }
}
