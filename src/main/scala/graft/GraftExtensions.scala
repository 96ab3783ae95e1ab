package graft

import graft.plans.{DotProduct, FreqSketch, HllSketch, IntersectCount, QuantileSketch}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for graft's native expressions.
  *
  * Two registration paths:
  *  - `withExtensions(new GraftExtensions)` at session build time
  *    (the SparkSessionExtensions route — what a deployment sets via
  *    `spark.sql.extensions=graft.GraftExtensions`);
  *  - `GraftExtensions.register(spark)` on a live session (what
  *    Verify/tests use, since the driver owns session creation).
  *
  * After either, SQL users get `graft_dot(a, b)` and
  * `graft_intersect_count(a, b)` with full codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.dotEntry)
    e.injectFunction(GraftExtensions.intersectEntry)
    e.injectFunction(GraftExtensions.hllEntry)
    e.injectFunction(GraftExtensions.freqEntry)
    e.injectFunction(GraftExtensions.quantilesEntry)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
    e.injectOptimizerRule(_ => graft.plans.SimplifyBothWaysNullChecks)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  private def binary(name: String)(mk: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { args =>
    if (args.length != 2) throw new IllegalArgumentException(
      s"$name expects exactly 2 arguments, got ${args.length}")
    mk(args(0), args(1))
  }

  private[graft] val dotEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two array<double> columns"),
      binary("graft_dot")(DotProduct))

  private[graft] val intersectEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_intersect_count"),
      info("graft_intersect_count",
        "graft_intersect_count(a, b) - |A∩B| for sorted distinct array<long> columns"),
      binary("graft_intersect_count")(IntersectCount))

  private val hllBuilder: Seq[Expression] => Expression = { args =>
    if (args.length != 1) throw new IllegalArgumentException(
      s"graft_hll expects exactly 1 argument, got ${args.length}")
    HllSketch(args.head).toAggregateExpression(isDistinct = false)
  }

  private[graft] val hllEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_hll"),
      info("graft_hll", "graft_hll(c) - HyperLogLog approximate distinct count of c"),
      hllBuilder)

  private val freqBuilder: Seq[Expression] => Expression = { args =>
    val k = args match {
      case Seq(_) => 64
      case Seq(_, Literal(kv: Int, _)) => kv
      case _ => throw new IllegalArgumentException(
        s"graft_freq expects (col) or (col, k literal), got ${args.length} args")
    }
    FreqSketch(args.head, k).toAggregateExpression(isDistinct = false)
  }

  private[graft] val freqEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_freq"),
      info("graft_freq",
        "graft_freq(c[, k]) - Misra-Gries heavy hitters of c as map<item, count-lower-bound>"),
      freqBuilder)

  private val quantilesBuilder: Seq[Expression] => Expression = { args =>
    import org.apache.spark.unsafe.types.UTF8String
    val (k, pcts) = args match {
      case Seq(_) => (1024, Seq(50, 90, 99))
      case Seq(_, Literal(kv: Int, _)) => (kv, Seq(50, 90, 99))
      case Seq(_, Literal(kv: Int, _), Literal(ps: UTF8String, _)) =>
        (kv, ps.toString.split(',').toSeq.map(_.trim.toInt))
      case _ => throw new IllegalArgumentException(
        "graft_quantiles expects (col), (col, k literal), or " +
          s"(col, k literal, 'p1,p2,..' percent literal), got ${args.length} args")
    }
    QuantileSketch(
        org.apache.spark.sql.catalyst.expressions.Cast(
          args.head, org.apache.spark.sql.types.DoubleType), k, pcts)
      .toAggregateExpression(isDistinct = false)
  }

  private[graft] val quantilesEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_quantiles"),
      info("graft_quantiles",
        "graft_quantiles(c[, k[, 'p1,p2,..']]) - KLL quantile sketch of c; " +
          "array<double> of the value at each integer-percent probe"),
      quantilesBuilder)

  /** Live-session route for the null-check simplifier (a pure
    * expression rewrite, safe without any planner strategy —
    * unlike TopKRewriteRule, whose logical node needs the injected
    * strategy and therefore stays builder-route only). Idempotent. */
  def installNullCheckSimplifier(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(graft.plans.SimplifyBothWaysNullChecks))
      spark.experimental.extraOptimizations =
        cur :+ graft.plans.SimplifyBothWaysNullChecks
    // r18: InferFiltersFromGenerate injects `size(e) > 0 AND
    // isnotnull(e)` below every non-outer Generate, and filter
    // pushdown-through-project then INLINES the generator child's
    // whole expression chain into that filter — for the chunk/shingle
    // fan-outs this re-evaluates the tokenize+chunk pipeline per row
    // a second (and, via the x25 outer-expression-in-HOF-lambda trap,
    // per-ELEMENT: split() lands inside the pushed lambda) time.
    // Measured on d25's docChunks fan-out: 1.6 s → 0.31 s at sf0.1
    // with the rule excluded; d27 1.5 → 0.47 s. The filter's only
    // benefit is pruning empty-generator rows early, which the
    // Generate does anyway in the same stage in every graft fan-out
    // (scan → project → generate, no intervening shuffle). Rule
    // exclusion is semantics-preserving by construction; the tax it
    // removes grows with document length, so this holds at 100 TB.
    val excludeRule =
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    val existing = spark.conf.getOption("spark.sql.optimizer.excludedRules")
      .filter(_.nonEmpty)
    if (!existing.exists(_.split(',').contains(excludeRule)))
      spark.conf.set("spark.sql.optimizer.excludedRules",
        (existing.toSeq :+ excludeRule).mkString(","))
  }

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit = {
    installNullCheckSimplifier(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", binary("graft_dot")(DotProduct), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_intersect_count", binary("graft_intersect_count")(IntersectCount), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll", hllBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_freq", freqBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_quantiles", quantilesBuilder, "scala_udf")
  }
}
