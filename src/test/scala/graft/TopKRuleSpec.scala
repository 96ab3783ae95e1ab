package graft

import graft.plans.{TopKRewriteRule, TopKStrategy}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

class TopKRuleSpec extends AnyFunSuite {
  import TestSession._

  private def enableRule(): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    if (!spark.experimental.extraOptimizations.contains(TopKRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewriteRule
  }

  private def topkShaped(dropRank: Boolean) = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val ranked = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    if (dropRank) ranked.select("o_custkey", "o_orderkey", "o_totalprice")
    else ranked.select("o_custkey", "o_orderkey", "rn")
  }

  test("rank-dropping top-k windows rewrite to TopKPerKey automatically") {
    enableRule()
    val df = topkShaped(dropRank = true)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(1200))
    // the Window *operator* must be gone; Spark's WindowGroupLimit
    // pre-filter (which TopKPerKey benefits from) may remain
    assert(!plan.contains("Window ["), "window operator should be gone:\n" + plan.take(1200))
  }

  test("rewritten plan returns exactly the window result") {
    enableRule()
    val got = topkShaped(dropRank = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference computed without the rule: the oracled q4 result
    val want = SparkEntry.queries("q4_window")(spark, sf)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("ta9 tf-idf keyword extraction rewrites to TopKPerKey") {
    val plan = graft.queries.TextEvents.ta9Keywords(spark, TestSession.sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"ta9's rank-dropping top-3 should hit the rewrite:\n$plan")
  }

  test("queries that keep the rank column are NOT rewritten") {
    enableRule()
    val plan = topkShaped(dropRank = false).queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(1200))
    assert(!plan.contains("TopKPerKey"), "rank escapes — must keep the window")
  }
}
