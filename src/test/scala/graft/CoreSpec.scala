package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    GraftExtensions.installNullCheckSimplifier(s)
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class CoreSpec extends AnyFunSuite {
  import TestSession._

  test("every declared query runs and is non-degenerate") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0, s"$name failed")
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("every query has matching oracle column aliases where declared") {
    // oracle keys must be a subset of query keys
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("q1 pricing summary groups by flag+status") {
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    assert(df.columns.toSeq == Seq("l_returnflag", "l_linestatus",
      "sum_qty", "sum_base", "sum_disc_price", "avg_qty", "n_rows"))
    assert(df.count() > 0)
  }

  test("q2 broadcasts all dims (single fact scan, no dim shuffle)") {
    val plan = SparkEntry.queries("q2_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins for dims")
  }

  test("q5 pushes filters into the parquet scan") {
    val plan = SparkEntry.queries("q5_filter_project")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_discount"), "discount filter should be pushed")
  }

  test("GraftSession.tune applies defaults and registers SQL functions") {
    GraftSession.tune(spark)
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(spark.sql("SELECT graft_dot(CAST(array(1.0) AS array<double>), CAST(array(4.0) AS array<double>))").head.getDouble(0) == 4.0)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
