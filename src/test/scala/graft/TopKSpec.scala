package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  import TestSession._

  test("TopKPerKey returns exactly the window-rank result set (q4 shape)") {
    val o = Tables.orders(spark, sf)
    val topk = TopKPerKey.topKPerKey(o,
        keyNames = Seq("o_custkey"),
        orderBy = Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val windowed = SparkEntry.queries("q4_window")(spark, sf)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(topk == windowed,
      s"diff ${(topk diff windowed).take(3)} / ${(windowed diff topk).take(3)}")
  }

  test("TopKPerKey plans one exchange and no sort") {
    val o = Tables.orders(spark, sf)
    val plan = TopKPerKey.topKPerKey(o, Seq("o_custkey"),
      Seq(("o_totalprice", true)), 2).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(800))
    assert(!plan.contains("Sort "), "no per-partition sort expected:\n" + plan.take(1200))
  }

  test("TopKPerKey k=1 equals groupBy max") {
    val li = Tables.lineitem(spark, sf)
    val top1 = TopKPerKey.topKPerKey(li, Seq("l_orderkey"),
        Seq(("l_extendedprice", true), ("l_linenumber", false)), 1)
    assert(top1.count() == li.select("l_orderkey").distinct().count())
  }
}
