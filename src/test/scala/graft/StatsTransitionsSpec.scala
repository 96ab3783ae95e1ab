package graft

import graft.operators.{Events, Indexing}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 additions: the Solr StatsComponent (x24) and the event
  * transition matrix (e14) — contract checks the oracle hash can't
  * express (conservation laws, exact-decimal identities, hand-built
  * expected matrices). */
class StatsTransitionsSpec extends AnyFunSuite {
  import TestSession._

  test("e14 transition conservation: pairs = events - active users") {
    val ev = Tables.events(spark, sf).cache()
    val got = SparkEntry.queries("e14_transitions")(spark, sf).cache()
    val totalTransitions = got.agg(sum("n_transitions")).head.getLong(0)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    // each user's ordered stream of k events yields exactly k-1 pairs
    assert(totalTransitions == nEvents - nUsers,
      s"pair conservation broke: $totalTransitions != $nEvents - $nUsers")
    // a pair needs at least one exhibiting user, never more than its count
    assert(got.filter(col("n_keys") < 1 ||
      col("n_keys") > col("n_transitions")).count() == 0)
    got.unpersist(); ev.unpersist()
    ()
  }

  test("e14 hand-built stream produces the exact matrix") {
    import spark.implicits._
    // user 1: a b a b   user 2: a a c (same ts tie broken by event id)
    val ev = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"),
      (1L, 30L, 3L, "a"), (1L, 40L, 4L, "b"),
      (2L, 10L, 5L, "a"), (2L, 10L, 6L, "a"), (2L, 15L, 7L, "c"))
      .toDF("user_id", "t", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("t")))
    val got = Events.transitionCounts(ev, col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      .orderBy("prev_type", "next_type")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", "a", 1L, 1L), ("a", "b", 2L, 1L),
      ("a", "c", 1L, 1L), ("b", "a", 1L, 1L)))
  }

  test("x24 stats identities hold exactly on the real table") {
    val got = SparkEntry.queries("x24_stats")(spark, sf).cache()
    // the variance numerator is the exact integer identity, not a
    // float approximation: n*sumsq - sum^2, recomputed row by row
    got.collect().foreach { r =>
      val n = BigInt(r.getAs[Long]("n"))
      val sum = BigInt(r.getAs[Long]("sum_cents"))
      val sumsq = BigInt(r.getAs[Long]("sumsq_cents"))
      val varNum = BigInt(r.getAs[Long]("var_num"))
      assert(varNum == n * sumsq - sum * sum, s"identity broke on $r")
      assert(varNum >= 0, "n*sumsq - sum^2 is non-negative by Cauchy-Schwarz")
      // both engines' integer div truncates toward zero (Spark `div`,
      // DuckDB `//`) — BigInt `/` shares that semantic exactly
      assert(r.getAs[Long]("mean_cents") == (sum / n).toLong)
      assert(r.getAs[Long]("min_cents") <= r.getAs[Long]("mean_cents")
        && r.getAs[Long]("mean_cents") <= r.getAs[Long]("max_cents"))
      assert(r.getAs[Long]("n_distinct") <= n.toLong)
    }
    // q filter: the error facet is excluded, the other four present
    val facets = got.select("facet").collect().map(_.getString(0)).toSet
    assert(facets == Set("click", "view", "purchase", "signup"))
    got.unpersist()
    ()
  }

  test("x24 hand-built frame: known stats incl. distinct and variance") {
    import spark.implicits._
    val df = Seq(("a", 100L), ("a", 100L), ("a", 300L), ("b", 7L))
      .toDF("f", "cents")
    val got = Indexing.statsComponent(df, lit(true), col("f"), col("cents"))
      .orderBy("facet").collect()
    val a = got(0)
    assert(a.getAs[Long]("n") == 3 && a.getAs[Long]("n_distinct") == 2)
    assert(a.getAs[Long]("sum_cents") == 500 && a.getAs[Long]("mean_cents") == 166)
    assert(a.getAs[Long]("min_cents") == 100 && a.getAs[Long]("max_cents") == 300)
    // 3*(100^2+100^2+300^2) - 500^2 = 3*110000 - 250000 = 80000
    assert(a.getAs[Long]("var_num") == 80000L)
    assert(got(1).getAs[Long]("n") == 1 && got(1).getAs[Long]("var_num") == 0L)
  }
}
