package graft

import graft.dedup.Dedup
import graft.operators.{Corpus, Events}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 operator surface: Bloom-prefiltered decontamination,
  * duplicated-span stats, generic as-of join, ordered funnel,
  * deterministic stratified sampling. */
class RoundFourSpec extends AnyFunSuite {
  import TestSession._

  test("d9 Bloom prefilter is invisible: identical output to the exact path") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") >= 10)
    val bench = docs.filter(col("doc_id") < 10)
    val exact = Dedup.decontaminate(corpus, bench, minSharedShingles = 2)
    val bloom = Dedup.decontaminateBloom(corpus, bench, minSharedShingles = 2)
    assert(bloom.exceptAll(exact).isEmpty && exact.exceptAll(bloom).isEmpty,
      "Bloom-prefiltered result diverged from the exact semi-join")
    // ...even at an aggressive fpp, where false positives flood the
    // verify join but can never flip a count
    val sloppy = Dedup.decontaminateBloom(corpus, bench,
      minSharedShingles = 2, fpp = 0.3)
    assert(sloppy.exceptAll(exact).isEmpty && exact.exceptAll(sloppy).isEmpty)
  }

  test("d10 planted exact copies are 100% duplicated spans") {
    val stats = Dedup.dupSpanStats(Dedup.augmentedDocs(spark, sf)).cache()
    // an exact copy shares every shingle with its original
    val copies = stats.filter(col("doc_id") >= Dedup.ExactOffset)
    assert(copies.filter(col("dup_ratio") =!= 1.0).count() == 0,
      "exact copies must have dup_ratio 1.0")
    // n_shared is bounded by n_shingles everywhere
    assert(stats.filter(col("n_shared") > col("n_shingles")).count() == 0)
    // every augmented doc is represented
    assert(stats.count() == Tables.documents(spark, sf).count() * 3)
    stats.unpersist()
    ()
  }

  test("asOfJoin matches the per-row latest-predecessor computed naively") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"), col("ts").as("view_ts"))
      .agg(max("event_id").as("view_id"))
    val got = Events.asOfJoin(purchases, views, "user_id", "v_user",
        "purchase_ts", "view_ts")
      .select("purchase_id", "view_id")
    // naive oracle: theta-join all predecessors, keep the max view_ts
    // (tie-broken by the (user, ts)-unique reduction above)
    val naive = purchases.join(views,
        col("user_id") === col("v_user") && col("view_ts") <= col("purchase_ts"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("purchase_id").orderBy(col("view_ts").desc)))
      .filter(col("rn") === 1)
      .select("purchase_id", "view_id")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    assert(got.count() > 0, "fixture has no view->purchase sequences")
  }

  test("asOfJoin shuffles once on the key — no range probe, no cartesian") {
    val ev = Tables.events(spark, sf)
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("lk"), col("ts").as("lts"))
    val r = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("vid"), col("user_id").as("rk"), col("ts").as("rts"))
    val plan = Events.asOfJoin(l, r, "lk", "rk", "lts", "rts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"as-of join must not range-probe:\n${plan.take(1500)}")
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1,
      s"as-of join must shuffle exactly once on the key:\n${plan.take(1500)}")
  }

  test("e9 funnel counts are monotone and match direct stage-1 reach") {
    val rows = SparkEntry.queries("e9_funnel")(spark, sf)
      .collect().sortBy(_.getInt(0)).map(_.getLong(2))
    assert(rows.length == 3)
    assert(rows(0) >= rows(1) && rows(1) >= rows(2),
      s"funnel must narrow: ${rows.mkString(",")}")
    assert(rows(2) > 0, "fixture has no full view->click->purchase path")
    val viewers = Tables.events(spark, sf)
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(rows(0) == viewers)
  }

  test("e10 retention: week-0 row per cohort equals cohort size, counts bounded by it") {
    val r = SparkEntry.queries("e10_retention")(spark, sf).cache()
    val w0 = r.filter(col("weeks_since") === 0)
      .select(col("cohort_week"), col("n_active").as("cohort_size"))
    // every cohort has a week-0 row (its members were active then)
    assert(w0.count() == r.select("cohort_week").distinct().count())
    // no later week exceeds the cohort size, and none is empty
    val bad = r.join(w0, "cohort_week")
      .filter(col("n_active") > col("cohort_size") || col("n_active") < 1)
    assert(bad.count() == 0)
    // total week-0 actives = distinct users
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(w0.agg(sum("cohort_size")).head.getLong(0) == users)
    r.unpersist()
    // plan shape: exactly three exchanges, no join, at any scale
    val plan = graft.operators.Events.retention(
        Tables.events(spark, sf), col("user_id"), col("ts"))
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 == 3,
      s"retention must shuffle exactly 3 times:\n${plan.take(1500)}")
    assert(!plan.contains("Join"), s"retention must be join-free:\n${plan.take(1500)}")
    ()
  }

  test("x6 compaction groups are contiguous, budget-respecting, and lossless") {
    val p = SparkEntry.queries("x6_compact")(spark, sf).cache()
    // every file appears exactly once (a plan, not a rewrite)
    val files = Tables.documents(spark, sf)
      .groupBy(col("source"), expr("doc_id div 20")).count()
    assert(p.count() == files.count())
    // group byte totals stay within target + one straddling file
    val grp = p.groupBy("part_key", "group_id")
      .agg(sum("bytes").as("gb"), max("bytes").as("mx"), count(lit(1)).as("n"))
    grp.collect().foreach { r =>
      assert(r.getLong(2) <= 20000L + r.getLong(3), s"group over budget: $r")
      assert(r.getLong(4) >= 1)
    }
    // groups are contiguous in file order: group_id is non-decreasing
    val nonMono = p.withColumn("prev",
        lag("group_id", 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("part_key").orderBy("file_id")))
      .filter(col("prev").isNotNull && col("group_id") < col("prev"))
    assert(nonMono.count() == 0)
    p.unpersist()
    ()
  }

  test("v7 anomaly flags match a driver-side z-score computation") {
    val got = SparkEntry.queries("v7_volume_anomaly")(spark, sf)
      .select("vol_key", "day", "n", "is_anomaly").collect()
      .map(r => ((r.getString(0), r.getDate(1).toString), (r.getLong(2), r.getBoolean(3))))
    val byKey = got.groupBy(_._1._1)
    byKey.foreach { case (_, rows) =>
      val ns = rows.map(_._2._1.toDouble)
      val mean = ns.sum / ns.length
      val sd = if (ns.length < 2) 0.0
        else math.sqrt(ns.map(x => (x - mean) * (x - mean)).sum / (ns.length - 1))
      rows.foreach { case ((k, d), (n, flag)) =>
        val expect = sd > 0 &&
          math.abs(BigDecimal((n - mean) / sd)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) >= 2.0
        assert(flag == expect, s"($k,$d): n=$n flag=$flag expect=$expect")
      }
    }
    assert(got.nonEmpty)
  }

  test("stratifiedSample takes min(quota, stratum) deterministically via TopKPerKey") {
    // TestSession is a plain session: register the strategy + rule the
    // way GraftExtensions does for real sessions (TopKRuleSpec pattern)
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
    if (!spark.experimental.extraOptimizations.contains(graft.plans.TopKRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.TopKRewriteRule
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val s1 = Corpus.stratifiedSample(docs, col("lang"), col("doc_id"), 40)
    val s2 = Corpus.stratifiedSample(docs, col("lang"), col("doc_id"), 40)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val got = s1.groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    perLang.foreach { case (lang, n) =>
      assert(got(lang) == math.min(40L, n), s"$lang: ${got(lang)} vs min(40, $n)")
    }
    val plan = s1.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"rank-dropping sample must ride the TopKPerKey rewrite:\n${plan.take(1200)}")
  }
}
