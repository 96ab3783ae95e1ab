package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-posture behaviors: skew salting, approximate distinct. */
class ScaleSpec extends AnyFunSuite {
  import TestSession._

  test("salted join returns exactly the plain join's rows") {
    val li = Tables.lineitem(spark, sf)
    val part = Tables.part(spark, sf).select(col("p_partkey"), col("p_name"))
    val plain = li.join(part, col("l_partkey") === col("p_partkey"))
      .agg(count(lit(1)), sum("l_quantity")).head
    val salted = Skew.saltedJoin(li, part,
        col("l_partkey"), col("p_partkey"),
        discriminator = col("l_orderkey") * 10 + col("l_linenumber"), salt = 8)
      .agg(count(lit(1)), sum("l_quantity")).head
    assert(plain == salted)
  }

  test("salted join spreads a hot key across salt buckets") {
    // all rows share one key — the pathological case
    val big = spark.range(10000).select(lit(1L).as("k"), col("id"))
    val small = spark.range(1).select(lit(1L).as("k2"), lit("dim").as("v"))
    val joined = Skew.saltedJoin(big, small, col("k"), col("k2"),
      discriminator = col("id"), salt = 8)
    assert(joined.count() == 10000)
    // the salt column distributed rows over 8 sub-keys pre-join
    val buckets = big.withColumn("__salt", pmod(hash(col("id")), lit(8)))
      .groupBy("__salt").count().count()
    assert(buckets == 8)
  }

  test("graft_hll sketch tracks exact distinct within 5% per group") {
    val li = Tables.lineitem(spark, sf)
    val r = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_partkey")).as("exact"),
      graft.plans.HllSketch.hll(col("l_partkey")).as("hll"))
    r.collect().foreach { row =>
      val exact = row.getLong(1).toDouble
      val est = row.getLong(2).toDouble
      assert(math.abs(est - exact) / exact < 0.05,
        s"group ${row.get(0)}: exact=$exact hll=$est")
    }
    // and on strings
    val r2 = Tables.documents(spark, sf).agg(
      countDistinct(col("text")).as("exact"),
      graft.plans.HllSketch.hll(col("text")).as("hll")).head
    assert(math.abs(r2.getLong(1).toDouble - r2.getLong(0)) / r2.getLong(0) < 0.05)
  }

  test("graft_freq heavy hitters hold the Misra-Gries bounds vs exact counts") {
    import org.apache.spark.sql.functions.{col, explode, split, trim, lower}
    val toks = Tables.documents(spark, sf)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
    val n = toks.count()
    val k = 32
    val exact = toks.groupBy("tok").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val sketch = toks.agg(graft.plans.FreqSketch.freq(col("tok"), k).as("f"))
      .head.getMap[String, Long](0)
    val est = sketch.keysIterator.map(i => i -> sketch(i)).toMap
    assert(est.size <= k, s"sketch exceeded capacity: ${est.size} > $k")
    val bound = n.toDouble / k
    // every true heavy hitter (count > n/k) must be present
    exact.filter(_._2 > bound).foreach { case (tok, c) =>
      assert(est.contains(tok), s"heavy hitter '$tok' (count $c > $bound) missing")
    }
    // every estimate is a lower bound, short by at most n/k
    est.foreach { case (tok, e) =>
      val t = exact(tok)
      assert(e <= t && t - e <= bound, s"'$tok': est $e vs true $t (bound $bound)")
    }
    // SQL registration round-trips
    GraftExtensions.register(spark)
    val viaSql = {
      toks.createOrReplaceTempView("freq_toks")
      spark.sql(s"SELECT graft_freq(tok, $k) FROM freq_toks").head.getMap[String, Long](0)
    }
    assert(viaSql.keysIterator.size <= k)
  }

  test("approx_count_distinct tracks exact distinct within 5% (100 TB path for q7)") {
    val li = Tables.lineitem(spark, sf)
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }
}
