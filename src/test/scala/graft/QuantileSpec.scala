package graft

import graft.plans.QuantileSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KLL/MRL quantile sketch: exactness when capacity ≥ n (the oracled
  * e12 path), bounded rank error under real compaction on data well
  * past capacity, merge correctness across many partitions, and
  * run-determinism (the derandomized compactor parity). */
class QuantileSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private val pcts = Seq(50, 90, 99)

  /** True rank (1-indexed count of values ≤ v) in the sorted data. */
  private def rankOf(sorted: Array[Double], v: Double): Long =
    sorted.count(_ <= v).toLong

  test("capacity >= n returns the exact discrete order statistic") {
    // adversarial-ish values: clustered + outliers, shuffled determinist
    val xs = (1 to 3000).map(i => ((i * 2654435761L) % 997).toDouble / 7.0)
    val got = xs.toDF("v").repartition(8)
      .agg(QuantileSketch.quantiles(col("v"), k = 4096, pcts = pcts).as("q"))
      .head().getSeq[Double](0)
    val sorted = xs.sorted.toArray
    val want = pcts.map { p =>
      sorted(((p.toLong * xs.length + 99L) / 100L - 1L).toInt)
    }
    assert(got == want, s"got $got want $want")
  }

  test("small capacity on 60k values: rank error within 2% of n") {
    val n = 60000
    val xs = (1 to n).map(i => ((i * 40503L) % 65536).toDouble)
    val sorted = xs.sorted.toArray
    val got = xs.toDF("v").repartition(16)
      .agg(QuantileSketch.quantiles(col("v"), k = 256, pcts = pcts).as("q"))
      .head().getSeq[Double](0)
    pcts.zip(got).foreach { case (p, est) =>
      val target = (p.toLong * n + 99L) / 100L
      val err = math.abs(rankOf(sorted, est) - target)
      assert(err <= n / 50,
        s"p$p: estimate $est has rank error $err (> ${n / 50}) of n=$n")
    }
  }

  test("merge across partitions equals the single-partition sketch (exact path)") {
    val xs = (1 to 2000).map(i => ((i * 48271L) % 10007).toDouble)
    def run(parts: Int) = xs.toDF("v").repartition(parts)
      .agg(QuantileSketch.quantiles(col("v"), k = 4096, pcts = pcts).as("q"))
      .head().getSeq[Double](0)
    assert(run(1) == run(32))
  }

  test("run-deterministic under compaction (derandomized parity)") {
    val xs = (1 to 20000).map(i => ((i * 16807L) % 32003).toDouble)
    def run() = xs.toDF("v").coalesce(1)
      .agg(QuantileSketch.quantiles(col("v"), k = 128, pcts = pcts).as("q"))
      .head().getSeq[Double](0)
    assert(run() == run())
  }

  test("all-null and empty groups yield null, never a crash") {
    val df = Seq(("a", Some(1.0)), ("b", None)).toDF("g", "v")
    val rows = df.groupBy("g")
      .agg(QuantileSketch.quantiles(col("v"), k = 64, pcts = Seq(50)).as("q"))
      .orderBy("g").collect()
    assert(rows(0).getSeq[Double](1) == Seq(1.0))
    assert(rows(1).isNullAt(1))
  }

  test("SQL registration: graft_quantiles(col, k, 'pcts')") {
    GraftExtensions.register(spark)
    val xs = (1 to 500).map(_.toDouble)
    xs.toDF("v").createOrReplaceTempView("qs_vals")
    val got = spark.sql(
      "SELECT graft_quantiles(v, 1024, '50,99') AS q FROM qs_vals")
      .head().getSeq[Double](0)
    assert(got == Seq(250.0, 495.0))
  }
}
