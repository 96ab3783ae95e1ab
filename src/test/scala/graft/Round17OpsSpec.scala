package graft

import graft.dedup.{Dedup, SimHash}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 surface: the d30 auto-cap query's capped branch is
  * DATA-LIVE (the planted saturated bucket provably binds, its pairs
  * are the metered recall cost, organics survive) — the r16 verdict's
  * "production posture for the self-tuning bucket cap" receipt that
  * CORRECTNESS alone can't show (a cap that never fires would also
  * hash-match an uncapped oracle). */
class Round17OpsSpec extends AnyFunSuite {
  import TestSession._

  private val tplOffset = 9000000L

  test("d30: the auto cap binds — planted pairs dropped, organics kept") {
    val out = graft.queries.DedupSim.d30AutoCap(spark, sf).cache()
    // the planted clique (|docs| identical docs = C(|docs|,2) pairs
    // uncapped) must be FULLY dropped: every one of its 7 banded
    // buckets is corpus-proportionally above the cap
    assert(out.filter(col("a_id") >= tplOffset || col("b_id") >= tplOffset)
      .count() == 0, "planted saturated-bucket pairs leaked past the cap")
    // ...and the organic near-dup pairs survive (rows>0, and the
    // exact-copy twins that agree on non-saturated buckets are found)
    val organic = out.count()
    assert(organic > 0, "capped run lost the organic pairs")
    out.unpersist()
    ()
  }

  test("d30: autoBucketCap sits between the organic p99 and the planted bucket") {
    val tplText =
      "zvq0 zvq1 zvq2 zvq3 zvq4 zvq5 zvq6 zvq7 zvq8 zvq9 zvq10 zvq11"
    val docs = Tables.documents(spark, sf)
    val tpl = docs.select((col("doc_id") + tplOffset).as("doc_id"),
        lit(tplText).as("text"), lit("zz").as("lang"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val corpus = Dedup.augmentedDocs(spark, sf).unionByName(tpl)
    val banded = SimHash.banded(corpus).localCheckpoint()
    val cap = SimHash.autoBucketCap(banded)
    val nTpl = docs.count()
    assert(cap >= 32, s"cap $cap below the floor")
    assert(cap < nTpl,
      s"cap $cap does not bind on the |docs|=$nTpl planted bucket — " +
        "the d30 capped branch would be dead (the d25 liveness lesson)")
  }
}
