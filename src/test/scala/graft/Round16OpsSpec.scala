package graft

import graft.plans.CappedCollectSet
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 contracts: the size-capped distinct collector that closed
  * m7's unbounded collect_set (the r15 verdict's item 1) — exact sets
  * for every under-cap key, a bounded saturation sentinel for df ≫
  * maxDf keys, and byte-identical m7-shaped output against the
  * uncapped pipeline on a planted boilerplate-frame corpus. */
class Round16OpsSpec extends AnyFunSuite {
  import TestSession._

  test("CappedCollectSet: exact distinct set for under-cap keys") {
    import spark.implicits._
    val df = Seq(
      ("a", 3L), ("a", 1L), ("a", 3L), ("a", 2L), // dups collapse
      ("b", 7L),
      ("c", 5L), ("c", 6L), ("c", 7L), ("c", 8L)) // exactly cap
      .toDF("k", "id").repartition(4)
    val got = df.groupBy("k")
      .agg(CappedCollectSet.cappedCollectSet(col("id"), cap = 4).as("ids"))
      .select(col("k"), array_sort(col("ids")).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") == Seq(1L, 2L, 3L))
    assert(got("b") == Seq(7L))
    assert(got("c") == Seq(5L, 6L, 7L, 8L))
  }

  test("CappedCollectSet: df >> cap saturates at cap elements (bounded buffer)") {
    import spark.implicits._
    // a boilerplate frame hash shared by 5,000 videos — the 100-TB
    // shape whose uncapped collect_set buffer was the r15 finding
    val hot = (0 until 5000).map(i => ("hot", i.toLong))
    val cold = Seq(("cold", 1L), ("cold", 2L))
    val df = (hot ++ cold).toDF("k", "id").repartition(8)
    val got = df.groupBy("k")
      .agg(CappedCollectSet.cappedCollectSet(col("id"), cap = 4).as("ids"))
      .select(col("k"), size(col("ids")).as("n"), col("ids"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getSeq[Long](2)))
      .toMap
    assert(got("hot")._1 == 4, s"saturation sentinel must be cap: ${got("hot")}")
    assert(got("hot")._2.distinct.size == 4, "saturated ids must be distinct")
    assert(got("cold")._2.sorted == Seq(1L, 2L))
  }

  test("m7 pipeline shape: capped collector output == uncapped collect_set") {
    import spark.implicits._
    // planted (id, fh) inverted index: one df=200 boilerplate hash
    // (must drop), df=2 and df=3 genuine shared frames (must keep
    // exact id sets), df=1 singletons, plus in-video duplicate
    // (id, fh) rows that the set semantics must collapse
    val rows =
      (0L until 200L).map(i => (i, "boiler")) ++
      Seq((10L, "pairA"), (11L, "pairA"), (10L, "pairA")) ++
      Seq((20L, "triB"), (21L, "triB"), (22L, "triB")) ++
      Seq((30L, "solo"))
    val df = rows.toDF("id", "fh").repartition(8)
    def pairs(agged: org.apache.spark.sql.DataFrame) = agged
      .filter(size(col("ids")).between(2, 3))
      .withColumn("sids", array_sort(col("ids")))
      .select(explode(flatten(transform(col("sids"), (x, i) =>
        transform(slice(col("sids"), i + 2, size(col("sids"))), y =>
          struct(x.as("a_id"), y.as("b_id")))))).as("p"))
      .select(col("p.a_id"), col("p.b_id"))
      .orderBy("a_id", "b_id").collect().toSeq
    val capped = pairs(df.groupBy("fh")
      .agg(CappedCollectSet.cappedCollectSet(col("id"), cap = 4).as("ids")))
    val uncapped = pairs(df.groupBy("fh")
      .agg(collect_set(col("id")).as("ids")))
    assert(capped == uncapped, s"capped=$capped uncapped=$uncapped")
    assert(capped.nonEmpty, "planted pairs must survive")
  }

  test("m7 query is live and all-pairs-free on the real corpus") {
    val df = SparkEntry.queries("m7_video_neardup")(spark, sf)
    val rows = df.collect()
    assert(rows.length > 0, "planted near-dup videos must be found")
    // the planted re-uploads (doc_id, doc_id + 1,000,000) are found
    assert(rows.exists(r =>
      r.getAs[Long]("b_id") == r.getAs[Long]("a_id") + 1000000L),
      "planted (id, id+1e6) re-upload pairs missing")
  }
}
