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

  // ---- pigeonhole bucket cap (d4/m5 skew guard, r15 verdict #4) ----

  test("d4 bucket cap: drops only saturated-bucket pairs, keeps genuine recall") {
    import spark.implicits._
    // 120 IDENTICAL templated docs hash to ONE simhash, so every one
    // of its 7 chunk buckets holds all 120 copies — the boilerplate
    // saturation shape whose pair generation is O(bucket²). Genuine
    // docs: two exact-dup pairs with distinctive text (bucket size 2).
    val tpl = "common boilerplate navigation header licence footer " +
      "terms of use all rights reserved subscribe newsletter cookie"
    val g1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    val g2 = "colorless green ideas sleep furiously while the archive harvest proceeds"
    val docs = ((0 until 120).map(i => (10000L + i, tpl)) ++
      Seq((1L, g1), (2L, g1), (3L, g2), (4L, g2)))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairSet(graft.dedup.SimHash.nearDupPairs(docs, 6))
    val capped = pairSet(graft.dedup.SimHash.nearDupPairs(docs, 6,
      maxBucket = Some(40)))
    val isTpl = (id: Long) => id >= 10000L
    // precondition: the genuine pairs exist and are not template-keyed
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((3L, 4L)))
    // exact semantics: capped = uncapped minus saturated-only pairs
    assert(capped == uncapped.filterNot(p => isTpl(p._1) && isTpl(p._2)),
      s"cap must drop exactly the template-template pairs: " +
        s"capped=${capped.size} uncapped=${uncapped.size}")
    assert(capped.contains((1L, 2L)) && capped.contains((3L, 4L)),
      "genuine pairs must survive the cap")
    // the bound itself: no post-cap bucket exceeds the cap
    val maxBucket = graft.dedup.SimHash.capBuckets(
        graft.dedup.SimHash.banded(docs), 40)
      .groupBy("c", "v").count().agg(max("count")).head.getLong(0)
    assert(maxBucket <= 40L, s"post-cap bucket of $maxBucket")
  }

  test("autoBucketCap: self-tuned cap drops the saturated bucket, keeps genuine pairs") {
    import spark.implicits._
    // realistic mix: the sf0.01 corpus (its banded buckets are the
    // tight near-uniform distribution the p99 derivation assumes) +
    // one 120-copy template family (an extreme outlier far above
    // p99) + a distinctive exact-dup genuine pair
    val corpus = Tables.documents(spark, "/root/testdata/sf0.01")
      .select("doc_id", "text")
    val tpl = "common boilerplate navigation header licence footer " +
      "terms of use all rights reserved subscribe newsletter cookie"
    val g = "the quick brown fox jumps over the lazy dog near the river bank today"
    val extra = ((0 until 120).map(i => (8000000L + i, tpl)) ++
      Seq((9000001L, g), (9000002L, g))).toDF("doc_id", "text")
    val docs = corpus.unionByName(extra)
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val banded = graft.dedup.SimHash.banded(docs).localCheckpoint()
    val cap = graft.dedup.SimHash.autoBucketCap(banded)
    assert(cap >= 32 && cap < 120,
      s"derived cap $cap must sit between the floor and the 120-copy bucket")
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = pairSet(graft.dedup.SimHash.nearDupPairsAuto(docs, 6))
    val explicit = pairSet(graft.dedup.SimHash.nearDupPairs(docs, 6,
      maxBucket = Some(cap)))
    assert(auto == explicit,
      "auto path must equal the explicit-cap path at the derived cap")
    assert(auto.contains((9000001L, 9000002L)), "genuine pair must survive")
    assert(!auto.exists(p => p._1 >= 8000000L && p._1 < 9000000L
      && p._2 >= 8000000L && p._2 < 9000000L),
      "template-template pairs must be dropped by the derived cap")
  }

  test("m5 phash bucket cap: saturated payload bucket dropped, genuine pair kept") {
    import spark.implicits._
    val tplPay = ("zqzq" * 40) // identical payloads → one phash
    val gPay = "The Archive Quarterly Report volume nine covers harvest statistics " +
      "and validation outcomes for the year with appendices"
    val rows = (0 until 100).map(i => (5000L + i, tplPay)) ++
      Seq((1L, gPay), (2L, gPay))
    val hashed = rows.toDF("id", "text")
      .select(col("id"), graft.multimodal.Multimodal
        .blockHash60(col("text").cast("binary")).as("ph"))
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(graft.multimodal.Multimodal
      .phashNearDupPairs(hashed, "id", "ph", maxHamming = 5))
    val capped = pairs(graft.multimodal.Multimodal
      .phashNearDupPairs(hashed, "id", "ph", maxHamming = 5,
        maxBucket = Some(40)))
    assert(uncapped.contains((1L, 2L)))
    assert(capped == uncapped.filterNot(p => p._1 >= 5000L && p._2 >= 5000L),
      s"cap must drop exactly the template pairs: ${capped.size} vs ${uncapped.size}")
    assert(capped.contains((1L, 2L)), "genuine pair must survive")
  }

  // ---- BloomFront: the native state-scan filter (r15 items 5/7) ----

  test("BloomFront: fpp scales with state size, bits bounded, no false negatives") {
    import graft.streaming.BloomFront
    // fpp: base until state outgrows batch/base, then batch/state
    assert(BloomFront.scaledFpp(0.01, 1000, 0) == 0.01)
    assert(BloomFront.scaledFpp(0.01, 1000, 50000) == 0.01) // 1000/50k = 0.02 > base
    assert(BloomFront.scaledFpp(0.01, 1000, 1000000) == 0.001) // leak pinned at <= batch
    assert(BloomFront.scaledFpp(0.01, 1000, Long.MaxValue) == 1e-8) // floor
    // bits: monotone in n and in -log fpp, capped at the 8 MB ceiling
    assert(BloomFront.bits(1000, 0.01) < BloomFront.bits(10000, 0.01))
    assert(BloomFront.bits(1000, 0.01) < BloomFront.bits(1000, 0.0001))
    assert(BloomFront.bits(Long.MaxValue / 2, 1e-8) == BloomFront.maxBits)
    // end-to-end: every inserted key passes (no false negatives — the
    // exactness contract), and a disjoint probe set leaks ~fpp
    import spark.implicits._
    val keys = (0L until 5000L).toDF("g")
    val bf = BloomFront.build(keys, col("g"), 5000L, 0.01)
    assert(keys.filter(BloomFront.probe(bf, col("g"))).count() == 5000L)
    val disjoint = (1000000L until 1100000L).toDF("g")
    val fp = disjoint.filter(BloomFront.probe(bf, col("g"))).count()
    assert(fp < 3000L, s"fpp blowout: $fp of 100k disjoint keys passed")
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
