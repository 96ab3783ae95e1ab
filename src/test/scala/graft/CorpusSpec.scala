package graft

import graft.dedup.Dedup
import graft.operators.Corpus
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("connectedComponents labels a multi-hop chain with its minimum id") {
    // 1-2-3-4-5 chain (diameter 4, needs several propagation rounds)
    // plus a separate 10-11 pair and an isolated-from-pairs vertex set
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (10L, 11L))
      .toDF("a_id", "b_id")
    val cc = Dedup.connectedComponents(pairs, "a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1L to 5L).forall(cc(_) == 1L), s"chain labels wrong: $cc")
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(cc.size == 7) // only vertices that appear in pairs
  }

  test("connectedComponents merges clusters bridged by one edge") {
    val pairs = Seq((1L, 2L), (3L, 4L), (2L, 3L)).toDF("a_id", "b_id")
    val cc = Dedup.connectedComponents(pairs, "a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1L to 4L).forall(cc(_) == 1L))
  }

  test("star CC matches min-propagation CC on the real pair graph") {
    val pairs = graft.dedup.Dedup.minhashLsh(
      graft.dedup.Dedup.augmentedDocs(spark, sf), k = 8, bands = 4,
      threshold = 0.8).select("a_id", "b_id").localCheckpoint(false)
    val prop = Dedup.connectedComponents(pairs, "a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val star = Dedup.connectedComponentsStar(pairs, "a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(star == prop)
  }

  test("RDD min-label loop keeps the maxIters refusal and rejects non-integral keys") {
    // r19: the loop runs on hash-partitioned pair RDDs. Contract
    // parity with the retired DataFrame loop: refuses (not silently
    // truncates) when the diameter exceeds maxIters, and refuses
    // non-integral id columns up front (the old loop's decimal
    // label-sum also rejected them, but only at runtime mid-job).
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a_id", "b_id")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, "a_id", "b_id", maxIters = 2).count()
    }
    val strings = Seq(("a", "b")).toDF("a_id", "b_id")
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(strings, "a_id", "b_id").count()
    }
  }

  test("both CC variants return empty labels on an empty pair set") {
    // a corpus/SF with zero near-dup pairs must label-propagate to
    // nothing, not NPE on the null label sum (ADVICE r3)
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.connectedComponents(empty, "a_id", "b_id").count() == 0)
    assert(Dedup.connectedComponentsStar(empty, "a_id", "b_id").count() == 0)
  }

  test("star CC keeps self-pair-only vertices as singletons") {
    val pairs = Seq((1L, 2L), (7L, 7L)).toDF("a_id", "b_id")
    val star = Dedup.connectedComponentsStar(pairs, "a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(star == Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
  }

  test("star CC converges on a 2000-hop chain where diameter-bound propagation cannot") {
    val chain = spark.range(2000)
      .selectExpr("id AS a_id", "id + 1 AS b_id")
    // min propagation: needs ~diameter rounds — refuses at maxIters
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, "a_id", "b_id", maxIters = 10).count()
    }
    // star: O(log^2 n) rounds
    val star = Dedup.connectedComponentsStar(chain, "a_id", "b_id")
    assert(star.count() == 2001)
    assert(star.filter(col("cluster_id") =!= 0L).count() == 0)
  }

  test("d8 clusters hold the planted near-dup triples and keep one canonical per cluster") {
    val df = SparkEntry.queries("d8_cluster")(spark, sf).cache()
    val byCluster = df.groupBy("cluster_id")
      .agg(count(lit(1)).as("n"),
        sum(col("is_canonical").cast("int")).as("n_canon"))
    // exactly one canonical member per cluster
    assert(byCluster.filter(col("n_canon") =!= 1).count() == 0)
    // every exact copy (id+2M) must share its original's cluster
    val m = df.select("doc_id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val nDocs = Tables.documents(spark, sf).count()
    assert((0L until nDocs).forall(i => m(i + Dedup.ExactOffset) == m(i)))
    // canonical id is the min member id
    val minOk = df.groupBy("cluster_id").agg(min("doc_id").as("mn"))
      .filter(col("cluster_id") =!= col("mn")).count()
    assert(minOk == 0)
    df.unpersist()
    ()
  }

  test("hashSplit is deterministic, exhaustive, and roughly proportional") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val s1 = Corpus.hashSplit(docs, col("doc_id"), 90, 5)
    val s2 = Corpus.hashSplit(docs, col("doc_id"), 90, 5)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    val counts = s1.groupBy("split").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val n = docs.count()
    assert(counts.values.sum == n)
    assert(counts("train") > n * 8 / 10, s"train too small: $counts")
    assert(counts.getOrElse("val", 0L) > 0 && counts.getOrElse("test", 0L) > 0)
  }

  test("hashSplit assignment is stable under corpus growth") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val half = docs.filter(col("doc_id") % 2 === 0)
    val fromHalf = Corpus.hashSplit(half, col("doc_id"), 90, 5)
    val fromFull = Corpus.hashSplit(docs, col("doc_id"), 90, 5)
      .filter(col("doc_id") % 2 === 0)
    assert(fromHalf.exceptAll(fromFull).isEmpty)
  }

  test("shuffleShards is a reproducible permutation with bounded shards") {
    val df = SparkEntry.queries("p3_shuffle")(spark, sf).cache()
    val n = Tables.documents(spark, sf).count()
    assert(df.count() == n) // a permutation: nothing lost or duplicated
    assert(df.select("doc_id").distinct().count() == n)
    // (shard_id, shard_pos) is a unique dense address
    val shards = df.groupBy("shard_id")
      .agg(count(lit(1)).as("c"), min("shard_pos").as("mn"),
        max("shard_pos").as("mx"), countDistinct("shard_pos").as("d"))
      .collect()
    assert(shards.length == 8)
    shards.foreach { r =>
      assert(r.getInt(2) == 1 && r.getInt(3) == r.getLong(1).toInt
        && r.getLong(4) == r.getLong(1), s"shard address not dense: $r")
    }
    // the order is actually shuffled: doc_id order and shuffle order
    // disagree somewhere within a shard
    val monotone = df.filter(col("shard_id") === 0).orderBy("shard_pos")
      .select("doc_id").collect().map(_.getLong(0))
    assert(monotone.length < 2 || !monotone.sameElements(monotone.sorted))
    df.unpersist()
    ()
  }

  test("mixtureSample realizes the weights and is deterministic") {
    val df = SparkEntry.queries("p4_mixture")(spark, sf).cache()
    val bySource = df.groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val per = Tables.documents(spark, sf)
      .groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // upsampled source emits between floor(w) and ceil(w) per doc
    assert(bySource("src0") >= 2 * per("src0") && bySource("src0") <= 3 * per("src0"))
    // downsampled source keeps a strict subset
    assert(bySource.getOrElse("src1", 0L) < per("src1"))
    // pass-through sources emit exactly once
    assert(bySource("src2") == per("src2"))
    // copies of one doc are distinct rows
    val dup = df.groupBy("doc_id", "source", "copy_id").count()
      .filter(col("count") > 1).count()
    assert(dup == 0)
    df.unpersist()
    ()
  }

  test("packSequencesSharded holds the packing contract per (key, shard)") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        graft.text.TextAnalysis.nTokens(col("text")).as("n_tokens"))
    val packed = Corpus.packSequencesSharded(docs,
      col("lang"), col("doc_id"), col("n_tokens"), budget = 1000L,
      nShards = 4).cache()
    assert(packed.count() == docs.count()) // partition of the corpus
    val chunks = packed.groupBy("lang", "pack_shard", "chunk_id")
      .agg(sum("n_tokens").as("tok"),
        max(col("n_tokens").cast("long")).as("mx"), count(lit(1)).as("n"))
      .collect()
    chunks.foreach { r =>
      assert(r.getLong(3) <= 1000L + r.getLong(4), s"over budget: $r")
      assert(r.getLong(5) >= 1)
    }
    // parallel streams: more (lang, shard) windows than langs
    val nStreams = packed.select("lang", "pack_shard").distinct().count()
    val nLangs = packed.select("lang").distinct().count()
    assert(nStreams > nLangs)
    // ids dense per stream
    packed.groupBy("lang", "pack_shard")
      .agg(min("chunk_id").as("mn"), max("chunk_id").as("mx"),
        countDistinct("chunk_id").as("d")).collect()
      .foreach { r =>
        assert(r.getLong(2) == 0L && r.getLong(4) == r.getLong(3) + 1,
          s"chunk ids not dense: $r")
      }
    packed.unpersist()
    ()
  }

  test("corpus operator plans have the right shuffle shape") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source")
    // hashSplit: pure map — zero exchanges
    val p1 = Corpus.hashSplit(docs.select("doc_id"), col("doc_id"), 90, 5)
      .queryExecution.executedPlan.toString
    assert(!p1.contains("Exchange"), s"hashSplit must be map-only:\n$p1")
    // shuffleShards: exactly one hash exchange (the per-shard window)
    val p3 = Corpus.shuffleShards(docs.select("doc_id"), col("doc_id"), 8)
      .queryExecution.executedPlan.toString
    assert(p3.split("Exchange").length - 1 == 1,
      s"shuffleShards must shuffle exactly once:\n$p3")
    assert(!p3.contains("SinglePartition"),
      "shuffleShards must never collapse to one partition")
    // mixtureSample: weights come in via broadcast, never a shuffle join
    val p4 = Corpus.mixtureSample(docs, col("doc_id"), col("source"),
        Map("src0" -> 2.5, "src1" -> 0.25), 1.0)
      .queryExecution.executedPlan.toString
    assert(p4.contains("BroadcastHashJoin"), s"weights not broadcast:\n$p4")
    assert(!p4.contains("SortMergeJoin"))
  }

  test("packSequences chunks respect the token budget contract") {
    val packed = SparkEntry.queries("p2_pack")(spark, sf).cache()
    val chunks = packed.groupBy("lang", "chunk_id")
      .agg(sum("n_tokens").as("tok"), max(col("n_tokens").cast("long")).as("mx"),
        count(lit(1)).as("n"))
      .collect()
    // every chunk is nonempty and no chunk exceeds budget + one doc
    // (a doc lands where its first token falls, so it may straddle)
    chunks.foreach { r =>
      val tok = r.getLong(2); val mx = r.getLong(3)
      assert(tok <= 1000L + mx, s"chunk over budget: $r")
      assert(r.getLong(4) >= 1)
    }
    // chunk ids are dense per lang starting at 0
    val ids = packed.groupBy("lang").agg(
      min("chunk_id").as("mn"), max("chunk_id").as("mx"),
      countDistinct("chunk_id").as("d")).collect()
    ids.foreach { r =>
      assert(r.getLong(1) == 0L)
      assert(r.getLong(3) == r.getLong(2) + 1, s"chunk ids not dense: $r")
    }
    packed.unpersist()
    ()
  }

  test("packBinsFFD: contract holds and fill beats arrival-order next-fit") {
    val budget = 600L
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"))
    val bins = Corpus.packBinsFFD(docs, col("doc_id"), col("n_chars"),
      budget, nShards = 4).cache()
    // every doc exactly once
    assert(bins.count() == docs.count())
    assert(bins.select("doc_id").distinct().count() == docs.count())
    // no bin overfilled, except a singleton holding one oversize doc
    val over = bins.groupBy("pack_shard", "bin_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n"))
      .filter(col("fill") > budget && col("n") > 1).count()
    assert(over == 0, "multi-doc bin over budget")
    // dense bin ids per shard
    bins.groupBy("pack_shard")
      .agg(min("bin_id").as("mn"), max("bin_id").as("mx"),
        countDistinct("bin_id").as("d")).collect()
      .foreach { r =>
        assert(r.getLong(1) == 0L && r.getLong(3) == r.getLong(2) + 1,
          s"bin ids not dense: $r")
      }
    // FFD's reason to exist: fewer bins (= less padding waste) than
    // placing items in arrival order and closing a bin when the next
    // item doesn't fit (next-fit), computed per shard sequentially
    val items = bins.select("pack_shard", "doc_id", "n_tokens").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val nextFitBins = items.groupBy(_._1).map { case (_, rows) =>
      var n = 0; var room = 0L
      rows.sortBy(_._2).foreach { case (_, _, t) =>
        if (t <= room) room -= t
        else { n += 1; room = math.max(0L, budget - t) }
      }
      n
    }.sum
    val ffdBins = bins.select("pack_shard", "bin_id").distinct().count()
    assert(ffdBins <= nextFitBins,
      s"FFD used $ffdBins bins vs next-fit's $nextFitBins")
    // determinism across physical partitionings
    val again = Corpus.packBinsFFD(docs.repartition(7), col("doc_id"),
      col("n_chars"), budget, nShards = 4)
    assert(bins.exceptAll(again).isEmpty && again.exceptAll(bins).isEmpty,
      "packing depends on physical partitioning")
    bins.unpersist()
    ()
  }

  test("lengthBucketedBatches: manifest invariants and the padding win") {
    import graft.text.TextAnalysis
    val docs = Tables.documents(spark, sf)
    val tokens = TextAnalysis.nTokens(col("text")).cast("long")
    val m = Corpus.lengthBucketedBatches(docs, col("doc_id"), tokens,
      boundaries = Seq(25, 50, 75), batchSize = 32).cache()
    // conservation: every doc lands in exactly one batch
    assert(m.agg(org.apache.spark.sql.functions.sum("n_docs")).head.getLong(0)
      == docs.count())
    // size cap + the waste identity per batch
    assert(m.filter(col("n_docs") > 32 ||
      col("pad_tokens") =!= col("n_docs") * col("max_tokens") - col("sum_tokens"))
      .count() == 0)
    // all four tiers live on the real corpus
    assert(m.select("len_bucket").distinct().count() == 4)
    // the recipe's reason to exist: bucketing pads less than batching
    // the same stream unbucketed (one tier, same batch size)
    val flat = Corpus.lengthBucketedBatches(docs, col("doc_id"), tokens,
      boundaries = Seq(0), batchSize = 32)
    val bucketedWaste = m.agg(org.apache.spark.sql.functions.sum("pad_tokens"))
      .head.getLong(0)
    val flatWaste = flat.agg(org.apache.spark.sql.functions.sum("pad_tokens"))
      .head.getLong(0)
    assert(bucketedWaste < flatWaste,
      s"bucketing must pad less: $bucketedWaste !< $flatWaste")
    m.unpersist()
    // the 100 TB composition: batchAssignScalable within tiers keeps
    // the cap and conservation (ids differ — boundaries still hold)
    val bucket = Seq(25, 50, 75).map(b =>
      when(tokens >= b, 1).otherwise(0)).reduce(_ + _)
    val scalable = graft.operators.Harvest.batchAssignScalable(
        docs.select(col("doc_id"), tokens.as("nt"), bucket.as("len_bucket")),
        Seq(col("len_bucket")), col("doc_id"), recordsPerFile = 32)
      .groupBy("len_bucket", "file_idx")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
    assert(scalable.filter(col("n") > 32).count() == 0)
    assert(scalable.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
      == docs.count())
  }
}
