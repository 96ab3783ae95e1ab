package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-management operators for a training-data pipeline: the
  * steps between "deduplicated documents" and "training shards".
  *
  * Scale posture: `hashSplit` is a pure map (no shuffle, no state,
  * no RNG) — the split decision is a deterministic function of the
  * document id, so it is stable under re-runs, re-partitioning, and
  * incremental appends (a new document never moves an old one
  * between splits, the property `sample(fraction)` does NOT give).
  * `packSequences` is one window aggregation per (partition key):
  * the running-token-total layout every sequence-packing trainer
  * needs, parallel across keys.
  */
object Corpus {

  /** Deterministic train/val/test assignment by id hash.
    * bucket = h32("split:" + id) mod 100; split boundaries are
    * cumulative percentages (e.g. 90/5 → train <90, val <95, test
    * the rest). Engine-portable: the same md5-derived bucket is
    * reproducible in any engine (oracle mirror in queries.PipelineQ).
    */
  def hashSplit(df: DataFrame, idCol: Column,
      pctTrain: Int, pctVal: Int): DataFrame = {
    require(pctTrain + pctVal < 100, "train+val must leave room for test")
    val bucket = pmod(Hashing.h32(7, idCol.cast("string")), lit(100))
    df.withColumn("bucket", bucket.cast("int"))
      .withColumn("split",
        when(col("bucket") < pctTrain, "train")
          .when(col("bucket") < pctTrain + pctVal, "val")
          .otherwise("test"))
  }

  /** Deterministic corpus shuffle, sharded: shard = id-hash mod
    * nShards, position within shard = rank of the hash. Training
    * readers stream shards in shard_pos order and see a reproducible
    * pseudorandom document order with NO global sort — the only
    * shuffle is the one window per shard, and shard count (not corpus
    * size) bounds each window. The classic scale trap this avoids is
    * `row_number() OVER (ORDER BY rand())`: a single-partition total
    * sort with non-reproducible output. */
  def shuffleShards(df: DataFrame, idCol: Column, nShards: Int): DataFrame = {
    val key = Hashing.h32(11, idCol.cast("string"))
    df.withColumn("shuffle_key", key)
      .withColumn("shard_id", pmod(col("shuffle_key"), lit(nShards)).cast("int"))
      .withColumn("shard_pos", row_number().over(
        Window.partitionBy(col("shard_id"))
          .orderBy(col("shuffle_key"), idCol)))
  }

  /** Weighted mixture construction: each document is emitted
    * ⌊w⌋ + Bernoulli(frac(w)) times, where w is its source's mixture
    * weight (w > 1 upsamples by repetition, w < 1 downsamples) and
    * the Bernoulli draw is the deterministic id-hash bucket — so the
    * realized mixture is reproducible and append-stable, and expected
    * proportions match the weights exactly. Weights join in by a
    * broadcast (the weight table is per-source, always tiny); the
    * explode is map-side. Output gains `copy_id` (1-based). */
  def mixtureSample(df: DataFrame, idCol: Column, sourceCol: Column,
      weights: Map[String, Double], defaultWeight: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.toDF("mix_source", "mix_w")
    val bucket = pmod(
      Hashing.h32(13, concat(sourceCol, lit(":"), idCol.cast("string"))),
      lit(10000))
    val w = coalesce(col("mix_w"), lit(defaultWeight))
    val nCopies = (floor(w).cast("int")
      + when(bucket < (w - floor(w)) * 10000, 1).otherwise(0))
    df.join(broadcast(wdf), sourceCol === col("mix_source"), "left")
      .withColumn("n_copies", nCopies)
      // filter before sequence: sequence(1, 0) would COUNT DOWN
      .filter(col("n_copies") >= 1)
      .withColumn("copy_id", explode(sequence(lit(1), col("n_copies"))))
      .drop("mix_source", "mix_w", "n_copies")
  }

  /** Token-budget sequence packing: within each `keyCol` stream,
    * documents (ordered by `orderCol`, which must be unique per key)
    * are laid out contiguously and cut into chunks of ~`budget`
    * tokens: chunk = floor(running_total_before_doc / budget).
    * A document lands in the chunk where its first token falls, so
    * every chunk holds ≥1 document and chunk boundaries never depend
    * on physical partitioning — only on the (key, order) layout.
    *
    * At 100 TB the window partitions by `keyCol`; if one key's stream
    * is unboundedly large, compose a shard column into `keyCol`
    * (hash-bucket of the order key) to bound each window's size —
    * chunk ids then nest as (key, shard, chunk). */
  def packSequences(df: DataFrame, keyCol: Column, orderCol: Column,
      tokensCol: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(tokensCol).over(w))
      .withColumn("chunk_id",
        floor((col("cum_tokens") - tokensCol) / budget).cast("long"))
  }

  /** Packed-sequence SPAN MANIFEST — the attention-mask artifact a
    * packed-pretraining pipeline materializes next to the packing
    * itself: for every document [[packSequences]] placed, WHERE it
    * sits inside its pack (token offset + length + position in the
    * pack's document order) and how long the pack is. Trainers
    * consume exactly this to build block-diagonal attention masks
    * and reset position ids at document boundaries; without it a
    * packed batch silently lets attention bleed across documents.
    *
    * Pure integer arithmetic on the packing's own columns: a pack's
    * base offset is the minimum (cum − n) inside it, each document's
    * span starts at (cum − n) − base and runs `tokensCol` tokens.
    * Scale: the added windows key on (key, chunk) — a SUBSET-spec
    * refinement of the packing's own key partitioning, so Spark
    * reuses the one exchange (hashPartitioning(key) satisfies the
    * (key, chunk) clustering); nothing new shuffles. */
  def packSpanManifest(df: DataFrame, keyCol: Column, orderCol: Column,
      tokensCol: Column, budget: Long): DataFrame = {
    val packed = packSequences(df, keyCol, orderCol, tokensCol, budget)
      .withColumn("__sa", (col("cum_tokens") - tokensCol).cast("long"))
    val wp = Window.partitionBy(keyCol, col("chunk_id"))
    val wo = Window.partitionBy(keyCol, col("chunk_id")).orderBy(orderCol)
    packed
      .withColumn("span_start",
        (col("__sa") - min(col("__sa")).over(wp)).cast("long"))
      .withColumn("span_len", tokensCol.cast("long"))
      .withColumn("seq_idx", row_number().over(wo))
      .withColumn("pack_tokens", sum(tokensCol).over(wp).cast("long"))
      .drop("__sa")
  }

  /** The 100 TB form of packSequences: a hash shard of the order key
    * is composed into the window key, so parallelism is
    * |keys| × nShards and no single window ever holds a whole key's
    * stream (a 5-language corpus would otherwise pack on 5 threads).
    * Chunk ids nest as (key, pack_shard, chunk_id); the packing
    * contract — every chunk nonempty, ≤ budget + one straddling doc,
    * ids dense from 0 — holds per (key, shard) exactly as the
    * unsharded contract holds per key. Same twin relationship as
    * Harvest.batchAssignScalable to h5. */
  def packSequencesSharded(df: DataFrame, keyCol: Column, orderCol: Column,
      tokensCol: Column, budget: Long, nShards: Int): DataFrame = {
    val sharded = df.withColumn("pack_shard",
      pmod(Hashing.h32(17, orderCol.cast("string")), lit(nShards)).cast("int"))
    packSequences(sharded, struct(keyCol, col("pack_shard")),
      orderCol, tokensCol, budget)
  }

  /** Length-bucketed dynamic batching — the third training-shard
    * shape next to [[packSequences]] (concatenate + split) and
    * [[packBinsFFD]] (bin-pack): keep documents whole AND unconcat —
    * every batch pads to its own longest member, so grouping
    * like-length documents is what contains the waste (the
    * bucketed-batching recipe sequence trainers default to). Tier
    * boundaries are explicit integer thresholds — pure comparisons,
    * engine-exact (floor(log2(n)) double math ties differently per
    * engine near powers of two); bucket id = #boundaries ≤ n_tokens.
    * Batches form within a bucket in id order
    * ([[Harvest.batchAssign]]'s deterministic row-number shape; at
    * 100 TB compose [[Harvest.batchAssignScalable]]'s hash-sharded
    * twin exactly as h5 does). Output is the batch MANIFEST — one
    * row per (bucket, batch): doc count, max/sum tokens, and the
    * batch's padding waste n_docs·max − sum, the number the recipe
    * exists to minimize. Scale: one bounded window per bucket (or
    * sharded), then a hash agg on O(|batches|) groups. */
  def lengthBucketedBatches(df: DataFrame, idCol: Column, tokensCol: Column,
      boundaries: Seq[Int], batchSize: Int): DataFrame = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted,
      s"boundaries must be ascending, got $boundaries")
    val bucket = boundaries.map(b =>
      when(tokensCol >= b, 1).otherwise(0)).reduce(_ + _)
    Harvest.batchAssign(
        df.select(idCol.as("id"), tokensCol.as("n_tokens"),
          bucket.as("len_bucket")),
        Seq(col("len_bucket")), col("id"), batchSize)
      .groupBy(col("len_bucket"), col("file_idx").as("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max("n_tokens").as("max_tokens"),
        sum("n_tokens").as("sum_tokens"))
      .withColumn("pad_tokens",
        col("n_docs") * col("max_tokens") - col("sum_tokens"))
  }

  /** First-fit-decreasing bin packing — the PADDED-batch packing
    * contract, the other training-shard shape next to
    * [[packSequences]]: documents never split across sequences, so
    * each bin's unused tail is PADDING WASTE and the packer's job is
    * to minimize it. FFD (sort descending, place each item in the
    * first bin with room) is the classic offline heuristic
    * (≤ 11/9·OPT + 6/9 bins, Johnson 1973); packSequences' straddling
    * stream has zero waste by construction but splits documents —
    * pick by whether the training recipe masks cross-document
    * attention or pads.
    *
    * Scale shape: the corpus hash-shards on the id (same contract as
    * [[packSequencesSharded]]), each (shard) group's items ship to
    * ONE task via groupByKey and the sequential FFD runs in-memory
    * per group — nShards bounds group size, bins never cross shards,
    * and determinism is total ((tokens desc, id asc) placement
    * order, first-fit index). Oversize documents (> budget) get a
    * singleton bin. Output: (doc_id, n_tokens, pack_shard, bin_id)
    * with bin ids dense from 0 per shard. */
  def packBinsFFD(df: DataFrame, idCol: Column, tokensCol: Column,
      budget: Long, nShards: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(idCol.cast("long").as("id"),
        tokensCol.cast("long").as("n_tokens"))
      .withColumn("pack_shard",
        pmod(Hashing.h32(17, col("id").cast("string")), lit(nShards)).cast("int"))
      .as[(Long, Long, Int)]
      .groupByKey(_._3)
      .flatMapGroups { (shard, it) =>
        val sorted = it.toSeq.sortBy { case (id, t, _) => (-t, id) }
        val remaining = scala.collection.mutable.ArrayBuffer.empty[Long]
        sorted.iterator.map { case (id, t, _) =>
          val fit = if (t <= budget) remaining.indexWhere(_ >= t) else -1
          val bin =
            if (fit >= 0) { remaining(fit) -= t; fit }
            else {
              remaining += (if (t >= budget) 0L else budget - t)
              remaining.size - 1
            }
          (id, t, shard, bin.toLong)
        }
      }
      .toDF("doc_id", "n_tokens", "pack_shard", "bin_id")
  }

  /** Temperature rebalancing downsample (α = 1/2, the Pile/ROOTS-
    * style domain rebalance): acceptance rate per domain s is
    * r_s = √(n_min/n_s), so the realized mixture flattens toward the
    * smallest domain (expected kept = √(n_min·n_s)) — the
    * data-DERIVED-weights sibling of mixtureSample's explicit
    * weights. The Bernoulli draw is exact INTEGER arithmetic: with
    * h = id-hash mod 2²⁰, keep ⟺ h²·n_s < n_min·2⁴⁰ — squaring the
    * inequality removes the square root entirely (IEEE sqrt/pow can
    * differ in the last ulp across engines). The cross-multiply runs
    * in DECIMAL(38,0) (exact, codegen'd; DuckDB twin uses HUGEINT):
    * h² < 2⁴⁰ times n_s ≤ 2⁶³ stays under 2¹⁰³ ≪ 10³⁸, so the
    * comparison is exact for ANY int64 domain size — signed-64
    * arithmetic would wrap silently once a domain passes 2²³ (~8.4M)
    * rows, exactly the 100 TB regime this targets.
    * Counts come from one groupBy (per-domain, tiny, broadcast back);
    * n_min is a one-row stats read (the x7 pattern). Deterministic,
    * append-stable per domain snapshot. */
  def temperatureSample(df: DataFrame, sourceCol: Column, idCol: Column): DataFrame = {
    val counts = df.groupBy(sourceCol.as("ts_source"))
      .agg(count(lit(1)).as("n_s"))
    // n_min folded into the counts frame (r19 double-action sweep):
    // the separate agg(min).head() action cost a SECOND full
    // scan+groupBy of df per execution (counts was recomputed for the
    // action and again for the join side). An unpartitioned window-min
    // over the already-aggregated per-domain frame — tiny by contract,
    // one row per domain — yields the same exact long inside the one
    // plan: one counts pass, one action, identical kept bits.
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val countsW = counts.withColumn("n_min", min("n_s").over(wAll))
    val h = pmod(
      Hashing.h32(29, concat(sourceCol, lit(":"), idCol.cast("string"))),
      lit(1L << 20))
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    df.join(broadcast(countsW), sourceCol === col("ts_source"))
      .withColumn("kept",
        (h * h).cast(big) * col("n_s").cast(big) <
          col("n_min").cast(big) * lit(1L << 40).cast(big))
      .drop("ts_source", "n_min")
  }

  /** Deterministic stratified sample: exactly min(nPer, |stratum|)
    * rows per stratum, chosen by md5-hash rank of the id — a
    * reproducible fixed-size-panel draw with no RNG (rerunning over
    * the same corpus picks the same rows; hashSplit/mixtureSample
    * are the rate-based siblings and stay append-stable, a
    * fixed-SIZE panel by construction cannot be). The rank-dropping
    * row_number shape auto-rewrites to TopKPerKey (bounded heap per
    * stratum, no per-stratum global sort) — one shuffle on the
    * stratum key regardless of corpus size. */
  def stratifiedSample(df: DataFrame, strataCol: Column, idCol: Column,
      nPer: Int): DataFrame = {
    require(nPer >= 1, s"nPer must be >= 1, got $nPer")
    val h = md5(concat(lit("strat:"), idCol.cast("string")))
    val w = Window.partitionBy(strataCol).orderBy(h, idCol)
    df.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= nPer)
      .drop("__r")
  }

  /** Per-domain document cap — the web-corpus pass that keeps any one
    * domain/source from dominating the training mix (boilerplate
    * farms, mirrors, crawler traps). Unlike [[stratifiedSample]] this
    * is an AUDIT pass: every row survives, gaining the domain's total
    * count, the document's deterministic in-domain rank (md5-hash
    * order, so which docs survive the cap is reproducible and
    * unbiased by id assignment), and the `kept` verdict — so the drop
    * decision is inspectable and the same frame feeds both the kept
    * corpus (filter) and the drop report (its complement), exactly
    * the v1/v2 validate split applied to domain skew.
    *
    * One shuffle on the domain key serves both windows (rank + count
    * share the partitioning); the hot-domain window is a bounded
    * rank/count, never a collect. */
  def domainCap(df: DataFrame, domainCol: Column, idCol: Column,
      maxPerDomain: Int): DataFrame = {
    require(maxPerDomain >= 1, s"maxPerDomain must be >= 1, got $maxPerDomain")
    val h = md5(concat(lit("domcap:"), idCol.cast("string")))
    val wRank = Window.partitionBy(domainCol).orderBy(h, idCol)
    val wAll = Window.partitionBy(domainCol)
    df.withColumn("domain_total", count(lit(1)).over(wAll))
      .withColumn("domain_rank", row_number().over(wRank))
      .withColumn("kept", col("domain_rank") <= maxPerDomain)
  }

  /** Largest `orderCol`-ordered prefix per group whose `weightCol`
    * running total stays within the group's `budgetCol` — the
    * sharded (two-level cumsum) form of
    * `filter(sum(w) OVER (PARTITION BY g ORDER BY o) <= budget)`.
    *
    * The naive window totally orders every group's rows inside one
    * task — at 100 TB a dominant group funnels ~all rows through one
    * reducer (the p14 boundary-language scale-killer). Here the
    * heavy key space is groups × `buckets`: rows bucket by an
    * ORDER-ALIGNED integer range of `orderCol` (so bucket index is
    * monotone in the order — unlike batchAssignScalable's hash
    * buckets, a prefix CUT must preserve the order across buckets),
    * per-bucket sums cumulate in a tiny groups×buckets window, and
    * only the single BOUNDARY bucket per group (offset ≤ budget <
    * offset+sum) runs a row-level cumsum — over ≤ |group|/buckets
    * rows. Full-in buckets pass with no per-row scan at all;
    * past-budget buckets drop wholesale. Exact-integer equality with
    * the window form (spec-proven): bucketing is order-aligned and
    * `orderCol` must be unique per group, so every row's cumulative
    * total is bit-identical. `budgetCol` must be constant per group.
    * Bucket arithmetic is overflow-safe for any long `orderCol`
    * span: width = span DIV buckets + 1, index = offset DIV width
    * (≤ buckets, no multiplication of large values). */
  def orderedPrefixCut(df: DataFrame, groupCol: String, orderCol: String,
      weightCol: String, budgetCol: String, buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val reserved = Seq("__omin", "__omax", "__bkt", "__bsum", "__boff", "__cum")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"orderedPrefixCut: input already has reserved column(s) ${clash.mkString(", ")}")
    val span = df.groupBy(groupCol)
      .agg(min(orderCol).as("__omin"), max(orderCol).as("__omax"))
    // single-plan checkpoints (r18): b feeds the bucket-sum branch
    // AND the row-level join, and withOff feeds the full-bucket and
    // boundary-bucket branches — un-checkpointed, the upstream
    // (including the caller's token-count pipeline) re-ran once per
    // reference within the one final plan.
    val b = df.join(broadcast(span), Seq(groupCol))
      .withColumn("__bkt", expr(
        s"(`$orderCol` - __omin) DIV ((__omax - __omin) DIV $buckets + 1)"))
      .drop("__omin", "__omax")
      .localCheckpoint(false)
    val sums = b.groupBy(col(groupCol), col("__bkt"))
      .agg(sum(weightCol).as("__bsum"))
    val wOff = Window.partitionBy(groupCol).orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = sums.withColumn("__boff",
      coalesce(sum("__bsum").over(wOff), lit(0L)))
    val withOff = b.join(broadcast(offs), Seq(groupCol, "__bkt"))
      .localCheckpoint(false)
    val fullIn = withOff
      .filter(col("__boff") + col("__bsum") <= col(budgetCol))
    val wLoc = Window.partitionBy(col(groupCol), col("__bkt"))
      .orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = withOff
      .filter(col("__boff") <= col(budgetCol) &&
        col("__boff") + col("__bsum") > col(budgetCol))
      .withColumn("__cum", col("__boff") + sum(weightCol).over(wLoc))
      .filter(col("__cum") <= col(budgetCol))
      .drop("__cum")
    fullIn.unionByName(boundary).drop("__bkt", "__bsum", "__boff")
  }

  /** `ntile(tiles) OVER (PARTITION BY group ORDER BY primary, tie)`
    * without the per-group total order — the sharded form for the
    * p7-curriculum shape, where at 100 TB a dominant group would
    * otherwise funnel every row through one window task.
    *
    * ntile is POSITIONAL (row rank decides the tile, ties on the
    * value split across tiles by the tie-break), so value-quantile
    * cut points (the KLL route) cannot reproduce it exactly when
    * ties straddle a boundary; instead the exact global rank is
    * assembled two-level, like [[orderedPrefixCut]]: rows bucket by
    * an ORDER-ALIGNED integer range of `primaryOrder` (ties share a
    * bucket, so bucket index is monotone in the lexicographic order;
    * a hash bucket — batchAssignScalable's choice — would scramble
    * ranks), a per-(group,bucket) row_number sorts ≤ |group|/buckets
    * rows per task, per-bucket counts cumulate in a tiny
    * groups×buckets window, and rank = bucket offset + local rank.
    * The tile comes from the closed-form ntile split (first n%tiles
    * tiles get one extra row) — bit-identical to the window form,
    * spec-proven. Residual skew: a single dominant `primaryOrder`
    * VALUE still concentrates its ties in one bucket (positional
    * ntile fundamentally must order those ties somewhere); spread
    * numeric keys — lengths, sizes, scores — shard evenly.
    * `primaryOrder` must be integral; (`primaryOrder`, `tieBreak`)
    * must be unique per group. Adds `phase` ∈ [1, tiles]. */
  def shardedNtile(df: DataFrame, groupCol: String, primaryOrder: String,
      tieBreak: String, tiles: Int, buckets: Int = 64): DataFrame = {
    require(tiles >= 1, s"tiles must be >= 1, got $tiles")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val reserved = Seq("__omin", "__omax", "__bkt", "__cnt", "__off",
      "__n", "__lrn", "__rank", "phase")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"shardedNtile: input already has reserved column(s) ${clash.mkString(", ")}")
    val span = df.groupBy(groupCol)
      .agg(min(primaryOrder).as("__omin"), max(primaryOrder).as("__omax"))
    val b = df.join(broadcast(span), Seq(groupCol))
      .withColumn("__bkt", expr(
        s"(`$primaryOrder` - __omin) DIV ((__omax - __omin) DIV $buckets + 1)"))
      .drop("__omin", "__omax")
    val counts = b.groupBy(col(groupCol), col("__bkt"))
      .agg(count(lit(1)).as("__cnt"))
    val wOff = Window.partitionBy(groupCol).orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(groupCol)
    val offs = counts
      .withColumn("__off", coalesce(sum("__cnt").over(wOff), lit(0L)))
      .withColumn("__n", sum("__cnt").over(wTot))
      .drop("__cnt")
    val wLoc = Window.partitionBy(col(groupCol), col("__bkt"))
      .orderBy(col(primaryOrder).asc, col(tieBreak).asc)
    b.join(broadcast(offs), Seq(groupCol, "__bkt"))
      .withColumn("__lrn", row_number().over(wLoc))
      .withColumn("__rank", col("__off") + col("__lrn"))
      // closed-form positional split: base = n DIV t, the first
      // n MOD t tiles take base+1 rows. base = 0 (n < t) degenerates
      // to the first branch (rem·(base+1) = n covers every rank).
      .withColumn("phase", expr(
        s"""CAST(CASE
           WHEN __rank <= (__n % $tiles) * (__n DIV $tiles + 1)
             THEN (__rank - 1) DIV (__n DIV $tiles + 1) + 1
           ELSE (__n % $tiles)
             + (__rank - (__n % $tiles) * (__n DIV $tiles + 1) - 1)
               DIV (__n DIV $tiles) + 1
           END AS INT)"""))
      .drop("__bkt", "__off", "__n", "__lrn", "__rank")
  }
}
