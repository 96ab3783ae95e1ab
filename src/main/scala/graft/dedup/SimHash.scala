package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** 64-bit SimHash near-duplicate detection.
  *
  * SimHash folds a document's shingle set into one 64-bit signature
  * whose Hamming distance approximates set dissimilarity. The fold
  * (per-bit vote counting) is not expressible as a flat Column
  * formula; the default per-document path is the native codegen
  * [[graft.plans.SimHashFold]] expression (r15 — no ScalaUDF
  * boundary), and the row-stream form is a custom typed
  * `Aggregator` — a single-pass, map-side-combining aggregate with
  * a 64-int buffer (256 B/group), exactly the shape Spark
  * distributes well at 100 TB. Both share one mix+vote definition.
  *
  * Cost structure: the 64-bit shingle hash is computed once per
  * *unique* shingle (distinct vocabulary, broadcast back), and the
  * aggregator consumes pre-hashed longs with a primitive-array
  * buffer encoder — no per-row serialization of strings or digests.
  */
object SimHash {

  /** 64-bit shingle hash: splitmix64 finalizer over the 32-bit
    * seed-0 shingle hash the dedup pipeline already carries — no
    * per-shingle string digest. Canonical implementation lives with
    * the codegen fold ([[graft.plans.SimHashFold.mix64]]) so the
    * map-pass and the Aggregator can never drift. */
  def mix64(h: Long): Long = graft.plans.SimHashFold.mix64(h)

  /** Aggregator: pre-hashed shingles in, per-bit ±1 votes, signed
    * majority sign-vector out as a packed Long. */
  private object SimHashAgg extends Aggregator[Long, Array[Int], Long] {
    def zero: Array[Int] = new Array[Int](64)
    def reduce(buf: Array[Int], h0: Long): Array[Int] = {
      val h = mix64(h0)
      var j = 0
      while (j < 64) {
        buf(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      buf
    }
    def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var j = 0
      while (j < 64) { a(j) += b(j); j += 1 }
      a
    }
    def finish(buf: Array[Int]): Long = {
      var out = 0L
      var j = 0
      while (j < 64) {
        if (buf(j) > 0) out |= (1L << j)
        j += 1
      }
      out
    }
    // primitive-array encoder: UnsafeArrayData, no java serialization
    def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column form of the aggregator, usable in groupBy().agg(). */
  def simhashAgg(hashedShingle: Column): Column = udaf(SimHashAgg).apply(hashedShingle)

  /** doc_id -> 64-bit simhash, single map pass over the hashed
    * shingle arrays (the default path). The fold is the native
    * codegen [[graft.plans.SimHashFold]] since r15 — the interpreted
    * simhashUdf it replaces crossed the ScalaUDF converter boundary
    * per document on d4's hot path (the ShingleHash playbook). */
  def signatures(docs: DataFrame): DataFrame =
    Dedup.withHashedShingles(docs)
      .select(col("doc_id"),
        graft.plans.SimHashFold.simhashFold(col("sh")).as("simhash"))

  /** Same signature via the typed Aggregator over exploded shingle
    * hashes — the distributed-aggregate form for inputs that arrive
    * as a row stream rather than per-document arrays. Must produce
    * identical signatures to `signatures` (cross-checked in
    * DedupSpec). */
  def signaturesAgg(docs: DataFrame): DataFrame =
    Dedup.withHashedShingles(docs)
      .select(col("doc_id"), explode(col("sh")).as("h"))
      .groupBy("doc_id")
      .agg(simhashAgg(col("h")).as("simhash"))

  /** (doc_id, simhash, c, v) pigeonhole fan-out — the banded frame
    * both sides of [[nearDupPairs]]' self-join read, exposed so the
    * soak can meter raw bucket/candidate volume under the cap knob. */
  private[graft] def banded(docs: DataFrame): DataFrame = {
    val chunks = (0 until 7).map(c => struct(lit(c).as("c"),
      shiftrightunsigned(col("simhash"), c * 10).bitwiseAND(lit(1023L)).as("v")))
    signatures(docs).select(col("doc_id"), col("simhash"),
        explode(array(chunks: _*)).as("ch"))
      .select(col("doc_id"), col("simhash"), col("ch.c").as("c"), col("ch.v").as("v"))
  }

  /** Drop rows in over-populated (chunk_idx, chunk_val) buckets — the
    * d14/d17 discriminative posture applied to pigeonhole banding
    * (r15 verdict item 4). Pair generation within a bucket is
    * O(bucket²), and a near-duplicate-saturated or boilerplate-heavy
    * corpus concentrates mass in few chunk values (the all-zero
    * simhash chunk of templated docs); a bucket above `cap` is, like
    * an over-df shingle, non-discriminative — dropping it bounds the
    * join's per-key fanout at cap² while every pair in a sane bucket
    * keeps its full recall (a true near-dup pair agreeing ONLY on
    * saturated chunks is the metered recall cost, the d21 posture —
    * Round16OpsSpec plants exactly that corpus and the soak meters
    * candidate volume + genuine-pair recall under the cap). The
    * over-cap bucket list is tiny (≤ n/cap rows) and broadcast into
    * the anti-join; the banded frame itself never re-shuffles. */
  private[graft] def capBuckets(banded: DataFrame, cap: Int,
      keys: Seq[String] = Seq("c", "v")): DataFrame = {
    val over = banded.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bsz")).filter(col("bsz") > cap)
      .select(keys.map(col): _*)
    banded.join(broadcast(over), keys, "left_anti")
  }

  /** SELF-TUNING bucket cap — the x19 p99 posture applied to
    * pigeonhole banding, so [[capBuckets]] needs no hand-picked
    * constant per corpus: cap = max(floor, headroom × p`pct` of the
    * banded frame's own bucket sizes). On a benign corpus the
    * bucket-size distribution is tight (key space 7 × 2¹⁰,
    * near-uniform hashes), so headroom × p99 sits safely above every
    * genuine bucket and the cap never bites; a boilerplate-saturated
    * bucket is an extreme outlier orders of magnitude above p99 and
    * is exactly what gets dropped. One (c,v)-keyed count + one KLL
    * sketch merge over the banded frame — derive it from the SAME
    * frame the join reads (see [[nearDupPairsAuto]]) or from a
    * corpus sample in a long-lived pipeline. */
  def autoBucketCap(banded: DataFrame, keys: Seq[String] = Seq("c", "v"),
      pct: Int = 99, headroom: Int = 4, floor: Int = 32): Int = {
    // the sketch yields NULL on an empty banded frame (empty corpus,
    // or every doc too short to shingle) — degenerate corpora fall
    // back to the floor cap instead of NPE-ing the pair query
    val row = banded.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bsz"))
      .agg(graft.plans.QuantileSketch.quantiles(
        col("bsz").cast("double"), 1 << 14, Seq(pct)).as("qs"))
      .select(element_at(col("qs"), 1).cast("long"))
      .first()
    val p = if (row.isNullAt(0)) 0L else row.getLong(0)
    math.max(floor.toLong, math.min(Int.MaxValue.toLong, p * headroom)).toInt
  }

  /** [[nearDupPairs]] with the bucket cap DERIVED from the corpus
    * itself (the 100-TB operating mode for boilerplate-saturated
    * corpora when no hand cap is known). The banded frame is
    * eagerly checkpointed because it crosses two executions — the
    * cap-derivation action and the pair join (the CLAUDE.md
    * crosses-executions rule) — which also means the
    * scan→shingle→fold→explode map stage is paid ONCE for both. */
  def nearDupPairsAuto(docs: DataFrame, maxHamming: Int,
      pct: Int = 99, headroom: Int = 4, floor: Int = 32): DataFrame = {
    require(maxHamming <= 6, "7-chunk blocking guarantees recall only for hamming <= 6")
    val b = banded(docs).localCheckpoint()
    val cap = autoBucketCap(b, Seq("c", "v"), pct, headroom, floor)
    val bandedHinted = capBuckets(b, cap).hint("shuffle_hash")
    bandedHinted.as("x").join(bandedHinted.as("y"),
        col("x.c") === col("y.c") && col("x.v") === col("y.v")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Near-dup pairs by pigeonhole chunk blocking: the 64-bit
    * signature splits into 7 chunks of ≤10 bits; hamming ≤ 6 flips
    * at most 6 chunks, so every true near-dup pair agrees on at
    * least one chunk — candidates are pairs sharing any
    * (chunk-index, chunk-value), found with an equi-join whose key
    * space is 7 × 2¹⁰ (well distributed), then verified with
    * bit_count. No O(block²) metadata blocks, no skewed keys;
    * recall is exactly 1.0 for hamming ≤ 6 by construction.
    *
    * `maxBucket` (default off) engages the [[capBuckets]] skew guard:
    * the 100-TB operating mode for boilerplate-saturated corpora,
    * trading metered recall on saturated buckets for an O(cap²)
    * per-key fanout bound. The oracled d4 query runs uncapped — the
    * bench corpus has no saturated buckets (validated across SFs) —
    * so the exact-recall contract above stays the oracle's. */
  def nearDupPairs(docs: DataFrame, maxHamming: Int,
      maxBucket: Option[Int] = None): DataFrame = {
    require(maxHamming <= 6, "7-chunk blocking guarantees recall only for hamming <= 6")
    val b0 = banded(docs)
    // shuffle_hash, deliberately: BOTH sides of the self-join are the
    // corpus-proportional banded frame, so a broadcast is a
    // small-corpus artifact that (a) cannot exist at 100 TB and
    // (b) double-computes the scan→shingle→fold→explode map stage —
    // the broadcast build side re-derives the frame instead of
    // reading the other side's shuffle. The hinted shuffle join IS
    // the at-scale plan, and measured 1.6 → 1.0 s on d4 at sf0.1
    // (r15): the identical per-side exchanges collapse to ONE under
    // AQE's exchange reuse (ReusedExchange on the second branch —
    // asserted in PlanAuditSpec since r16), so the map stage is paid
    // once, not once per side.
    val bandedHinted = maxBucket.fold(b0)(capBuckets(b0, _)).hint("shuffle_hash")
    val cands = bandedHinted.as("x").join(bandedHinted.as("y"),
        col("x.c") === col("y.c") && col("x.v") === col("y.v")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    cands
  }
}
