package graft.dedup

import graft.Tables
import graft.functions.Hashing
import graft.operators.Transform
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline.
  *
  * Scale posture (SURVEY.md §4): every near-dup operator is
  * structured as candidate-generation (blocking or LSH banding,
  * bounded output) followed by exact verification on candidates
  * only. The full O(n²) cross join never materializes; the only
  * all-pairs work happens *within* blocks/buckets whose size is
  * controlled by the blocking key.
  *
  * Set operations run over 32-bit *hashed* shingles (array<long>),
  * never shingle strings: the per-pair intersect cost drops ~10×
  * and the shuffle payload per document is 8·|shingles| bytes flat.
  */
object Dedup {

  /** Test-corpus augmentation: every document plus (a) a near-copy
    * with the first 20 characters removed (doc_id + 1000000, an
    * "edited near-dup") and (b) an exact copy (doc_id + 2000000).
    * Planted positives for every dedup flavor; the derivation is
    * mirrored verbatim in the oracle SQL. */
  val NearOffset = 1000000L
  val ExactOffset = 2000000L
  def augmentedDocs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select("doc_id", "text", "lang", "n_chars")
    d.unionByName(d.select(
        (col("doc_id") + NearOffset).as("doc_id"),
        substring(col("text"), 21, Int.MaxValue).as("text"),
        col("lang"),
        length(substring(col("text"), 21, Int.MaxValue)).as("n_chars")))
      .unionByName(d.select(
        (col("doc_id") + ExactOffset).as("doc_id"),
        col("text"), col("lang"), col("n_chars")))
  }

  /** Exact dedup: group on md5(text), never on raw text — the
    * shuffle key is 16 bytes regardless of document size, so this
    * holds at 100 TB (the standard hash-first trick). */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))

  /** Distinct 3-token shingles of normalized text — the SEQUENTIAL
    * REFERENCE the ShingleHash parity spec replays; NOT a query
    * entry point. The query-side forms are the codegen expressions
    * ([[hashedShingles]] / [[positionalHashedShingles]], and
    * graft.plans.TokenGrams for string grams) — the legacy
    * `shinglesUdf` ScalaUDF was retired r15 (the r14 verdict's
    * item 10): every remaining caller rides the expression path. */
  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  private[graft] def shingleStrings(text: String): Array[String] = {
    val norm = wsPattern.matcher(text.toLowerCase).replaceAll(" ").trim
    val tks = wsPattern.split(norm)
    val n = math.max(tks.length - 2, 1)
    val out = new Array[String](n)
    var i = 0
    while (i < n) {
      val sb = new StringBuilder(tks(i))
      if (i + 1 < tks.length) sb.append(' ').append(tks(i + 1))
      if (i + 2 < tks.length) sb.append(' ').append(tks(i + 2))
      out(i) = sb.toString
      i += 1
    }
    out.distinct
  }

  /** 32-bit seeded shingle hash, JVM-side: first 8 hex chars of
    * md5("<seed>:<s>") — the exact formula of
    * graft.functions.Hashing.h32, which the oracle mirrors. */
  private[dedup] def h32jvm(seed: Int, s: String): Long = Hashing.h32jvm(seed, s)

  /** Hashed shingles in DOCUMENT ORDER with one entry per start
    * token (posexplode yields the 0-based token position of each
    * shingle) — same normalization/hash as [[hashedShingles]], so
    * the two forms join. Native codegen expression since r14 (the
    * r13 watch-list item): bit-identical to the legacy UDF
    * (ShingleHashSpec pins parity), but no ScalaUDF converter
    * boundary and no codegen fence on the hottest dedup stage. */
  def positionalHashedShingles(text: Column): Column =
    graft.plans.ShingleHash.positionalHashedShingles(text)

  /** Distinct ASCENDING 32-bit-hashed shingles (seed 0). Hash
    * collisions can merge shingles with probability |sh|²/2³² —
    * immaterial, and the oracle mirrors the same hashing so results
    * stay exact. Native codegen expression since r14 (see
    * [[positionalHashedShingles]]); [[shingleStrings]] remains the
    * sequential reference the parity spec replays. */
  def hashedShingles(text: Column): Column =
    graft.plans.ShingleHash.hashedShingles(text)

  /** docs → (doc_id, lang, n_chars, sh) with hashed shingle sets. */
  def withHashedShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("n_chars"),
      hashedShingles(col("text")).as("sh"))

  /** Jaccard via a single merge-intersect: |A∩B| / (|A|+|B|-|A∩B|).
    * hashedShingles emits sorted distinct arrays, so the native
    * IntersectCount expression (one codegen'd merge pass, no per-pair
    * hash set) applies. */
  def jaccard4(a: Column, b: Column): Column = {
    val i = graft.plans.IntersectCount.intersectCount(a, b)
    round(i / (size(a) + size(b) - i).cast("double"), 4)
  }

  /** Blocked n-gram Jaccard: candidates share a language and sit
    * within `charWindow` characters. The length constraint is turned
    * into an equi-join key — chunk = n_chars/(charWindow+1), probe
    * side exploded to {chunk-1, chunk, chunk+1} — so the shuffle
    * distributes over (lang × chunk), not 5 skewed lang keys.
    * A size-ratio prefilter (|A|/|B| ≥ τ, necessary for J ≥ τ)
    * drops most pairs before any set op. */
  def ngramJaccard(docs: DataFrame, threshold: Double, charWindow: Int): DataFrame =
    // lazy local checkpoint: both join branches read one materialized
    // copy of the shingled corpus instead of re-running the shingle
    // UDF per branch (Spark has no cross-branch CSE) — ~40% of the
    // operator's cost at sf0.1
    ngramJaccardShingled(withHashedShingles(docs).localCheckpoint(false),
      threshold, charWindow)

  /** [[ngramJaccard]] over a PRE-shingled (materialized) frame —
    * see [[minhashLshShingled]] for why the shingle pass is hoisted
    * to the caller (d21 shares one pass across three pipelines). */
  def ngramJaccardShingled(s: DataFrame, threshold: Double,
      charWindow: Int): DataFrame = {
    val chunkW = charWindow + 1
    val a = s.select(col("doc_id").as("a_id"), col("lang").as("a_lang"),
      col("n_chars").as("a_n"), col("sh").as("a_sh"),
      floor(col("n_chars") / chunkW).as("a_chunk"))
    val b = s.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
      col("n_chars").as("b_n"), col("sh").as("b_sh"),
      explode(array(floor(col("n_chars") / chunkW) - 1,
        floor(col("n_chars") / chunkW),
        floor(col("n_chars") / chunkW) + 1)).as("b_chunk"))
    a.join(b,
        col("a_lang") === col("b_lang") && col("a_chunk") === col("b_chunk")
          && col("a_id") < col("b_id")
          && abs(col("a_n") - col("b_n")) <= charWindow
          // ε-margin: J ≤ min/max always, and the final filter is on
          // round(J,4) ≥ τ, so τ-0.001 here can never drop a pair the
          // (prefilter-free) oracle keeps
          && (least(size(col("a_sh")), size(col("b_sh")))
              >= greatest(size(col("a_sh")), size(col("b_sh"))) * (threshold - 0.001)))
      // fused early-exit prefilter: J ≥ t ⟺ |A∩B| ≥ t(|A|+|B|)/(1+t);
      // with t' = τ-0.001 this is a pure necessary condition for
      // round(J,4) ≥ τ, and the merge bails as soon as a pair is
      // provably in or out — most candidates never finish the pass
      .filter(graft.plans.IntersectAtLeast.intersectAtLeast(
        col("a_sh"), col("b_sh"),
        ceil((size(col("a_sh")) + size(col("b_sh"))) * (threshold - 0.001)
          / (1.0 + threshold - 0.001)).cast("int")))
      .select(col("a_id"), col("b_id"), jaccard4(col("a_sh"), col("b_sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Asymmetric CONTAINMENT near-dup (the quote/subset shape d2's
    * symmetric Jaccard misses: a short doc embedded in a long one has
    * low Jaccard but high containment |A∩B|/min(|A|,|B|)). Candidates
    * cannot block on length (the contained doc may be 10× shorter),
    * so they come from a shingle inverted-index self-join restricted
    * to DISCRIMINATIVE shingles: 2 ≤ df ≤ maxDf. The df cap bounds
    * pair volume by maxDf·Σdf (the stopword-shingle quadratic never
    * materializes — the documented recall knob: a pair sharing ONLY
    * ubiquitous shingles is missed, and such a pair is noise at any
    * corpus size); exact containment then runs only on candidates via
    * the native IntersectCount merge. All-integer contract: emits
    * (n_shared, n_min) and thresholds as n_shared·100 ≥ pct·n_min —
    * no float ratio can hit a cross-engine round boundary. */
  def containmentPairs(docs: DataFrame, thresholdPct: Int, maxDf: Int): DataFrame = {
    require(thresholdPct >= 1 && thresholdPct <= 100, s"pct in [1,100]")
    val s = withHashedShingles(docs).localCheckpoint(false)
    val posts = s.select(col("doc_id"), explode(col("sh")).as("h"))
    val rare = posts.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
    // single-plan checkpoint + shuffle_hash (r18): rp fed BOTH sides
    // of the candidate self-join, so the posts-explode + df-count +
    // thin join ran twice; the checkpoint materializes the (small,
    // df-capped) discriminative postings once and the d4/m5 hint
    // keeps the self-join the at-scale shuffle plan (the postings
    // table is corpus-proportional — a broadcast cannot exist at
    // 100 TB; AQE exchange reuse collapses the two identical sides).
    val rp = posts.join(rare.select("h"), "h")
      .localCheckpoint(false).hint("shuffle_hash")
    val cand = rp.as("a").join(rp.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    cand
      .join(s.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(s.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .select(col("a_id"), col("b_id"),
        graft.plans.IntersectCount.intersectCount(col("a_sh"), col("b_sh"))
          .cast("long").as("n_shared"),
        least(size(col("a_sh")), size(col("b_sh"))).cast("long").as("n_min"))
      .filter(col("n_shared") * 100 >= lit(thresholdPct) * col("n_min"))
  }

  /** Containment KEEP-LIST — [[containmentPairs]] reduced to the
    * per-document decision a pipeline applies. Asymmetric semantics:
    * in a containment pair the CONTAINED document (the smaller
    * shingle set — the quote) is dropped and the superset document
    * kept; when the sets tie in size (mutual containment, the planted
    * exact copies) the larger doc_id drops, so the tie branch is
    * data-exercised. A document contained in several supersets drops
    * once, reported with its smallest container and the container
    * count. Same candidate generation and df cap as the pair form —
    * one extra groupBy on the (already thresholded) pair output, so
    * the scale posture is unchanged. Returns
    * (dropped_id, kept_in, n_containers).
    *
    * CHAIN SEMANTICS (A ⊂ B ⊂ C): `kept_in` names the smallest
    * CONTAINER of the dropped doc, not necessarily a SURVIVOR — in a
    * chain, B both contains A and is itself dropped into C, so A's
    * row may read (A, kept_in=B) while B has its own (B, kept_in=C)
    * row. This is deliberate: resolving transitively would need an
    * iterative closure (a CC-shaped fixpoint) for what is a
    * provenance hint, and the keep decision itself — "is doc X
    * dropped?" — is already chain-correct because every contained
    * doc appears as a dropped_id regardless of where its container
    * lands. Consumers that need a surviving representative should
    * anti-join kept_in against dropped_id and follow the one-step
    * chain, or use the cluster-representative form
    * ([[clusterRepFromLabels]]) which IS transitive by
    * construction. */
  def containmentKeepList(docs: DataFrame, thresholdPct: Int,
      maxDf: Int): DataFrame = {
    require(thresholdPct >= 1 && thresholdPct <= 100, s"pct in [1,100]")
    val s = withHashedShingles(docs).localCheckpoint(false)
    val posts = s.select(col("doc_id"), explode(col("sh")).as("h"))
    val rare = posts.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
    // checkpoint + hint: see containmentPairs (same shape, r18)
    val rp = posts.join(rare.select("h"), "h")
      .localCheckpoint(false).hint("shuffle_hash")
    val cand = rp.as("a").join(rp.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    val scored = cand
      .join(s.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(s.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .select(col("a_id"), col("b_id"),
        graft.plans.IntersectCount.intersectCount(col("a_sh"), col("b_sh"))
          .cast("long").as("n_shared"),
        size(col("a_sh")).cast("long").as("n_a"),
        size(col("b_sh")).cast("long").as("n_b"))
      .filter(col("n_shared") * 100
        >= lit(thresholdPct) * least(col("n_a"), col("n_b")))
    val verdicts = scored.select(
      when(col("n_a") < col("n_b"), col("a_id"))
        .when(col("n_b") < col("n_a"), col("b_id"))
        .otherwise(greatest(col("a_id"), col("b_id"))).as("dropped_id"),
      when(col("n_a") < col("n_b"), col("b_id"))
        .when(col("n_b") < col("n_a"), col("a_id"))
        .otherwise(least(col("a_id"), col("b_id"))).as("container_id"))
    verdicts.groupBy("dropped_id")
      .agg(min(col("container_id")).as("kept_in"),
        count(lit(1)).as("n_containers"))
  }

  /** MinHash permutation constants: m_i = min over hashed shingles h
    * of (A_i·h + B_i) mod P. Products stay < 2^52 (A < 2^20,
    * h < 2^32), so the arithmetic is exact in any engine's 64-bit
    * integers — the oracle mirrors the same literals. */
  val MinhashA: Array[Long] = Array(1000003L, 1000033L, 1000037L, 1000039L,
    1000081L, 1000099L, 1000117L, 1000121L)
  val MinhashB: Array[Long] = Array(12345L, 23456L, 34567L, 45678L,
    56789L, 67890L, 78901L, 89012L)
  val MinhashP: Long = 2147483647L

  private val minhash8Udf = udf { (sh: Seq[Long]) =>
    Array.tabulate(8) { i =>
      if (sh.isEmpty) Long.MaxValue
      else {
        var m = Long.MaxValue
        val a = MinhashA(i); val b = MinhashB(i)
        sh.foreach { h => val v = (a * h + b) % MinhashP; if (v < m) m = v }
        m
      }
    }
  }

  /** MinHash signatures as k arithmetic permutations of the (already
    * computed) seed-0 hashed shingles — no string re-hashing, no
    * vocabulary join, map-only over `shingled` = (doc_id, sh). */
  def minhashSignatures(shingled: DataFrame, k: Int): DataFrame = {
    require(k <= 8, "8 permutation constants defined")
    shingled.select(col("doc_id"), minhash8Udf(col("sh")).as("mh"))
      .select((col("doc_id") +:
        (0 until k).map(i => element_at(col("mh"), i + 1).as(s"m$i"))): _*)
  }

  /** MinHash + LSH banding: k hashes in `bands` bands of k/bands
    * rows. Docs sharing any band value become candidates; candidates
    * are verified with exact Jaccard. The shuffle key is
    * (band, band-value) — collision probability for true jaccard j
    * is 1-(1-j^r)^b, so the bucket join only sees near-dups and
    * hash-collision noise, never all pairs. */
  /** Banded LSH keys of a shingled frame: (doc_id, band, bv). This IS
    * the persistable MinHash index — production stores it (plus the
    * shingle sets) keyed on (band, bv); [[minhashLshIncremental]]
    * probes it with a delta batch. */
  def bandedSignatures(shingled: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val r = k / bands
    val sig = minhashSignatures(shingled, k)
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until r).map(i => col(s"m${b * r + i}").cast("string"))
      struct(lit(b).as("band"), concat_ws("_", parts: _*).as("bv"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bv").as("bv"))
  }

  def minhashLsh(docs: DataFrame, k: Int, bands: Int,
      threshold: Double): DataFrame =
    // one shingle pass total: signatures AND both verify sides read
    // the same materialized hashed-shingle corpus
    minhashLshShingled(withHashedShingles(docs).localCheckpoint(false),
      k, bands, threshold)

  /** [[minhashLsh]] over a PRE-shingled (materialized) frame
    * (doc_id, lang, n_chars, sh) — the entry point when the caller
    * already holds the hashed-shingle corpus (d21's recall gate runs
    * three pipelines off ONE shingle pass; before r18 each config
    * re-shingled the corpus). The banded self-join is
    * shuffle_hash-hinted (the d4/m5 rule, extended here r18): both
    * sides are the SAME corpus-proportional banded frame, so the
    * un-hinted broadcast at small SF double-computes the
    * minhash+band map stage and cannot exist at 100 TB — the hinted
    * shuffle join is the at-scale plan and AQE's exchange reuse
    * collapses the two identical sides to one map stage. */
  def minhashLshShingled(s: DataFrame, k: Int, bands: Int,
      threshold: Double): DataFrame = {
    val banded = bandedSignatures(s, k, bands).hint("shuffle_hash")
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    cands
      .join(s.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(s.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .select(col("a_id"), col("b_id"), jaccard4(col("a_sh"), col("b_sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Incremental near-dup detection: a NEW batch probed against the
    * existing corpus's MinHash index — the form dedup actually runs
    * in a continuously-harvesting pipeline, where re-pairing the full
    * corpus per ingest (d3's shape) would be O(corpus) every batch.
    * Here only the delta is shingled/signed fresh; the base side is
    * exactly the (band, bv)-keyed [[bandedSignatures]] index plus the
    * shingle sets, both computed once and persistable. Candidates are
    * (delta × index) band-bucket matches; verification touches only
    * candidates. Cost per batch: O(|delta| + matches) — independent
    * of corpus size except through the (bounded) bucket join.
    *
    * Returns (new_id, dup_of, jaccard): every verified near-dup link
    * from a new document to an existing one (new-vs-new dups are the
    * NEXT batch's base — dedup them with [[minhashLsh]] before
    * appending). */
  def minhashLshIncremental(base: DataFrame, delta: DataFrame,
      k: Int, bands: Int, threshold: Double): DataFrame =
    minhashLshIncrementalShingled(
      withHashedShingles(base).localCheckpoint(false),
      withHashedShingles(delta).localCheckpoint(false),
      k, bands, threshold)

  /** [[minhashLshIncremental]] over PRE-shingled sides (doc_id, sh) —
    * the entry point when the base's shingle sets are already
    * persisted (the streaming ingest path keeps them as its corpus
    * state and never re-shingles history). */
  def minhashLshIncrementalShingled(bs: DataFrame, ds: DataFrame,
      k: Int, bands: Int, threshold: Double): DataFrame = {
    val index = bandedSignatures(bs, k, bands)
    val probes = bandedSignatures(ds, k, bands)
    val cands = probes.as("d").join(index.as("x"),
        col("d.band") === col("x.band") && col("d.bv") === col("x.bv"))
      .select(col("d.doc_id").as("new_id"), col("x.doc_id").as("dup_of"))
      .distinct()
    cands
      .join(ds.select(col("doc_id").as("new_id"), col("sh").as("a_sh")), "new_id")
      .join(bs.select(col("doc_id").as("dup_of"), col("sh").as("b_sh")), "dup_of")
      .select(col("new_id"), col("dup_of"),
        jaccard4(col("a_sh"), col("b_sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Benchmark decontamination: count, per corpus document, the
    * hashed 3-shingles it shares with a benchmark/eval set, and flag
    * documents at or above the contamination threshold. The
    * benchmark shingle vocabulary is small and broadcast; the corpus
    * side explodes map-side and aggregates once on doc_id — at
    * 100 TB this is a broadcast semi-join, never a pairwise op. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      minSharedShingles: Int): DataFrame = {
    val benchSh = benchmark
      .select(explode(hashedShingles(col("text"))).as("s")).distinct()
    val corpusEx = corpus
      .select(col("doc_id"), explode(hashedShingles(col("text"))).as("s"))
    val hits = corpusEx.join(broadcast(benchSh), "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    corpus.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) >= minSharedShingles).as("contaminated"))
  }

  /** Span-level contamination AUDIT — [[decontaminate]]'s verdict
    * upgraded to provenance: for every (corpus doc, benchmark doc)
    * pair sharing ≥ `minSharedShingles` DISTINCT shingles, which
    * eval item leaked and WHERE — the token-position span
    * [first_pos, last_pos] of the matching shingles in the corpus
    * document (the evidence a removal/redaction pass acts on; a
    * boolean verdict can only drop the whole doc). Same scale shape
    * as d7: the benchmark shingle table broadcasts (eval sets are
    * small by contract — now keyed by bench doc), the corpus
    * explodes once WITH positions, and the pair aggregation is
    * keyed on (doc, bench). */
  def contaminationSpans(corpus: DataFrame, benchmark: DataFrame,
      minSharedShingles: Int): DataFrame = {
    val bench = benchmark.select(col("doc_id").as("bench_id"),
      explode(hashedShingles(col("text"))).as("s"))
    val cex = corpus.select(col("doc_id"),
      posexplode(positionalHashedShingles(col("text"))).as(Seq("pos", "s")))
    cex.join(broadcast(bench), "s")
      .groupBy("doc_id", "bench_id")
      .agg(countDistinct("s").as("n_shared"),
        min("pos").cast("long").as("first_pos"),
        max("pos").cast("long").as("last_pos"))
      .filter(col("n_shared") >= minSharedShingles)
  }

  /** Cross-corpus exact-substring DECONTAMINATION rewrite (d29) —
    * the Lee et al. 2022 strip applied against an EVAL set: every
    * maximal ≥ minLen-token run in a corpus document whose k-grams
    * all occur somewhere in the benchmark is cut, and the document
    * reassembled from surviving tokens. Completes the
    * decontamination ladder: [[decontaminate]]/[[decontaminateBloom]]
    * give a DOC verdict (drop wholesale), [[contaminationSpans]]
    * gives audit provenance (a coarse [first, last] bound per pair),
    * this ships the SURGICAL cut — the remediation that keeps the
    * un-leaked 95% of a lightly-contaminated document instead of
    * dropping it.
    *
    * Covered ⟺ the position's k-gram occurs in the eval set —
    * exactly d26's covered-position rule with "occurs ≥ 2 corpus-
    * wide" swapped for "occurs in eval", so islands, the ≥ minLen
    * cut and the token strip are the SAME shared operators
    * ([[substringAnchors]], [[coveredToSpans]], [[stripSpans]]) and
    * cannot drift from the within-corpus rungs.
    *
    * Scale shape: the eval side is small by contract (the d7/d23
    * posture) — its distinct gram set broadcasts; the corpus side is
    * one map-only anchor fan-out + the broadcast semi-join + the
    * per-doc islands window. Nothing corpus-proportional shuffles on
    * the eval key, nothing is pairwise. For an eval set too large to
    * broadcast, drop the hint — the same un-hinted posture as d26's
    * covered join. */
  def stripEvalSubstrings(corpus: DataFrame, benchmark: DataFrame,
      k: Int, minLen: Int): DataFrame = {
    val evalGrams = benchmark
      .select(explode(positionalHashedKgrams(col("text"), k)).as("g"))
      .distinct()
    val covered = substringAnchors(corpus, k)
      .join(broadcast(evalGrams), "g")
      .select("doc_id", "pos")
    stripSpans(corpus, coveredToSpans(covered, k, minLen))
  }

  /** Bloom-prefiltered decontamination: same output contract as
    * [[decontaminate]] — EXACTLY, because the Bloom pass is only a
    * prefilter — but the exploded corpus shingle stream is thinned
    * MAP-SIDE by a ~10-bits/item Bloom filter of the benchmark
    * shingle vocabulary before the exact verify join ever shuffles.
    * At 100 TB the exploded corpus side dominates (≈ tokens × 1
    * rows); clean documents share almost no shingles with an eval
    * set, so the Bloom drops ≈ (1 - fpp) of that stream at the scan
    * and the verify join + doc_id aggregation only ever see true
    * hits plus an fpp-bounded trickle of false positives, which the
    * exact semi-join then removes. No false negatives by Bloom
    * construction → bit-identical to the unfiltered plan (the spec
    * asserts it; the oracle is the same SQL as d7's). */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
      minSharedShingles: Int, fpp: Double = 0.01): DataFrame = {
    // deliberately NOT checkpointed: a checkpointed frame whose
    // lineage shares relations with a caller's other plans breaks
    // plan composition (exceptAll saw the whole branch as empty —
    // Spark 4.1.2 relation-dedup edge case); the benchmark side is
    // small by nature, so recomputing its shingles for the count,
    // the filter build, and the verify join is the cheaper honest
    // trade
    val benchSh = benchmark
      .select(explode(hashedShingles(col("text"))).as("s")).distinct()
    val nBenchSh = benchSh.count()
    // empty eval set: nothing can be contaminated — and a Bloom
    // aggregate over a zero-row frame yields a null filter (the
    // probe would null out instead of passing), so this is a
    // required short-circuit, not just a fast path
    if (nBenchSh == 0)
      return corpus.select(col("doc_id"), lit(0L).as("n_hits"),
        lit(false).as("contaminated"))
    // NATIVE Bloom front since r17 (r16 verdict item 3): built with
    // the engine's own bloom_filter_agg (distributed, map-side
    // partial) and probed with might_contain over a binary LITERAL —
    // the map-side filter stays inside whole-stage codegen, no
    // ScalaUDF boundary, no broadcast-variable lifecycle (the
    // ShingleHash/SimHashFold playbook; the streaming twin
    // SubstringStream proved the machinery in r16). Same
    // no-false-negative construction ⇒ output stays bit-identical
    // to the exact path (RoundFourSpec) and to the old
    // stat.bloomFilter build.
    val bf = graft.streaming.BloomFront.build(benchSh, col("s"), nBenchSh, fpp)
    val corpusEx = corpus
      .select(col("doc_id"), explode(hashedShingles(col("text"))).as("s"))
      .filter(graft.streaming.BloomFront.probe(bf, col("s")))
    val hits = corpusEx.join(broadcast(benchSh), "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    corpus.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) >= minSharedShingles).as("contaminated"))
  }

  /** Cross-document duplicated-span statistics: for every document,
    * how many of its distinct 3-token shingles also appear in at
    * least one OTHER document, and the duplicated fraction — the
    * per-document signal behind exact-substring dedup ("this doc is
    * 60% boilerplate shared with the rest of the corpus"; the
    * span-REMOVAL step is a tokenizer-side rewrite this score
    * gates). Shapes: one explode (map-side), then exactly two
    * shuffles — a count-window on the 32-bit shingle hash (the only
    * wide key, uniformly distributed by construction) and the
    * per-doc reduction. hashedShingles emits DISTINCT shingles per
    * document, so `count(*) over (partition by s)` IS the number of
    * documents containing s — no countDistinct, no self-join, the
    * exploded stream is scanned once. Linear in corpus tokens,
    * nothing pairwise. */
  def dupSpanStats(docs: DataFrame): DataFrame = {
    val ex = docs
      .select(col("doc_id"), explode(hashedShingles(col("text"))).as("s"))
    val nd = count(lit(1)).over(Window.partitionBy("s"))
    ex.withColumn("nd", nd)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum((col("nd") >= 2).cast("long")).as("n_shared"))
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        round(col("n_shared") / col("n_shingles").cast("double"), 4)
          .as("dup_ratio"))
  }

  /** Boilerplate-chunk removal (the C4/CCNet repeated-line dedup
    * rung, d10's stats upgraded to the REWRITE a pipeline actually
    * ships): documents split into non-overlapping `width`-token
    * chunks (the "lines" of this single-line corpus; a trailing
    * short chunk is its own chunk, so reassembly is one array_join),
    * chunks occurring `minOcc`+ times corpus-wide — C4's own rule is
    * the absolute "any line appearing ≥ 3 times" cut — are struck
    * from every document, and the cleaned text is reassembled in
    * token order.
    *
    * Scale shape: one map-side chunk fan-out feeds (a) the
    * chunk-keyed occurrence count (shuffle 1, map-side partial) and
    * (b) the rewrite join; the hot set (occ ≥ minOcc) is usually
    * small (it IS the boilerplate) and Spark/AQE broadcasts it back
    * onto the exploded stream when runtime stats say it fits — the
    * join carries NO broadcast hint (a hint is honored past the
    * threshold and would OOM on a web-scale hot set, where every
    * common n-gram chunk qualifies, not just planted headers), so a
    * corpus-proportional hot set genuinely degrades to the shuffled
    * equi-join (Round14OpsSpec pins the fallback engaging). The
    * reassembly is one doc-keyed aggregation (shuffle 2). Linear in
    * corpus tokens, nothing pairwise, no driver-side data. */
  def boilerplateStrip(docs: DataFrame, width: Int = 3,
      minOcc: Long = 3L): DataFrame = {
    val ex = docChunks(docs, width)
    val hot = ex.groupBy("chunk").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= minOcc)
      .select(col("chunk"), lit(true).as("hot"))
    stripAgainstHot(ex, hot)
  }

  /** The d25 chunk fan-out: (doc_id, pos, chunk) — non-overlapping
    * `width`-token chunks, trailing remainder as its own chunk.
    * Shared by [[boilerplateStrip]] and the streaming gate
    * ([[graft.streaming.BoilerplateStream]]) so batch and stream can
    * never drift on the chunk definition. */
  def docChunks(docs: DataFrame, width: Int): DataFrame = {
    // project the token split to a column BEFORE the chunk lambda
    // touches it (the x25 outer-expression rule: a non-attribute
    // expression inside a HOF re-evaluates per element — here that
    // would re-split the document once per chunk, O(L²/width))
    val toks = docs.select(col("doc_id"),
      split(trim(col("text")), "\\s+").as("tks"))
    val chunked = toks.select(col("doc_id"),
      transform(
        sequence(lit(0), expr(s"(size(tks) - 1) div $width")),
        i => array_join(slice(col("tks"), i * width + 1, lit(width)), " "))
        .as("chunks"))
    chunked.select(col("doc_id"),
      posexplode(col("chunks")).as(Seq("pos", "chunk")))
  }

  /** The d25 rewrite: strike every chunk in `hot` (chunk, hot=true)
    * from the fan-out `ex` and reassemble per doc. Deliberately NO
    * broadcast hint: the hot set is corpus-proportional in the worst
    * case (at web scale every common trigram chunk clears an
    * absolute occ cut), and a hint is honored past
    * autoBroadcastJoinThreshold — Spark would build it in memory
    * until the 8 GB/driver wall instead of degrading. Left unhinted,
    * AQE broadcasts the usual tiny hot set from runtime stats and
    * falls back to the shuffled equi-join when it does not fit
    * (Round14OpsSpec proves both: the AQE broadcast on a tiny hot set + the engaged
    * fallback). [[graft.streaming.BoilerplateStream]] inherits this
    * posture through the shared operator. */
  def stripAgainstHot(ex: DataFrame, hot: DataFrame): DataFrame =
    ex.join(hot, Seq("chunk"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("hot").isNotNull.cast("long")).as("n_removed"),
        array_join(transform(array_sort(collect_list(
            when(col("hot").isNull, struct(col("pos"), col("chunk"))))),
          s => s.getField("chunk")), " ").as("clean_text"))

  /** Positional k-token-gram hashes in DOCUMENT ORDER, k generic —
    * the anchor stream of [[exactSubstringSpans]]. Same
    * normalization (lower + whitespace collapse) and 32-bit seeded
    * hash as the 3-shingle family, so the oracle mirrors the exact
    * formula (hash collisions replay identically — the d10 rule). A
    * doc shorter than k tokens emits NO anchors: it cannot contain a
    * ≥ k-token duplicate. Native codegen expression (see
    * [[hashedShingles]] — the same r14 switch). */
  def positionalHashedKgrams(text: Column, k: Int): Column =
    graft.plans.ShingleHash.positionalKgrams(text, k)

  /** Exact-substring duplicate SPANS (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better"
    * suffix-array rung, re-expressed shingle-anchored): a token
    * position is COVERED iff its k-token gram occurs ≥ 2 times
    * corpus-wide (cross-doc or within-doc — the suffix array makes
    * no distinction either); maximal runs of consecutive covered
    * positions are duplicate spans of token length run + k − 1, and
    * spans ≥ `minLen` tokens are reported as (doc_id, span_start,
    * span_len). Unlike d13's FIXED non-overlapping windows this
    * catches UNALIGNED duplicates — a shared run offset by half a
    * window anchors at every interior position regardless of any
    * grid (Round14OpsSpec plants exactly that miss).
    *
    * Scale shape: O(tokens) anchor fan-out; one g-keyed occurrence
    * count (map-side partial — 8-byte keys); the covered-set join is
    * an UN-HINTED equi-join (the dup-gram set is corpus-proportional
    * on a crawl — the d25 lesson, AQE picks broadcast only when it
    * fits); islands are one per-doc window (bounded per key). Never
    * pairwise, no driver-side data. */
  def exactSubstringSpans(docs: DataFrame, k: Int, minLen: Int): DataFrame = {
    val ex = substringAnchors(docs, k)
    val dup = ex.groupBy("g").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2).select("g")
    coveredToSpans(ex.join(dup, Seq("g")).select("doc_id", "pos"), k, minLen)
  }

  /** Anchor fan-out (doc_id, pos, g) shared by the whole exact-
    * substring family (d26/d27's detect, d28's strip, the stream
    * gate, the indexed forms). Map-only: O(tokens) rows, no shuffle. */
  def substringAnchors(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"),
        positionalHashedKgrams(col("text"), k).as("gs"))
      .select(col("doc_id"), posexplode(col("gs")).as(Seq("pos", "g")))

  /** Covered anchor positions → maximal consecutive islands → spans
    * of token length run + k − 1, kept at ≥ minLen. One per-doc
    * window (bounded per key) + one (doc, grp) aggregate. Public so
    * the streaming gate rides the SAME islands arithmetic as the
    * batch forms (the no-drift rule). */
  def coveredToSpans(covered: DataFrame, k: Int,
      minLen: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    covered
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min("pos").cast("long").as("span_start"),
        (max("pos") - min("pos") + k).cast("long").as("span_len"))
      .filter(col("span_len") >= minLen)
      .select("doc_id", "span_start", "span_len")
  }

  /** BUMP whenever the gram-index layout or anchor semantics change:
    * persisted indexes under java.io.tmpdir otherwise keep serving
    * output built by OLD code (the ClusterLabelsAlgoVersion rule).
    * v2 (r18): gram-hash-sharded layout ([[GramIndexShards]]). */
  private val GramIndexAlgoVersion = 2

  /** Shard fan of the persisted gram index (r18, the SubstringStream
    * sharded-state twin): the table lays out as `shard=<pmod(g,N)>/`
    * partitions, so no single directory's file listing grows with
    * the duplicate volume and a consumer probing a KNOWN gram subset
    * prunes whole shard directories (partition pruning on the shard
    * column). The full-corpus probes d26/d28 run read every shard —
    * same bytes as before, now in bounded directories. */
  private val GramIndexShards = 16

  /** The persisted duplicated-gram table d26 and d28 SHARE (the
    * FingerprintCache build-if-absent pattern): one g-keyed
    * occurrence count + first-occurrence min over the anchor
    * fan-out, kept ONLY where occ ≥ 2 — unique grams (the vast
    * majority of a real corpus) never persist, so the index is
    * duplicate-proportional, not corpus-proportional. Schema
    * (g, occ, first{doc_id, pos}); `first` is the corpus-global
    * lexicographic (doc_id, pos) minimum d28's keep rule reads.
    * Build cost is the single shuffle both queries used to pay
    * independently per run; probes pay only their own map-side
    * fan-out + one equi-join against this table. */
  def writeGramIndex(docs: DataFrame, dir: String, k: Int): Long = {
    val g = substringAnchors(docs, k)
      .groupBy("g")
      .agg(count(lit(1)).as("occ"),
        min(struct(col("doc_id"), col("pos"))).as("first"))
      .filter(col("occ") >= 2)
      .withColumn("shard",
        pmod(col("g"), lit(GramIndexShards.toLong)).cast("int"))
    graft.sources.VersionedTable.writePartitioned(g, dir, "shard")
  }

  /** Build-if-absent for the shared substring gram index, keyed by
    * the data directory's documents.parquet fingerprint + k +
    * [[GramIndexAlgoVersion]] (the ensureClusterLabels lifecycle). */
  def ensureGramIndex(docs: DataFrame, dataDir: String, k: Int): String =
    synchronized {
      val f = new java.io.File(s"$dataDir/documents.parquet")
      val live = s":substr-gram:v$GramIndexAlgoVersion:"
      val key = graft.operators.Retrieval.corpusFingerprintKey(f) +
        s"$live$k"
      val dir = graft.sources.FingerprintCache.prepare(
        "graft_grams", key, live)
      if (graft.sources.VersionedTable.latestVersion(dir).isEmpty)
        writeGramIndex(docs, dir, k)
      dir
    }

  /** [[exactSubstringSpans]] over a pre-built gram index: the
    * g-keyed occurrence count is a table read instead of a shuffle;
    * spec-pinned identical to the self-contained form. */
  def exactSubstringSpansIndexed(docs: DataFrame, grams: DataFrame,
      k: Int, minLen: Int): DataFrame =
    coveredToSpans(
      substringAnchors(docs, k).join(grams.select("g"), Seq("g"))
        .select("doc_id", "pos"),
      k, minLen)

  /** [[substringStripSpans]] over a pre-built gram index (same
    * first-occurrence keep rule, read from the index's `first`). */
  def substringStripSpansIndexed(docs: DataFrame, grams: DataFrame,
      k: Int, minLen: Int): DataFrame = {
    val later = substringAnchors(docs, k)
      .join(grams.select(col("g"), col("first")), Seq("g"))
      .filter(!(col("doc_id") === col("first.doc_id")
        && col("pos") === col("first.pos")))
      .select("doc_id", "pos")
    coveredToSpans(later, k, minLen)
  }

  /** [[stripSubstringDups]] over a pre-built gram index. */
  def stripSubstringDupsIndexed(docs: DataFrame, grams: DataFrame,
      k: Int, minLen: Int): DataFrame =
    stripSpans(docs, substringStripSpansIndexed(docs, grams, k, minLen))

  /** The d28 span source: maximal runs of NON-FIRST covered anchor
    * positions — [[exactSubstringSpans]] restricted to occurrences
    * that are not the corpus-global first of their k-gram
    * (lexicographic (doc_id, pos) minimum, a deterministic total
    * order both engines replay). The first occurrence of every
    * duplicated substring survives; every later occurrence becomes
    * a strip span. Same scale shape as d26 plus one min-struct
    * aggregate riding the existing g-keyed count shuffle. */
  def substringStripSpans(docs: DataFrame, k: Int, minLen: Int): DataFrame = {
    val ex = substringAnchors(docs, k)
    val firsts = ex.groupBy("g")
      .agg(count(lit(1)).as("occ"),
        min(struct(col("doc_id"), col("pos"))).as("first"))
      .filter(col("occ") >= 2)
      .select("g", "first")
    val later = ex.join(firsts, Seq("g"))
      .filter(!(col("doc_id") === col("first.doc_id")
        && col("pos") === col("first.pos")))
      .select("doc_id", "pos")
    coveredToSpans(later, k, minLen)
  }

  /** Exact-substring dedup REWRITE (d28) — the step Lee et al. 2022
    * actually ship (d26 DETECTS spans; this strips them): every
    * duplicated run of ≥ `minLen` tokens keeps its corpus-global
    * FIRST occurrence and is cut from every later one, documents
    * reassembled from their surviving tokens. Output text is in the
    * anchor normalization (lower + collapsed whitespace) so token
    * positions align exactly with the span source. The per-token
    * keep probe is a light HOF over the doc's own (small) span
    * array — the ta2/ta3 carve-out — with `tks` projected to a
    * column first (the x25 outer-expression rule). Scale: d26's
    * shape + one doc-keyed span collect (bounded per doc); the
    * rewrite pass is map-only. */
  def stripSubstringDups(docs: DataFrame, k: Int, minLen: Int): DataFrame = {
    val spans = substringStripSpans(docs, k, minLen)
    stripSpans(docs, spans)
  }

  /** The d28 rewrite half: cut `spans` (doc_id, span_start,
    * span_len) out of each document's normalized token stream.
    * Spans need NOT be token-disjoint: [[substringStripSpans]]
    * islands are only anchor-disjoint, so two islands bridged by
    * fewer than k−1 uncovered anchors (a global-first or unique
    * gram between two later-copy runs) overlap in token space. The
    * exists probe handles overlap naturally, and `n_stripped` is
    * derived from the ACTUAL cut (n_tokens minus surviving tokens),
    * never by summing span_len — summing would double-bill the
    * overlap. Shared by the batch query and the streaming gate so
    * the two can never drift on the cut. */
  def stripSpans(docs: DataFrame, spans: DataFrame): DataFrame = {
    val sp = spans.groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_len"))).as("sp"))
    val toks = docs.select(col("doc_id"),
      split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")
        .as("tks"))
    toks.join(sp, Seq("doc_id"), "left")
      .withColumn("spn", coalesce(col("sp"),
        array().cast("array<struct<span_start:bigint,span_len:bigint>>")))
      .withColumn("kept", filter(
        transform(sequence(lit(0), size(col("tks")) - 1), i =>
          when(exists(col("spn"), s =>
            i >= s.getField("span_start")
              && i < s.getField("span_start") + s.getField("span_len")),
            lit(null)).otherwise(element_at(col("tks"), i + 1))),
        x => x.isNotNull))
      .select(col("doc_id"),
        size(col("tks")).cast("long").as("n_tokens"),
        (size(col("tks")) - size(col("kept"))).cast("long").as("n_stripped"),
        array_join(col("kept"), " ").as("clean_text"))
  }

  /** Within-document repetition REWRITE (d27) — the intra-doc
    * complement of [[boilerplateStrip]]: ta17 only MEASURES the
    * Gopher repetition signals, and d25's hot set is corpus-level;
    * this strikes repeated chunks INSIDE each document (a chunk's
    * first occurrence survives, every later occurrence is dropped)
    * and reassembles the text in token order. Chunking is the same
    * [[docChunks]] grid as d25, so the two rewrites compose without
    * drifting on the chunk definition.
    *
    * Scale shape: NO corpus-wide state at all — one (doc_id, chunk)
    * keyed aggregate (map-side partial) then one doc-keyed
    * reassembly; both shuffles bounded per document. The
    * embarrassing-parallel end of the dedup ladder. */
  def stripInternalRepeats(docs: DataFrame, width: Int = 3): DataFrame =
    docChunks(docs, width)
      .groupBy(col("doc_id"), col("chunk"))
      .agg(min("pos").as("pos"), count(lit(1)).as("occ"))
      .groupBy("doc_id")
      .agg(sum("occ").as("n_chunks"),
        sum(col("occ") - 1).as("n_removed"),
        array_join(transform(array_sort(collect_list(
            struct(col("pos"), col("chunk")))),
          s => s.getField("chunk")), " ").as("clean_text"))

  /** Fuzzy name matching by edit distance: candidates block on a
    * coarse key (brand), verified with Levenshtein. The classic
    * entity-resolution step for short strings where token sets are
    * too coarse; `levenshtein` is codegen'd and identical in the
    * oracle engine. */
  def editDistancePairs(df: DataFrame, idCol: Column, nameCol: Column,
      blockCol: Column, maxDist: Int): DataFrame = {
    // Levenshtein runs on DISTINCT name pairs, never id pairs: string
    // columns repeat heavily (64 distinct names across 20k parts at
    // sf0.1), so the edit-distance matrix is computed once per
    // (name, name) and the verdicts broadcast back to id space —
    // ~4000× fewer distance evaluations than pairing ids directly.
    //
    // Pair generation is an EQUI-join, never names × names: lev ≤ k
    // implies |len(a) - len(b)| ≤ k, and the length constraint turns
    // into a join key — chunk = len/(k+1), probe side exploded to
    // {chunk-1, chunk, chunk+1} (the d2 chunking trick, lossless by
    // the same ±k containment argument). The shuffle distributes over
    // length chunks and each name only meets names of similar length:
    // O(Σ |chunk|²) instead of O(distinct²). For name-heavy corpora
    // where one length dominates, compose a caller-side phonetic/
    // prefix key into `nameCol`'s table before calling (the verify
    // step is unchanged); the chunk join stays exact regardless.
    val chunkW = maxDist + 1
    val names = df.select(nameCol.as("n")).distinct().localCheckpoint(false)
    val n1 = names.select(col("n").as("n1"),
      floor(length(col("n")) / chunkW).as("c1"))
    val n2 = names.select(col("n").as("n2"),
      explode(array(floor(length(col("n")) / chunkW) - 1,
        floor(length(col("n")) / chunkW),
        floor(length(col("n")) / chunkW) + 1)).as("c2"))
    val namePairs = n1
      .join(n2, col("c1") === col("c2") && col("n1") <= col("n2")
        && abs(length(col("n1")) - length(col("n2"))) <= maxDist)
      // thresholded levenshtein: banded O(len·k) with early exit (-1
      // when above the bound) instead of the full O(len²) matrix
      .select(col("n1"), col("n2"),
        levenshtein(col("n1"), col("n2"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
    val p1 = df.select(idCol.as("id1"), nameCol.as("name1"), blockCol.as("blk1"))
    val p2 = df.select(idCol.as("id2"), nameCol.as("name2"), blockCol.as("blk2"))
    // split the cases so no dedup shuffle is needed:
    //  - distinct names (n1 < n2): each unordered id pair matches the
    //    join exactly once (only one name assignment fits) — just
    //    normalize the id order;
    //  - identical names: id1 < id2 directly.
    val diffName = p1
      .join(broadcast(namePairs.filter(col("n1") < col("n2"))), col("name1") === col("n1"))
      .join(p2, col("name2") === col("n2") && col("blk1") === col("blk2"))
      .select(least(col("id1"), col("id2")).as("a_id"),
        greatest(col("id1"), col("id2")).as("b_id"), col("dist"))
    val sameName = p1
      .join(p2, col("name1") === col("name2") && col("blk1") === col("blk2")
        && col("id1") < col("id2"))
      .select(col("id1").as("a_id"), col("id2").as("b_id"), lit(0).as("dist"))
    diffName.unionByName(sameName)
  }

  /** Near-dup clustering: connected components over a pair list,
    * labeling every member with the minimum doc id reachable through
    * the pair graph (the canonical-representative convention — the
    * step that turns pairwise near-dup verdicts into "keep one per
    * cluster" decisions).
    *
    * Algorithm: iterative min-label propagation. Each round every
    * vertex takes the min of its own label and its neighbors' labels;
    * rounds = graph diameter. Near-dup graphs are unions of small
    * dense clusters (diameter ≤ 3 in practice), so this converges in
    * a handful of rounds; for adversarial long-chain graphs use
    * [[connectedComponentsStar]] (O(log² n) rounds worst case, same
    * output contract). The symmetric edge closure carries SELF-LOOPS,
    * so a vertex's own label re-enters each round through the min,
    * with no union-with-previous-labels branch. Convergence is
    * detected exactly: labels only ever decrease, so an unchanged
    * label sum is a fixpoint.
    *
    * PARTITIONER-PRESERVING LOOP (r19, verdict item 2). The r18
    * DataFrame loop re-shuffled the FULL edge set every round: under
    * AQE, a localCheckpoint records UnknownPartitioning (coalesced
    * shuffle reads), so EnsureRequirements re-exchanged BOTH join
    * sides and sorted them — CcProbe measured 3 Exchanges per round
    * (edges + labels + the min-agg) where 1 is fundamental. Long-keyed
    * graphs (every production caller: doc-id pairs) now run the loop
    * on pair RDDs under ONE explicit HashPartitioner: edges are
    * hash-partitioned and persisted once, the per-round join is
    * NARROW (both sides share the partitioner), and only the
    * (dst, label) min-reduce shuffles — one |labels|-sized shuffle
    * per round instead of an |edges|-sized re-shuffle plus two sorts.
    * Locally this measures at parity (CcProbe best-of-warm 1.47 vs
    * 1.48 s on the d8 pair set); the win is the at-scale shape, same
    * doctrine as the r15/r18 de-broadcast work. An AQE-off DataFrame
    * variant also reached 1 Exchange/round but lost AQE coalescing
    * everywhere else in the query and measured ~13% worse — rejected.
    * Key types must be integral (every caller passes long doc ids;
    * the retired DataFrame loop was never type-generic either — its
    * decimal label-sum rejected strings at runtime), enforced loudly
    * up front. CorpusSpec pins min-label ≡ star on multi-hop
    * fixtures and the maxIters refusal.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 25): DataFrame = {
    val keyTypes = pairs.select(col(aCol), col(bCol)).schema.map(_.dataType)
    require(keyTypes.forall {
        case org.apache.spark.sql.types.LongType => true
        case org.apache.spark.sql.types.IntegerType => true
        case _ => false
      },
      s"connectedComponents needs integral id columns, got " +
        s"${keyTypes.mkString(", ")} — map ids to longs first")
    connectedComponentsLongRdd(pairs, aCol, bCol, maxIters)
  }

  /** The long-keyed partitioner-preserving loop — see
    * [[connectedComponents]] for the shape argument. The final label
    * RDD stays localCheckpoint-persisted (the returned frame scans
    * its blocks — the same non-fault-tolerant materialization the
    * repo's DF-side localCheckpoints accept); downstream consumers
    * either act on it per construction or persist the result
    * themselves (e.g. [[writeClusterLabels]]); the bench's
    * between-query sweep and session teardown reclaim the blocks. */
  private def connectedComponentsLongRdd(pairs: DataFrame, aCol: String,
      bCol: String, maxIters: Int): DataFrame = {
    val spark = pairs.sparkSession
    val part = new org.apache.spark.HashPartitioner(
      spark.sparkContext.defaultParallelism)
    val p = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
      .rdd
    // symmetric closure + self-loops, hash-partitioned ONCE
    val edges = p.flatMap { case (a, b) =>
        Iterator((a, b), (b, a), (a, a), (b, b)) }
      .partitionBy(part)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val minLong = (a: Long, b: Long) => math.min(a, b)
    // init = round one: min over self ∪ neighbors (self-loops included).
    // Labels are localCheckpoint'd per round (lineage cut at the first
    // action — the labelSum below), matching the retired DF loop's
    // bounded-lineage posture: without it a 25-round run carries a
    // 25-deep recompute chain through unpersisted intermediates.
    var labels = edges.reduceByKey(part, minLong).localCheckpoint()
    // labels only ever decrease, so ΣBigInt(label) strictly decreases
    // until the fixpoint — exact at any label domain, empty input sums
    // to zero and converges immediately
    def labelSum(r: org.apache.spark.rdd.RDD[(Long, Long)]): BigInt =
      r.aggregate(BigInt(0))((acc, kv) => acc + kv._2, _ + _)
    var prevSum = labelSum(labels)
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      // narrow join (shared partitioner) + one min-reduce shuffle
      val next = edges.join(labels, part)
        .map { case (_, (dst, label)) => (dst, label) }
        .reduceByKey(part, minLong)
        .localCheckpoint()
      val nextSum = labelSum(next)
      labels.unpersist(blocking = false)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      iters += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters iterations")
    edges.unpersist(blocking = false)
    spark.createDataFrame(labels).toDF("id", "cluster_id")
  }

  /** Connected components in O(log n) rounds: alternating
    * large-star/small-star (Kiveris et al., "Connected Components in
    * MapReduce and Beyond") — the variant for graphs whose diameter
    * is NOT small (chains of pairwise near-dups spanning millions of
    * docs), where per-round min propagation would need diameter
    * rounds. Same output contract as [[connectedComponents]].
    *
    * Each round is two star operations, each one groupBy-min plus
    * one join back to the edge list — no collect_list, so a
    * high-degree hub never materializes its neighborhood in one row.
    * Convergence = the small-star edge set reaches a fixpoint
    * (checked exactly with exceptAll, not a hash heuristic); at the
    * fixpoint every vertex points directly at its component minimum.
    */
  def connectedComponentsStar(pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 60): DataFrame = {
    // vertex set from the RAW pairs (a self-pair-only vertex is a
    // legitimate singleton and must label itself, matching
    // connectedComponents); edges from the self-loop-free pairs
    val p = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint(false)
    // directed hi→lo, deduped
    var dir = p.filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .distinct().localCheckpoint(false)
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      // large-star: every neighbor v > u links to m = min(N(u) ∪ {u})
      val sym = dir.select(col("u"), col("v"))
        .unionByName(dir.select(col("v").as("u"), col("u").as("v")))
      val lsMins = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val ls = sym.join(lsMins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // small-star: u and its smaller neighbors all link to the min
      val ssMins = ls.groupBy("u").agg(min("v").as("m"))
      val ss = ls.join(ssMins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(ssMins.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint(false)
      converged = ss.count() == dir.count() &&
        ss.exceptAll(dir).isEmpty
      dir = ss
      iters += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIters rounds")
    // at the fixpoint dir is (vertex, component-min); minima map to
    // themselves
    val verts = p.select(col("a").as("id"))
      .unionByName(p.select(col("b").as("id"))).distinct()
    verts.join(dir.select(col("u").as("id"), col("v").as("m")), Seq("id"), "left")
      .select(col("id"), coalesce(col("m"), col("id")).as("cluster_id"))
  }

  /** Edge-count-adaptive connected components: route to min-label
    * propagation or the large/small-star twin from the MEASURED soak
    * crossover (Soak.scala, identical clusters both sides: min-label
    * 4.7 vs 6.6 s at 243k edges, star 14.6 vs 17.7 s at 2.16M —
    * min-label's per-round edges⋈labels join grows with edge volume,
    * star contraction amortizes it above ~1M edges). The pair frame
    * is LAZILY checkpointed and materialized by the routing count in
    * the same job (r18) — the (possibly expensive) candidate pipeline
    * runs exactly once and the CC loop reads the materialized blocks.
    * Why this lazy frame is exempt from the eager-checkpoint rule
    * (CLAUDE.md): the count() action runs IMMEDIATELY after the
    * checkpoint with no intervening plan, so the blocks exist before
    * any later execution could observe an empty replay — the same
    * audited checkpoint-then-immediate-aggregate shape as the loop's
    * own per-round labelSum. If a future Spark/AQE bump perturbs
    * this, revert to localCheckpoint(eager = true) and re-measure. */
  /** The routing rule, exposed so callers (Soak's router line, specs)
    * can observe which algorithm a given edge count selects. */
  def ccRouteForCount(nEdges: Long, crossover: Long = 1000000L): String =
    if (nEdges <= crossover) "minlabel" else "star"

  def connectedComponentsAdaptive(pairs: DataFrame, aCol: String,
      bCol: String, crossover: Long = 1000000L): DataFrame = {
    // lazy checkpoint + immediate count (r18): the count action
    // materializes the blocks in the same job (the CC loop's audited
    // checkpoint-then-immediate-aggregate pattern) — the former
    // EAGER checkpoint ran the candidate pipeline as one job and
    // then re-scanned the blocks in a second for the count
    val p = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint(false)
    if (ccRouteForCount(p.count(), crossover) == "minlabel")
      connectedComponents(p, "a", "b")
    else connectedComponentsStar(p, "a", "b")
  }

  /** LSH acceptance gate — the s8/s9 recall contract applied to
    * dedup: before trusting banded MinHash at corpus scale, measure
    * what fraction of TRUE near-dup pairs (exact Jaccard ≥ τ over
    * the [[ngramJaccard]] length-blocked ground truth) each band
    * configuration's candidates actually surface. More bands × fewer
    * rows = higher candidate probability at a given J (1−(1−J^r)^b)
    * = higher recall and more verification work — this gate is the
    * measured operating chart for that knob, the dedup twin of
    * FAISS's recall-vs-nProbe sweep.
    *
    * Output: one ALL-INTEGER row per configuration (n_bands,
    * rows_per_band, n_true, n_found, recall_x10000 — floored integer
    * division, engine-portable). Scale: ground truth is quadratic-
    * bounded by the same blocking d2 uses, so at 100 TB the gate
    * runs on a bounded SAMPLE of the corpus (it is an acceptance
    * test, not a production pass); every stage is the d2/d3
    * candidate machinery unchanged. */
  def lshRecallGate(docs: DataFrame, k: Int, bandConfigs: Seq[Int],
      threshold: Double, charWindow: Int): DataFrame = {
    // ONE shingle pass for the whole gate (r18): the truth pipeline
    // and every band config read the same materialized hashed-shingle
    // corpus — before, each of the three pipelines re-shingled the
    // corpus into its own checkpoint. All branches belong to the
    // SINGLE final union plan, so the lazy checkpoint is safe per the
    // crosses-executions rule.
    val s = withHashedShingles(docs).localCheckpoint(false)
    // one truth frame read once per config branch of the SINGLE
    // final union plan — safe lazy per the crosses-executions rule
    val truth = ngramJaccardShingled(s, threshold, charWindow)
      .select(col("a_id"), col("b_id"))
      .localCheckpoint(false)
    bandConfigs.map { b =>
      val found = minhashLshShingled(s, k, b, threshold)
        .select(col("a_id"), col("b_id"), lit(1).as("hit"))
      truth.join(found, Seq("a_id", "b_id"), "left")
        .agg(count(lit(1)).as("n_true"), count(col("hit")).as("n_found"))
        .select(lit(b).as("n_bands"), lit(k / b).as("rows_per_band"),
          col("n_true"), col("n_found"),
          // n_true = 0 (no true near-dup pairs in the corpus) is
          // vacuous recall, not NULL: Spark's DIV would emit NULL
          // where DuckDB's // errors/diverges, and a NULL gate row
          // reads as a pass — report 10000 explicitly instead
          when(col("n_true") === 0, lit(10000L))
            .otherwise(expr("n_found * 10000 DIV n_true"))
            .as("recall_x10000"))
    }.reduce(_ unionByName _)
  }

  /** Build side of the dedup-label lifecycle (the x7
    * build-once/search-many shape applied to clustering): run
    * MinHash-LSH + adaptive connected components ONCE and persist
    * every document's membership row (doc_id, cluster_id, n_chars)
    * behind a [[graft.sources.VersionedTable]] alias. At 100 TB the
    * LSH+CC pass is the expensive stage; every downstream consumer
    * (keep-lists, split accounting, reporting) should scan the
    * persisted labels, not re-cluster. Returns the published
    * version. */
  def writeClusterLabels(docs: DataFrame, labelsDir: String,
      k: Int = 8, bands: Int = 4, threshold: Double = 0.8): Long = {
    val pairs = minhashLsh(docs, k, bands, threshold)
    val cc = connectedComponentsAdaptive(pairs, "a_id", "b_id")
      .withColumnRenamed("id", "doc_id")
    val mem = docs
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        col("n_chars"))
    graft.sources.VersionedTable.write(mem, labelsDir)
  }

  /** Algorithm-version salt for [[ensureClusterLabels]]' cache key.
    * BUMP THIS whenever writeClusterLabels / minhashLsh / connected
    * components change semantics: the persisted labels under
    * java.io.tmpdir otherwise keep serving output built by the OLD
    * code until /tmp is cleared — the same stale-reads-green hazard
    * class as a stale /tmp/graft_verify dump. */
  private val ClusterLabelsAlgoVersion = 1

  /** Build-if-absent for cluster labels derived from one data
    * directory, fingerprint-keyed like Retrieval.ensureIndex (data
    * files + LSH parameters + [[ClusterLabelsAlgoVersion]]), so
    * repeated queries in one session — and the bench's repeated
    * executions — reuse the one build without ever reusing a build
    * from older label-writing code. Returns the labels dir. */
  def ensureClusterLabels(docs: DataFrame, dataDir: String,
      k: Int = 8, bands: Int = 4, threshold: Double = 0.8): String =
    synchronized {
      val f = new java.io.File(s"$dataDir/documents.parquet")
      val live = s":cc-lsh:v$ClusterLabelsAlgoVersion:"
      val key = graft.operators.Retrieval.corpusFingerprintKey(f) +
        s"$live$k:$bands:$threshold"
      // marker-before-build + stale sweep via the shared lifecycle
      // (FingerprintCache scaladoc documents the concurrency
      // argument originally proven here for graft_cclabels).
      val dir = graft.sources.FingerprintCache.prepare(
        "graft_cclabels", key, live)
      if (graft.sources.VersionedTable.latestVersion(dir).isEmpty)
        writeClusterLabels(docs, dir, k, bands, threshold)
      dir
    }

  /** Keep-list READ path over a persisted membership frame (doc_id,
    * cluster_id, n_chars): longest member per non-singleton cluster,
    * ties to smallest doc_id — the identical decision to the inline
    * d18 form (spec-proven equal), but the input is a label scan,
    * not a re-clustering: one cluster_id-keyed count + one window
    * over O(|docs|) rows. */
  def clusterRepFromLabels(mem: DataFrame): DataFrame = {
    val counts = mem.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    mem.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(counts, Seq("cluster_id"))
      .filter(col("n_members") >= 2)
      .select(col("cluster_id"), col("doc_id").as("rep_id"),
        col("n_chars").as("rep_n_chars"), col("n_members"))
  }

  /** Dedup SURVIVOR list over a persisted membership frame (doc_id,
    * cluster_id, n_chars) — the keep-list the Ivfpq scaladoc's
    * serving recommendation ("dedup BEFORE indexing") consumes:
    * exactly ONE survivor per cluster, chosen by the d18 decision
    * (longest member, ties to smallest doc_id) and extended to
    * singleton clusters, which keep their only member. One window
    * over a label scan — build-once/read-many like every other
    * labels consumer; DedupAnnComposeSpec builds an IVFPQ index
    * from this list and the Soak chart measures the rerank knob
    * returning to k×small on the deduped corpus. */
  def survivorsFromLabels(mem: DataFrame): DataFrame = {
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    mem.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("cluster_id"))
  }

  /** Cross-source duplication matrix (d16's operator form): for
    * every source pair, how many distinct `width`-token passages they
    * share. Plan: d13's chunker (posexplode, map-only) → md5 →
    * DISTINCT (source, hash) — the per-source posting dedup that
    * bounds everything downstream — → one hash-keyed self-join →
    * pair count. The shared posting frame is a single-plan
    * multi-read localCheckpoint (every branch belongs to ONE
    * execution).
    *
    * `maxDf` is the 100 TB knob (d14's recall/volume trade): a
    * passage present in more than `maxDf` sources is boilerplate
    * (licence headers, navigation chrome), not reprinting — and it
    * is exactly the hash whose self-join fanout is df² per hash.
    * Capping bounds total pair volume by maxDf·Σdf instead of
    * |sources|²·|boilerplate hashes|. With cap ≥ the true max df the
    * result is exact (spec-pinned); uncapped (`None`) is the small-
    * source-set form the d16 oracle runs. */
  def sourceOverlap(docs: DataFrame, sourceCol: Column, textCol: Column,
      width: Int, stride: Int, maxDf: Option[Int] = None): DataFrame = {
    val p = graft.text.TextAnalysis.explodeChunks(
        docs.select(sourceCol.as("source"), textCol.as("text")),
        col("text"), width, stride)
      .select(col("source"), md5(col("chunk_text")).as("h"))
      .distinct()
      .localCheckpoint(false)
    val kept = maxDf match {
      case Some(cap) =>
        // df over DISTINCT sources (p is already per-source distinct);
        // semi-join keeps only discriminative hashes. The df frame is
        // another branch of the same single execution.
        p.join(p.groupBy("h").agg(count(lit(1)).as("df"))
            .filter(col("df") <= cap).select("h"),
          Seq("h"), "left_semi")
      case None => p
    }
    kept.select(col("source").as("source_a"), col("h"))
      .join(kept.select(col("source").as("source_b"), col("h")), "h")
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Embedding near-dup pairs: block on a coarse cluster key (here
    * the label column, playing the IVF-centroid role), exact cosine
    * within blocks, threshold on the rounded value. Cosine runs on
    * the native DotProduct expression (graft.plans.VectorExpr). */
  def embeddingCosinePairs(embeddings: DataFrame, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    // single-plan checkpoint + shuffle_hash (r18, the d4/m5 rule):
    // both self-join sides are the same corpus-proportional embedding
    // frame — un-checkpointed the scan + vector decode ran twice, and
    // the small-SF broadcast of a corpus side cannot exist at 100 TB;
    // the block-keyed shuffle join with AQE exchange reuse is the
    // at-scale plan.
    val e = embeddings.select(col("vec_id"), col(blockCol).as("block"),
        graft.functions.Vectors.toDouble(col(vecCol)).as("v"))
      .localCheckpoint(false).hint("shuffle_hash")
    val a = e.select(col("vec_id").as("a_id"), col("block").as("a_block"), col("v").as("a_v"))
    val b = e.select(col("vec_id").as("b_id"), col("block").as("b_block"), col("v").as("b_v"))
    a.join(b, col("a_block") === col("b_block") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        graft.functions.Vectors.cosine4(col("a_v"), col("b_v")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
