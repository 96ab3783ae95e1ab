package graft.queries

import graft.Tables
import graft.dedup.{Dedup, SimHash}
import graft.functions.Vectors
import graft.similarity.Knn
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup (d1–d10) and similarity-search (s1–s5) query surface
  * (SURVEY.md §2). EVERY query here is oracle-checked — including
  * the approximate searches: d4's SimHash (splitmix64 re-derived in
  * UBIGINT SQL), s2's LSH buckets (deterministic md5-derived
  * planes), and s4's IVF (quantized coarse quantizer → exact integer
  * centroid sums → deterministic probes) are all exactly replayable
  * in DuckDB.
  */
object DedupSim {

  /** Augmented embeddings: originals plus a deterministically
    * perturbed copy (vec_id + 1000000): v'_i = v_i + 0.05 * v_{(i+1) mod 64}.
    * Mirrored in the d5 oracle. */
  def augmentedEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), Vectors.toDouble(col("embedding")).as("v"))
    e.unionByName(e.select(
      (col("vec_id") + 1000000L).as("vec_id"),
      col("label"),
      transform(sequence(lit(0), lit(63)), i =>
        try_element_at(col("v"), i + 1)
          + lit(0.05) * try_element_at(col("v"), pmod(i + 1, lit(64)) + 1)).as("v")))
  }

  def d1Exact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(Dedup.augmentedDocs(spark, dir))
      .orderBy("keep_id")

  /** d24: canonical-URL dedup ([[graft.dedup.UrlDedup]]) — the
    * pre-content dedup rung every web-scale pipeline runs first. The
    * testdata carries no URL column, so each doc synthesizes one of
    * four crawl-variant shapes of the same logical page (uppercase
    * www host + default port + utm param / mixed-case host +
    * fragment / trailing slash / a KEPT id param + trailing utm):
    * shapes 0-2 collapse to one canonical URL per doc_id-quad, shape
    * 3 stays distinct through its non-tracking param. The oracle
    * does NOT re-implement the normalization — it states each
    * shape's expected canonical form as ground truth (the r6
    * pattern); UrlDedupSpec covers the normalization contract on
    * adversarial URLs. Map-only normalize + ONE hash agg on the
    * canonical key — the d1 exact-dedup scale shape. */
  def d24UrlDedup(spark: SparkSession, dir: String): DataFrame = {
    val k = expr("doc_id div 4").cast("string")
    val m = col("doc_id") % 4
    val url =
      when(m === 0, concat(lit("http://WWW.Example.com:80/a/"), k,
        lit("?utm_source=feed")))
      .when(m === 1, concat(lit("http://example.COM/a/"), k, lit("#frag")))
      .when(m === 2, concat(lit("http://example.com/a/"), k, lit("/")))
      .otherwise(concat(lit("http://example.com/a/"), k,
        lit("?id=1&utm_campaign=x")))
    graft.dedup.UrlDedup.dedupByUrl(
        Tables.documents(spark, dir).select(col("doc_id"), url.as("url")),
        col("doc_id"), col("url"))
      .orderBy("canonical_url")
  }

  def d2NgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(Dedup.augmentedDocs(spark, dir), threshold = 0.8, charWindow = 25)
      .orderBy("a_id", "b_id")

  /** d14: asymmetric containment pairs — |A∩B|/min thresholded as
    * pure integer math (n_shared·100 ≥ 70·n_min), candidates from
    * the discriminative-shingle (2 ≤ df ≤ 4) inverted-index join. */
  def d14Containment(spark: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(Dedup.augmentedDocs(spark, dir),
        thresholdPct = 70, maxDf = 4)
      .orderBy("a_id", "b_id")

  def d3MinhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(Dedup.augmentedDocs(spark, dir), k = 8, bands = 4, threshold = 0.8)
      .orderBy("a_id", "b_id")

  def d4Simhash(spark: SparkSession, dir: String): DataFrame =
    SimHash.nearDupPairs(Dedup.augmentedDocs(spark, dir), maxHamming = 6)
      .orderBy("a_id", "b_id")

  /** d30: [[SimHash.nearDupPairsAuto]] with the self-tuning bucket
    * cap BINDING (r16 verdict item 4 — d4 runs uncapped because the
    * bench corpus has no saturated buckets; this query PLANTS one, so
    * the production skew-guard branch is driver-oracled, the d21
    * recall-gate pattern). One identical boilerplate template per
    * source document (the d24/d25 synthesis posture: disjoint
    * vocabulary, so no organic shingle is perturbed) puts |docs|
    * copies into each of one simhash's 7 pigeonhole buckets —
    * corpus-proportional, so it outgrows the p99-derived cap at
    * every SF (measured cap 40/44/144 vs planted bucket 617/606/6162
    * at sf0.001/0.01/0.1) where a fixed-count plant would die under
    * SF growth (the d25 lesson). The capped recall trade is exactly
    * what the oracle replays: planted pairs must NOT appear, every
    * sane-bucket pair must. */
  def d30AutoCap(spark: SparkSession, dir: String): DataFrame = {
    val tplText =
      "zvq0 zvq1 zvq2 zvq3 zvq4 zvq5 zvq6 zvq7 zvq8 zvq9 zvq10 zvq11"
    val tpl = Tables.documents(spark, dir).select(
        (col("doc_id") + 9000000L).as("doc_id"),
        lit(tplText).as("text"), lit("zz").as("lang"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    SimHash.nearDupPairsAuto(
        Dedup.augmentedDocs(spark, dir).unionByName(tpl), maxHamming = 6)
      .orderBy("a_id", "b_id")
  }

  def d5EmbedCosine(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingCosinePairs(
        augmentedEmbeddings(spark, dir).select(col("vec_id"), col("label"), col("v").as("embedding")),
        vecCol = "embedding", blockCol = "label", threshold = 0.9)
      .orderBy("a_id", "b_id")

  def d6EditDist(spark: SparkSession, dir: String): DataFrame =
    Dedup.editDistancePairs(Tables.part(spark, dir),
        col("p_partkey"), col("p_name"), col("p_brand"), maxDist = 4)
      .orderBy("a_id", "b_id")

  /** d7: benchmark decontamination — docs 0–9 play the eval set. */
  def d7Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.decontaminate(
        corpus = docs.filter(col("doc_id") >= 10),
        benchmark = docs.filter(col("doc_id") < 10),
        minSharedShingles = 3)
      .orderBy("doc_id")
  }

  /** d23: span-level contamination audit — d7's verdict upgraded to
    * provenance: WHICH eval item leaked into which document and
    * WHERE (the token-position span of the matching shingles), the
    * evidence a redaction pass acts on where a boolean can only drop
    * the doc. Same broadcast/explode scale shape as d7 with
    * positions carried. */
  def d23ContamSpans(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.contaminationSpans(
        corpus = docs.filter(col("doc_id") >= 10),
        benchmark = docs.filter(col("doc_id") < 10),
        minSharedShingles = 3)
      .orderBy("doc_id", "bench_id")
  }

  /** d29: cross-corpus exact-substring DECONTAMINATION rewrite —
    * the Lee et al. 2022 strip applied against the eval set (the
    * d7/d23 convention: docs < 10 are the benchmark, the rest the
    * corpus). d7 drops whole contaminated docs, d23 reports coarse
    * [first, last] audit bounds; this SURGICALLY cuts every maximal
    * ≥ 20-token run whose 10-grams occur in the eval set and keeps
    * the rest of the document. Planted positives (the d24 synthesis
    * pattern, both HAVING branches live at every SF): each eval doc
    * gets a LONG corpus twin (+4,000,000: three vocab-disjoint
    * tokens then eval tokens 8..47 — a 40-token verbatim leak that
    * strips to the three unique tokens) and a SHORT twin
    * (+4,100,000: eval tokens 8..22, a 15-token covered island
    * UNDER minLen that must survive untouched — the cut's drop
    * branch, deterministic at every SF). The cleaned STRING is
    * hash-compared (the ta8/d25/d28 posture); counts ALL-INTEGER. */
  def d29DecontamStrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val eval = docs.filter(col("doc_id") < 10)
    def twin(offset: Long, pfx: String, from: Int, len: Int) =
      eval.select((col("doc_id") + offset).as("doc_id"),
        concat_ws(" ",
          concat(lit(pfx + "q"), col("doc_id")),
          concat(lit(pfx + "r"), col("doc_id")),
          concat(lit(pfx + "s"), col("doc_id")),
          array_join(slice(split(trim(col("text")), "\\s+"), from, len), " "))
          .as("text"))
    val corpus = docs.filter(col("doc_id") >= 10)
      .unionByName(twin(4000000L, "zt", 8, 40))
      .unionByName(twin(4100000L, "zu", 8, 15))
    Dedup.stripEvalSubstrings(corpus, eval, k = 10, minLen = 20)
      .orderBy("doc_id")
  }

  /** d9: Bloom-prefiltered decontamination — the map-side-thinned
    * twin of d7 (exact same output contract by the no-false-negative
    * argument in Dedup.decontaminateBloom; run here at threshold 2
    * so d7/d9 oracle rows genuinely differ). */
  def d9Bloom(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.decontaminateBloom(
        corpus = docs.filter(col("doc_id") >= 10),
        benchmark = docs.filter(col("doc_id") < 10),
        minSharedShingles = 2)
      .orderBy("doc_id")
  }

  /** d10: duplicated-span statistics over the augmented corpus (the
    * planted exact/near copies guarantee shared spans exist). */
  def d10DupSpans(spark: SparkSession, dir: String): DataFrame =
    Dedup.dupSpanStats(Dedup.augmentedDocs(spark, dir))
      .orderBy("doc_id")

  /** Header templates d25 plants (the d24 synthesis pattern: the
    * testdata has no boilerplate, so the query synthesizes the
    * crawl-header shapes a web corpus carries). Six tokens each —
    * exactly two width-3 chunks, so no header chunk straddles into
    * body text — over a vocabulary disjoint from the corpus's, so a
    * header chunk can never collide with a natural one. */
  private val d25Headers = Seq(
    "subscribe to our newsletter for updates",
    "all rights reserved by the publisher",
    "click here to accept cookie policy",
    "share this article on social feed")

  /** d25: boilerplate-chunk removal (the C4/CCNet repeated-line
    * rung) — d10 measures duplicated spans, this one REWRITES the
    * corpus: non-overlapping 3-token chunks occurring ≥ 3 times
    * corpus-wide (C4's own "any line appearing three or more times"
    * rule) are struck and the cleaned text reassembled in token
    * order. Each doc gets one of four planted header templates
    * (doc_id % 4), so the cut is live on BOTH branches at every SF:
    * headers are hot everywhere (occ ≈ |docs|/4), natural trigrams
    * mostly survive at small SF and split by Poisson spread at
    * sf0.1 — and a few hundred sf0.1 docs go fully-boilerplate,
    * keeping the empty-rewrite edge oracle-exercised. The cleaned
    * STRING itself is hash-compared (the ta8 posture). */
  def d25BoilerplateStrip(spark: SparkSession, dir: String): DataFrame = {
    val hdrs = array(d25Headers.map(lit): _*)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(element_at(hdrs, pmod(col("doc_id"), lit(4)).cast("int") + 1),
          lit(" "), trim(col("text"))).as("text"))
    Dedup.boilerplateStrip(docs, width = 3, minOcc = 3L)
      .orderBy("doc_id")
  }

  /** d26: exact-substring duplicate spans (the Lee et al. 2022
    * suffix-array rung, shingle-anchored) — the UNALIGNED-duplicate
    * detector d13's fixed 20-token window grid provably misses. The
    * corpus plants its own positives (the d24 synthesis pattern):
    * every %10 doc gets a twin (doc_id + 3000000) carrying three
    * vocab-disjoint unique tokens then tokens 8..47 of the original —
    * a 40-token verbatim copy starting at offset 7, half a d13
    * window off the grid, so no 20-token aligned passage matches but
    * every interior 10-gram anchors. Expected spans: start 3/len 40
    * in the twin, start 7/len 40 in the original (clipped on short
    * docs; natural repeats extend spans identically in both engines —
    * the oracle replays the same h32 anchor hashing, so even hash
    * collisions replay). ALL-INTEGER output. */
  /** The d26/d28 planted corpus: documents plus an offset-7 40-token
    * copy twin for every %10 doc (see d26's scaladoc). */
  private def substringBase(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val planted = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat_ws(" ",
          concat(lit("zq"), col("doc_id")),
          concat(lit("zr"), col("doc_id")),
          concat(lit("zs"), col("doc_id")),
          array_join(slice(split(trim(col("text")), "\\s+"), 8, 40), " "))
          .as("text"))
    docs.unionByName(planted)
  }

  /** The shared persisted gram index d26 and d28 both probe (the
    * FingerprintCache build-if-absent lifecycle, r15): both queries
    * used to rebuild the identical anchor fan-out + g-keyed
    * occurrence count per run; the duplicated-gram table now builds
    * once per (data fingerprint, k) and each query pays only its
    * map-side fan-out + one equi-join. Listed in
    * Bench.indexedQueries so driver runs report build-if-absent
    * separately from the probe. */
  private def gramIndex(spark: SparkSession, dir: String): DataFrame = {
    val gdir = Dedup.ensureGramIndex(substringBase(spark, dir), dir, k = 10)
    graft.sources.VersionedTable.readLatest(spark, gdir)
  }

  def d26SubstringSpans(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactSubstringSpansIndexed(substringBase(spark, dir),
        gramIndex(spark, dir), k = 10, minLen = 20)
      .orderBy("doc_id", "span_start")

  /** d28: the exact-substring dedup REWRITE (d26 detects, this
    * ships the cut — the Lee et al. 2022 step itself): every
    * duplicated ≥20-token run keeps its corpus-global FIRST
    * occurrence ((doc_id, pos)-lexicographic, replayed by a
    * row_number in the oracle) and is stripped from every later
    * one; documents reassemble from surviving tokens in the anchor
    * normalization. On the planted corpus each %10 original keeps
    * its text intact (it IS the first occurrence) while its twin
    * sheds the whole copied run down to its three unique tokens —
    * and natural duplicates exercise the strip on unplanted docs
    * too. The cleaned STRING is hash-compared (the ta8/d25
    * posture); counts ALL-INTEGER. */
  def d28SubstringStrip(spark: SparkSession, dir: String): DataFrame =
    Dedup.stripSubstringDupsIndexed(substringBase(spark, dir),
        gramIndex(spark, dir), k = 10, minLen = 20)
      .orderBy("doc_id")

  /** d27: within-doc repetition rewrite — the intra-document
    * complement of d25 (ta17 measures the Gopher repetition signals;
    * this STRIPS them): repeated width-3 chunks inside one document
    * keep their first occurrence, later occurrences drop, text
    * reassembles in token order. Planted positives: every %7 doc is
    * prefixed with its own first six tokens, so the body's first two
    * grid chunks repeat the prefix chunks exactly (prepending keeps
    * the 3-token grid aligned — appending would straddle the
    * trailing partial chunk); every other doc is the
    * nothing-removed branch. The cleaned STRING is hash-compared
    * (the ta8/d25 posture). */
  def d27InternalRepeats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(
            array_join(slice(split(trim(col("text")), "\\s+"), 1, 6), " "),
            lit(" "), trim(col("text"))))
          .otherwise(col("text")).as("text"))
    Dedup.stripInternalRepeats(docs, width = 3)
      .orderBy("doc_id")
  }

  /** d8: the full dedup decision — MinHash-LSH pairs (the d3
    * pipeline) → connected components → every document labeled with
    * its cluster's canonical (minimum) id; `is_canonical` marks the
    * one document per cluster a training pipeline would keep. The CC
    * step routes through the edge-count-adaptive picker (min-label
    * below the measured ~1M-edge crossover, large/small-star above —
    * both routes equivalence-spec'd, so the label output is route-
    * independent). */
  def d8Cluster(spark: SparkSession, dir: String): DataFrame = {
    val docs = Dedup.augmentedDocs(spark, dir)
    val pairs = Dedup.minhashLsh(docs, k = 8, bands = 4, threshold = 0.8)
    val cc = Dedup.connectedComponentsAdaptive(pairs, "a_id", "b_id")
      .withColumnRenamed("id", "doc_id")
    docs.select(col("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("is_canonical", col("cluster_id") === col("doc_id"))
      .orderBy("doc_id")
  }

  /** d12: incremental dedup — the augmented copies play the incoming
    * batch, the original documents the existing corpus; the batch
    * probes the base's banded MinHash index. Every planted copy
    * should link back to its original (J=1 exact, J≥0.8 near). */
  def d12Incremental(spark: SparkSession, dir: String): DataFrame = {
    val aug = Dedup.augmentedDocs(spark, dir)
    Dedup.minhashLshIncremental(
        base = aug.filter(col("doc_id") < Dedup.NearOffset),
        delta = aug.filter(col("doc_id") >= Dedup.NearOffset),
        k = 8, bands = 4, threshold = 0.8)
      .orderBy("new_id", "dup_of")
  }

  /** d11: semantic dedup (SemDeDup) over the augmented embeddings —
    * quantized-centroid coarse clusters seeded by label, within-
    * cluster cosine >= 0.99, greedy keep-the-min-id decision. The
    * planted perturbed copies (cos ~0.9988 to their originals) are
    * the semantic dups; random pairs sit far below the bar. */
  def d11SemDedup(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.SemDedup.semDedup(
        augmentedEmbeddings(spark, dir)
          .select(col("vec_id").as("id"), col("label"), col("v")),
        seedKey = "label", tau = 0.99)
      .select(col("id").as("vec_id"), col("cluster_id"), col("is_kept"))
      .orderBy("vec_id")

  /** d13: passage-level dedup — exact dedup at SUB-document
    * granularity (the RefinedWeb/CCNet line-dedup shape: boilerplate
    * repeats across documents even when whole documents don't).
    * Non-overlapping 20-token windows, first occurrence kept by
    * (doc_id, chunk_idx) order, and each document rebuilt from its
    * kept passages. Two shuffles: the passage-hash window (uniform
    * md5 key) and the per-doc reassembly — linear in corpus tokens,
    * nothing pairwise. An exact copy of a document keeps ZERO
    * passages; a 20-char-shifted near-dup re-aligns almost nowhere,
    * so both engines must agree on every boundary. */
  def d13PassageDedup(spark: SparkSession, dir: String): DataFrame = {
    val pass = graft.text.TextAnalysis.explodeChunks(
        Dedup.augmentedDocs(spark, dir).select("doc_id", "text"),
        col("text"), width = 20, stride = 20)
      .select(col("doc_id"), col("chunk_idx"),
        col("chunk_text").as("passage"))
    val w = Window.partitionBy(md5(col("passage")))
      .orderBy(col("doc_id"), col("chunk_idx"))
    pass.withColumn("rn", row_number().over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_passages"),
        sum((col("rn") === 1).cast("long")).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("rn") === 1,
            struct(col("chunk_idx"), col("passage"))))),
          s => s.getField("passage"))).as("dedup_text"))
      .orderBy("doc_id")
  }

  /** s8: ANN recall@k evaluation — the acceptance gate every
    * approximate index needs before it replaces the exact search:
    * per query, how many of the true top-k (brute force, the s1
    * plan) the IVF probe (the s4 plan) actually returned. ALL-
    * INTEGER output (n_hits of k). At 100 TB the truth side runs on
    * a SAMPLE of queries — the plan is identical, only the query-set
    * filter changes; the corpus-side cost is one brute-force pass
    * over the sampled queries plus the index probe being audited. */
  def s8Recall(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("label"),
        Vectors.toDouble(col("embedding")).as("v"))
    val q = e.filter(col("id") < 10).select("id", "v")
    val c = e.filter(col("id") >= 10)
    val truth = Knn.bruteForce(q, c.select("id", "v"), k = 5)
      .select(col("q_id"), col("n_id"))
    val approx = graft.similarity.Ivf.search(q, c.select("id", "v", "label"),
        listKey = "label", k = 5, nProbe = 2, centroidScale = 1000000L)
      .select(col("q_id"), col("n_id"), lit(1).as("hit"))
    truth.join(approx, Seq("q_id", "n_id"), "left")
      .groupBy("q_id")
      .agg(count(col("hit")).as("n_hits"))
      .withColumn("k", lit(5))
      .orderBy("q_id")
  }

  /** d16: cross-source duplication matrix — for every source pair,
    * how many distinct 20-token passages they share (the corpus-audit
    * answer to "which sources reprint which", and the planning input
    * for source-level dedup priorities). Plan: d13's chunker
    * (posexplode, map-only) → md5 → DISTINCT (source, hash) — the
    * per-source posting dedup that bounds everything downstream —
    * → one hash-keyed self-join → pair count. The shared frame is a
    * single-plan multi-read localCheckpoint (both join branches of
    * ONE execution). At web scale pass maxDf (Dedup.sourceOverlap's
    * d14-style df cap — boilerplate hashes are dropped before the
    * self-join, soak-exercised in Soak.scala); at the fixture's 20
    * sources the uncapped join is exact and tiny. */
  def d16SourceOverlap(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.sourceOverlap(Tables.documents(spark, dir),
        col("source"), col("text"), width = 20, stride = 20,
        maxDf = None)
      .orderBy("source_a", "source_b")

  /** d18: duplicate-cluster representative selection — the canonical
    * dedup OUTPUT: d8's clustering reduced to the keep-list a
    * pipeline actually writes (keep the LONGEST member per cluster,
    * ties to the smallest doc_id — the planted exact copies tie on
    * n_chars, so the tie branch is oracle-exercised at every SF).
    * Singleton clusters are excluded: the keep-list's interesting
    * rows are the ones where something was dropped. Plan: the d8
    * pipeline (LSH candidates → min-label propagation) → ONE shared
    * membership frame (single-plan lazy checkpoint: the counts and
    * window branches belong to one execution) → per-cluster
    * row_number + member count, both shuffles keyed on cluster_id. */
  def d18ClusterRep(spark: SparkSession, dir: String): DataFrame = {
    val docs = Dedup.augmentedDocs(spark, dir)
    val pairs = Dedup.minhashLsh(docs, k = 8, bands = 4, threshold = 0.8)
    val cc = Dedup.connectedComponentsAdaptive(pairs, "a_id", "b_id")
      .withColumnRenamed("id", "doc_id")
    val mem = docs
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        col("n_chars"))
      .localCheckpoint(false)
    Dedup.clusterRepFromLabels(mem).orderBy("cluster_id")
  }

  /** d21: the LSH acceptance gate over the augmented corpus — recall
    * of the banded candidate generator vs the d2 exact ground truth,
    * at the production configuration (4 bands × 2 rows) and the
    * cheaper 2×4 one. The 2×4 row's recall drops below 10000 (fewer,
    * longer bands miss true near-dups whose J < 1) while 4×2 holds it —
    * both verdict regimes live. ALL-INTEGER output. */
  def d21LshRecall(spark: SparkSession, dir: String): DataFrame =
    Dedup.lshRecallGate(Dedup.augmentedDocs(spark, dir), k = 8,
        bandConfigs = Seq(4, 2), threshold = 0.8, charWindow = 25)
      .orderBy("n_bands")

  /** d15: the d18 keep-list on PERSISTED labels — the
    * build-once/read-many lifecycle (x7's shape applied to dedup):
    * `Dedup.ensureClusterLabels` runs LSH + adaptive CC once and
    * publishes (doc_id, cluster_id, n_chars) behind a VersionedTable
    * alias; the keep-list is then a label SCAN (one count + one
    * window on cluster_id) instead of a re-clustering — at 100 TB
    * every downstream consumer reads these labels. Output
    * spec-proven identical to d18's inline form; the oracle is the
    * same independent recursive-CTE replay. */
  def d15PersistedRep(spark: SparkSession, dir: String): DataFrame = {
    val labelsDir = Dedup.ensureClusterLabels(
      Dedup.augmentedDocs(spark, dir), dir)
    Dedup.clusterRepFromLabels(
        graft.sources.VersionedTable.readLatest(spark, labelsDir))
      .orderBy("cluster_id")
  }

  /** p13: cluster-balanced sampling over the PERSISTED dedup labels
    * (the D4/SemDeDup-paper step between dedup and mixture: instead
    * of keeping one representative per near-dup cluster — d18's
    * keep-list — keep a sublinear SAMPLE of each cluster so heavily
    * duplicated content is down-weighted, not erased). Sqrt-law
    * keep rule in exact integers: member ranked r (by n_chars desc,
    * doc_id asc — the d18 tie-break) is kept iff r² ≤ cluster size,
    * i.e. ~√size survivors per cluster; singletons always survive.
    * Both verdicts live at every SF (planted size-3 clusters keep
    * rank 1, drop ranks 2–3). Plan: a label SCAN, not a
    * re-clustering — one count + one window, both keyed on
    * cluster_id (d15's read-path posture; at 100 TB the LSH+CC cost
    * lives in the build, every downstream sampler reads labels). */
  def p13ClusterBalanced(spark: SparkSession, dir: String): DataFrame = {
    val labelsDir = Dedup.ensureClusterLabels(
      Dedup.augmentedDocs(spark, dir), dir)
    val mem = graft.sources.VersionedTable.readLatest(spark, labelsDir)
    val cnt = mem.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    mem.withColumn("rank", row_number().over(w).cast("long"))
      .join(cnt, Seq("cluster_id"))
      .withColumn("kept", col("rank") * col("rank") <= col("n_members"))
      .select("doc_id", "cluster_id", "rank", "n_members", "kept")
      .orderBy("doc_id")
  }

  /** d22: the dedup FUNNEL — the survivorship audit a pipeline
    * publishes after its dedup stages: how many documents remain
    * after (0) nothing, (1) exact dedup (one survivor per identical
    * text, d1's definition), (2) near-dup clustering (one survivor
    * per MinHash-LSH connected component, d8/d18's clusters via the
    * PERSISTED labels — the read-path, not a re-clustering).
    * Monotone by construction (exact copies always share a cluster),
    * which the oracle proves with independent counts. O(1) output;
    * the three counts are global aggregates (allowlisted tiny final
    * reductions) over one corpus scan + one label scan. */
  def d22DedupFunnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = Dedup.augmentedDocs(spark, dir)
    val labelsDir = Dedup.ensureClusterLabels(docs, dir)
    val mem = graft.sources.VersionedTable.readLatest(spark, labelsDir)
    val total = docs.agg(count(lit(1)).cast("long").as("docs_kept"))
      .select(lit(0).as("stage_ord"), lit("total").as("stage"),
        col("docs_kept"))
    val exact = docs.agg(countDistinct(md5(col("text")))
        .cast("long").as("docs_kept"))
      .select(lit(1).as("stage_ord"), lit("exact").as("stage"),
        col("docs_kept"))
    val near = mem.agg(countDistinct(col("cluster_id"))
        .cast("long").as("docs_kept"))
      .select(lit(2).as("stage_ord"), lit("near_dup").as("stage"),
        col("docs_kept"))
    total.unionByName(exact).unionByName(near).orderBy("stage_ord")
  }

  /** g1: source-authority ranking — PageRank over the d16 reprint
    * graph (sources that share passages link to each other; a source
    * many reprinters connect to accumulates rank — the provenance
    * weighting signal a curation pipeline uses to decide WHICH copy
    * of duplicated content to keep). Three EXACT-INTEGER iterations:
    * r0 = 10⁶; r_{t+1}(v) = 150000 + (85·Σ_{u~v} (r_t(u) DIV
    * outdeg(u))) DIV 100 — integer division per edge then exact
    * integer sums, so the result is order-independent and replays
    * bit-identically in the oracle (no float damping drift;
    * isolated sources report the bare 150000 teleport mass, live at
    * every SF). Plan: the d16 posting pipeline once (single-plan
    * multi-read), then 3 unrolled join+agg rounds over the
    * O(|sources|) rank frame — iteration depth is FIXED, and every
    * stage is keyed on source; at web scale |sources| is the domain
    * count and the per-iteration shuffle is the contribution
    * aggregate, exactly GraphX/Pregel's cost shape with no
    * driver-side loop state. */
  def g1SourceRank(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.sourceOverlap(docs, col("source"), col("text"),
        width = 20, stride = 20, maxDf = None)
      .select(col("source_a"), col("source_b"), lit(1L).as("w"))
      .localCheckpoint(false)
    // unweighted = the w ≡ 1 case of Graph.weightedPageRank
    // ((r·1) DIV wdeg = r DIV outdeg — bit-identical to the unrolled
    // oracle CTE, which keeps its original r DIV outdeg form)
    graft.operators.Graph.weightedPageRank(
        docs.select("source").distinct(), pairs, iters = 3)
      .select(col("source"), col("wdeg").as("outdeg"), col("rank_i3"))
      .orderBy("source")
  }

  /** g2: WEIGHTED source-authority PageRank — the g1 graph with edge
    * weight = n_shared passages (d16's overlap count), so a source
    * reprinted wholesale confers proportionally more authority than
    * one sharing a single passage. Same exact-integer unrolled-CTE
    * replay (per-edge (r·w) DIV wdeg — integer div per edge on BOTH
    * engines, so no reassociation can differ); same 3 fixed
    * iterations over the |sources|²-bounded edge table. The
    * incremental twin is streaming/RankStream.maintainRank
    * (batch-parity spec'd). */
  def g2WeightedRank(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.sourceOverlap(docs, col("source"), col("text"),
        width = 20, stride = 20, maxDf = None)
      .select(col("source_a"), col("source_b"), col("n_shared").as("w"))
      .localCheckpoint(false)
    graft.operators.Graph.weightedPageRank(
        docs.select("source").distinct(), pairs, iters = 3)
      .orderBy("source")
  }

  /** g3: HITS hubs & authorities — Kleinberg's mutual recursion over
    * the g2 reprint graph, directed later-source → earlier-source
    * (deterministic crawl-time stand-in), weights = d16's n_shared.
    * The per-phase normalization is integer division against the
    * phase total, so the whole two-iteration recursion replays as an
    * unrolled CTE (the g1/g2 exact-integer posture — no float norm).
    * Isolated sources hold 0 on both scores at every SF. */
  def g3Hits(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.sourceOverlap(docs, col("source"), col("text"),
        width = 20, stride = 20, maxDf = None)
      .select(col("source_a"), col("source_b"), col("n_shared").as("w"))
      .localCheckpoint(false)
    graft.operators.Graph.hits(
        docs.select("source").distinct(), pairs, iters = 2)
      .orderBy("source")
  }

  /** d17: the df-CAPPED overlap matrix — d16 with the 100 TB knob
    * engaged (maxDf=3): passage hashes present in more than 3
    * sources are treated as boilerplate and dropped BEFORE the
    * self-join, bounding pair fanout by maxDf·Σdf instead of
    * |sources|² per ubiquitous hash. The cap BITES at every SF
    * (1/1/32 hashes dropped at sf0.001/0.01/0.1, pair counts 29/27/
    * 139 vs d16's 33/32/187) so the oracle exercises both branches:
    * hashes kept under the cap and hashes excluded above it. */
  def d17CappedOverlap(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.sourceOverlap(Tables.documents(spark, dir),
        col("source"), col("text"), width = 20, stride = 20,
        maxDf = Some(3))
      .orderBy("source_a", "source_b")

  /** s9: IVF recall-vs-nProbe sweep — the tuning curve that picks the
    * probe count for a target recall (FAISS's standard operating
    * chart), computed exactly: for nProbe ∈ {1,2,3}, total brute-force
    * top-5 hits recovered across all queries. The truth side is
    * computed ONCE and checkpointed (three union branches of one
    * execution read it); each probe level re-ranks only the probed
    * lists. ALL-INTEGER output (n_probe, total_hits, n_queries). */
  def s9RecallSweep(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("label"),
        Vectors.toDouble(col("embedding")).as("v"))
    val q = e.filter(col("id") < 10).select("id", "v")
    val c = e.filter(col("id") >= 10)
    val truth = Knn.bruteForce(q, c.select("id", "v"), k = 5)
      .select(col("q_id"), col("n_id")).localCheckpoint(false)
    Seq(1, 2, 3).map { np =>
      val approx = graft.similarity.Ivf.search(q,
          c.select("id", "v", "label"), listKey = "label", k = 5,
          nProbe = np, centroidScale = 1000000L)
        .select(col("q_id"), col("n_id"), lit(1).as("hit"))
      truth.join(approx, Seq("q_id", "n_id"), "left")
        .agg(count(col("hit")).as("total_hits"),
          count_distinct(col("q_id")).as("n_queries"))
        .select(lit(np).as("n_probe"), col("total_hits"), col("n_queries"))
    }.reduce(_ unionByName _)
      .orderBy("n_probe")
  }

  def s1KnnBrute(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), Vectors.toDouble(col("embedding")).as("v"))
    Knn.bruteForce(e.filter(col("id") < 10), e.filter(col("id") >= 10), k = 5)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
      .orderBy("q_id", "rank")
  }

  def s2KnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), Vectors.toDouble(col("embedding")).as("v"))
    Knn.lshBucketed(e.filter(col("id") < 10), e.filter(col("id") >= 10),
        k = 5, nPlanes = 8, dim = 64)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
      .orderBy("q_id", "rank")
  }

  /** s13: MULTI-TABLE LSH ANN — the recall lever orthogonal to s2's
    * multi-probe: three INDEPENDENT 10-plane tables (salted
    * deterministic derivations), candidates = pairs sharing a bucket
    * in ANY table, union-distinct'd before one exact cosine re-rank.
    * Smaller per-table buckets (10 planes vs s2's 8) make the union
    * genuinely decide the candidate set at every SF; the oracle
    * re-derives all three plane sets and replays the union. */
  def s13KnnLshTables(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), Vectors.toDouble(col("embedding")).as("v"))
    Knn.lshMultiTable(e.filter(col("id") < 10), e.filter(col("id") >= 10),
        k = 5, nPlanes = 10, dim = 64, nTables = 3)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
      .orderBy("q_id", "rank")
  }

  /** s4: IVF ANN — label-seeded inverted lists, 2-probe search, with
    * the QUANTIZED coarse quantizer (integer-exact centroid sums →
    * deterministic probes across engines and partitionings) — which
    * is what makes this approximate search hash-checkable; float-avg
    * centroids (centroidScale = 0) keep the recall tests in IvfSpec
    * honest for the classic form. */
  def s4KnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("label"), Vectors.toDouble(col("embedding")).as("v"))
    graft.similarity.Ivf.search(
        e.filter(col("id") < 10).select("id", "v"),
        e.filter(col("id") >= 10).select("id", "v", "label"),
        listKey = "label", k = 5, nProbe = 2, centroidScale = 1000000L)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
      .orderBy("q_id", "rank")
  }

  /** s5: int8 embedding quantization — per-vector max-abs scaling,
    * q_i = round(v_i·127/maxabs), the storage/transfer prep every
    * large ANN index does (4× smaller, dequant = q·maxabs/127).
    * Map-only (posexplode + native array_max); output exploded to
    * (vec_id, dim, q) so the oracle compares scalars, not nested
    * arrays. Rounds rank the same in both engines: round() is
    * half-away-from-zero in Spark and DuckDB, applied BEFORE the int
    * cast (casting alone truncates in Spark but rounds in DuckDB). */
  /** s6: filtered vector search — top-k cosine restricted to a
    * metadata predicate (lang = 'en'), evaluated PRE-search: the
    * filter composes into the corpus scan before scoring, so (a) the
    * plan prunes with the predicate instead of scoring everything
    * and discarding (post-filtering also under-fills k), and (b) the
    * ANN side stays the map-only bruteForce shape. The production
    * "vector search with a WHERE clause" pattern. */
  def s6FilteredKnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), Vectors.toDouble(col("embedding")).as("v"))
    val langs = Tables.documents(spark, dir).select(col("doc_id").as("id"), col("lang"))
    val corpus = e.join(langs, "id")
      .filter(col("lang") === "en" && col("id") >= 10)
      .select("id", "v")
    Knn.bruteForce(e.filter(col("id") < 10), corpus, k = 5)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
      .orderBy("q_id", "rank")
  }

  /** s14: filtered IVF search — s6's metadata predicate (lang = 'en')
    * run through the s4 IVF plan instead of brute force. The
    * centroids are built from the FULL corpus (one index serves
    * every filter — at 100 TB the index is the expensive artifact,
    * filters are ad hoc), and the predicate composes into the
    * probed-list scan BEFORE scoring (pre-filtering: a selective
    * filter makes the probe cheaper, and under-fill is an honestly
    * shorter result, never a silently wrong one). The lang join
    * happens once, outside the search. */
  def s14FilteredIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("label"),
        Vectors.toDouble(col("embedding")).as("v"))
    val langs = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"), col("lang"))
    // LEFT join: the centroid base must be the FULL >= 10 embedding
    // corpus regardless of documents coverage (the oracle builds
    // centroids from all vec_id >= 10) — an inner join would silently
    // drop doc-less vectors from centroid construction, a
    // data-dependent divergence the fixture's 1:1 coverage hides.
    val corpus = e.filter(col("id") >= 10)
      .join(langs, Seq("id"), "left")
      .select(col("id"), col("v"), col("label"),
        coalesce(col("lang") === "en", lit(false)).as("keep"))
    graft.similarity.Ivf.searchFiltered(
        e.filter(col("id") < 10).select("id", "v"), corpus,
        listKey = "label", keepCol = "keep",
        k = 5, nProbe = 2, centroidScale = 1000000L)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
      .orderBy("q_id", "rank")
  }

  /** s7: MMR-diversified retrieval — brute-force top-20 candidates
    * per query, then the greedy λ=0.5 maximal-marginal-relevance
    * re-rank picks 5. The corpus-sized stage is candidate generation
    * (s1's map-only shape); the greedy loop touches only
    * |queries|×20 rows. The oracle replays the greedy trajectory in
    * a recursive CTE. */
  def s7Mmr(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), Vectors.toDouble(col("embedding")).as("v"))
    val queries = e.filter(col("id") < 10)
    val corpus = e.filter(col("id") >= 10)
    val top = graft.similarity.Knn.bruteForce(queries, corpus, k = 20)
      .select("q_id", "n_id", "cos")
    val cands = corpus.select(col("id").as("n_id"), col("v").as("n_v"))
      .join(broadcast(top), "n_id")
      .select("q_id", "n_id", "cos", "n_v")
    graft.similarity.Mmr.rerank(cands, k = 5, lam = 0.5)
      .select("q_id", "n_id", "cos", "rank")
      .orderBy("q_id", "rank")
  }

  def s5Quantize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
      .withColumn("maxabs", array_max(transform(col("v"), x => abs(x))))
    e.select(col("vec_id"), col("maxabs"), posexplode(col("v")).as(Seq("pos", "val")))
      .select(col("vec_id"), (col("pos") + 1).as("dim"),
        when(col("maxabs") === 0, 0)
          .otherwise(round(col("val") * 127 / col("maxabs")))
          .cast("int").as("q"),
        round(col("maxabs") / 127, 6).as("scale"))
      .orderBy("vec_id", "dim")
  }

  /** s3: hybrid lexical+vector retrieval over the joined
    * documents⋈embeddings corpus (shared id space), routed through
    * the LSH-bucket candidate generator (4 hyperplanes → 16 buckets;
    * a query only scores its own bucket). The oracle mirrors the
    * bucketing with the same md5-derived plane literals. */
  val S3Planes = 4
  def s3Hybrid(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.documents(spark, dir).select(col("doc_id").as("id"), col("text"))
      .join(Tables.embeddings(spark, dir)
        .select(col("vec_id").as("id"), Vectors.toDouble(col("embedding")).as("v")), "id")
    graft.similarity.Hybrid.searchBucketed(
        corpus.filter(col("id") < 5), corpus.filter(col("id") >= 5),
        k = 5, alpha = 0.5, nPlanes = S3Planes, dim = 64)
      .select("q_id", "n_id", "score", "rank")
      .orderBy("q_id", "rank")
  }

  /** d19: containment KEEP-LIST — d14's asymmetric pairs reduced to
    * the per-document drop decision (keep the superset, drop the
    * contained quote; size ties — the planted exact copies — drop the
    * larger id, so the tie branch is oracle-exercised at every SF).
    * One groupBy past the d14 plan; df cap unchanged. */
  def d19ContainKeep(spark: SparkSession, dir: String): DataFrame =
    Dedup.containmentKeepList(Dedup.augmentedDocs(spark, dir),
        thresholdPct = 70, maxDf = 4)
      .orderBy("dropped_id")

  /** d20: SemDeDup cluster representatives — d11 reduced to the
    * per-cluster keep decision (centroid-nearest surviving member,
    * rank on the ROUNDED assignment cosine desc / id asc — the same
    * rank-on-rounded technique the assignment itself uses), with
    * member/kept/dropped counts; only clusters where the greedy pass
    * dropped something. */
  def d20SemdedupRep(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.SemDedup.semDedupRep(
        augmentedEmbeddings(spark, dir)
          .select(col("vec_id").as("id"), col("label"), col("v")),
        seedKey = "label", tau = 0.99)
      .orderBy("cluster_id")

  /** s10: product-quantization ADC search with exact refine (Jégou
    * et al. 2011 + FAISS's IndexRefine) — the memory rung below s5's
    * int8: corpus stored as 8 one-of-32 codes per vector, queries
    * answered from per-query distance TABLES (8 lookups per corpus
    * vector, no per-pair 64-dim math), then the top-80 shortlist
    * re-scored exactly (recall 0.90 vs strict-ADC 0.26, measured).
    * All-integer contract end to end: quantized coordinates,
    * point-seeded codebooks refined by one integer-exact Lloyd step,
    * BIGINT squared distances — the whole k-means TRAINING loop
    * replays bit-identically in SQL, which is what makes an
    * approximate ANN index hash-checkable. */
  def s10Pq(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("label"),
        Vectors.toDouble(col("embedding")).as("v"))
    // train-once/probe-many behind the fingerprint, SHARED with s11:
    // flat PQ is IVF×PQ with every list scanned, and the IVFPQ
    // index's codebook/codes/sidecar are trained by the identical
    // deterministic pipeline (same corpus, same knobs — the coarse
    // centroids are simply ignored here), so one persisted index
    // serves both queries and the one-time build is paid once.
    // Pq.searchIndex reads the BASE tables only (no appended
    // segments) — exactly the build-once serving posture this query
    // measures; a maintained deployment probes via Ivfpq.searchIndex
    val idx = graft.similarity.Ivfpq.ensureIndex(
      e.filter(col("id") >= 10), "label", "id", "v", dir,
      nCodes = 32, iters = 1, dsub = 8, scale = 10000L)
    graft.similarity.Pq.searchIndex(spark, idx,
        e.filter(col("id") < 10).select("id", "v"), "id", "v",
        k = 5, rerank = 80)
      .select(col("q_id"), col("n_id"), col("adist"), col("rank"))
      .orderBy("q_id", "rank")
  }

  /** s11: IVF × PQ — the composed billion-scale ANN shape (FAISS
    * IVFADC, by_residual=false): s4's quantized coarse quantizer
    * prunes the scan to 2 probed lists per query (file-level
    * partition pruning on the persisted code table), s10's
    * all-integer PQ answers distances inside the probed lists from
    * 8 one-byte codes per vector via ADC tables, and the top-80
    * shortlist is exactly refined. Both stages are integer-exact, so
    * the full composed trajectory — coarse means, probe selection,
    * codebook training, encode, ADC, refine — replays bit-identically
    * in SQL, keeping even the two-stage approximate index
    * hash-checkable. */
  def s11IvfPq(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("label"),
        Vectors.toDouble(col("embedding")).as("v"))
    val idx = graft.similarity.Ivfpq.ensureIndex(
      e.filter(col("id") >= 10), "label", "id", "v", dir,
      nCodes = 32, iters = 1, dsub = 8, scale = 10000L,
      centroidScale = 1000000L)
    graft.similarity.Ivfpq.searchIndex(spark, idx,
        e.filter(col("id") < 10).select("id", "v"), "id", "v",
        k = 5, nProbe = 2, rerank = 80)
      .select(col("q_id"), col("n_id"), col("adist"), col("rank"))
      .orderBy("q_id", "rank")
  }

  /** s12: RESIDUAL IVF×PQ — s11 with by_residual=true, the accuracy
    * rung FAISS defaults to: the PQ stage encodes x − c(list(x))
    * against a per-list INTEGER centroid (half-away-from-zero
    * integer means of the quantized coordinates, stored beside the
    * float probe centroids), so the codebooks spend their entropy on
    * within-list structure instead of re-describing list means.
    * Residuals are exact integer vectors and the residual codebooks
    * train at scale=1 on them, so the whole pipeline — integer
    * centroid, residual, training, encode, per-(query, probed-list)
    * ADC tables (the known nProbe× table cost of by_residual),
    * refine — still replays bit-identically in SQL. */
  def s12IvfpqResidual(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("label"),
        Vectors.toDouble(col("embedding")).as("v"))
    val idx = graft.similarity.Ivfpq.ensureIndex(
      e.filter(col("id") >= 10), "label", "id", "v", dir,
      nCodes = 32, iters = 1, dsub = 8, scale = 10000L,
      centroidScale = 1000000L, byResidual = true)
    graft.similarity.Ivfpq.searchIndex(spark, idx,
        e.filter(col("id") < 10).select("id", "v"), "id", "v",
        k = 5, nProbe = 2, rerank = 80)
      .select(col("q_id"), col("n_id"), col("adist"), col("rank"))
      .orderBy("q_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s10_pq" -> (s10Pq _),
    "s11_ivfpq" -> (s11IvfPq _),
    "s12_ivfpq_residual" -> (s12IvfpqResidual _),
    "s3_hybrid" -> (s3Hybrid _),
    "d19_contain_keep" -> (d19ContainKeep _),
    "d20_semdedup_rep" -> (d20SemdedupRep _),
    "d1_exact" -> (d1Exact _),
    "d24_url_dedup" -> (d24UrlDedup _),
    "d25_boilerplate" -> (d25BoilerplateStrip _),
    "d26_substring_spans" -> (d26SubstringSpans _),
    "d27_internal_repeats" -> (d27InternalRepeats _),
    "d28_substring_strip" -> (d28SubstringStrip _),
    "d2_ngram_jaccard" -> (d2NgramJaccard _),
    "d14_containment" -> (d14Containment _),
    "d3_minhash_lsh" -> (d3MinhashLsh _),
    "d4_simhash" -> (d4Simhash _),
    "d30_autocap" -> (d30AutoCap _),
    "d5_embed_cosine" -> (d5EmbedCosine _),
    "d6_editdist" -> (d6EditDist _),
    "d7_decontaminate" -> (d7Decontaminate _),
    "d23_contam_spans" -> (d23ContamSpans _),
    "d29_decontam_strip" -> (d29DecontamStrip _),
    "d8_cluster" -> (d8Cluster _),
    "d9_bloom" -> (d9Bloom _),
    "d10_dupspans" -> (d10DupSpans _),
    "d11_semdedup" -> (d11SemDedup _),
    "d12_incremental" -> (d12Incremental _),
    "d13_passage_dedup" -> (d13PassageDedup _),
    "s1_knn_brute" -> (s1KnnBrute _),
    "s2_knn_lsh" -> (s2KnnLsh _),
    "s13_knn_lsh_tables" -> (s13KnnLshTables _),
    "s4_knn_ivf" -> (s4KnnIvf _),
    "s5_quantize" -> (s5Quantize _),
    "s6_filtered_knn" -> (s6FilteredKnn _),
    "s14_filtered_ivf" -> (s14FilteredIvf _),
    "s7_mmr" -> (s7Mmr _),
    "s8_recall" -> (s8Recall _),
    "d16_source_overlap" -> (d16SourceOverlap _),
    "d17_capped_overlap" -> (d17CappedOverlap _),
    "d18_cluster_rep" -> (d18ClusterRep _),
    "d15_persisted_rep" -> (d15PersistedRep _),
    "p13_cluster_balanced" -> (p13ClusterBalanced _),
    "d22_dedup_funnel" -> (d22DedupFunnel _),
    "g1_source_rank" -> (g1SourceRank _),
    "g2_weighted_rank" -> (g2WeightedRank _),
    "g3_hits" -> (g3Hits _),
    "d21_lsh_recall" -> (d21LshRecall _),
    "s9_recall_sweep" -> (s9RecallSweep _),
  )

  /** Shared oracle CTE fragments. */
  private val augBase =
    """SELECT doc_id, text, lang, n_chars FROM documents
       UNION ALL
       SELECT doc_id + 1000000, substr(text, 21), lang, length(substr(text, 21)) FROM documents
       UNION ALL
       SELECT doc_id + 2000000, text, lang, n_chars FROM documents"""

  /** The tokenize→shingle→hash chain over an arbitrary base SELECT —
    * shared by every shingle-keyed oracle; d30 swaps in a base with
    * the planted saturated-bucket docs appended. */
  private def shingleCteFor(baseSql: String) =
    s"""base AS ($baseSql),
       toks AS (
         SELECT doc_id, lang, n_chars,
           regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+') AS tks
         FROM base),
       sh AS (
         SELECT doc_id, lang, n_chars,
           list_distinct(list_transform(range(1, greatest(len(tks) - 2, 1) + 1),
             i -> array_to_string(tks[i:i+2], ' '))) AS sh
         FROM toks),
       shh AS (
         SELECT doc_id, lang, n_chars,
           list_distinct(list_transform(sh,
             s -> CAST(concat('0x', substr(md5(concat('0:', s)), 1, 8)) AS BIGINT))) AS sh
         FROM sh)"""

  private val shingleCte = shingleCteFor(augBase)

  /** The planted saturated-bucket corpus d30 runs on: augmentedDocs
    * plus ONE identical boilerplate template per source document
    * (disjoint vocabulary, so the plant perturbs no organic shingle)
    * — |docs| identical texts share one simhash, so each of its 7
    * pigeonhole chunks is a bucket of |docs| rows, corpus-
    * proportionally above the p99-derived cap at EVERY SF (measured:
    * cap 40/44/144 vs planted bucket 617/606/6162 at
    * sf0.001/0.01/0.1 — the d25 lesson: a plant must OUTGROW a
    * relative threshold, which a per-document plant does and a fixed
    * count does not). */
  private val d30TplText =
    "zvq0 zvq1 zvq2 zvq3 zvq4 zvq5 zvq6 zvq7 zvq8 zvq9 zvq10 zvq11"

  private val d30Base = augBase + s"""
       UNION ALL
       SELECT doc_id + 9000000, '$d30TplText', 'zz', CAST(length('$d30TplText') AS BIGINT) FROM documents"""

  /** The splitmix64 SimHash signature chain (expects `shh` in scope,
    * yields `sig(doc_id, s UBIGINT)`) — shared by d4's exhaustive
    * pair oracle and d30's capped-banding replay. Overflow-checked
    * UBIGINT arithmetic: mulmod via 32-bit split (hi/lo partial
    * products, outer mod folds them back), per-bit vote counting,
    * packed signatures. */
  private val simhashSigCte =
    """ex AS (SELECT doc_id, CAST(unnest(sh) AS UBIGINT) AS h FROM shh),
         z0 AS (SELECT doc_id, h + CAST(11400714819323198485 AS UBIGINT) AS z FROM ex),
         t1 AS (SELECT doc_id, xor(z, z >> 30) AS t FROM z0),
         m1 AS (SELECT doc_id, (t % 4294967296) * CAST(484763065 AS UBIGINT) AS lof,
           (((t % 4294967296) * CAST(3210233709 AS UBIGINT)) % 4294967296
            + ((t // 4294967296) * CAST(484763065 AS UBIGINT)) % 4294967296) AS hi_pre FROM t1),
         m1b AS (SELECT doc_id, ((hi_pre + lof // 4294967296) % 4294967296) * 4294967296 + lof % 4294967296 AS z FROM m1),
         t2 AS (SELECT doc_id, xor(z, z >> 27) AS t FROM m1b),
         m2 AS (SELECT doc_id, (t % 4294967296) * CAST(321982955 AS UBIGINT) AS lof,
           (((t % 4294967296) * CAST(2496678331 AS UBIGINT)) % 4294967296
            + ((t // 4294967296) * CAST(321982955 AS UBIGINT)) % 4294967296) AS hi_pre FROM t2),
         m2b AS (SELECT doc_id, ((hi_pre + lof // 4294967296) % 4294967296) * 4294967296 + lof % 4294967296 AS z FROM m2),
         mixed AS (SELECT doc_id, xor(z, z >> 31) AS z FROM m2b),
         votes AS (SELECT doc_id, j, sum(CASE WHEN (z >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
           FROM mixed CROSS JOIN (SELECT unnest(range(0, 64)) AS j) r GROUP BY 1, 2),
         sig AS (SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN CAST(CAST(1 AS UBIGINT) << j AS HUGEINT) ELSE 0 END) AS UBIGINT) AS s
           FROM votes GROUP BY 1)"""

  private def h32sql(seed: Int, e: String): String =
    s"CAST(concat('0x', substr(md5(concat('$seed:', $e)), 1, 8)) AS BIGINT)"

  /** MinHash signatures + LSH band keys (expects `shh` from
    * shingleCte in scope) — the index half of the pipeline, shared by
    * the d3/d8 pair oracles and d12's incremental probe. */
  private val minhashSigBandsCtes =
    s"""sig AS (SELECT doc_id,
             ${(0 until 8).map(i =>
               s"coalesce(list_min(list_transform(sh, h -> (${graft.dedup.Dedup.MinhashA(i)}*h + ${graft.dedup.Dedup.MinhashB(i)}) % ${graft.dedup.Dedup.MinhashP})), 9223372036854775807) AS m$i")
               .mkString(",\n             ")}
           FROM shh),
         bands AS (
           SELECT doc_id, 0 AS band, concat(CAST(m0 AS VARCHAR), '_', CAST(m1 AS VARCHAR)) AS bv FROM sig
           UNION ALL SELECT doc_id, 1, concat(CAST(m2 AS VARCHAR), '_', CAST(m3 AS VARCHAR)) FROM sig
           UNION ALL SELECT doc_id, 2, concat(CAST(m4 AS VARCHAR), '_', CAST(m5 AS VARCHAR)) FROM sig
           UNION ALL SELECT doc_id, 3, concat(CAST(m6 AS VARCHAR), '_', CAST(m7 AS VARCHAR)) FROM sig)"""

  /** ...plus symmetric candidate generation and exact-Jaccard verify
    * (the full d3 pipeline), shared by the d3 and d8 oracles. */
  private val minhashPairsCtes =
    s"""$minhashSigBandsCtes,
         cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
           FROM bands x JOIN bands y
             ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id),
         pairs AS (SELECT a_id, b_id, jaccard FROM (
           SELECT a_id, b_id,
             round(len(list_intersect(sa.sh, sb.sh))
               / CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 4) AS jaccard
           FROM cand JOIN shh sa ON sa.doc_id = a_id JOIN shh sb ON sb.doc_id = b_id)
           WHERE jaccard >= 0.8)"""

  private val augEmb =
    """SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       UNION ALL
       SELECT vec_id + 1000000, label,
         list_transform(range(1, 65),
           i -> CAST(embedding[i] AS DOUBLE) + 0.05 * CAST(embedding[(i % 64) + 1] AS DOUBLE))
       FROM embeddings"""

  /** g2's exact-integer weighted-PageRank replay over the source
    * passage-overlap graph (3 unrolled iterations ending in r3, plus
    * deg) — shared by the g2 oracle and Etl's x21 boosted-search
    * oracle (same package). */
  private[queries] val weightedRankCtes: String =
    """t AS (SELECT source, regexp_split_to_array(trim(text), '\s+') AS tks
           FROM documents),
         s AS (SELECT source, unnest(range(0, greatest(len(tks), 1), 20)) AS st, tks FROM t),
         p AS (SELECT source,
             md5(array_to_string(list_slice(tks, st + 1, least(st + 20, len(tks))), ' ')) AS h
           FROM s),
         sh AS (SELECT DISTINCT source, h FROM p),
         pr AS (SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS w
           FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
           GROUP BY 1, 2),
         edges AS (SELECT sa AS u, sb AS v, w FROM pr
           UNION ALL SELECT sb, sa, w FROM pr),
         nodes AS (SELECT DISTINCT source FROM t),
         deg AS (SELECT n.source, CAST(coalesce(sum(e.w), 0) AS BIGINT) AS wdeg
           FROM nodes n LEFT JOIN edges e ON n.source = e.u GROUP BY 1),
         r0 AS (SELECT source, CAST(1000000 AS BIGINT) AS r FROM nodes),
         c1 AS (SELECT e.v, sum((r0.r * e.w) // d.wdeg) AS m FROM edges e
           JOIN r0 ON e.u = r0.source JOIN deg d ON e.u = d.source GROUP BY 1),
         r1 AS (SELECT n.source, CAST(150000 + (85 * coalesce(c1.m, 0)) // 100 AS BIGINT) AS r
           FROM nodes n LEFT JOIN c1 ON n.source = c1.v),
         c2 AS (SELECT e.v, sum((r1.r * e.w) // d.wdeg) AS m FROM edges e
           JOIN r1 ON e.u = r1.source JOIN deg d ON e.u = d.source GROUP BY 1),
         r2 AS (SELECT n.source, CAST(150000 + (85 * coalesce(c2.m, 0)) // 100 AS BIGINT) AS r
           FROM nodes n LEFT JOIN c2 ON n.source = c2.v),
         c3 AS (SELECT e.v, sum((r2.r * e.w) // d.wdeg) AS m FROM edges e
           JOIN r2 ON e.u = r2.source JOIN deg d ON e.u = d.source GROUP BY 1),
         r3 AS (SELECT n.source, CAST(150000 + (85 * coalesce(c3.m, 0)) // 100 AS BIGINT) AS r
           FROM nodes n LEFT JOIN c3 ON n.source = c3.v)"""

  private def cosSql(a: String, b: String): String =
    s"round(list_inner_product($a, $b) / (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b))), 4)"

  /** DuckDB twin of Knn.hyperplaneBucket: the plane values are exact
    * k/1000 decimals (Hashing.uniformFromKey), so the literals
    * round-trip to identical doubles in both engines. */
  private def bucketSql(vExpr: String, nPlanes: Int, dim: Int,
      salt: String = ""): String = {
    val planes = graft.similarity.Knn.derivePlanes(nPlanes, dim, salt)
    planes.map { p =>
      val lits = p.mkString("[", ", ", "]")
      s"CASE WHEN list_inner_product($vExpr, CAST($lits AS DOUBLE[])) >= 0 THEN '1' ELSE '0' END"
    }.mkString("concat(", ",\n             ", ")")
  }

  val oracleSql: Map[String, String] = Map(
    "d1_exact" ->
      s"""WITH base AS ($augBase)
         SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_dups
         FROM base GROUP BY md5(text) ORDER BY keep_id""",
    // d25: header planting, chunking, the C4 occ>=3 cut and the
    // rewrite all re-derived; the hot set folds to a scalar list
    // (coalesced to [] if ever empty) so the filter replays without
    // a join
    "d25_boilerplate" ->
      s"""WITH aug AS (
           SELECT doc_id, concat(CASE doc_id % 4
               WHEN 0 THEN '${d25Headers(0)}' WHEN 1 THEN '${d25Headers(1)}'
               WHEN 2 THEN '${d25Headers(2)}' ELSE '${d25Headers(3)}' END,
             ' ', trim(text)) AS text
           FROM documents),
         toks AS (
           SELECT doc_id, regexp_split_to_array(text, '\\s+') AS tks
           FROM aug),
         ch AS (
           SELECT doc_id, list_transform(range(0, ((len(tks) - 1) // 3) + 1),
             i -> array_to_string(tks[3*i+1:3*i+3], ' ')) AS chunks
           FROM toks),
         dfc AS (SELECT chunk, count(*) AS occ
           FROM (SELECT unnest(chunks) AS chunk FROM ch) GROUP BY 1),
         hot AS (SELECT coalesce(list(chunk), []) AS hs
           FROM dfc WHERE occ >= 3)
         SELECT doc_id, CAST(len(chunks) AS BIGINT) AS n_chunks,
           CAST(len(list_filter(chunks, c -> list_contains(hs, c))) AS BIGINT)
             AS n_removed,
           coalesce(array_to_string(
               list_filter(chunks, c -> NOT list_contains(hs, c)), ' '), '')
             AS clean_text
         FROM ch, hot ORDER BY doc_id""",
    // d26: the anchor hashing is the SAME h32 formula both engines
    // (the d10 rule — even collisions replay); covered positions →
    // islands by the pos − row_number() trick; spans as integer
    // (start, len)
    "d26_substring_spans" ->
      s"""WITH base AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 3000000,
             concat('zq', doc_id, ' zr', doc_id, ' zs', doc_id, ' ',
               array_to_string(list_slice(
                 regexp_split_to_array(trim(text), '\\s+'), 8, 47), ' '))
           FROM documents WHERE doc_id % 10 = 0),
         t AS (SELECT doc_id,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+') AS tks
           FROM base),
         p AS (SELECT doc_id, unnest(range(1, greatest(len(tks) - 9, 0) + 1)) AS i, tks
           FROM t),
         g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
             ${h32sql(0, "array_to_string(tks[i:i+9], ' ')")} AS gh
           FROM p),
         dup AS (SELECT gh FROM (
             SELECT gh, count(*) AS c FROM g GROUP BY 1) WHERE c >= 2),
         cov AS (SELECT doc_id, pos FROM g WHERE gh IN (SELECT gh FROM dup)),
         isl AS (SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM cov)
         SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) - min(pos) + 10 AS BIGINT) AS span_len
         FROM isl GROUP BY doc_id, grp
         HAVING max(pos) - min(pos) + 10 >= 20
         ORDER BY doc_id, span_start""",
    // d27: same docChunks grid as d25; first occurrence per
    // (doc, chunk) kept by min(pos), reassembly ordered by pos
    "d27_internal_repeats" ->
      """WITH base AS (
           SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN
               concat(array_to_string(list_slice(
                   regexp_split_to_array(trim(text), '\s+'), 1, 6), ' '),
                 ' ', trim(text))
             ELSE text END AS text
           FROM documents),
         toks AS (SELECT doc_id,
             regexp_split_to_array(trim(text), '\s+') AS tks FROM base),
         ch AS (SELECT doc_id, list_transform(range(0, ((len(tks) - 1) // 3) + 1),
             i -> array_to_string(tks[3*i+1:3*i+3], ' ')) AS chunks
           FROM toks),
         e AS (SELECT doc_id, unnest(range(0, len(chunks))) AS pos, chunks FROM ch),
         e2 AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
             chunks[CAST(pos + 1 AS INT)] AS chunk FROM e),
         k AS (SELECT doc_id, chunk, min(pos) AS pos, count(*) AS occ
           FROM e2 GROUP BY 1, 2)
         SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_chunks,
           CAST(sum(occ - 1) AS BIGINT) AS n_removed,
           coalesce(string_agg(chunk, ' ' ORDER BY pos), '') AS clean_text
         FROM k GROUP BY doc_id ORDER BY doc_id""",
    // d28: d26's anchor pipeline, occurrences ranked per gram by
    // (doc_id, pos) — rn = 1 is the kept first occurrence, every
    // rn > 1 position feeds the strip islands; the rewrite is a
    // token-level anti-join against the span set. n_stripped is
    // derived from the ACTUAL cut (n_tokens - kept count) because
    // islands are only anchor-disjoint: token extents may overlap
    // and summing span_len would double-bill the overlap (r15 fix,
    // mirrored in Dedup.stripSpans)
    "d28_substring_strip" ->
      s"""WITH base AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 3000000,
             concat('zq', doc_id, ' zr', doc_id, ' zs', doc_id, ' ',
               array_to_string(list_slice(
                 regexp_split_to_array(trim(text), '\\s+'), 8, 47), ' '))
           FROM documents WHERE doc_id % 10 = 0),
         t AS (SELECT doc_id,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+') AS tks
           FROM base),
         p AS (SELECT doc_id, unnest(range(1, greatest(len(tks) - 9, 0) + 1)) AS i, tks
           FROM t),
         g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
             ${h32sql(0, "array_to_string(tks[i:i+9], ' ')")} AS gh
           FROM p),
         r AS (SELECT doc_id, pos,
             count(*) OVER (PARTITION BY gh) AS occ,
             row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
           FROM g),
         cov AS (SELECT doc_id, pos FROM r WHERE occ >= 2 AND rn > 1),
         isl AS (SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM cov),
         sp AS (SELECT doc_id, min(pos) AS s, max(pos) - min(pos) + 10 AS l
           FROM isl GROUP BY doc_id, grp
           HAVING max(pos) - min(pos) + 10 >= 20),
         tok AS (SELECT doc_id, unnest(range(0, len(tks))) AS i, tks FROM t),
         tok2 AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
             tks[CAST(i + 1 AS INT)] AS tk FROM tok),
         kept AS (SELECT k.doc_id, k.i, k.tk FROM tok2 k
           LEFT JOIN sp ON k.doc_id = sp.doc_id
             AND k.i >= sp.s AND k.i < sp.s + sp.l
           WHERE sp.s IS NULL),
         agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             string_agg(tk, ' ' ORDER BY i) AS clean_text
           FROM kept GROUP BY doc_id)
         SELECT t.doc_id, CAST(len(tks) AS BIGINT) AS n_tokens,
           CAST(len(tks) - coalesce(a.n_kept, 0) AS BIGINT) AS n_stripped,
           coalesce(a.clean_text, '') AS clean_text
         FROM t LEFT JOIN agg a USING (doc_id)
         ORDER BY t.doc_id""",
    // d29: the d28 strip replay with the covered rule swapped —
    // a position is covered iff its 10-gram occurs in the EVAL set
    // (docs < 10); islands/minLen/strip identical to d28's CTEs
    "d29_decontam_strip" ->
      s"""WITH ev AS (SELECT text FROM documents WHERE doc_id < 10),
         corpus AS (
           SELECT doc_id, text FROM documents WHERE doc_id >= 10
           UNION ALL
           SELECT doc_id + 4000000,
             concat('ztq', doc_id, ' ztr', doc_id, ' zts', doc_id, ' ',
               array_to_string(list_slice(
                 regexp_split_to_array(trim(text), '\\s+'), 8, 47), ' '))
           FROM documents WHERE doc_id < 10
           UNION ALL
           SELECT doc_id + 4100000,
             concat('zuq', doc_id, ' zur', doc_id, ' zus', doc_id, ' ',
               array_to_string(list_slice(
                 regexp_split_to_array(trim(text), '\\s+'), 8, 22), ' '))
           FROM documents WHERE doc_id < 10),
         evt AS (SELECT
             regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+') AS tks
           FROM ev),
         evp AS (SELECT unnest(range(1, greatest(len(tks) - 9, 0) + 1)) AS i, tks
           FROM evt),
         evg AS (SELECT DISTINCT
             ${h32sql(0, "array_to_string(tks[i:i+9], ' ')")} AS gh
           FROM evp),
         t AS (SELECT doc_id,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+') AS tks
           FROM corpus),
         p AS (SELECT doc_id, unnest(range(1, greatest(len(tks) - 9, 0) + 1)) AS i, tks
           FROM t),
         g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
             ${h32sql(0, "array_to_string(tks[i:i+9], ' ')")} AS gh
           FROM p),
         cov AS (SELECT doc_id, pos FROM g WHERE gh IN (SELECT gh FROM evg)),
         isl AS (SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM cov),
         sp AS (SELECT doc_id, min(pos) AS s, max(pos) - min(pos) + 10 AS l
           FROM isl GROUP BY doc_id, grp
           HAVING max(pos) - min(pos) + 10 >= 20),
         tok AS (SELECT doc_id, unnest(range(0, len(tks))) AS i, tks FROM t),
         tok2 AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
             tks[CAST(i + 1 AS INT)] AS tk FROM tok),
         kept AS (SELECT k.doc_id, k.i, k.tk FROM tok2 k
           LEFT JOIN sp ON k.doc_id = sp.doc_id
             AND k.i >= sp.s AND k.i < sp.s + sp.l
           WHERE sp.s IS NULL),
         agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             string_agg(tk, ' ' ORDER BY i) AS clean_text
           FROM kept GROUP BY doc_id)
         SELECT t.doc_id, CAST(len(tks) AS BIGINT) AS n_tokens,
           CAST(len(tks) - coalesce(a.n_kept, 0) AS BIGINT) AS n_stripped,
           coalesce(a.clean_text, '') AS clean_text
         FROM t LEFT JOIN agg a USING (doc_id)
         ORDER BY t.doc_id""",
    // d24: the oracle states each crawl-variant shape's EXPECTED
    // canonical form directly (independent ground truth — the r6
    // pattern), then groups; the Spark side must reach the same
    // grouping through the actual normalization chain
    "d24_url_dedup" ->
      """WITH u AS (
           SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN concat('http://WWW.Example.com:80/a/',
                 CAST(doc_id // 4 AS VARCHAR), '?utm_source=feed')
               WHEN 1 THEN concat('http://example.COM/a/',
                 CAST(doc_id // 4 AS VARCHAR), '#frag')
               WHEN 2 THEN concat('http://example.com/a/',
                 CAST(doc_id // 4 AS VARCHAR), '/')
               ELSE concat('http://example.com/a/',
                 CAST(doc_id // 4 AS VARCHAR), '?id=1&utm_campaign=x')
             END AS url,
             CASE WHEN doc_id % 4 = 3
               THEN concat('http://example.com/a/',
                 CAST(doc_id // 4 AS VARCHAR), '?id=1')
               ELSE concat('http://example.com/a/',
                 CAST(doc_id // 4 AS VARCHAR))
             END AS canonical_url
           FROM documents)
         SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_dups,
           min(doc_id) AS keep_id,
           CAST(count(DISTINCT url) AS BIGINT) AS n_variants
         FROM u GROUP BY 1 ORDER BY 1""",
    "d13_passage_dedup" ->
      s"""WITH base AS ($augBase),
         t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tks FROM base),
         s AS (SELECT doc_id, unnest(range(0, greatest(len(tks), 1), 20)) AS st, tks FROM t),
         p AS (SELECT doc_id, CAST(st / 20 AS INT) AS chunk_idx,
             array_to_string(list_slice(tks, st + 1, least(st + 20, len(tks))), ' ') AS passage
           FROM s),
         r AS (SELECT doc_id, chunk_idx, passage,
             row_number() OVER (PARTITION BY md5(passage)
               ORDER BY doc_id, chunk_idx) AS rn
           FROM p)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_passages,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           coalesce(string_agg(CASE WHEN rn = 1 THEN passage END, ' '
             ORDER BY chunk_idx), '') AS dedup_text
         FROM r GROUP BY doc_id ORDER BY doc_id""",
    // d14: same discriminative-df candidate join, all-integer
    // containment threshold (no float ratio, no round boundary)
    "d14_containment" ->
      s"""WITH $shingleCte,
         posts AS (SELECT doc_id, unnest(sh) AS h FROM shh),
         rare AS (SELECT h FROM (
             SELECT h, count(*) AS df FROM posts GROUP BY 1)
           WHERE df >= 2 AND df <= 4),
         rp AS (SELECT p.doc_id, p.h FROM posts p JOIN rare USING (h)),
         cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
           FROM rp a JOIN rp b ON a.h = b.h AND a.doc_id < b.doc_id)
         SELECT c.a_id, c.b_id,
           CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS n_shared,
           CAST(least(len(sa.sh), len(sb.sh)) AS BIGINT) AS n_min
         FROM cand c
           JOIN shh sa ON sa.doc_id = c.a_id
           JOIN shh sb ON sb.doc_id = c.b_id
         WHERE len(list_intersect(sa.sh, sb.sh)) * 100
           >= 70 * least(len(sa.sh), len(sb.sh))
         ORDER BY a_id, b_id""",
    // d19: the d14 pipeline with per-side set sizes, then the
    // asymmetric drop rule (smaller set drops; ties drop the larger
    // id) and one group-by on the dropped side
    "d19_contain_keep" ->
      s"""WITH $shingleCte,
         posts AS (SELECT doc_id, unnest(sh) AS h FROM shh),
         rare AS (SELECT h FROM (
             SELECT h, count(*) AS df FROM posts GROUP BY 1)
           WHERE df >= 2 AND df <= 4),
         rp AS (SELECT p.doc_id, p.h FROM posts p JOIN rare USING (h)),
         cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
           FROM rp a JOIN rp b ON a.h = b.h AND a.doc_id < b.doc_id),
         scored AS (
           SELECT c.a_id, c.b_id,
             CAST(len(sa.sh) AS BIGINT) AS n_a,
             CAST(len(sb.sh) AS BIGINT) AS n_b
           FROM cand c
             JOIN shh sa ON sa.doc_id = c.a_id
             JOIN shh sb ON sb.doc_id = c.b_id
           WHERE len(list_intersect(sa.sh, sb.sh)) * 100
             >= 70 * least(len(sa.sh), len(sb.sh))),
         v AS (
           SELECT
             CASE WHEN n_a < n_b THEN a_id
                  WHEN n_b < n_a THEN b_id
                  ELSE greatest(a_id, b_id) END AS dropped_id,
             CASE WHEN n_a < n_b THEN b_id
                  WHEN n_b < n_a THEN a_id
                  ELSE least(a_id, b_id) END AS container_id
           FROM scored)
         SELECT dropped_id, min(container_id) AS kept_in,
           CAST(count(*) AS BIGINT) AS n_containers
         FROM v GROUP BY 1 ORDER BY dropped_id""",
    "d2_ngram_jaccard" ->
      s"""WITH $shingleCte
         SELECT a_id, b_id, jaccard FROM (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             round(len(list_intersect(a.sh, b.sh))
               / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 4) AS jaccard
           FROM shh a JOIN shh b
             ON a.lang = b.lang AND a.doc_id < b.doc_id
             AND abs(a.n_chars - b.n_chars) <= 25)
         WHERE jaccard >= 0.8 ORDER BY a_id, b_id""",
    "d3_minhash_lsh" ->
      s"""WITH $shingleCte,
         $minhashPairsCtes
         SELECT a_id, b_id, jaccard FROM pairs ORDER BY a_id, b_id""",
    "d8_cluster" ->
      s"""WITH RECURSIVE $shingleCte,
         $minhashPairsCtes,
         edges AS (
           SELECT a_id AS src, b_id AS dst FROM pairs
           UNION
           SELECT b_id, a_id FROM pairs),
         reach(v, r) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT reach.v, e.dst FROM reach JOIN edges e ON reach.r = e.src),
         lbl AS (SELECT v AS doc_id, least(v, min(r)) AS cluster_id
           FROM reach GROUP BY v)
         SELECT b.doc_id,
           coalesce(l.cluster_id, b.doc_id) AS cluster_id,
           (coalesce(l.cluster_id, b.doc_id) = b.doc_id) AS is_canonical
         FROM base b LEFT JOIN lbl l USING (doc_id)
         ORDER BY doc_id""",
    // d21: both band configurations replayed against the exact
    // length-blocked truth; bands2 regroups the SAME 8 minhashes into
    // 2 bands of 4 (bv format identical to bandedSignatures: '_'-join)
    "d21_lsh_recall" ->
      s"""WITH $shingleCte,
         $minhashSigBandsCtes,
         bands2 AS (
           SELECT doc_id, 0 AS band, concat(CAST(m0 AS VARCHAR), '_', CAST(m1 AS VARCHAR), '_', CAST(m2 AS VARCHAR), '_', CAST(m3 AS VARCHAR)) AS bv FROM sig
           UNION ALL SELECT doc_id, 1, concat(CAST(m4 AS VARCHAR), '_', CAST(m5 AS VARCHAR), '_', CAST(m6 AS VARCHAR), '_', CAST(m7 AS VARCHAR)) FROM sig),
         truth AS (SELECT a_id, b_id FROM (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             round(len(list_intersect(a.sh, b.sh))
               / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 4) AS jaccard
           FROM shh a JOIN shh b
             ON a.lang = b.lang AND a.doc_id < b.doc_id
             AND abs(a.n_chars - b.n_chars) <= 25)
           WHERE jaccard >= 0.8),
         p4 AS (SELECT a_id, b_id FROM (
           SELECT a_id, b_id,
             round(len(list_intersect(sa.sh, sb.sh))
               / CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 4) AS jaccard
           FROM (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
             FROM bands x JOIN bands y
               ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id) c
           JOIN shh sa ON sa.doc_id = a_id JOIN shh sb ON sb.doc_id = b_id)
           WHERE jaccard >= 0.8),
         p2 AS (SELECT a_id, b_id FROM (
           SELECT a_id, b_id,
             round(len(list_intersect(sa.sh, sb.sh))
               / CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 4) AS jaccard
           FROM (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
             FROM bands2 x JOIN bands2 y
               ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id) c
           JOIN shh sa ON sa.doc_id = a_id JOIN shh sb ON sb.doc_id = b_id)
           WHERE jaccard >= 0.8),
         g4 AS (SELECT CAST(count(*) AS BIGINT) AS n_true,
             CAST(count(p.a_id) AS BIGINT) AS n_found
           FROM truth t LEFT JOIN p4 p USING (a_id, b_id)),
         g2 AS (SELECT CAST(count(*) AS BIGINT) AS n_true,
             CAST(count(p.a_id) AS BIGINT) AS n_found
           FROM truth t LEFT JOIN p2 p USING (a_id, b_id))
         SELECT 2 AS n_bands, 4 AS rows_per_band, n_true, n_found,
           CASE WHEN n_true = 0 THEN 10000
                ELSE n_found * 10000 // n_true END AS recall_x10000
           FROM g2
         UNION ALL
         SELECT 4, 2, n_true, n_found,
           CASE WHEN n_true = 0 THEN 10000
                ELSE n_found * 10000 // n_true END FROM g4
         ORDER BY n_bands""",
    // d15 re-reads the PERSISTED labels d8's pipeline built; the
    // oracle replays the identical clustering + keep decision from
    // scratch (same SQL as d18 — the point of d15 is that the Spark
    // side does NOT recompute while the oracle proves the labels
    // still say the same thing)
    "d15_persisted_rep" ->
      s"""WITH RECURSIVE $shingleCte,
         $minhashPairsCtes,
         edges AS (
           SELECT a_id AS src, b_id AS dst FROM pairs
           UNION
           SELECT b_id, a_id FROM pairs),
         reach(v, r) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT reach.v, e.dst FROM reach JOIN edges e ON reach.r = e.src),
         lbl AS (SELECT v AS doc_id, least(v, min(r)) AS cluster_id
           FROM reach GROUP BY v),
         mem AS (
           SELECT b.doc_id, coalesce(l.cluster_id, b.doc_id) AS cluster_id,
             CAST(b.n_chars AS BIGINT) AS n_chars
           FROM base b LEFT JOIN lbl l USING (doc_id)),
         cnt AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
           FROM mem GROUP BY 1),
         rep AS (
           SELECT cluster_id, doc_id AS rep_id, n_chars AS rep_n_chars,
             row_number() OVER (PARTITION BY cluster_id
               ORDER BY n_chars DESC, doc_id ASC) AS rn
           FROM mem)
         SELECT r.cluster_id, r.rep_id, r.rep_n_chars, c.n_members
         FROM rep r JOIN cnt c USING (cluster_id)
         WHERE r.rn = 1 AND c.n_members >= 2
         ORDER BY r.cluster_id""",
    // d22: exact + near counts recomputed from scratch (the CC
    // replay again), proving the Spark side's persisted-label read
    "d22_dedup_funnel" ->
      s"""WITH RECURSIVE $shingleCte,
         $minhashPairsCtes,
         edges AS (
           SELECT a_id AS src, b_id AS dst FROM pairs
           UNION
           SELECT b_id, a_id FROM pairs),
         reach(v, r) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT reach.v, e.dst FROM reach JOIN edges e ON reach.r = e.src),
         lbl AS (SELECT v AS doc_id, least(v, min(r)) AS cluster_id
           FROM reach GROUP BY v),
         mem AS (
           SELECT b.doc_id, coalesce(l.cluster_id, b.doc_id) AS cluster_id
           FROM base b LEFT JOIN lbl l USING (doc_id))
         SELECT 0 AS stage_ord, 'total' AS stage,
           CAST(count(*) AS BIGINT) AS docs_kept FROM base
         UNION ALL
         SELECT 1, 'exact', CAST(count(DISTINCT md5(text)) AS BIGINT) FROM base
         UNION ALL
         SELECT 2, 'near_dup', CAST(count(DISTINCT cluster_id) AS BIGINT) FROM mem
         ORDER BY stage_ord""",
    // p13: the same CC replay as d15, then the sqrt-law keep window
    "p13_cluster_balanced" ->
      s"""WITH RECURSIVE $shingleCte,
         $minhashPairsCtes,
         edges AS (
           SELECT a_id AS src, b_id AS dst FROM pairs
           UNION
           SELECT b_id, a_id FROM pairs),
         reach(v, r) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT reach.v, e.dst FROM reach JOIN edges e ON reach.r = e.src),
         lbl AS (SELECT v AS doc_id, least(v, min(r)) AS cluster_id
           FROM reach GROUP BY v),
         mem AS (
           SELECT b.doc_id, coalesce(l.cluster_id, b.doc_id) AS cluster_id,
             CAST(b.n_chars AS BIGINT) AS n_chars
           FROM base b LEFT JOIN lbl l USING (doc_id)),
         cnt AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
           FROM mem GROUP BY 1),
         rnk AS (
           SELECT doc_id, cluster_id,
             CAST(row_number() OVER (PARTITION BY cluster_id
               ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rank
           FROM mem)
         SELECT r.doc_id, r.cluster_id, r.rank, c.n_members,
           (r.rank * r.rank <= c.n_members) AS kept
         FROM rnk r JOIN cnt c USING (cluster_id)
         ORDER BY r.doc_id""",
    "d18_cluster_rep" ->
      s"""WITH RECURSIVE $shingleCte,
         $minhashPairsCtes,
         edges AS (
           SELECT a_id AS src, b_id AS dst FROM pairs
           UNION
           SELECT b_id, a_id FROM pairs),
         reach(v, r) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT reach.v, e.dst FROM reach JOIN edges e ON reach.r = e.src),
         lbl AS (SELECT v AS doc_id, least(v, min(r)) AS cluster_id
           FROM reach GROUP BY v),
         mem AS (
           SELECT b.doc_id, coalesce(l.cluster_id, b.doc_id) AS cluster_id,
             CAST(b.n_chars AS BIGINT) AS n_chars
           FROM base b LEFT JOIN lbl l USING (doc_id)),
         cnt AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
           FROM mem GROUP BY 1),
         rep AS (
           SELECT cluster_id, doc_id AS rep_id, n_chars AS rep_n_chars,
             row_number() OVER (PARTITION BY cluster_id
               ORDER BY n_chars DESC, doc_id ASC) AS rn
           FROM mem)
         SELECT r.cluster_id, r.rep_id, r.rep_n_chars, c.n_members
         FROM rep r JOIN cnt c USING (cluster_id)
         WHERE r.rn = 1 AND c.n_members >= 2
         ORDER BY r.cluster_id""",
    // d12: the incremental probe replayed — same sig/band CTEs as d3,
    // but candidates are (delta >= 1000000) x (base < 1000000) only
    "d12_incremental" ->
      s"""WITH $shingleCte,
         $minhashSigBandsCtes,
         cand AS (SELECT DISTINCT d.doc_id AS new_id, x.doc_id AS dup_of
           FROM bands d JOIN bands x
             ON d.band = x.band AND d.bv = x.bv
             AND d.doc_id >= 1000000 AND x.doc_id < 1000000)
         SELECT new_id, dup_of, jaccard FROM (
           SELECT new_id, dup_of,
             round(len(list_intersect(sa.sh, sb.sh))
               / CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 4) AS jaccard
           FROM cand JOIN shh sa ON sa.doc_id = new_id
             JOIN shh sb ON sb.doc_id = dup_of)
         WHERE jaccard >= 0.8 ORDER BY new_id, dup_of""",
    // d11: the SemDeDup pass replayed exactly — quantized centroids
    // (integer-exact sums, the s4 technique), rank-on-rounded-cosine
    // assignment, greedy lower-id-wins drop rule on round(cos,4)
    "d11_semdedup" ->
      s"""WITH aug AS ($augEmb),
         cents0 AS (
           SELECT label, dim,
             CAST(sum(CAST(round(v[dim] * 1000000) AS BIGINT)) AS DOUBLE)
               / (count(*) * 1000000.0) AS m
           FROM aug CROSS JOIN (SELECT unnest(range(1, 65)) AS dim) r
           GROUP BY 1, 2),
         cents AS (SELECT label AS c_id, list(m ORDER BY dim) AS centroid
           FROM cents0 GROUP BY 1),
         asn AS (
           SELECT vec_id, v, c_id AS cluster_id FROM (
             SELECT a.vec_id, a.v, c.c_id,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY ${cosSql("a.v", "c.centroid")} DESC, c.c_id ASC) AS p
             FROM aug a CROSS JOIN cents c)
           WHERE p = 1),
         dropped AS (SELECT DISTINCT b.vec_id AS id
           FROM asn a JOIN asn b
             ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
           WHERE ${cosSql("a.v", "b.v")} >= 0.99)
         SELECT asn.vec_id, cluster_id,
           (asn.vec_id NOT IN (SELECT id FROM dropped)) AS is_kept
         FROM asn ORDER BY vec_id""",
    // d20: d11's assignment + greedy drop replayed, then the
    // per-cluster representative (rank on the ROUNDED assignment
    // cosine desc, id asc over kept members) and counts; only
    // clusters where something was dropped
    "d20_semdedup_rep" ->
      s"""WITH aug AS ($augEmb),
         cents0 AS (
           SELECT label, dim,
             CAST(sum(CAST(round(v[dim] * 1000000) AS BIGINT)) AS DOUBLE)
               / (count(*) * 1000000.0) AS m
           FROM aug CROSS JOIN (SELECT unnest(range(1, 65)) AS dim) r
           GROUP BY 1, 2),
         cents AS (SELECT label AS c_id, list(m ORDER BY dim) AS centroid
           FROM cents0 GROUP BY 1),
         asn AS (
           SELECT vec_id, v, c_id AS cluster_id, c_cos FROM (
             SELECT a.vec_id, a.v, c.c_id,
               ${cosSql("a.v", "c.centroid")} AS c_cos,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY ${cosSql("a.v", "c.centroid")} DESC, c.c_id ASC) AS p
             FROM aug a CROSS JOIN cents c)
           WHERE p = 1),
         dropped AS (SELECT DISTINCT b.vec_id AS id
           FROM asn a JOIN asn b
             ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
           WHERE ${cosSql("a.v", "b.v")} >= 0.99),
         mem AS (
           SELECT vec_id, cluster_id, c_cos,
             (vec_id NOT IN (SELECT id FROM dropped)) AS is_kept
           FROM asn),
         cnt AS (SELECT cluster_id,
             CAST(count(*) AS BIGINT) AS n_members,
             CAST(sum(CASE WHEN is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(sum(CASE WHEN is_kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
           FROM mem GROUP BY 1),
         rep AS (
           SELECT cluster_id, vec_id AS rep_id,
             row_number() OVER (PARTITION BY cluster_id
               ORDER BY c_cos DESC, vec_id ASC) AS rn
           FROM mem WHERE is_kept)
         SELECT r.cluster_id, r.rep_id, c.n_members, c.n_kept, c.n_dropped
         FROM rep r JOIN cnt c USING (cluster_id)
         WHERE r.rn = 1 AND c.n_dropped >= 1
         ORDER BY r.cluster_id""",
    "d5_embed_cosine" ->
      s"""WITH aug AS ($augEmb)
         SELECT a_id, b_id, cos FROM (
           SELECT a.vec_id AS a_id, b.vec_id AS b_id, ${cosSql("a.v", "b.v")} AS cos
           FROM aug a JOIN aug b ON a.label = b.label AND a.vec_id < b.vec_id)
         WHERE cos >= 0.9 ORDER BY a_id, b_id""",
    "d6_editdist" ->
      """SELECT a_id, b_id, dist FROM (
           SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
             levenshtein(a.p_name, b.p_name) AS dist
           FROM part a JOIN part b
             ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
             AND abs(length(a.p_name) - length(b.p_name)) <= 4)
         WHERE dist <= 4 ORDER BY a_id, b_id""",
    "d7_decontaminate" ->
      """WITH toks AS (
           SELECT doc_id,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+') AS tks
           FROM documents),
         sh0 AS (
           SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(tks) - 2, 1) + 1),
             i -> array_to_string(tks[i:i+2], ' '))) AS sh
           FROM toks),
         shh AS (
           SELECT doc_id, list_distinct(list_transform(sh,
             s -> CAST(concat('0x', substr(md5(concat('0:', s)), 1, 8)) AS BIGINT))) AS sh
           FROM sh0),
         bench AS (SELECT DISTINCT unnest(sh) AS s FROM shh WHERE doc_id < 10),
         cex AS (SELECT doc_id, unnest(sh) AS s FROM shh WHERE doc_id >= 10),
         hits AS (SELECT doc_id, count(*) AS n_hits FROM cex JOIN bench USING (s) GROUP BY 1)
         SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
           (coalesce(h.n_hits, 0) >= 3) AS contaminated
         FROM (SELECT doc_id FROM documents WHERE doc_id >= 10) d
         LEFT JOIN hits h USING (doc_id)
         ORDER BY doc_id""",
    // d23: d7's shingle chain with POSITIONS on the corpus side
    // (0-based shingle start token = i - 1 over the same range) and
    // the benchmark side keyed by eval doc, aggregated per pair
    "d23_contam_spans" ->
      """WITH toks AS (
           SELECT doc_id,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+') AS tks
           FROM documents),
         sh0 AS (
           SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(tks) - 2, 1) + 1),
             i -> array_to_string(tks[i:i+2], ' '))) AS sh
           FROM toks),
         shh AS (
           SELECT doc_id, list_distinct(list_transform(sh,
             s -> CAST(concat('0x', substr(md5(concat('0:', s)), 1, 8)) AS BIGINT))) AS sh
           FROM sh0),
         bsh AS (SELECT doc_id AS bench_id, unnest(sh) AS s
           FROM shh WHERE doc_id < 10),
         cex AS (SELECT doc_id, i - 1 AS pos,
             CAST(concat('0x', substr(md5(concat('0:',
               array_to_string(tks[i:i+2], ' '))), 1, 8)) AS BIGINT) AS s
           FROM (SELECT doc_id, tks,
               unnest(range(1, greatest(len(tks) - 2, 1) + 1)) AS i
             FROM toks WHERE doc_id >= 10)),
         pairs AS (SELECT c.doc_id, b.bench_id,
             CAST(count(DISTINCT c.s) AS BIGINT) AS n_shared,
             CAST(min(c.pos) AS BIGINT) AS first_pos,
             CAST(max(c.pos) AS BIGINT) AS last_pos
           FROM cex c JOIN bsh b USING (s)
           GROUP BY 1, 2)
         SELECT doc_id, bench_id, n_shared, first_pos, last_pos
         FROM pairs WHERE n_shared >= 3
         ORDER BY doc_id, bench_id""",
    // d4: the FULL SimHash pipeline re-derived in SQL — splitmix64 in
    // overflow-checked UBIGINT arithmetic (mulmod via 32-bit split:
    // hi/lo partial products, outer mod folds them back), per-bit
    // vote counting, packed signatures, then brute-force verified
    // pairs. The 7-chunk pigeonhole candidates on the Spark side have
    // recall exactly 1.0 for hamming <= 6, so the oracle's exhaustive
    // pair scan must produce the identical set.
    "d4_simhash" ->
      s"""WITH $shingleCte,
         $simhashSigCte
         SELECT a_id, b_id, hamming FROM (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             bit_count(xor(a.s, b.s)) AS hamming
           FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
         WHERE hamming <= 6 ORDER BY a_id, b_id""",
    // d30: the SELF-TUNING bucket cap provably BINDING under the
    // oracle — the full nearDupPairsAuto replay: banded pigeonhole
    // chunks, per-bucket sizes, the exact p99 (KLL at capacity 2^14 ≥
    // the ≤ 7·2^10 bucket count never compacts, so its quantile IS
    // the order statistic at rank ceil(99n/100)), cap =
    // max(32, 4·p99), over-cap buckets dropped, THEN the capped
    // candidate join verified by hamming. The planted per-document
    // template saturates 7 buckets corpus-proportionally above the
    // cap at every SF; its pairs are the metered recall cost and must
    // NOT appear.
    "d30_autocap" ->
      s"""WITH ${shingleCteFor(d30Base)},
         $simhashSigCte,
         bands AS (SELECT doc_id, s, c, CAST((s >> (c * 10)) & 1023 AS BIGINT) AS v
           FROM sig CROSS JOIN (SELECT unnest(range(0, 7)) AS c)),
         sizes AS (SELECT c, v, count(*) AS bsz FROM bands GROUP BY 1, 2),
         p99 AS (SELECT bsz AS p FROM
             (SELECT bsz, row_number() OVER (ORDER BY bsz) AS rn FROM sizes)
             WHERE rn = (SELECT (99 * count(*) + 99) // 100 FROM sizes)),
         cap AS (SELECT greatest(32, 4 * p) AS cap FROM p99),
         kept AS (SELECT b.doc_id, b.s, b.c, b.v FROM bands b
           JOIN sizes z ON z.c = b.c AND z.v = b.v
           WHERE z.bsz <= (SELECT cap FROM cap)),
         cands AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
           FROM kept x JOIN kept y ON x.c = y.c AND x.v = y.v AND x.doc_id < y.doc_id)
         SELECT a_id, b_id, hamming FROM (
           SELECT c.a_id, c.b_id, bit_count(xor(sa.s, sb.s)) AS hamming
           FROM cands c JOIN sig sa ON sa.doc_id = c.a_id
             JOIN sig sb ON sb.doc_id = c.b_id)
         WHERE hamming <= 6 ORDER BY a_id, b_id""",
    // s4: IVF 2-probe search with the quantized coarse quantizer —
    // centroid sums are exact integer arithmetic after round(x·10⁶),
    // so probe selection is deterministic and the whole search
    // replays in SQL
    // s10: the WHOLE PQ pipeline — point seeds, one Lloyd step,
    // encoding, ADC — replayed in exact integer arithmetic (quantized
    // coords, integer-rounded means via (2s+n)//(2n) on abs+sign,
    // BIGINT squared distances); every stage is order-independent, so
    // codes and ADC totals are bit-reproducible cross-engine
    "s10_pq" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         wq AS (SELECT vec_id,
             list_transform(v, x -> CAST(round(x * 10000) AS BIGINT)) AS w
           FROM e),
         dims AS (SELECT unnest(range(1, 65)) AS dim),
         corp AS (SELECT vec_id, w FROM wq WHERE vec_id >= 10),
         qs AS (SELECT vec_id, w FROM wq WHERE vec_id < 10),
         sg AS (SELECT vec_id % 32 AS code, min(vec_id) AS sid
           FROM corp GROUP BY 1),
         cb1 AS (SELECT CAST(sg.code AS INT) AS code, dim,
             CAST((dim - 1) // 8 AS INT) AS sub, c.w[dim] AS cm
           FROM sg JOIN corp c ON c.vec_id = sg.sid CROSS JOIN dims),
         dc1 AS (SELECT c.vec_id AS id, cb1.sub, cb1.code,
             CAST(sum((c.w[cb1.dim] - cb1.cm) * (c.w[cb1.dim] - cb1.cm)) AS BIGINT) AS d2
           FROM corp c CROSS JOIN cb1 GROUP BY 1, 2, 3),
         as1 AS (SELECT id, sub, code FROM (
             SELECT id, sub, code, row_number() OVER (PARTITION BY id, sub
               ORDER BY d2 ASC, code ASC) AS rn FROM dc1)
           WHERE rn = 1),
         cb AS (SELECT code, dim, CAST((dim - 1) // 8 AS INT) AS sub,
             CASE WHEN s >= 0 THEN (2*s + n) // (2*n)
                  ELSE -((2*(-s) + n) // (2*n)) END AS cm
           FROM (SELECT a.code, d.dim, CAST(sum(c.w[d.dim]) AS BIGINT) AS s,
               count(*) AS n
             FROM corp c CROSS JOIN dims d
             JOIN as1 a ON a.id = c.vec_id AND a.sub = (d.dim - 1) // 8
             GROUP BY 1, 2)),
         dc AS (SELECT c.vec_id AS n_id, cb.sub, cb.code,
             CAST(sum((c.w[cb.dim] - cb.cm) * (c.w[cb.dim] - cb.cm)) AS BIGINT) AS d2
           FROM corp c CROSS JOIN cb GROUP BY 1, 2, 3),
         codes AS (SELECT n_id, sub, code FROM (
             SELECT n_id, sub, code, row_number() OVER (PARTITION BY n_id, sub
               ORDER BY d2 ASC, code ASC) AS rn FROM dc)
           WHERE rn = 1),
         qd AS (SELECT q.vec_id AS q_id, cb.sub, cb.code,
             CAST(sum((q.w[cb.dim] - cb.cm) * (q.w[cb.dim] - cb.cm)) AS BIGINT) AS d2
           FROM qs q CROSS JOIN cb GROUP BY 1, 2, 3),
         adc AS (SELECT q_id, n_id, CAST(sum(qd.d2) AS BIGINT) AS adist
           FROM codes JOIN qd USING (sub, code) GROUP BY 1, 2),
         short AS (SELECT q_id, n_id FROM (
             SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
               ORDER BY adist ASC, n_id ASC) AS arank FROM adc)
           WHERE arank <= 80),
         ex2 AS (SELECT s.q_id, s.n_id,
             CAST(sum((q.w[d.dim] - c.w[d.dim]) * (q.w[d.dim] - c.w[d.dim])) AS BIGINT) AS adist
           FROM short s JOIN qs q ON q.vec_id = s.q_id
           JOIN corp c ON c.vec_id = s.n_id CROSS JOIN dims d
           GROUP BY 1, 2)
         SELECT q_id, n_id, adist, rank FROM (
           SELECT q_id, n_id, adist, CAST(row_number() OVER (PARTITION BY q_id
             ORDER BY adist ASC, n_id ASC) AS INT) AS rank FROM ex2)
         WHERE rank <= 5 ORDER BY q_id, rank""",
    // s11: s10's PQ training/encode CTEs verbatim + s4's quantized
    // coarse-centroid probe CTEs; the only composition point is the
    // adc CTE, which admits a (q_id, n_id) pair only when n's list is
    // among q's 2 probed lists — exactly the partition-pruned scan
    // the Spark plan performs
    "s11_ivfpq" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         wq AS (SELECT vec_id,
             list_transform(v, x -> CAST(round(x * 10000) AS BIGINT)) AS w
           FROM e),
         dims AS (SELECT unnest(range(1, 65)) AS dim),
         corp AS (SELECT vec_id, w FROM wq WHERE vec_id >= 10),
         qs AS (SELECT vec_id, w FROM wq WHERE vec_id < 10),
         sg AS (SELECT vec_id % 32 AS code, min(vec_id) AS sid
           FROM corp GROUP BY 1),
         cb1 AS (SELECT CAST(sg.code AS INT) AS code, dim,
             CAST((dim - 1) // 8 AS INT) AS sub, c.w[dim] AS cm
           FROM sg JOIN corp c ON c.vec_id = sg.sid CROSS JOIN dims),
         dc1 AS (SELECT c.vec_id AS id, cb1.sub, cb1.code,
             CAST(sum((c.w[cb1.dim] - cb1.cm) * (c.w[cb1.dim] - cb1.cm)) AS BIGINT) AS d2
           FROM corp c CROSS JOIN cb1 GROUP BY 1, 2, 3),
         as1 AS (SELECT id, sub, code FROM (
             SELECT id, sub, code, row_number() OVER (PARTITION BY id, sub
               ORDER BY d2 ASC, code ASC) AS rn FROM dc1)
           WHERE rn = 1),
         cb AS (SELECT code, dim, CAST((dim - 1) // 8 AS INT) AS sub,
             CASE WHEN s >= 0 THEN (2*s + n) // (2*n)
                  ELSE -((2*(-s) + n) // (2*n)) END AS cm
           FROM (SELECT a.code, d.dim, CAST(sum(c.w[d.dim]) AS BIGINT) AS s,
               count(*) AS n
             FROM corp c CROSS JOIN dims d
             JOIN as1 a ON a.id = c.vec_id AND a.sub = (d.dim - 1) // 8
             GROUP BY 1, 2)),
         dc AS (SELECT c.vec_id AS n_id, cb.sub, cb.code,
             CAST(sum((c.w[cb.dim] - cb.cm) * (c.w[cb.dim] - cb.cm)) AS BIGINT) AS d2
           FROM corp c CROSS JOIN cb GROUP BY 1, 2, 3),
         codes AS (SELECT n_id, sub, code FROM (
             SELECT n_id, sub, code, row_number() OVER (PARTITION BY n_id, sub
               ORDER BY d2 ASC, code ASC) AS rn FROM dc)
           WHERE rn = 1),
         qd AS (SELECT q.vec_id AS q_id, cb.sub, cb.code,
             CAST(sum((q.w[cb.dim] - cb.cm) * (q.w[cb.dim] - cb.cm)) AS BIGINT) AS d2
           FROM qs q CROSS JOIN cb GROUP BY 1, 2, 3),
         dlab AS (SELECT vec_id AS n_id, label FROM e WHERE vec_id >= 10),
         fq AS (SELECT vec_id AS q_id, v AS q_v FROM e WHERE vec_id < 10),
         cents0 AS (SELECT label, dim,
             CAST(sum(CAST(round(v[dim] * 1000000) AS BIGINT)) AS DOUBLE)
               / (count(*) * 1000000.0) AS m
           FROM e CROSS JOIN dims WHERE vec_id >= 10
           GROUP BY 1, 2),
         cents AS (SELECT label, list(m ORDER BY dim) AS centroid
           FROM cents0 GROUP BY 1),
         probes AS (SELECT q_id, label FROM (
             SELECT fq.q_id, cents.label,
               row_number() OVER (PARTITION BY fq.q_id
                 ORDER BY ${cosSql("fq.q_v", "cents.centroid")} DESC, cents.label ASC) AS p
             FROM fq CROSS JOIN cents)
           WHERE p <= 2),
         adc AS (SELECT qd.q_id, codes.n_id, CAST(sum(qd.d2) AS BIGINT) AS adist
           FROM codes
           JOIN dlab ON dlab.n_id = codes.n_id
           JOIN probes p ON p.label = dlab.label
           JOIN qd ON qd.q_id = p.q_id AND qd.sub = codes.sub
             AND qd.code = codes.code
           GROUP BY 1, 2),
         short AS (SELECT q_id, n_id FROM (
             SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
               ORDER BY adist ASC, n_id ASC) AS arank FROM adc)
           WHERE arank <= 80),
         ex2 AS (SELECT s.q_id, s.n_id,
             CAST(sum((q.w[d.dim] - c.w[d.dim]) * (q.w[d.dim] - c.w[d.dim])) AS BIGINT) AS adist
           FROM short s JOIN qs q ON q.vec_id = s.q_id
           JOIN corp c ON c.vec_id = s.n_id CROSS JOIN dims d
           GROUP BY 1, 2)
         SELECT q_id, n_id, adist, rank FROM (
           SELECT q_id, n_id, adist, CAST(row_number() OVER (PARTITION BY q_id
             ORDER BY adist ASC, n_id ASC) AS INT) AS rank FROM ex2)
         WHERE rank <= 5 ORDER BY q_id, rank""",
    // s12: s11's chain with the PQ stage run on RESIDUALS — the
    // per-list integer centroid (icent: half-up integer means of the
    // quantized coords), residual arrays for corpus and per-(query,
    // probed-list), and the training/encode/ADC CTEs re-run on them;
    // the exact refine still scores ORIGINAL quantized vectors
    "s12_ivfpq_residual" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         wq AS (SELECT vec_id,
             list_transform(v, x -> CAST(round(x * 10000) AS BIGINT)) AS w
           FROM e),
         dims AS (SELECT unnest(range(1, 65)) AS dim),
         corp AS (SELECT vec_id, w FROM wq WHERE vec_id >= 10),
         qs AS (SELECT vec_id, w FROM wq WHERE vec_id < 10),
         dlab AS (SELECT vec_id AS n_id, label FROM e WHERE vec_id >= 10),
         fq AS (SELECT vec_id AS q_id, v AS q_v FROM e WHERE vec_id < 10),
         cents0 AS (SELECT label, dim,
             CAST(sum(CAST(round(v[dim] * 1000000) AS BIGINT)) AS DOUBLE)
               / (count(*) * 1000000.0) AS m
           FROM e CROSS JOIN dims WHERE vec_id >= 10
           GROUP BY 1, 2),
         cents AS (SELECT label, list(m ORDER BY dim) AS centroid
           FROM cents0 GROUP BY 1),
         probes AS (SELECT q_id, label FROM (
             SELECT fq.q_id, cents.label,
               row_number() OVER (PARTITION BY fq.q_id
                 ORDER BY ${cosSql("fq.q_v", "cents.centroid")} DESC, cents.label ASC) AS p
             FROM fq CROSS JOIN cents)
           WHERE p <= 2),
         ic0 AS (SELECT d.label, dm.dim, CAST(sum(c.w[dm.dim]) AS BIGINT) AS s,
             count(*) AS n
           FROM corp c JOIN dlab d ON c.vec_id = d.n_id CROSS JOIN dims dm
           GROUP BY 1, 2),
         icent AS (SELECT label, dim,
             CASE WHEN s >= 0 THEN (2*s + n) // (2*n)
                  ELSE -((2*(-s) + n) // (2*n)) END AS cm
           FROM ic0),
         rcorp AS (SELECT c.vec_id, list(c.w[ic.dim] - ic.cm ORDER BY ic.dim) AS rw
           FROM corp c JOIN dlab d ON c.vec_id = d.n_id
           JOIN icent ic ON ic.label = d.label
           GROUP BY 1),
         sg AS (SELECT vec_id % 32 AS code, min(vec_id) AS sid
           FROM rcorp GROUP BY 1),
         cb1 AS (SELECT CAST(sg.code AS INT) AS code, dim,
             CAST((dim - 1) // 8 AS INT) AS sub, c.rw[dim] AS cm
           FROM sg JOIN rcorp c ON c.vec_id = sg.sid CROSS JOIN dims),
         dc1 AS (SELECT c.vec_id AS id, cb1.sub, cb1.code,
             CAST(sum((c.rw[cb1.dim] - cb1.cm) * (c.rw[cb1.dim] - cb1.cm)) AS BIGINT) AS d2
           FROM rcorp c CROSS JOIN cb1 GROUP BY 1, 2, 3),
         as1 AS (SELECT id, sub, code FROM (
             SELECT id, sub, code, row_number() OVER (PARTITION BY id, sub
               ORDER BY d2 ASC, code ASC) AS rn FROM dc1)
           WHERE rn = 1),
         cb AS (SELECT code, dim, CAST((dim - 1) // 8 AS INT) AS sub,
             CASE WHEN s >= 0 THEN (2*s + n) // (2*n)
                  ELSE -((2*(-s) + n) // (2*n)) END AS cm
           FROM (SELECT a.code, d.dim, CAST(sum(c.rw[d.dim]) AS BIGINT) AS s,
               count(*) AS n
             FROM rcorp c CROSS JOIN dims d
             JOIN as1 a ON a.id = c.vec_id AND a.sub = (d.dim - 1) // 8
             GROUP BY 1, 2)),
         dc AS (SELECT c.vec_id AS n_id, cb.sub, cb.code,
             CAST(sum((c.rw[cb.dim] - cb.cm) * (c.rw[cb.dim] - cb.cm)) AS BIGINT) AS d2
           FROM rcorp c CROSS JOIN cb GROUP BY 1, 2, 3),
         codes AS (SELECT n_id, sub, code FROM (
             SELECT n_id, sub, code, row_number() OVER (PARTITION BY n_id, sub
               ORDER BY d2 ASC, code ASC) AS rn FROM dc)
           WHERE rn = 1),
         qr AS (SELECT p.q_id, p.label,
             list(q.w[ic.dim] - ic.cm ORDER BY ic.dim) AS rw
           FROM probes p JOIN qs q ON q.vec_id = p.q_id
           JOIN icent ic ON ic.label = p.label
           GROUP BY 1, 2),
         qd AS (SELECT qr.q_id, qr.label, cb.sub, cb.code,
             CAST(sum((qr.rw[cb.dim] - cb.cm) * (qr.rw[cb.dim] - cb.cm)) AS BIGINT) AS d2
           FROM qr CROSS JOIN cb GROUP BY 1, 2, 3, 4),
         adc AS (SELECT qd.q_id, codes.n_id, CAST(sum(qd.d2) AS BIGINT) AS adist
           FROM codes JOIN dlab ON dlab.n_id = codes.n_id
           JOIN qd ON qd.label = dlab.label AND qd.sub = codes.sub
             AND qd.code = codes.code
           GROUP BY 1, 2),
         short AS (SELECT q_id, n_id FROM (
             SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
               ORDER BY adist ASC, n_id ASC) AS arank FROM adc)
           WHERE arank <= 80),
         ex2 AS (SELECT s.q_id, s.n_id,
             CAST(sum((q.w[d.dim] - c.w[d.dim]) * (q.w[d.dim] - c.w[d.dim])) AS BIGINT) AS adist
           FROM short s JOIN qs q ON q.vec_id = s.q_id
           JOIN corp c ON c.vec_id = s.n_id CROSS JOIN dims d
           GROUP BY 1, 2)
         SELECT q_id, n_id, adist, rank FROM (
           SELECT q_id, n_id, adist, CAST(row_number() OVER (PARTITION BY q_id
             ORDER BY adist ASC, n_id ASC) AS INT) AS rank FROM ex2)
         WHERE rank <= 5 ORDER BY q_id, rank""",
    "s4_knn_ivf" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         d AS (SELECT vec_id AS n_id, label, v AS n_v FROM e WHERE vec_id >= 10),
         q AS (SELECT vec_id AS q_id, v AS q_v FROM e WHERE vec_id < 10),
         cents0 AS (
           SELECT label, dim,
             CAST(sum(CAST(round(n_v[dim] * 1000000) AS BIGINT)) AS DOUBLE)
               / (count(*) * 1000000.0) AS m
           FROM d CROSS JOIN (SELECT unnest(range(1, 65)) AS dim) r
           GROUP BY 1, 2),
         cents AS (SELECT label, list(m ORDER BY dim) AS centroid FROM cents0 GROUP BY 1),
         probes AS (
           SELECT q_id, q_v, label FROM (
             SELECT q.q_id, q.q_v, cents.label,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY ${cosSql("q.q_v", "cents.centroid")} DESC, cents.label ASC) AS p
             FROM q CROSS JOIN cents)
           WHERE p <= 2),
         scored AS (
           SELECT q_id, n_id, ${cosSql("q_v", "n_v")} AS cos
           FROM probes JOIN d USING (label))
         SELECT q_id, n_id, cos, rank FROM (
           SELECT q_id, n_id, cos,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, n_id ASC) AS INT) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY q_id, rank""",
    // s14: s4's full-corpus centroid + probe scaffolding, with the
    // scored list scan additionally gated by the lang predicate —
    // pre-filtering inside probed lists, the filtered-ANN contract
    "s14_filtered_ivf" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         d AS (SELECT vec_id AS n_id, label, v AS n_v FROM e WHERE vec_id >= 10),
         q AS (SELECT vec_id AS q_id, v AS q_v FROM e WHERE vec_id < 10),
         keep AS (SELECT e.vec_id AS n_id FROM e
           JOIN documents doc ON e.vec_id = doc.doc_id
           WHERE doc.lang = 'en' AND e.vec_id >= 10),
         cents0 AS (
           SELECT label, dim,
             CAST(sum(CAST(round(n_v[dim] * 1000000) AS BIGINT)) AS DOUBLE)
               / (count(*) * 1000000.0) AS m
           FROM d CROSS JOIN (SELECT unnest(range(1, 65)) AS dim) r
           GROUP BY 1, 2),
         cents AS (SELECT label, list(m ORDER BY dim) AS centroid FROM cents0 GROUP BY 1),
         probes AS (
           SELECT q_id, q_v, label FROM (
             SELECT q.q_id, q.q_v, cents.label,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY ${cosSql("q.q_v", "cents.centroid")} DESC, cents.label ASC) AS p
             FROM q CROSS JOIN cents)
           WHERE p <= 2),
         scored AS (
           SELECT q_id, n_id, ${cosSql("q_v", "n_v")} AS cos
           FROM probes JOIN d USING (label) JOIN keep USING (n_id))
         SELECT q_id, n_id, cos, rank FROM (
           SELECT q_id, n_id, cos,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, n_id ASC) AS INT) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY q_id, rank""",
    "s6_filtered_knn" ->
      s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT id AS q_id, v AS q_v FROM e WHERE id < 10),
         c AS (SELECT e.id AS n_id, e.v AS n_v
           FROM e JOIN documents d ON e.id = d.doc_id
           WHERE d.lang = 'en' AND e.id >= 10),
         scored AS (SELECT q_id, n_id, ${cosSql("q_v", "n_v")} AS cos
           FROM q CROSS JOIN c)
         SELECT q_id, n_id, cos, rank FROM (
           SELECT q_id, n_id, cos,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, n_id ASC) AS INT) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY q_id, rank""",
    // s2: home-bucket LSH ANN — the deterministic md5-derived planes
    // make the bucketing reproducible in SQL (same bucketSql as s3),
    // so the approximate search is exactly replayable
    // s13: all three salted plane sets re-derived; UNION (not ALL)
    // is the candidate distinct; exact re-rank identical to s2's
    "s13_knn_lsh_tables" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         bkt AS (SELECT vec_id, v,
             ${bucketSql("v", 10, 64, "t0")} AS b0,
             ${bucketSql("v", 10, 64, "t1")} AS b1,
             ${bucketSql("v", 10, 64, "t2")} AS b2
           FROM e),
         q AS (SELECT vec_id AS q_id, v AS q_v, b0, b1, b2 FROM bkt WHERE vec_id < 10),
         c AS (SELECT vec_id AS n_id, v AS n_v, b0, b1, b2 FROM bkt WHERE vec_id >= 10),
         cand AS (
           SELECT q.q_id, c.n_id FROM q JOIN c ON q.b0 = c.b0
           UNION SELECT q.q_id, c.n_id FROM q JOIN c ON q.b1 = c.b1
           UNION SELECT q.q_id, c.n_id FROM q JOIN c ON q.b2 = c.b2),
         scored AS (SELECT cand.q_id, cand.n_id, ${cosSql("q.q_v", "c.n_v")} AS cos
           FROM cand
           JOIN q ON cand.q_id = q.q_id
           JOIN c ON cand.n_id = c.n_id)
         SELECT q_id, n_id, cos, rank FROM (
           SELECT q_id, n_id, cos,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, n_id ASC) AS INT) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY q_id, rank""",
    "s2_knn_lsh" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         bkt AS (SELECT vec_id, v, ${bucketSql("v", 8, 64)} AS bucket FROM e),
         q AS (SELECT vec_id AS q_id, v AS q_v, bucket FROM bkt WHERE vec_id < 10),
         c AS (SELECT vec_id AS n_id, v AS n_v, bucket FROM bkt WHERE vec_id >= 10),
         scored AS (SELECT q_id, n_id, ${cosSql("q_v", "n_v")} AS cos
           FROM q JOIN c USING (bucket))
         SELECT q_id, n_id, cos, rank FROM (
           SELECT q_id, n_id, cos,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, n_id ASC) AS INT) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY q_id, rank""",
    "d9_bloom" ->
      """WITH toks AS (
           SELECT doc_id,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+') AS tks
           FROM documents),
         sh0 AS (
           SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(tks) - 2, 1) + 1),
             i -> array_to_string(tks[i:i+2], ' '))) AS sh
           FROM toks),
         shh AS (
           SELECT doc_id, list_distinct(list_transform(sh,
             s -> CAST(concat('0x', substr(md5(concat('0:', s)), 1, 8)) AS BIGINT))) AS sh
           FROM sh0),
         bench AS (SELECT DISTINCT unnest(sh) AS s FROM shh WHERE doc_id < 10),
         cex AS (SELECT doc_id, unnest(sh) AS s FROM shh WHERE doc_id >= 10),
         hits AS (SELECT doc_id, count(*) AS n_hits FROM cex JOIN bench USING (s) GROUP BY 1)
         SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
           (coalesce(h.n_hits, 0) >= 2) AS contaminated
         FROM (SELECT doc_id FROM documents WHERE doc_id >= 10) d
         LEFT JOIN hits h USING (doc_id)
         ORDER BY doc_id""",
    "d10_dupspans" ->
      s"""WITH $shingleCte,
         ex AS (SELECT doc_id, unnest(sh) AS s FROM shh),
         shared AS (SELECT s FROM (
           SELECT s, count(DISTINCT doc_id) AS nd FROM ex GROUP BY 1) WHERE nd >= 2),
         tot AS (SELECT doc_id, count(*) AS n_shingles FROM ex GROUP BY 1),
         shr AS (SELECT doc_id, count(*) AS n_shared FROM ex
           WHERE s IN (SELECT s FROM shared) GROUP BY 1)
         SELECT t.doc_id, CAST(t.n_shingles AS BIGINT) AS n_shingles,
           CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared,
           round(coalesce(h.n_shared, 0) / CAST(t.n_shingles AS DOUBLE), 4) AS dup_ratio
         FROM tot t LEFT JOIN shr h USING (doc_id)
         ORDER BY t.doc_id""",
    "s3_hybrid" ->
      s"""WITH corpus AS (
           SELECT d.doc_id AS id,
             list_distinct(regexp_split_to_array(trim(lower(d.text)), '\\s+')) AS toks,
             CAST(e.embedding AS DOUBLE[]) AS v
           FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         bkt AS (SELECT id, toks, v,
             ${bucketSql("v", S3Planes, 64)} AS bucket
           FROM corpus),
         q AS (SELECT id AS q_id, toks AS q_toks, v AS q_v, bucket FROM bkt WHERE id < 5),
         c AS (SELECT id AS n_id, toks AS n_toks, v AS n_v, bucket FROM bkt WHERE id >= 5),
         scored AS (
           SELECT q_id, n_id,
             round(0.5 * (list_inner_product(q_v, n_v)
                 / (sqrt(list_inner_product(q_v, q_v)) * sqrt(list_inner_product(n_v, n_v))))
               + 0.5 * (len(list_intersect(q_toks, n_toks))
                 / CAST(len(q_toks) + len(n_toks) - len(list_intersect(q_toks, n_toks)) AS DOUBLE)),
             4) AS score
           FROM q JOIN c USING (bucket))
         SELECT q_id, n_id, score, rank FROM (
           SELECT q_id, n_id, score,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY score DESC, n_id ASC) AS INT) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY q_id, rank""",
    "s5_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e),
         x AS (SELECT vec_id, maxabs,
             unnest(range(1, len(v) + 1)) AS dim, unnest(v) AS val
           FROM m)
         SELECT vec_id, CAST(dim AS INT) AS dim,
           CAST(CASE WHEN maxabs = 0 THEN 0
                ELSE round(val * 127 / maxabs) END AS INT) AS q,
           round(maxabs / 127, 6) AS scale
         FROM x ORDER BY vec_id, dim""",
    // s7: the greedy MMR trajectory replayed step by step in a
    // recursive CTE — identical candidates (rounded cos, id ties),
    // identical pairwise sims, identical 0.5·cos − 0.5·maxsim
    // arithmetic, so every pick matches
    "s7_mmr" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT vec_id AS q_id, v AS q_v FROM e WHERE vec_id < 10),
         n AS (SELECT vec_id AS n_id, v AS n_v FROM e WHERE vec_id >= 10),
         scored AS (SELECT q_id, n_id, ${cosSql("q_v", "n_v")} AS cos
           FROM q CROSS JOIN n),
         cand AS (SELECT q_id, n_id, cos FROM (
           SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, n_id ASC) AS r FROM scored) WHERE r <= 20),
         sim AS (
           SELECT c1.q_id, c1.n_id AS a, c2.n_id AS b,
             ${cosSql("na.n_v", "nb.n_v")} AS s
           FROM cand c1 JOIN cand c2
             ON c1.q_id = c2.q_id AND c1.n_id <> c2.n_id
           JOIN n na ON na.n_id = c1.n_id
           JOIN n nb ON nb.n_id = c2.n_id),
         sel(q_id, step, chosen, ccos, chosen_set) AS (
           SELECT q_id, 1, n_id, cos, [n_id] FROM (
             SELECT q_id, n_id, cos,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY cos DESC, n_id ASC) AS r FROM cand) WHERE r = 1
           UNION ALL
           SELECT q_id, step + 1, pick, pcos, list_append(chosen_set, pick) FROM (
             SELECT s.q_id, s.step, c.n_id AS pick, c.cos AS pcos, s.chosen_set,
               row_number() OVER (PARTITION BY s.q_id ORDER BY
                 0.5 * c.cos - 0.5 * (SELECT max(sim.s) FROM sim
                   WHERE sim.q_id = s.q_id AND sim.a = c.n_id
                     AND list_contains(s.chosen_set, sim.b)) DESC,
                 c.n_id ASC) AS r
             FROM sel s JOIN cand c
               ON c.q_id = s.q_id AND NOT list_contains(s.chosen_set, c.n_id)
             WHERE s.step < 5) WHERE r = 1)
         SELECT q_id, chosen AS n_id, ccos AS cos, CAST(step AS INT) AS rank
         FROM sel ORDER BY q_id, rank""",
    "s1_knn_brute" ->
      s"""WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT vec_id AS q_id, v AS qv FROM d WHERE vec_id < 10),
         n AS (SELECT vec_id AS n_id, v AS nv FROM d WHERE vec_id >= 10),
         scored AS (SELECT q_id, n_id, ${cosSql("qv", "nv")} AS cos FROM q CROSS JOIN n)
         SELECT q_id, n_id, cos, rank FROM (
           SELECT q_id, n_id, cos,
             CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS INT) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY q_id, rank""",
    // s8: recall@k of the s4 IVF probe against the s1 brute-force
    // truth — both re-derived exactly as in their own oracles, so the
    // recall is exact integer counting over two proven-deterministic
    // top-k sets
    "s8_recall" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         d AS (SELECT vec_id AS n_id, label, v AS n_v FROM e WHERE vec_id >= 10),
         q AS (SELECT vec_id AS q_id, v AS q_v FROM e WHERE vec_id < 10),
         truth AS (
           SELECT q_id, n_id FROM (
             SELECT q_id, n_id,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY ${cosSql("q_v", "n_v")} DESC, n_id ASC) AS rank
             FROM q CROSS JOIN d)
           WHERE rank <= 5),
         cents0 AS (
           SELECT label, dim,
             CAST(sum(CAST(round(n_v[dim] * 1000000) AS BIGINT)) AS DOUBLE)
               / (count(*) * 1000000.0) AS m
           FROM d CROSS JOIN (SELECT unnest(range(1, 65)) AS dim) r
           GROUP BY 1, 2),
         cents AS (SELECT label, list(m ORDER BY dim) AS centroid FROM cents0 GROUP BY 1),
         probes AS (
           SELECT q_id, q_v, label FROM (
             SELECT q.q_id, q.q_v, cents.label,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY ${cosSql("q.q_v", "cents.centroid")} DESC, cents.label ASC) AS p
             FROM q CROSS JOIN cents)
           WHERE p <= 2),
         approx AS (
           SELECT q_id, n_id FROM (
             SELECT q_id, n_id,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY cos DESC, n_id ASC) AS rank
             FROM (SELECT q_id, n_id, ${cosSql("q_v", "n_v")} AS cos
                   FROM probes JOIN d USING (label)) s)
           WHERE rank <= 5)
         SELECT t.q_id, CAST(count(a.n_id) AS BIGINT) AS n_hits, 5 AS k
         FROM truth t LEFT JOIN approx a ON t.q_id = a.q_id AND t.n_id = a.n_id
         GROUP BY t.q_id ORDER BY t.q_id""",
    // s9: the s8 recall derivation repeated per probe level (the
    // per-level CTEs are generated from one template so all three
    // share the exact centroid/probe/rank arithmetic)
    "s9_recall_sweep" -> {
      def approx(np: Int) =
        s"""probes_$np AS (
           SELECT q_id, q_v, label FROM (
             SELECT q.q_id, q.q_v, cents.label,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY ${cosSql("q.q_v", "cents.centroid")} DESC, cents.label ASC) AS p
             FROM q CROSS JOIN cents)
           WHERE p <= $np),
         approx_$np AS (
           SELECT q_id, n_id FROM (
             SELECT q_id, n_id,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY cos DESC, n_id ASC) AS rank
             FROM (SELECT q_id, n_id, ${cosSql("q_v", "n_v")} AS cos
                   FROM probes_$np JOIN d USING (label)) s)
           WHERE rank <= 5)"""
      def level(np: Int) =
        s"""SELECT $np AS n_probe,
           CAST(count(a.n_id) AS BIGINT) AS total_hits,
           CAST(count(DISTINCT t.q_id) AS BIGINT) AS n_queries
         FROM truth t LEFT JOIN approx_$np a
           ON t.q_id = a.q_id AND t.n_id = a.n_id"""
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         d AS (SELECT vec_id AS n_id, label, v AS n_v FROM e WHERE vec_id >= 10),
         q AS (SELECT vec_id AS q_id, v AS q_v FROM e WHERE vec_id < 10),
         truth AS (
           SELECT q_id, n_id FROM (
             SELECT q_id, n_id,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY ${cosSql("q_v", "n_v")} DESC, n_id ASC) AS rank
             FROM q CROSS JOIN d)
           WHERE rank <= 5),
         cents0 AS (
           SELECT label, dim,
             CAST(sum(CAST(round(n_v[dim] * 1000000) AS BIGINT)) AS DOUBLE)
               / (count(*) * 1000000.0) AS m
           FROM d CROSS JOIN (SELECT unnest(range(1, 65)) AS dim) r
           GROUP BY 1, 2),
         cents AS (SELECT label, list(m ORDER BY dim) AS centroid FROM cents0 GROUP BY 1),
         ${Seq(1, 2, 3).map(approx).mkString(",\n         ")}
         ${Seq(1, 2, 3).map(level).mkString(" UNION ALL\n         ")}
         ORDER BY n_probe"""
    },
    // d16: d13's exact chunk boundaries (range start list, slice,
    // space-join) then distinct per-source passage hashes and the
    // source-pair count
    // g1: d16's posting CTE + 3 unrolled exact-integer PR rounds
    "g1_source_rank" ->
      s"""WITH t AS (SELECT source, regexp_split_to_array(trim(text), '\\s+') AS tks
           FROM documents),
         s AS (SELECT source, unnest(range(0, greatest(len(tks), 1), 20)) AS st, tks FROM t),
         p AS (SELECT source,
             md5(array_to_string(list_slice(tks, st + 1, least(st + 20, len(tks))), ' ')) AS h
           FROM s),
         sh AS (SELECT DISTINCT source, h FROM p),
         pr AS (SELECT a.source AS sa, b.source AS sb
           FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
           GROUP BY 1, 2),
         edges AS (SELECT sa AS u, sb AS v FROM pr
           UNION ALL SELECT sb, sa FROM pr),
         nodes AS (SELECT DISTINCT source FROM t),
         deg AS (SELECT n.source, CAST(coalesce(count(e.v), 0) AS BIGINT) AS outdeg
           FROM nodes n LEFT JOIN edges e ON n.source = e.u GROUP BY 1),
         r0 AS (SELECT source, CAST(1000000 AS BIGINT) AS r FROM nodes),
         c1 AS (SELECT e.v, sum(r0.r // d.outdeg) AS m FROM edges e
           JOIN r0 ON e.u = r0.source JOIN deg d ON e.u = d.source GROUP BY 1),
         r1 AS (SELECT n.source, CAST(150000 + (85 * coalesce(c1.m, 0)) // 100 AS BIGINT) AS r
           FROM nodes n LEFT JOIN c1 ON n.source = c1.v),
         c2 AS (SELECT e.v, sum(r1.r // d.outdeg) AS m FROM edges e
           JOIN r1 ON e.u = r1.source JOIN deg d ON e.u = d.source GROUP BY 1),
         r2 AS (SELECT n.source, CAST(150000 + (85 * coalesce(c2.m, 0)) // 100 AS BIGINT) AS r
           FROM nodes n LEFT JOIN c2 ON n.source = c2.v),
         c3 AS (SELECT e.v, sum(r2.r // d.outdeg) AS m FROM edges e
           JOIN r2 ON e.u = r2.source JOIN deg d ON e.u = d.source GROUP BY 1),
         r3 AS (SELECT n.source, CAST(150000 + (85 * coalesce(c3.m, 0)) // 100 AS BIGINT) AS r
           FROM nodes n LEFT JOIN c3 ON n.source = c3.v)
         SELECT r3.source, d.outdeg, r3.r AS rank_i3
         FROM r3 JOIN deg d ON r3.source = d.source
         ORDER BY r3.source""",
    // g3: the directed reprint graph (later source → earlier), two
    // unrolled HITS iterations, each phase's integer-division rescale
    // replayed against the phase total — bit-for-bit the Spark math
    "g3_hits" ->
      s"""WITH t AS (SELECT source, regexp_split_to_array(trim(text), '\\s+') AS tks
           FROM documents),
         s AS (SELECT source, unnest(range(0, greatest(len(tks), 1), 20)) AS st, tks FROM t),
         p AS (SELECT source,
             md5(array_to_string(list_slice(tks, st + 1, least(st + 20, len(tks))), ' ')) AS h
           FROM s),
         sh AS (SELECT DISTINCT source, h FROM p),
         pr AS (SELECT a.source AS sa, b.source AS sb,
             CAST(count(*) AS BIGINT) AS w
           FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
           GROUP BY 1, 2),
         edges AS (SELECT sb AS u, sa AS v, w FROM pr),
         nodes AS (SELECT DISTINCT source FROM t),
         h0 AS (SELECT source, CAST(1000000 AS BIGINT) AS hb FROM nodes),
         a1r AS (SELECT e.v AS source, CAST(sum(h0.hb * e.w) AS BIGINT) AS m
           FROM edges e JOIN h0 ON e.u = h0.source GROUP BY 1),
         a1t AS (SELECT greatest(CAST(sum(m) AS BIGINT), 1) AS s FROM a1r),
         a1 AS (SELECT n.source,
             CAST((coalesce(a1r.m, 0) * 1000000) // a1t.s AS BIGINT) AS a
           FROM nodes n LEFT JOIN a1r USING (source), a1t),
         h1r AS (SELECT e.u AS source, CAST(sum(a1.a * e.w) AS BIGINT) AS m
           FROM edges e JOIN a1 ON e.v = a1.source GROUP BY 1),
         h1t AS (SELECT greatest(CAST(sum(m) AS BIGINT), 1) AS s FROM h1r),
         h1 AS (SELECT n.source,
             CAST((coalesce(h1r.m, 0) * 1000000) // h1t.s AS BIGINT) AS hb
           FROM nodes n LEFT JOIN h1r USING (source), h1t),
         a2r AS (SELECT e.v AS source, CAST(sum(h1.hb * e.w) AS BIGINT) AS m
           FROM edges e JOIN h1 ON e.u = h1.source GROUP BY 1),
         a2t AS (SELECT greatest(CAST(sum(m) AS BIGINT), 1) AS s FROM a2r),
         a2 AS (SELECT n.source,
             CAST((coalesce(a2r.m, 0) * 1000000) // a2t.s AS BIGINT) AS a
           FROM nodes n LEFT JOIN a2r USING (source), a2t),
         h2r AS (SELECT e.u AS source, CAST(sum(a2.a * e.w) AS BIGINT) AS m
           FROM edges e JOIN a2 ON e.v = a2.source GROUP BY 1),
         h2t AS (SELECT greatest(CAST(sum(m) AS BIGINT), 1) AS s FROM h2r),
         h2 AS (SELECT n.source,
             CAST((coalesce(h2r.m, 0) * 1000000) // h2t.s AS BIGINT) AS hb
           FROM nodes n LEFT JOIN h2r USING (source), h2t)
         SELECT n.source, h2.hb AS hub, a2.a AS auth
         FROM nodes n JOIN h2 USING (source) JOIN a2 USING (source)
         ORDER BY n.source""",
    // g2: the g1 CTE chain with per-edge weights (n_shared) and the
    // weighted split (r*w) // wdeg — integer div per edge, matching
    // the Spark expression exactly
    "g2_weighted_rank" ->
      s"""WITH $weightedRankCtes
         SELECT r3.source, d.wdeg, r3.r AS rank_i3
         FROM r3 JOIN deg d ON r3.source = d.source
         ORDER BY r3.source""",
    "d16_source_overlap" ->
      s"""WITH t AS (SELECT source, regexp_split_to_array(trim(text), '\\s+') AS tks
           FROM documents),
         s AS (SELECT source, unnest(range(0, greatest(len(tks), 1), 20)) AS st, tks FROM t),
         p AS (SELECT source,
             md5(array_to_string(list_slice(tks, st + 1, least(st + 20, len(tks))), ' ')) AS h
           FROM s),
         sh AS (SELECT DISTINCT source, h FROM p)
         SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared
         FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "d17_capped_overlap" ->
      s"""WITH t AS (SELECT source, regexp_split_to_array(trim(text), '\\s+') AS tks
           FROM documents),
         s AS (SELECT source, unnest(range(0, greatest(len(tks), 1), 20)) AS st, tks FROM t),
         p AS (SELECT source,
             md5(array_to_string(list_slice(tks, st + 1, least(st + 20, len(tks))), ' ')) AS h
           FROM s),
         sh AS (SELECT DISTINCT source, h FROM p),
         keep AS (SELECT source, h FROM sh
           WHERE h IN (SELECT h FROM sh GROUP BY h HAVING count(*) <= 3))
         SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared
         FROM keep a JOIN keep b ON a.h = b.h AND a.source < b.source
         GROUP BY 1, 2 ORDER BY 1, 2""",
  )
}
