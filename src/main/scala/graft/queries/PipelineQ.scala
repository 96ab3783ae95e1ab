package graft.queries

import graft.Tables
import graft.operators.Corpus
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-pipeline corpus-management queries (SURVEY.md §2):
  * deterministic splits and token-budget packing over `documents`.
  */
object PipelineQ {

  /** p1: reproducible train/val/test split (90/5/5) keyed on the
    * document id hash — stable under re-runs and appends. */
  def p1HashSplit(spark: SparkSession, dir: String): DataFrame =
    Corpus.hashSplit(
        Tables.documents(spark, dir).select("doc_id", "lang"),
        col("doc_id"), pctTrain = 90, pctVal = 5)
      .select("doc_id", "lang", "bucket", "split")
      .orderBy("doc_id")

  /** p2: sequence packing — per-language contiguous layout cut into
    * ~1000-token training chunks by running token total. */
  def p2Pack(spark: SparkSession, dir: String): DataFrame =
    Corpus.packSequences(
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("lang"),
            TextAnalysis.nTokens(col("text")).as("n_tokens")),
        keyCol = col("lang"), orderCol = col("doc_id"),
        tokensCol = col("n_tokens"), budget = 1000L)
      .select("doc_id", "lang", "n_tokens", "cum_tokens", "chunk_id")
      .orderBy("doc_id")

  /** p16: the pack-span manifest — p2's packing upgraded to the
    * attention-mask artifact (per doc: offset, length, order inside
    * its pack, and the pack's total tokens — what a trainer needs to
    * block-diagonalize attention and reset position ids at document
    * boundaries). Same one lang-keyed exchange as p2: the per-pack
    * windows refine the packing's own partitioning. */
  def p16PackSpans(spark: SparkSession, dir: String): DataFrame =
    Corpus.packSpanManifest(
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("lang"),
            TextAnalysis.nTokens(col("text")).as("n_tokens")),
        keyCol = col("lang"), orderCol = col("doc_id"),
        tokensCol = col("n_tokens"), budget = 1000L)
      .select(col("lang"), col("chunk_id"), col("seq_idx"), col("doc_id"),
        col("span_start"), col("span_len"), col("pack_tokens"))
      .orderBy("doc_id")

  /** p3: reproducible sharded corpus shuffle (8 shards). */
  def p3Shuffle(spark: SparkSession, dir: String): DataFrame =
    Corpus.shuffleShards(
        Tables.documents(spark, dir).select("doc_id"),
        col("doc_id"), nShards = 8)
      .select("doc_id", "shuffle_key", "shard_id", "shard_pos")
      .orderBy("doc_id")

  /** p4: mixture construction — src0 upsampled 2.5x, src1 kept at
    * 25%, everything else passed through once. */
  def p4Mixture(spark: SparkSession, dir: String): DataFrame =
    Corpus.mixtureSample(
        Tables.documents(spark, dir).select("doc_id", "source"),
        col("doc_id"), col("source"),
        weights = Map("src0" -> 2.5, "src1" -> 0.25),
        defaultWeight = 1.0)
      .select("doc_id", "source", "copy_id")
      .orderBy("doc_id", "copy_id")

  /** p9: temperature rebalancing (α = 1/2) — per-source acceptance
    * √(n_min/n_s) flattens the domain mixture toward the smallest
    * source; the draw is exact integer math (h²·n_s < n_min·2⁴⁰). */
  def p9Temperature(spark: SparkSession, dir: String): DataFrame =
    Corpus.temperatureSample(
        Tables.documents(spark, dir).select("doc_id", "source"),
        col("source"), col("doc_id"))
      .select("doc_id", "source", "n_s", "kept")
      .orderBy("doc_id")

  /** p5: overlapping token-window chunking — 40-token windows every
    * 30 tokens (10-token overlap), the RAG/context-prep layout. */
  def p5Chunk(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.explodeChunks(
        Tables.documents(spark, dir).select("doc_id", "text"),
        col("text"), width = 40, stride = 30)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_text"))
      .withColumn("n_chunk_tokens", TextAnalysis.nTokens(col("chunk_text")))
      .orderBy("doc_id", "chunk_idx")

  /** p6: deterministic stratified sample — a 40-per-language panel
    * drawn by md5-hash rank (no RNG; the rank-dropping shape rides
    * the TopKPerKey rewrite). Strata smaller than the quota return
    * whole (sf0.001 exercises that branch). */
  def p6Stratified(spark: SparkSession, dir: String): DataFrame =
    Corpus.stratifiedSample(
        Tables.documents(spark, dir).select("doc_id", "lang", "source"),
        col("lang"), col("doc_id"), nPer = 40)
      .orderBy("doc_id")

  /** p7: curriculum phases — documents quartiled per language by a
    * difficulty proxy (length), shortest first: phase 1 = the easy
    * quarter, phase 4 = the hard one. The quartile is positional
    * ntile over the totally-ordered (length, doc_id) key, computed
    * through [[graft.operators.Corpus.shardedNtile]] (order-aligned
    * n_chars buckets, two-level exact ranks, closed-form tile
    * split) so no language ever totally orders its documents inside
    * one window task — bit-identical to the ntile window form the
    * oracle replays, spec-proven. */
  def p7Curriculum(spark: SparkSession, dir: String): DataFrame =
    Corpus.shardedNtile(
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("lang"), col("n_chars")),
        groupCol = "lang", primaryOrder = "n_chars",
        tieBreak = "doc_id", tiles = 4)
      .select("doc_id", "lang", "n_chars", "phase")
      .orderBy("doc_id")

  /** p8: per-source document cap (audit form) — every document keeps
    * its source's total, its deterministic in-source rank, and the
    * kept/dropped verdict at a 150-docs-per-source cap (sf0.01's
    * sources hold ~125 docs each, so both verdicts appear at sf0.1
    * and the all-kept branch is exercised below it). */
  def p8DomainCap(spark: SparkSession, dir: String): DataFrame =
    Corpus.domainCap(
        Tables.documents(spark, dir).select("doc_id", "source"),
        col("source"), col("doc_id"), maxPerDomain = 150)
      .orderBy("doc_id")

  /** p10: token-budget source selection — rank sources by token mass
    * and keep the largest until the cumulative count passes 40% of
    * the corpus (the "data budget" cut every training-mix plan
    * starts from). Plan: one corpus-wide per-source token aggregate
    * (map-side partial sums — the only wide stage), then the cumsum
    * window runs on the SOURCE-level table: O(|sources|) rows, the
    * deliberate tiny-final-reduction single partition (PlanAuditSpec
    * allowlists it). ALL-INTEGER: the 40% rule compares
    * cum·10 ≤ total·4, no ratios, no rounding. */
  def p10TokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .select(col("source"), TextAnalysis.nTokens(col("text")).as("nt"))
      .groupBy("source").agg(sum("nt").as("n_tokens"))
    val w = Window.orderBy(col("n_tokens").desc, col("source").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = Window.partitionBy()
    perSource
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .withColumn("total_tokens", sum("n_tokens").over(total))
      .withColumn("selected",
        col("cum_tokens") * 10 <= col("total_tokens") * 4)
      .select("source", "n_tokens", "cum_tokens", "selected")
      .orderBy(col("n_tokens").desc, col("source").asc)
  }

  /** p12: data-constrained repeat planning — the epoch schedule a
    * token-budgeted multilingual run needs when a language is
    * SMALLER than its mixture target (the data-constrained regime of
    * Muennighoff et al. 2023: low-resource languages run out of
    * unique tokens and must repeat, but repeating past a few epochs
    * stops helping, so the plan caps repeats and reports the
    * shortfall). Per language: an equal share of a 2×-corpus token
    * budget, the epochs needed to serve it (integer ceil), repeats
    * clamped to the cap, whether the cap engaged, and the tokens
    * actually served. ALL-INTEGER arithmetic throughout. The only
    * wide stages are the per-language aggregate and the O(|langs|)
    * global window (the p10 pattern — bounded by construction).
    * Both cap branches are live at every SF: `en` (~40% of tokens)
    * fills its share within the cap, the four smaller languages
    * cannot. */
  def p12RepeatPlan(spark: SparkSession, dir: String): DataFrame = {
    val cap = 2L
    val perLang = Tables.documents(spark, dir)
      .select(col("lang"), TextAnalysis.nTokens(col("text")).as("nt"))
      .groupBy("lang").agg(sum("nt").as("n_tokens"))
    val all = Window.partitionBy()
    perLang
      .withColumn("total_tokens", sum("n_tokens").over(all))
      .withColumn("n_langs", count(lit(1)).over(all))
      .withColumn("target_tokens", expr("(total_tokens * 2) DIV n_langs"))
      .withColumn("epochs_needed",
        expr("(target_tokens + n_tokens - 1) DIV n_tokens"))
      .withColumn("repeats", least(col("epochs_needed"), lit(cap)))
      .withColumn("capped", col("epochs_needed") > cap)
      .withColumn("served_tokens",
        least(col("target_tokens"), col("n_tokens") * cap))
      .select("lang", "n_tokens", "target_tokens", "repeats", "capped",
        "served_tokens")
      .orderBy("lang")
  }

  /** p14: epoch-manifest materialization — p12's repeat PLAN turned
    * into the actual training manifest a data loader consumes: one
    * row per (lang, epoch, doc). Each language serves
    * `served = min(target, 2·n_tokens)` tokens (p12's capped
    * schedule) as `served DIV n_tokens` FULL epochs of every doc
    * plus one PARTIAL epoch that takes docs in doc_id order while
    * the running token total stays within the remainder — exact
    * integer accounting, no sampling. All three manifest regimes are
    * data-live: full-only (the four small languages, rem=0),
    * full+partial (en at sf0.001: 1 full + 832-token partial),
    * partial-only (en at sf0.01/0.1: target < n_tokens so epoch 1
    * is already the cut). Plan: one token-count scan feeds the tiny
    * per-lang plan (broadcast back), full epochs are a bounded
    * sequence-explode (fanout ≤ cap=2), and the partial cut runs
    * through [[graft.operators.Corpus.orderedPrefixCut]] — the
    * sharded two-level cumsum (order-aligned doc_id buckets,
    * per-bucket offsets, row-level scan only inside the single
    * boundary bucket), so no language ever funnels its full doc set
    * through one window task; spec-proven row-identical to the
    * per-lang window form. */
  def p14EpochManifest(spark: SparkSession, dir: String): DataFrame = {
    val ps = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        TextAnalysis.nTokens(col("text")).cast("long").as("nt"))
      .localCheckpoint(false)
    val plan = ps.groupBy("lang").agg(sum("nt").as("n_tokens"))
      .withColumn("target",
        expr("(sum(n_tokens) OVER ()) * 2 DIV (count(1) OVER ())"))
      .withColumn("served", least(col("target"), col("n_tokens") * 2))
      .withColumn("full_epochs", expr("served DIV n_tokens"))
      .withColumn("rem", col("served") % col("n_tokens"))
      .select("lang", "full_epochs", "rem")
    val withPlan = ps.join(broadcast(plan), Seq("lang"))
    val full = withPlan.filter(col("full_epochs") >= 1)
      .select(col("lang"),
        explode(expr("sequence(1L, full_epochs)")).as("epoch"),
        col("doc_id"), col("nt"))
    val partial = Corpus.orderedPrefixCut(
        withPlan.filter(col("rem") > 0),
        groupCol = "lang", orderCol = "doc_id",
        weightCol = "nt", budgetCol = "rem")
      .select(col("lang"), (col("full_epochs") + 1).as("epoch"),
        col("doc_id"), col("nt"))
    full.unionByName(partial).orderBy("lang", "epoch", "doc_id")
  }

  /** p11: contamination-aware split accounting — the audit a
    * pipeline runs before training: p1's deterministic hash split
    * joined with d7's decontamination verdict, aggregated to
    * (split, contaminated) counts. Answers "how much of each split
    * survives decontamination, and does eval leakage concentrate in
    * any split". Plan: the d7 pipeline (benchmark shingles
    * broadcast, corpus-side explode map-thinned by the join) plus a
    * map-only split assignment — the doc_id aggregate is the only
    * wide stage beyond d7's own; output is O(splits) rows. Both
    * verdict branches live at every SF (e.g. 559 of 4502 train docs
    * contaminated at sf0.1). */
  def p11DecontamSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val verdict = graft.dedup.Dedup.decontaminate(
      corpus = docs.filter(col("doc_id") >= 10),
      benchmark = docs.filter(col("doc_id") < 10),
      minSharedShingles = 3)
    val splits = Corpus.hashSplit(
      docs.filter(col("doc_id") >= 10).select("doc_id"),
      col("doc_id"), pctTrain = 90, pctVal = 5)
    splits.join(verdict.select("doc_id", "contaminated"), Seq("doc_id"))
      .groupBy("split", "contaminated")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("split", "contaminated")
  }

  /** p15: length-bucketed dynamic batching
    * ([[Corpus.lengthBucketedBatches]]) — batches pad to their own
    * longest member, so like-length grouping is what contains the
    * waste. Tier thresholds 25/50/75 keep all four buckets
    * data-live at every SF (token counts run 10–100); the output is
    * the batch manifest with each batch's padding bill. Oracle
    * replays the in-bucket row_number assignment (the h5 pattern —
    * `batchAssignScalable` is the contract-tested 100 TB twin). */
  def p15LengthBatches(spark: SparkSession, dir: String): DataFrame =
    Corpus.lengthBucketedBatches(
        Tables.documents(spark, dir),
        col("doc_id"), TextAnalysis.nTokens(col("text")).cast("long"),
        boundaries = Seq(25, 50, 75), batchSize = 32)
      .orderBy("len_bucket", "batch_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p15_length_batches" -> (p15LengthBatches _),
    "p11_decontam_split" -> (p11DecontamSplit _),
    "p10_token_budget" -> (p10TokenBudget _),
    "p12_repeat_plan" -> (p12RepeatPlan _),
    "p14_epoch_manifest" -> (p14EpochManifest _),
    "p7_curriculum" -> (p7Curriculum _),
    "p8_domain_cap" -> (p8DomainCap _),
    "p1_hash_split" -> (p1HashSplit _),
    "p2_pack" -> (p2Pack _),
    "p16_pack_spans" -> (p16PackSpans _),
    "p3_shuffle" -> (p3Shuffle _),
    "p4_mixture" -> (p4Mixture _),
    "p5_chunk" -> (p5Chunk _),
    "p6_stratified" -> (p6Stratified _),
    "p9_temperature" -> (p9Temperature _),
  )

  val oracleSql: Map[String, String] = Map(
    // p15: same tier thresholds as pure comparisons, in-bucket
    // row_number batches, integer padding bill
    "p15_length_batches" ->
      """WITH t AS (
           SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS nt
           FROM documents),
         b AS (
           SELECT doc_id, nt,
             (CASE WHEN nt >= 25 THEN 1 ELSE 0 END
              + CASE WHEN nt >= 50 THEN 1 ELSE 0 END
              + CASE WHEN nt >= 75 THEN 1 ELSE 0 END) AS len_bucket
           FROM t),
         a AS (
           SELECT len_bucket, nt,
             CAST(floor((row_number() OVER (PARTITION BY len_bucket
               ORDER BY doc_id) - 1) / 32.0) AS BIGINT) AS batch_id
           FROM b)
         SELECT len_bucket, batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           max(nt) AS max_tokens,
           CAST(sum(nt) AS BIGINT) AS sum_tokens,
           CAST(count(*) AS BIGINT) * max(nt) - CAST(sum(nt) AS BIGINT)
             AS pad_tokens
         FROM a GROUP BY 1, 2 ORDER BY 1, 2""",
    // p11: d7's shingle-hit verdict (same '0:'-seeded md5 shingle
    // hash) x p1's md5 bucket split, aggregated
    "p11_decontam_split" ->
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
         hits AS (SELECT doc_id, count(*) AS n_hits FROM cex JOIN bench USING (s) GROUP BY 1),
         verdict AS (
           SELECT d.doc_id, coalesce(h.n_hits, 0) >= 3 AS contaminated,
             CAST(CAST(concat('0x', substr(md5(concat('7:', CAST(d.doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 AS INT) AS bucket
           FROM documents d LEFT JOIN hits h USING (doc_id)
           WHERE d.doc_id >= 10)
         SELECT CASE WHEN bucket < 90 THEN 'train'
                     WHEN bucket < 95 THEN 'val'
                     ELSE 'test' END AS split,
           contaminated, CAST(count(*) AS BIGINT) AS n_docs
         FROM verdict GROUP BY 1, 2 ORDER BY 1, 2""",
    // p10: same \s+ token count, same (n_tokens desc, source) total
    // order, integer 40% rule; DuckDB window sums cast back from
    // HUGEINT
    // p12: equal-share budget, integer ceil epochs, cap clamp — the
    // identical arithmetic re-derived
    // p14: p12's plan expanded to the (lang, epoch, doc) manifest
    "p14_epoch_manifest" ->
      """WITH ps AS (
           SELECT lang, doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS nt
           FROM documents),
         pl AS (SELECT lang, CAST(sum(nt) AS BIGINT) AS n_tokens
           FROM ps GROUP BY 1),
         t AS (
           SELECT lang, n_tokens,
             (CAST(sum(n_tokens) OVER () AS BIGINT) * 2)
               // CAST(count(*) OVER () AS BIGINT) AS target
           FROM pl),
         plan AS (
           SELECT lang,
             least(target, n_tokens * 2) // n_tokens AS full_epochs,
             least(target, n_tokens * 2) % n_tokens AS rem
           FROM t),
         fe AS (
           SELECT p.lang, unnest(range(1, pn.full_epochs + 1)) AS epoch,
             p.doc_id, p.nt
           FROM ps p JOIN plan pn USING (lang)
           WHERE pn.full_epochs >= 1),
         pe AS (
           SELECT lang, full_epochs + 1 AS epoch, doc_id, nt FROM (
             SELECT p.lang, pn.full_epochs, pn.rem, p.doc_id, p.nt,
               sum(p.nt) OVER (PARTITION BY p.lang ORDER BY p.doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             FROM ps p JOIN plan pn USING (lang)
             WHERE pn.rem > 0)
           WHERE cum <= rem)
         SELECT lang, epoch, doc_id, nt FROM fe
         UNION ALL
         SELECT lang, epoch, doc_id, nt FROM pe
         ORDER BY lang, epoch, doc_id""",
    "p12_repeat_plan" ->
      """WITH pl AS (
           SELECT lang,
             CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY 1),
         c AS (
           SELECT lang, n_tokens,
             CAST(sum(n_tokens) OVER () AS BIGINT) AS total_tokens,
             CAST(count(*) OVER () AS BIGINT) AS n_langs
           FROM pl),
         t AS (
           SELECT lang, n_tokens,
             (total_tokens * 2) // n_langs AS target_tokens
           FROM c),
         e AS (
           SELECT lang, n_tokens, target_tokens,
             (target_tokens + n_tokens - 1) // n_tokens AS epochs_needed
           FROM t)
         SELECT lang, n_tokens, target_tokens,
           least(epochs_needed, 2) AS repeats,
           epochs_needed > 2 AS capped,
           least(target_tokens, n_tokens * 2) AS served_tokens
         FROM e ORDER BY lang""",
    "p10_token_budget" ->
      """WITH ps AS (
           SELECT source,
             CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY 1),
         c AS (
           SELECT source, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY n_tokens DESC, source ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
             CAST(sum(n_tokens) OVER () AS BIGINT) AS total_tokens
           FROM ps)
         SELECT source, n_tokens, cum_tokens,
           (cum_tokens * 10 <= total_tokens * 4) AS selected
         FROM c ORDER BY n_tokens DESC, source ASC""",
    // p9: the squared-inequality draw re-derived; 2^40 literal
    "p9_temperature" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
           FROM documents GROUP BY 1),
         m AS (SELECT min(n_s) AS n_min FROM c),
         d AS (SELECT doc_id, source,
             CAST(concat('0x', substr(md5(concat('29:', source, ':', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 1048576 AS h
           FROM documents)
         SELECT d.doc_id, d.source, c.n_s,
           (CAST(d.h AS HUGEINT) * CAST(d.h AS HUGEINT) * CAST(c.n_s AS HUGEINT)
             < CAST(m.n_min AS HUGEINT) * CAST(1099511627776 AS HUGEINT)) AS kept
         FROM d JOIN c USING (source), m
         ORDER BY d.doc_id""",
    "p8_domain_cap" ->
      """SELECT doc_id, source,
           CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS domain_total,
           CAST(row_number() OVER (PARTITION BY source
             ORDER BY md5(concat('domcap:', CAST(doc_id AS VARCHAR))), doc_id) AS INT) AS domain_rank,
           (row_number() OVER (PARTITION BY source
             ORDER BY md5(concat('domcap:', CAST(doc_id AS VARCHAR))), doc_id) <= 150) AS kept
         FROM documents ORDER BY doc_id""",
    "p1_hash_split" ->
      """SELECT doc_id, lang,
           CAST(CAST(concat('0x', substr(md5(concat('7:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 AS INT) AS bucket,
           CASE WHEN CAST(concat('0x', substr(md5(concat('7:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 < 90 THEN 'train'
                WHEN CAST(concat('0x', substr(md5(concat('7:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 < 95 THEN 'val'
                ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",
    // p16: p2's cum/chunk replay, then the per-pack base-offset min,
    // order row_number and token-sum windows — all integer
    "p16_pack_spans" ->
      """WITH t AS (
           SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
           FROM documents),
         c AS (
           SELECT doc_id, lang, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
           FROM t),
         p AS (
           SELECT doc_id, lang, n_tokens,
             CAST(floor((cum_tokens - n_tokens) / 1000) AS BIGINT) AS chunk_id,
             cum_tokens - n_tokens AS sa
           FROM c)
         SELECT lang, chunk_id,
           CAST(row_number() OVER (PARTITION BY lang, chunk_id
             ORDER BY doc_id) AS INT) AS seq_idx,
           doc_id,
           CAST(sa - min(sa) OVER (PARTITION BY lang, chunk_id) AS BIGINT)
             AS span_start,
           CAST(n_tokens AS BIGINT) AS span_len,
           CAST(sum(n_tokens) OVER (PARTITION BY lang, chunk_id) AS BIGINT)
             AS pack_tokens
         FROM p ORDER BY doc_id""",
    "p2_pack" ->
      """WITH t AS (
           SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
           FROM documents),
         c AS (
           SELECT doc_id, lang, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
           FROM t)
         SELECT doc_id, lang, n_tokens, cum_tokens,
           CAST(floor((cum_tokens - n_tokens) / 1000) AS BIGINT) AS chunk_id
         FROM c ORDER BY doc_id""",
    "p3_shuffle" ->
      """WITH k AS (
           SELECT doc_id,
             CAST(concat('0x', substr(md5(concat('11:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) AS shuffle_key
           FROM documents)
         SELECT doc_id, shuffle_key,
           CAST(shuffle_key % 8 AS INT) AS shard_id,
           CAST(row_number() OVER (PARTITION BY shuffle_key % 8
             ORDER BY shuffle_key, doc_id) AS INT) AS shard_pos
         FROM k ORDER BY doc_id""",
    "p4_mixture" ->
      """WITH w AS (
           SELECT doc_id, source,
             CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.25
               ELSE 1.0 END AS mw,
             CAST(concat('0x', substr(md5(concat('13:', source, ':', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 10000 AS bucket
           FROM documents),
         n AS (
           SELECT doc_id, source,
             CAST(floor(mw) AS INT)
               + CASE WHEN bucket < (mw - floor(mw)) * 10000 THEN 1 ELSE 0 END AS n_copies
           FROM w)
         SELECT doc_id, source, copy_id FROM (
           SELECT doc_id, source,
             CAST(unnest(range(1, n_copies + 1)) AS INT) AS copy_id
           FROM n)
         ORDER BY doc_id, copy_id""",
    "p7_curriculum" ->
      """SELECT doc_id, lang, n_chars,
           CAST(ntile(4) OVER (PARTITION BY lang
             ORDER BY n_chars ASC, doc_id ASC) AS INT) AS phase
         FROM documents ORDER BY doc_id""",
    "p6_stratified" ->
      """SELECT doc_id, lang, source FROM (
           SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5(concat('strat:', CAST(doc_id AS VARCHAR))), doc_id) AS r
           FROM documents)
         WHERE r <= 40 ORDER BY doc_id""",
    "p5_chunk" ->
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tks
           FROM documents),
         s AS (
           SELECT doc_id, tks,
             unnest(range(0, greatest(len(tks), 1), 30)) AS st
           FROM t)
         SELECT doc_id,
           CAST(st / 30 AS INT) AS chunk_idx,
           array_to_string(list_slice(tks, st + 1, least(st + 40, len(tks))), ' ') AS chunk_text,
           CAST(len(list_slice(tks, st + 1, least(st + 40, len(tks)))) AS INT) AS n_chunk_tokens
         FROM s ORDER BY doc_id, chunk_idx""",
  )
}
