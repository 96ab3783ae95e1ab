package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline: token
  * counting, quality scoring, language ID, fingerprinting. Map-only —
  * at 100 TB these run at scan speed with zero shuffles. Builtin
  * codegen'd expressions everywhere; the one HOF lambda left
  * (tokenMatches) is a measured, documented exception — see its
  * Scaladoc for the three-way benchmark that keeps it.
  *
  * The reference corpus operations (tulflow) stop at validation and
  * crosswalks; these extend the same record-stream model to the
  * filtering/scoring stages an LLM data pipeline adds.
  */
object TextAnalysis {

  /** Whitespace tokens (the cheap count). */
  def nTokens(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** Word tokens via a BPE-ish regex ([a-z0-9]+ runs) — robust to
    * punctuation, the count a tokenizer budget estimate wants. */
  def nWordTokens(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z0-9]+"), lit(0)))

  /** Gopher-style composite quality rules (Rae et al. 2021's
    * MassiveText document gate), shared by the batch query (ta16)
    * and the streaming ingest gate ([[graft.streaming.QualityStream]]).
    * Input needs (doc_id, text); output is one row per doc with the
    * four rule verdicts + the composite `pass`, ALL-INTEGER
    * thresholds (no float ratio parity surface). Plan: one token
    * explode → (doc_id, tok) count → per-doc aggregate — every rule
    * input from one keyed aggregation chain, no window, no corpus
    * join-back. TOTAL over its input: NULL text coalesces to '' so
    * every doc_id gets a verdict row (a quality gate must never lose
    * rows — explode(NULL) yields none, and the streaming gate's join
    * would silently drop the doc from corpus AND quarantine); ''
    * tokenizes to one empty token ⇒ n_tokens=1 ⇒ rule_wc fails ⇒
    * the doc lands in quarantine, which is the verdict a text-less
    * document deserves. */
  def gopherRules(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val stop = Seq("the", "a", "of", "and", "in", "to", "is")
    val tf = docs
      .select(col("doc_id"),
        explode(split(trim(coalesce(col("text"), lit(""))), "\\s+"))
          .as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    tf.groupBy("doc_id").agg(
        sum("tf").as("n_tokens"),
        sum(length(col("tok")) * col("tf")).as("n_nonspace"),
        max("tf").as("max_tf"),
        sum(when(col("tok").isin(stop: _*), col("tf")).otherwise(0L))
          .as("n_stop"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") >= 20 && col("n_tokens") <= 80).as("rule_wc"),
        (col("n_nonspace") >= col("n_tokens") * 4 &&
          col("n_nonspace") <= col("n_tokens") * 5).as("rule_mwl"),
        (col("n_stop") >= 2).as("rule_stop"),
        (col("max_tf") * 5 <= col("n_tokens")).as("rule_rep"))
      .withColumn("pass",
        col("rule_wc") && col("rule_mwl") && col("rule_stop") &&
          col("rule_rep"))
  }

  /** Within-document n-gram repetition (the Gopher repetition family,
    * Rae et al. 2021 Table A1 — the MassiveText signals [[gopherRules]]'
    * token gate does not cover): per document, the character mass of
    * the most frequent word 2-GRAM (`top2_chars` = max over 2-grams
    * of count·length — boilerplate phrases repeated through a doc)
    * and of all REPEATED word 3-grams (`dup3_chars` = Σ over 3-grams
    * with count ≥ 2 of count·length — templated/spun text), judged
    * against the normalized character count with ALL-INTEGER
    * threshold compares (top-2-gram share ≤ 1/14, duplicate-3-gram
    * mass ≤ 1/10 — both verdicts data-live at every SF): no float
    * ratio parity surface, the ta16 posture. NULL text coalesces to
    * '' so every doc keeps its verdict row.
    *
    * Plan: normalize once; n-gram generation is
    * `explode(sequence)+slice+concat_ws` (the generator form — no
    * HOF lambda in the hot path, the d2/p5 lesson); then two
    * (doc_id, gram)-keyed counts feeding doc-keyed aggregates — map
    * explode + keyed aggregations, no window, no corpus join-back:
    * the same one-shuffle-per-signal 100 TB shape as [[gopherRules]],
    * with the (doc, gram) key uniform by construction (no skew: a
    * gram's count is bounded by its doc's length). */
  def ngramRepetition(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val base = docs.select(col("doc_id"),
      regexp_replace(trim(coalesce(col("text"), lit(""))), "\\s+", " ")
        .as("norm"))
    def gramCounts(n: Int) = base
      .select(col("doc_id"), split(col("norm"), " ").as("toks"))
      // sequence(1, m) REVERSES when m < 1 — guard short docs to an
      // empty gram set instead
      .select(col("doc_id"), col("toks"),
        explode(when(size(col("toks")) >= n,
            sequence(lit(1), size(col("toks")) - (n - 1)))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("toks"), col("i"), lit(n))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val top2 = gramCounts(2).groupBy("doc_id")
      .agg(max(col("c") * length(col("g"))).as("top2_chars"))
    val dup3 = gramCounts(3).groupBy("doc_id")
      .agg(sum(when(col("c") >= 2, col("c") * length(col("g")))
        .otherwise(lit(0L))).as("dup3_chars"))
    base.join(top2, Seq("doc_id"), "left").join(dup3, Seq("doc_id"), "left")
      .select(col("doc_id"),
        length(col("norm")).cast("long").as("n_chars"),
        coalesce(col("top2_chars"), lit(0L)).as("top2_chars"),
        coalesce(col("dup3_chars"), lit(0L)).as("dup3_chars"))
      .withColumn("rule_top2",
        col("top2_chars") * 14 <= col("n_chars"))
      .withColumn("rule_dup3",
        col("dup3_chars") * 10 <= col("n_chars"))
      .withColumn("pass", col("rule_top2") && col("rule_dup3"))
  }

  /** PII patterns, deliberately portable: no backrefs/lookaround, so
    * the same pattern string behaves identically under Java regex
    * (Spark codegen) and RE2 (most other engines, incl. the oracle). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9] [0-9]{3} [0-9]{4} [0-9]{4}"

  /** PII redaction: mask emails and phone numbers with typed
    * placeholder tokens. Map-only regexp_replace — scan-speed at any
    * scale; the counts come from regexp_count so audit metrics don't
    * need a second pass over matches. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
      lit(PhoneRe), lit("<PHONE>"))

  def nEmails(text: Column): Column = regexp_count(text, lit(EmailRe))
  def nPhones(text: Column): Column = regexp_count(text, lit(PhoneRe))

  /** Overlapping token-window chunking (RAG / context-window prep):
    * windows of `width` tokens starting every `stride` tokens; the
    * last window may be shorter. posexplode over a builtin `sequence`
    * of starts, then `slice`+`concat_ws` — every expression is
    * whole-stage-codegen'd (NO higher-order-function lambda: HOF
    * lambdas evaluate interpreted per element, the d2 lesson, banned
    * in hot array paths). Map-only, no shuffle; output size is the
    * n/stride blowup the caller asked for, nothing more. Adds
    * (chunk_idx, chunk_text) columns to `df`, one row per chunk.
    * Rejects input frames that already carry the internal/output
    * names — withColumn would silently overwrite them (three call
    * sites funnel arbitrary frames through here). */
  def explodeChunks(df: org.apache.spark.sql.DataFrame, text: Column,
      width: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    val reserved = Seq("__toks", "__start", "chunk_idx", "chunk_text")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"explodeChunks: input already has reserved column(s) ${clash.mkString(", ")}")
    val toks = split(trim(text), "\\s+")
    df.withColumn("__toks", toks)
      .select(col("*"), posexplode(
        sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)),
          lit(stride))).as(Seq("chunk_idx", "__start")))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("__toks"), col("__start") + 1, lit(width))))
      .drop("__toks", "__start")
  }

  /** Ratio of non-alphanumeric-non-space characters. */
  def punctRatio(text: Column): Column =
    round(length(regexp_replace(text, "[a-z0-9\\s]", "")) / length(text), 4)

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is")

  /** Count of whole tokens from `words` in `text`.
    *
    * DELIBERATELY an HOF `filter` + `isInCollection`, kept after
    * measuring all three candidates at sf0.1 (r6, best-of-N,
    * isolated): HOF 0.092 s (ta2) / 0.151 s (ta3), a regexp_count
    * alternation 0.145 / 0.226, a JVM hash-set UDF 0.167 / 0.281.
    * The repo's "no HOF lambdas in hot array paths" invariant is
    * about HEAVY per-element work on long arrays (d2's shingle set
    * ops, 483→9.6 s as a UDF); for a small membership probe per
    * token the interpreted lambda is the cheapest of the three and
    * map-only per-row cost scales unchanged to any corpus size. */
  private def tokenMatches(text: Column, words: Seq[String]): Column =
    size(filter(split(trim(text), "\\s+"), t => t.isInCollection(words)))

  /** Fraction of tokens that are stopwords — a fluency signal:
    * natural text sits in a band, keyword-stuffed or boilerplate
    * text falls outside it. */
  def stopwordRatio(text: Column): Column =
    round(tokenMatches(text, Stopwords) / nTokens(text), 4)

  /** Mean token length over word tokens. */
  def avgTokenLen(text: Column): Column =
    round(length(regexp_replace(text, "\\s", "")) / nTokens(text), 4)

  /** Marker-token language scores: occurrences of each language's
    * high-frequency function words. A real pipeline would use
    * character n-gram profiles; marker counting is the deterministic,
    * shuffle-free heuristic and the shape is identical. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "la", "les", "et"))

  def langScore(text: Column, markers: Seq[String]): Column =
    tokenMatches(text, markers)

  /** argmax over marker scores; earlier entry in LangMarkers wins
    * ties (deterministic, mirrored in the oracle's CASE chain). */
  def predictedLang(text: Column): Column = {
    val scores = LangMarkers.map { case (l, m) => l -> langScore(text, m) }
    val maxScore = greatest(scores.map(_._2): _*)
    // fold from the right so the leftmost max wins
    scores.reverse.foldLeft(lit("und"): Column) { case (acc, (l, s)) =>
      when(s === maxScore && maxScore > 0, lit(l)).otherwise(acc)
    }
  }

  /** Gopher-style quality gate: the composite keep/drop decision an
    * LLM-data pipeline applies before training, with the failed-rule
    * reasons carried for auditability (same report shape as
    * Validate.invalidReport). All component signals are the map-only
    * expressions above. */
  def qualityGate(text: Column, minTokens: Int, maxTokens: Int,
      minAvgTokLen: Double, maxAvgTokLen: Double,
      maxPunctRatio: Double): (Column, Column) = {
    val checks = Seq(
      (nTokens(text) >= minTokens, s"fewer than $minTokens tokens"),
      (nTokens(text) <= maxTokens, s"more than $maxTokens tokens"),
      (avgTokenLen(text) >= minAvgTokLen, s"avg token len under $minAvgTokLen"),
      (avgTokenLen(text) <= maxAvgTokLen, s"avg token len over $maxAvgTokLen"),
      (punctRatio(text) <= maxPunctRatio, s"punct ratio over $maxPunctRatio"))
    val keep = checks.map(_._1).reduce(_ && _)
    val reasons = concat_ws("; ",
      checks.map { case (c, msg) => when(!c, lit(msg)) }: _*)
    (keep, reasons)
  }

  /** Character-distribution Shannon entropy over a fixed alphabet
    * (a–z, space, plus one "other" bucket) — the OCR-garbage /
    * binary-noise / key-mash quality signal: natural language sits
    * near its language's characteristic char entropy, corrupted or
    * machine-generated text falls far outside the band.
    *
    * Exact cross-engine parity with zero data movement: the 27
    * a–z/space counts come from ONE pass of the native
    * [[graft.plans.CharClassCounts]] expression (codegen'd; the
    * oracle's replace-length identity produces the identical
    * integers, and a spec pins the equality), the "other" bucket is
    * derived as length − Σcounts, and each ln is quantized to a long
    * BEFORE the fixed-order 28-term sum (the ta11 technique: integer
    * sums are order-independent and replay bit-identically in SQL).
    * NO explode, NO shuffle, NO UDF — scan speed at any corpus size.
    * Adds (n_len, s_q) where s_q = Σ_c cnt_c · round(ln(cnt_c/n)·10⁶);
    * the reader's entropy is −s_q / (n·10⁶) nats. The counts array
    * is materialized as its own projection column so the expression
    * runs once per row (CollapseProject keeps multiply-referenced
    * non-cheap aliases un-inlined). */
  def charEntropyQ(df: org.apache.spark.sql.DataFrame,
      text: Column): org.apache.spark.sql.DataFrame = {
    val staged = df
      .withColumn("__cc", graft.plans.TextExpr.charClassCounts(lower(text)))
      .withColumn("__n", length(lower(text))) // oracle measures lower(t)
    val counts = (0 until 27).map(i => element_at(col("__cc"), i + 1))
    val all = counts :+ (col("__n") - counts.reduce(_ + _)) // "other"
    val terms = all.map(c =>
      when(c > 0, c.cast("long") *
        round(log(c.cast("double") / col("__n")) * 1e6).cast("long"))
        .otherwise(lit(0L)))
    staged
      .withColumn("n_len", col("__n").cast("long"))
      .withColumn("s_q", terms.reduce(_ + _))
      .drop("__cc", "__n")
  }

  /** Whole-document fingerprint: md5 of normalized text. */
  def fingerprintMd5(norm: Column): Column = md5(norm.cast("binary"))

  /** Rolling shingle fingerprint: lexicographic min of md5 over
    * 3-token shingles — a 1-permutation MinHash; stable under small
    * edits anywhere except at the minimal shingle. Precondition:
    * ≥3 tokens (shorter docs fall back to a partial shingle). */
  def fingerprintShingleMin(norm: Column): Column = {
    val tks = split(trim(norm), "\\s+")
    val idx = sequence(lit(0), greatest(size(tks) - 3, lit(0)))
    // try_element_at: OOB yields null (concat_ws skips it) instead of
    // an ANSI error for <3-token docs
    val shingles = transform(idx, i =>
      md5(concat_ws(" ",
        try_element_at(tks, i + 1), try_element_at(tks, i + 2), try_element_at(tks, i + 3))
        .cast("binary")))
    array_min(shingles)
  }
}
