package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Index-sink preparation and collection lifecycle semantics
  * (reference: solr_api_utils.py + tasks.py).
  *
  * The reference manages SolrCloud collections/aliases over HTTP:
  * build docs, create a fresh collection, swap the serving alias to
  * it, resolve the newest `name-<version>` configset, and ignore the
  * `-init` placeholder collections. graft keeps the *data* side of
  * that lifecycle: doc building is a map-only projection; version /
  * alias resolution are small aggregations over collection-name
  * strings (they run on metadata tables, so scale is trivial — the
  * point is semantic parity).
  */
object Indexing {

  /** Solr StatsComponent (`stats.field` over a `stats.facet`,
    * solr_api_utils.py's serving side exposes it per collection):
    * for each facet value of the rows matching `predicate` — doc
    * count, min/max/sum of the stat field, the integer mean, the
    * distinct-value count (Solr's `countDistinct`), Solr's
    * `sumOfSquares`, and the exact variance NUMERATOR
    * n·Σx² − (Σx)² so the reader's variance/stddev is a division of
    * two exact integers. Solr accumulates these stats in doubles
    * (order-sensitive); taking the stat field in integer cents keeps
    * every output engine-stable and exactly mergeable across
    * partitions — the form a 1000-executor partial-aggregate tree
    * needs anyway. Every column stays BIGINT: with per-row cents
    * bounded by ~10⁹ the quadratics fit int64 up to ~10⁹ rows per
    * facet (n·Σx² < 2⁶³); beyond that headroom, shard the facet or
    * move the quadratic pair to a string-rendered wide integer —
    * a mixed-precision output is a cross-engine hash hazard.
    * Scale shape: one hash aggregation, map-side partial, output
    * O(|facet values|); the distinct count is the only second
    * pass and is bounded by |facets|·|distinct cents|. */
  def statsComponent(df: DataFrame, predicate: Column, facetCol: Column,
      centsCol: Column): DataFrame =
    df.filter(predicate)
      .groupBy(facetCol.as("facet"))
      .agg(count(lit(1)).as("n"),
        min(centsCol).as("min_cents"),
        max(centsCol).as("max_cents"),
        sum(centsCol).as("sum_cents"),
        countDistinct(centsCol).as("n_distinct"),
        sum(centsCol * centsCol).as("sumsq_cents"))
      .select(col("facet"), col("n"), col("min_cents"), col("max_cents"),
        col("sum_cents"),
        expr("sum_cents div n").as("mean_cents"),
        col("n_distinct"),
        col("sumsq_cents"),
        (col("n") * col("sumsq_cents")
          - col("sum_cents") * col("sum_cents")).as("var_num"))

  /** Records → serialized index docs. Built with concat (portable,
    * codegen'd) rather than a JSON library so the exact payload is
    * reproducible in any engine. Field order is caller-chosen. */
  def solrDoc(fields: Seq[(String, Column)]): Column = {
    val body = fields.flatMap { case (name, c) =>
      Seq(lit(s""""$name":"""), c.cast("string"), lit(","))
    }.dropRight(1)
    concat((lit("{") +: body :+ lit("}")): _*)
  }

  /** `most_recent_configsets` (reference: solr_api_utils.py:85-96):
    * configset names look like `name-<digits>`; keep max version per
    * name and re-render `name-<maxversion>`. */
  def latestVersion(df: DataFrame, nameCol: Column): DataFrame =
    df.select(
        regexp_extract(nameCol, "^(.*)-([0-9]+)$", 1).as("configset"),
        regexp_extract(nameCol, "^(.*)-([0-9]+)$", 2).cast("long").as("version"))
      .groupBy("configset")
      .agg(max("version").as("__v"))
      .select(col("configset"),
        concat(col("configset"), lit("-"), col("__v").cast("string")).as("latest"))

  /** `filter_init_collection` (reference: solr_api_utils.py:230-240):
    * drop the `-init` placeholder collections an alias was
    * bootstrapped with. */
  def filterInitCollections(df: DataFrame, collectionCol: Column): DataFrame =
    df.filter(!collectionCol.endsWith("-init"))

  /** Apply a harvest batch to an index/base table — the maintenance
    * step the reference performs against Solr with its new-updated
    * and deleted record sets (harvest.py:185-208 writes them;
    * indexing consumes them): SCD-1 upsert = base rows not replaced
    * or deleted, plus all updates. Anti-joins on the id; at scale
    * this is the MERGE-shaped single shuffle per side (or a
    * Delta/Iceberg MERGE INTO with the same semantics). */
  def applyChanges(base: DataFrame, updates: DataFrame, deletes: DataFrame,
      idCol: String): DataFrame = {
    val removed = updates.select(idCol).unionByName(deletes.select(idCol))
    base.join(removed, Seq(idCol), "left_anti")
      .unionByName(updates)
  }

  /** Sharded inverted-postings build — the index-construction step
    * itself on the data plane (what the reference hands to Solr,
    * built distributively): token → postings. The postings for one
    * token are SHARDED by doc-id block, so a stopword's posting list
    * never concentrates on a single reducer — each (token, block)
    * group is bounded by the block's documents, and blocks of one
    * token merge downstream by concatenation (they're disjoint,
    * doc-sorted). Postings serialize as "doc:tf doc:tf …" sorted by
    * doc id — deterministic and engine-portable. */
  def invertedPostings(docs: DataFrame, idCol: Column, textCol: Column,
      nBlocks: Int): DataFrame = {
    val toks = docs.select(idCol.as("doc_id"),
      explode(split(trim(lower(textCol)), "\\s+")).as("tok"))
    val tf = toks.groupBy("tok", "doc_id").agg(count(lit(1)).as("tf"))
    tf.withColumn("block", pmod(col("doc_id"), lit(nBlocks)).cast("int"))
      .groupBy("tok", "block")
      .agg(count(lit(1)).as("df_block"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("doc_id"), col("tf")))),
          s => concat(s.getField("doc_id").cast("string"), lit(":"),
            s.getField("tf").cast("string")))).as("postings"))
  }

  /** Solr TermsComponent (`terms.fl`/`terms.prefix`/`terms.mincount`/
    * `terms.limit`, `terms.sort=count` — the term-enumeration
    * endpoint autocomplete and index-diagnostics tooling reads from
    * the collections the reference manages): enumerate the field's
    * distinct terms under a prefix with document frequency ≥
    * mincount, df-descending (term breaks ties — a total order, so
    * the page is engine-deterministic), first `limit` rows. Terms
    * here are word n-grams of the text field (`nGram` = 1 for plain
    * terms; 2 gives the shingle field a realistic long-tailed df
    * distribution). Scale shape: the prefix probes each n-gram's
    * FIRST WORD before any term string is built (a light
    * per-element membership probe — the measured-fastest HOF shape,
    * see CLAUDE.md), so string construction, the per-doc
    * array_distinct (quadratic in the array length for strings —
    * the first cut paid 7 s at sf0.1 building+deduping EVERY
    * bigram; prefix-first runs 0.6 s), the explode, and the
    * downstream shuffle all shrink by the prefix's selectivity;
    * df counts docs, not occurrences, with no tf pre-aggregate
    * shuffle; ONE hash aggregation on the surviving terms; the
    * global df-order is a TopK (orderBy+limit → the TopKRewriteRule
    * bounds every partition's sort to `limit`), so the wide stage
    * moves O(|prefix-matching distinct terms|) rows, never the
    * corpus. */
  def termsComponent(docs: DataFrame, textCol: Column, prefix: String,
      minCount: Long, limit: Int, nGram: Int = 1): DataFrame = {
    require(nGram >= 1 && limit >= 1, s"bad knobs: nGram=$nGram limit=$limit")
    // the word array is PROJECTED first so the lambdas below reference
    // an attribute, not the split() expression — an outer expression
    // embedded in a HOF lambda re-evaluates per ELEMENT (the split
    // would re-tokenize the document O(L) times — measured 4 s of the
    // first cut's 7 s at sf0.1)
    val tokenized = docs.select(split(trim(lower(textCol)), "\\s+").as("ws"))
    val words = col("ws")
    // conservative word-level prefilter: a matching term's first word
    // must start with the prefix's first token (superset when the
    // prefix spans a word boundary; the exact term filter below stays
    // authoritative either way)
    val wordPrefix = prefix.split(" ").head
    val nPos = size(words) - (nGram - 1)
    val starts = filter(sequence(lit(0), nPos - 1),
      i => element_at(words, i + 1).startsWith(wordPrefix))
    val terms = array_distinct(transform(starts, i =>
      concat_ws(" ", (0 until nGram).map(j => element_at(words, i + j + 1)): _*)))
    tokenized.select(explode(when(nPos >= 1, terms)).as("term"))
      .filter(col("term").startsWith(prefix))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minCount)
      .orderBy(col("df").desc, col("term"))
      .limit(limit)
  }

  /** Keyset (cursor) pagination — Solr's cursorMark semantics: the
    * next page is everything strictly AFTER the last (sort_key, id)
    * seen, limited to the page size. OFFSET-based deep paging scans
    * and discards `offset` rows (page 1M = a near-full sort); the
    * keyset predicate pushes into the scan and the TopK rewrite
    * bounds the sort to `pageSize` rows — O(page), not O(depth), at
    * any corpus size. The (key, id) pair must be a total order (id
    * breaks ties) or pages can skip/repeat rows across engines. */
  def pageAfter(docs: DataFrame, sortKey: Column, idCol: Column,
      afterKey: Long, afterId: Long, pageSize: Int): DataFrame = {
    require(pageSize >= 1, s"pageSize must be >= 1, got $pageSize")
    docs.filter(sortKey > afterKey ||
        (sortKey === afterKey && idCol > afterId))
      .orderBy(sortKey.asc, idCol.asc)
      .limit(pageSize)
  }

  /** Range facet — Solr's `facet.range` over a numeric field for the
    * rows matching a predicate: fixed-width buckets from an explicit
    * [lo, hi) grid (Solr takes start/end/gap the same way — no data-
    * dependent min/max pass, so the whole facet is ONE scan + one
    * groupBy). Bucket math is exact integer (floored div on the
    * shifted value); out-of-grid rows clamp into the edge buckets,
    * Solr's facet.range.other=before/after folded in. */
  def rangeFacet(docs: DataFrame, predicate: Column, valueCol: Column,
      lo: Long, gap: Long, nBuckets: Int): DataFrame = {
    require(gap >= 1 && nBuckets >= 1, s"need gap>=1, nBuckets>=1")
    val raw = floor((valueCol.cast("long") - lo) / gap).cast("long")
    val b = least(greatest(raw, lit(0L)), lit(nBuckets - 1L))
    docs.filter(predicate)
      .select(b.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (lit(lo) + col("bucket") * gap).as("bucket_lo"), col("n"))
  }

  /** Search-hit highlighting — Solr's highlighter run on the data
    * plane: for rows matching `term`, a context window around the
    * FIRST occurrence with the hit wrapped in <em> tags. Pure
    * per-row string expressions (map-only; the instr filter rides
    * the scan), so a 100 TB corpus highlights at scan speed. */
  def highlight(docs: DataFrame, idCol: Column, textCol: Column,
      term: String, context: Int): DataFrame = {
    require(context >= 0, s"context must be >= 0, got $context")
    val p = instr(textCol, term)
    val start = greatest(p - context, lit(1))
    docs.filter(p > 0)
      .select(idCol.as("doc_id"), p.cast("int").as("pos"),
        concat(
          textCol.substr(start, p - start),
          lit("<em>"), lit(term), lit("</em>"),
          textCol.substr(p + term.length, lit(context))).as("snippet"))
  }

  /** Multi-field facet counts — Solr's `facet.field` list computed
    * in ONE pass: the matching rows explode to (field, value) pairs
    * and a single groupBy produces every facet — one scan and one
    * shuffle for any number of facet fields, instead of a
    * scan+aggregate per field. Facet values stringify (Solr facets
    * are string buckets); nulls bucket as '(missing)', Solr's
    * facet.missing semantics. */
  def facetCounts(docs: DataFrame, predicate: Column,
      facetFields: Seq[String]): DataFrame = {
    require(facetFields.nonEmpty, "need at least one facet field")
    val pairs = facetFields.flatMap(f =>
      Seq(lit(f), coalesce(col(f).cast("string"), lit("(missing)"))))
    docs.filter(predicate)
      .select(explode(map(pairs: _*)).as(Seq("facet_field", "facet_value")))
      .groupBy("facet_field", "facet_value")
      .agg(count(lit(1)).as("n"))
  }

  /** Pivot (hierarchical) facet — Solr's `facet.pivot=f1,f2` with
    * `facet.limit` semantics at each level: the top `limit1` parent
    * values by count, and under each surviving parent the top
    * `limit2` child values, every node carrying its count and an
    * aggregated stat (the stats-component-inside-pivot shape).
    * Parent rows surface with child = `(all)` and count over ALL the
    * parent's docs (Solr's pivot parent count is not the sum of its
    * surfaced children). Scale shape: two aggregations — (parent) and
    * (parent, child) — both map-side partial; the parent top-k ranks
    * an O(|parent values|) aggregate (tiny by construction) and the
    * child ranks window per-parent over the aggregated (parent,
    * child) frame, bounded by |child values| per parent, never
    * doc-level rows. Ties break (count desc, value asc) — total
    * order, deterministic cross-engine. */
  def pivotFacet(docs: DataFrame, predicate: Column, parentField: String,
      childField: String, statCol: Column, limit1: Int, limit2: Int): DataFrame = {
    val base = docs.filter(predicate)
      .select(coalesce(col(parentField).cast("string"), lit("(missing)")).as("parent"),
        coalesce(col(childField).cast("string"), lit("(missing)")).as("child"),
        statCol.as("__stat"))
    // one (parent, child) aggregation serves both levels: parents are
    // its second-stage rollup, so doc rows shuffle exactly once
    val cells = base.groupBy("parent", "child")
      .agg(count(lit(1)).as("n_docs"), sum("__stat").as("stat_sum"))
      .localCheckpoint(false) // both level branches of ONE execution
    val parents = cells.groupBy("parent")
      .agg(sum("n_docs").as("n_docs"), sum("stat_sum").as("stat_sum"))
    val w1 = Window.orderBy(col("n_docs").desc, col("parent").asc)
    val topParents = parents.withColumn("r", row_number().over(w1))
      .filter(col("r") <= limit1).drop("r")
    val w2 = Window.partitionBy("parent")
      .orderBy(col("n_docs").desc, col("child").asc)
    val topChildren = cells
      .join(topParents.select("parent"), "parent")
      .withColumn("r", row_number().over(w2))
      .filter(col("r") <= limit2).drop("r")
    topParents.select(col("parent"), lit("(all)").as("child"),
        col("n_docs"), col("stat_sum"))
      .unionByName(topChildren
        .select(col("parent"), col("child"), col("n_docs"), col("stat_sum")))
  }

  /** Positional phrase search — Solr's exact-phrase query run on the
    * data plane: documents containing the n-word phrase as
    * consecutive tokens, with occurrence counts. ONE corpus scan
    * keeps only the phrase's own terms with their positions (the
    * `isin` filter rides the scan; everything after operates on the
    * tiny surviving frame, reused across all join branches of this
    * single execution), then word i joins on (doc_id, pos − i) — an
    * equi-join per word, no per-doc position arrays, no windows.
    * After the first join the frame is bounded by the rarest term's
    * postings, so an n-word phrase over 100 TB costs one scan plus
    * n−1 joins on term-sized frames. */
  def phraseSearch(docs: DataFrame, idCol: Column, textCol: Column,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    val hits = docs
      .select(idCol.as("doc_id"),
        posexplode(split(trim(lower(textCol)), "\\s+")).as(Seq("pos", "tok")))
      .filter(col("tok").isin(phrase: _*))
      .localCheckpoint(false) // single-plan multi-read: safe lazy
    val first = hits.filter(col("tok") === phrase.head)
      .select(col("doc_id"), col("pos").as("start"))
    val matched = phrase.zipWithIndex.tail.foldLeft(first) { case (acc, (w, i)) =>
      acc.join(
        hits.filter(col("tok") === w)
          .select(col("doc_id"), (col("pos") - i).as("start")),
        Seq("doc_id", "start"))
    }
    matched.groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"), min("start").cast("long").as("first_pos"))
  }

  /** Small-file compaction planner: assign a file inventory
    * (partition key, file id, bytes) to output groups of
    * ~targetBytes by running total within each partition — the
    * metadata side of a lakehouse OPTIMIZE / rewrite-data-files
    * pass, and the remedy for the small-file problem the reference's
    * records_per_file batching creates at scale (harvest.py:185-208
    * writes thousands of small objects per run). A 100 TB table's
    * file inventory is itself millions of rows, so the plan is
    * computed DISTRIBUTED: one window per partition key, ordered by
    * file id (groups then stay contiguous in scan order, preserving
    * any clustering). If a single partition's inventory is unbounded,
    * compose a hash shard into `partCol` — the packSequencesSharded
    * twin pattern. A file larger than targetBytes gets its own group
    * (the straddle rule, same contract as p2 packing). */
  def compactionPlan(files: DataFrame, partCol: Column, fileCol: Column,
      bytesCol: Column, targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCol).orderBy(fileCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    files.withColumn("cum_bytes", sum(bytesCol).over(w))
      .withColumn("group_id",
        floor((col("cum_bytes") - bytesCol) / targetBytes).cast("long"))
  }

  /** Z-value: bit-interleave the low `bits` bits of two bucketized
    * dimensions (Morton order). Sorting by z lays rows out along a
    * space-filling curve, so each output file covers a COMPACT
    * RECTANGLE in (a, b) space and parquet footer min/max stats
    * prune files for range predicates on EITHER dimension — the
    * multi-dimensional clustering a single-column sort can't give
    * (a sort on `a` leaves every file spanning the full `b` range).
    * Pure codegen'd bit math; inputs must already be quantized to
    * `< 2^bits` (rank/bucket upstream). */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val al = a.cast("long"); val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(1), 2 * i)
        .plus(shiftleft(shiftright(bl, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_ + _)
  }

  /** Write `df` z-ordered: range-partition + sort by the z-value so
    * file boundaries follow the curve. `nFiles` sizes the layout —
    * at 100 TB pick it from target file size, and recluster as part
    * of compaction (the x6 executor composes: plan groups on the
    * z-sorted inventory). */
  def zorderWrite(df: DataFrame, zCol: Column, outDir: String,
      nFiles: Int): Unit =
    df.withColumn("__z", zCol)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)

  /** Prefix suggester (the data-plane form of Solr's suggester
    * component, which the reference's collections serve): top-`k`
    * completions per `prefixLen`-char prefix ranked by corpus
    * frequency, ties broken by token. Plan: map-only token explode →
    * ONE (prefix, token) count shuffle → per-prefix top-k (window;
    * rank kept, so deliberately not TopKPerKey-rewritten) — no
    * global sort anywhere. At 100 TB the count shuffle is the only
    * wide stage and its key space is the vocabulary (uniform-ish:
    * token skew collapses at the count stage by map-side partial
    * aggregation); the emitted suggestion table is the small serving
    * artifact a real suggester would load. */
  def suggest(docs: DataFrame, textCol: Column, prefixLen: Int,
      k: Int): DataFrame =
    suggestFromVocab(tokenCounts(docs, textCol), prefixLen, k)

  /** MoreLikeThis (Solr MLT component's data plane): for every doc
    * matching `seedPred`, the top-`k` most similar OTHER docs by
    * count of shared rare 3-shingles. "Interesting terms" are
    * shingles with df ∈ [dfMin, dfMax] — the df cap is the 100 TB
    * fanout bound (a term in half the corpus scores everything
    * against everything and carries no signal; per-shingle join
    * fanout is ≤ dfMax·|seed postings|), and the seed side is tiny
    * by definition (an MLT request names a handful of docs) so it
    * broadcasts. ALL-INTEGER scores; rank kept so downstream orders
    * are totally unique. One shingle scan feeds the df, seed and
    * candidate branches of ONE plan (single-plan multi-read lazy
    * checkpoint). Input needs (doc_id, lang, n_chars, text) —
    * [[graft.dedup.Dedup.withHashedShingles]]'s contract.
    *
    * OPERATING RULE: `dfMax` is corpus-RELATIVE. Growing the corpus
    * multiplies every shingle's df, so a fixed cap eventually drops
    * the whole discriminative band and MLT goes silent (measured in
    * the 10×-replica soak: cap 10 → zero candidates, cap
    * 10·replicas → the same per-seed candidates the base corpus
    * yields at 10). Scale the cap with corpus size, or derive it
    * from a df-quantile. */
  def moreLikeThis(docs: DataFrame, seedPred: Column,
      dfMin: Int, dfMax: Int, k: Int): DataFrame = {
    val posts = mltPosts(docs)
    val rare = posts.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= dfMin && col("df") <= dfMax)
    mltScore(posts, rare, seedPred, k)
  }

  /** Self-tuning MLT (the measured operating rule made automatic):
    * `dfMax` is DERIVED per run as the `dfPct`-th percentile of the
    * corpus's shingle-df distribution via the KLL sketch
    * (graft_quantiles, plans/QuantileSketch.scala) — corpus growth
    * multiplies every df, so the percentile cut tracks the
    * discriminative band that a fixed cap loses (the 10×-soak's
    * "fixed cap 10 → zero candidates" measurement). Integer-exact
    * when `sketchK` ≥ |distinct shingles| (no compaction ⇒ the exact
    * order statistic at rank ceil(pct·n/100) — the e12 trick, which
    * is what keeps x19 hash-oracled); at 100 TB you drop `sketchK`
    * to a constant and accept the KLL rank-error band on the CAP
    * (a knob, not an answer — candidate sets change only at the df
    * boundary). The 1-row cut frame broadcasts back over the df
    * table (a 1-row BroadcastNestedLoopJoin — tiny-by-design, the
    * s1/s4 allowlisted shape; a constant equi-key would just be
    * folded away by the optimizer); the only single-partition stage
    * is the O(sketchK) sketch merge. */
  def moreLikeThisAuto(docs: DataFrame, seedPred: Column, dfMin: Int,
      dfPct: Int, k: Int, sketchK: Int = 1 << 15): DataFrame = {
    val posts = mltPosts(docs)
    val dfs = posts.groupBy("h").agg(count(lit(1)).as("df"))
      .localCheckpoint(false) // feeds cut + band of ONE plan
    val cut = dfs.agg(graft.plans.QuantileSketch.quantiles(
        col("df").cast("double"), sketchK, Seq(dfPct)).as("qs"))
      .select(element_at(col("qs"), 1).cast("long").as("df_max"))
    val rare = dfs.crossJoin(broadcast(cut))
      .filter(col("df") >= dfMin && col("df") <= col("df_max"))
    mltScore(posts, rare, seedPred, k)
  }

  /** One shingle scan feeds the df, seed and candidate branches of
    * ONE plan (single-plan multi-read lazy checkpoint). */
  private def mltPosts(docs: DataFrame): DataFrame =
    graft.dedup.Dedup.withHashedShingles(docs)
      .select(col("doc_id"), explode(col("sh")).as("h"))
      .localCheckpoint(false)

  private def mltScore(posts: DataFrame, rare: DataFrame,
      seedPred: Column, k: Int): DataFrame = {
    val rp = posts.join(rare.select("h"), "h")
    val seeds = rp.filter(seedPred)
      .select(col("doc_id").as("seed_id"), col("h"))
    val scored = broadcast(seeds).join(rp, Seq("h"))
      .filter(col("doc_id") =!= col("seed_id"))
      .groupBy(col("seed_id"), col("doc_id").as("cand_id"))
      .agg(count(lit(1)).as("n_shared"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("seed_id")
      .orderBy(col("n_shared").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Corpus vocabulary (tok, freq) — the shared input of the
    * suggester and spellcheck components, and the serving artifact
    * VocabIndex maintains incrementally. One corpus-sized stage:
    * map-only token explode → count shuffle keyed on the vocabulary
    * (map-side partial aggregation collapses token skew). */
  def tokenCounts(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(split(trim(lower(textCol)), "\\s+")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))

  /** The vocab→suggestion stage of [[suggest]]: top-k per prefix
    * from an existing (tok, freq) table. Vocabulary-sized input, so
    * the window shuffle is small regardless of corpus size. */
  def suggestFromVocab(vocab: DataFrame, prefixLen: Int,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = vocab.filter(length(col("tok")) >= prefixLen)
      .select(substring(col("tok"), 1, prefixLen).as("prefix"),
        col("tok"), col("freq"))
    val w = Window.partitionBy("prefix")
      .orderBy(col("freq").desc, col("tok").asc)
    counts.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("prefix", "rank", "tok", "freq")
  }

  /** Spellcheck suggester (the Solr spellcheck component's data
    * plane): for each query token, the closest vocabulary token by
    * edit distance ≤ `maxDist`, ties broken by corpus frequency desc
    * then token asc (deterministic). Candidate generation is BLOCKED,
    * never all-pairs — a candidate must share the first character and
    * sit within ±1 length (the d6 lesson): both frames are
    * vocabulary-sized, tiny relative to the corpus that produced
    * them, and the blocking bounds the levenshtein calls to per-block
    * crosses. KNOWN RECALL LIMIT of that blocking: a typo in the
    * FIRST character ('qipeline'→'pipeline', dist 1) or a 2-edit
    * query whose length differs by 2 never meets its correction,
    * even though dist <= maxDist — the standard trade Solr's own
    * n-gram-blocked spellchecker makes; widen the block (first OR
    * last char, ±maxDist length) if fuller recall is worth the extra
    * levenshtein volume. `queries` needs a `query` column; `vocab`
    * needs (tok, freq). */
  def spellcheck(queries: DataFrame, vocab: DataFrame,
      maxDist: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("query"),
      substring(col("query"), 1, 1).as("qc1"), length(col("query")).as("qlen"))
    val v = vocab.select(col("tok"), col("freq"),
      substring(col("tok"), 1, 1).as("vc1"), length(col("tok")).as("vlen"))
    val cand = q.join(v, col("qc1") === col("vc1") &&
        abs(col("qlen") - col("vlen")) <= 1)
      .withColumn("dist", levenshtein(col("query"), col("tok")))
      .filter(col("dist") <= maxDist)
    val w = Window.partitionBy("query")
      .orderBy(col("dist").asc, col("freq").desc, col("tok").asc)
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("query"), col("tok").as("suggestion"), col("dist"), col("freq"))
  }

  /** Query elevation — Solr's QueryElevationComponent data plane
    * (elevate.xml: per-query editorially pinned documents served
    * ABOVE the organic ranking, the forceElevation posture: a pinned
    * doc appears even when retrieval did not surface it). `results`
    * is any ranked frame (q_id, n_id, rank — the x7/x8/x21 shape);
    * `elevation` the tiny config table (q_id, n_id, pos). Output is
    * one SERP per query, `k` rows total: pinned docs at ranks
    * 1..E(q) in config order, then the organic ranking with pinned
    * ids EXCLUDED filling E(q)+1..k — exclusion before the cut, so a
    * pinned doc never double-serves and never steals an organic
    * slot. Callers must fetch results with k' ≥ k + max E(q)
    * candidates so the organic fill never runs short.
    *
    * Scale shape: the elevation config is editorial (tiny, Solr
    * ships it as a config FILE) — both joins broadcast it; the
    * re-rank window partitions per query over ≤ k' rows. Output:
    * (q_id, n_id, rank, elevated). */
  def elevate(results: DataFrame, elevation: DataFrame, k: Int): DataFrame = {
    val elev = elevation.select(col("q_id"), col("n_id"), col("pos"))
    val offsets = elev.groupBy("q_id")
      .agg(count(lit(1)).cast("int").as("n_elev"))
    val pinned = elev
      .select(col("q_id"), col("n_id"), col("pos").cast("int").as("rank"),
        lit(true).as("elevated"))
    val organic = results
      .join(broadcast(elev.select("q_id", "n_id")), Seq("q_id", "n_id"),
        "left_anti")
      .withColumn("orank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("rank").asc)))
      .join(broadcast(offsets), Seq("q_id"), "left")
      .select(col("q_id"), col("n_id"),
        (col("orank") + coalesce(col("n_elev"), lit(0))).as("rank"),
        lit(false).as("elevated"))
    pinned.unionByName(organic).filter(col("rank") <= k)
  }

  /** Index endpoint URL construction (reference: tasks.py:76-103
    * `get_solr_url`): host may or may not carry a scheme, optional
    * port, then /solr/<core>. Pure function — the sink config side
    * of the lifecycle. */
  def solrUrl(host: String, port: Option[Int], scheme: Option[String],
      core: String): String = {
    val base =
      if (host.startsWith("http")) host
      else s"${scheme.getOrElse("http")}://$host"
    val withPort = port.map(p => s"$base:$p").getOrElse(base)
    s"$withPort/solr/$core"
  }
}
