package graft.queries

import graft.Tables
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ETL query surface (SURVEY.md §2: h1–h7, r1–r3, v1–v4, t1–t2,
  * x1–x3) — the tulflow capability map bound to the testdata tables.
  * `events` plays the OAI record stream (event_id = identifier,
  * ts = datestamp, event_type = setSpec/status), `documents` plays
  * the harvested record corpus.
  */
object Etl {
  import Validate.Rule

  private val deletedStatus = "error" // the status value treated as OAI status='deleted'

  /** Schematron-analog assertion set for `documents`. `min_length`
    * genuinely fails for short docs; the rest guard consistency. */
  private def docRules = Seq(
    Rule("nonempty", length(col("text")) > 0, "record has no content"),
    Rule("min_length", col("n_chars") >= 100, "record shorter than 100 chars"),
    Rule("known_lang", col("lang").isInCollection(Seq("en", "de", "fr", "es", "zh")),
      "unknown language code"),
    Rule("chars_consistent", col("n_chars") === length(col("text")),
      "n_chars does not match text length"),
    Rule("source_present", col("source").isNotNull && col("source") =!= "",
      "missing source"))

  // ---- Harvest ----

  def h1PartitionStatus(spark: SparkSession, dir: String): DataFrame =
    Harvest.flagDeleted(Tables.events(spark, dir), col("event_type"), deletedStatus)
      .select("event_id", "event_type", "is_deleted")
      .orderBy("event_id")

  def h2SetInclude(spark: SparkSession, dir: String): DataFrame =
    Harvest.includeSets(Tables.events(spark, dir), col("event_type"), Seq("click", "view"))
      .select("event_id", "event_type", "user_id")
      .orderBy("event_id")

  def h3SetExclude(spark: SparkSession, dir: String): DataFrame =
    Harvest.excludeSets(Tables.events(spark, dir), col("event_type"), Seq("error"))
      .select("event_id", "event_type", "user_id")
      .orderBy("event_id")

  def h4DateWindow(spark: SparkSession, dir: String): DataFrame =
    Harvest.dateWindow(Tables.events(spark, dir), col("ts"),
        Some(java.sql.Timestamp.valueOf("2024-01-08 00:00:00")),
        Some(java.sql.Timestamp.valueOf("2024-01-22 00:00:00")))
      .select("event_id", "ts", "event_type")
      .orderBy("event_id")

  /** h9: harvest-gap audit — drop a deterministic subset of days
    * (day-of-month % 7 == 3, the planted gaps) and detect exactly
    * those as missing per feed (Harvest.missingDays: per-feed
    * calendar anti-join; the explode is calendar-bounded). */
  def h9MissingDays(spark: SparkSession, dir: String): DataFrame =
    Harvest.missingDays(
        Tables.events(spark, dir).filter(dayofmonth(col("ts")) % 7 =!= 3),
        col("event_type"), col("ts"))
      .orderBy("key", "missing_day")

  /** h10: the incremental-harvest window PLAN — each feed's resume
    * span (min→max event date plays the last-success→now state) cut
    * into 7-day [from, until) slices, the last clipped (the OAI
    * from/until slicing the reference's DAG computes around
    * harvest_oai; bounded ranges are how a resume stays polite and
    * retries stay small). Integer-ceil window counts; every feed's
    * span exceeds one width AND ends off-boundary at every SF, so
    * both the full-window and the clipped-final branches are
    * oracle-live. r14: the plan runs through
    * [[Harvest.oaiInclusiveBounds]] so the INCLUSIVE [oai_from,
    * oai_until] day bounds an OAI ListRecords request actually takes
    * (until_date − 1 day — no boundary-day double-harvest) are
    * oracled too; the zero-span "harvest today" single-day mapping is
    * spec-pinned (Round13OpsSpec) since every fixture span is
    * non-empty. */
  def h10HarvestWindows(spark: SparkSession, dir: String): DataFrame = {
    val state = Tables.events(spark, dir)
      .groupBy(col("event_type").as("key"))
      .agg(to_date(min(col("ts"))).as("lo"), to_date(max(col("ts"))).as("hi"))
    Harvest.oaiInclusiveBounds(
        Harvest.harvestWindows(state, col("key"), col("lo"), col("hi"),
          widthDays = 7))
      .orderBy("key", "win_idx")
  }

  def h5BatchAssign(spark: SparkSession, dir: String): DataFrame =
    Harvest.batchAssign(
        Harvest.flagDeleted(Tables.events(spark, dir), col("event_type"), deletedStatus),
        Seq(col("is_deleted")), col("event_id"), recordsPerFile = 1000)
      .select("event_id", "is_deleted", "file_idx")
      .orderBy("event_id")

  def h6ContentHash(spark: SparkSession, dir: String): DataFrame =
    Harvest.contentKey(Tables.documents(spark, dir), col("text"), "dag/ts/new-updated")
      .select("doc_id", "s3_key")
      .orderBy("doc_id")

  def h7DedupLatest(spark: SparkSession, dir: String): DataFrame =
    Harvest.latestPerIdentifier(Tables.events(spark, dir),
        col("user_id"), col("ts"), col("event_id"))
      .select(col("user_id"), col("event_id").as("latest_event_id"))
      .orderBy("user_id")

  /** h8: incremental harvest diff — current snapshot vs a simulated
    * previous run (docs with id%7=0 didn't exist yet → added;
    * id%5=0 carried different content → changed; a few retired ids
    * → deleted; everything else unchanged). */
  def h8HarvestDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val current = docs.select(col("doc_id").as("rec_id"),
      md5(col("text").cast("binary")).as("content_hash"))
    val prevLive = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id").as("rec_id"),
        md5(when(col("doc_id") % 5 === 0, concat(lit("old:"), col("text")))
          .otherwise(col("text")).cast("binary")).as("content_hash"))
    val prevRetired = docs.filter(col("doc_id") < 20)
      .select((col("doc_id") + 5000000L).as("rec_id"),
        md5(concat(lit("gone:"), col("doc_id").cast("string")).cast("binary"))
          .as("content_hash"))
    Harvest.harvestDiff(current, prevLive.unionByName(prevRetired))
      .orderBy("rec_id")
  }

  // ---- Records ----

  def r1FieldExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        Records.extractField(col("props"), "\"k\": ([0-9]+)").as("k"))
      .orderBy("event_id")

  def r2IdQuality(spark: SparkSession, dir: String): DataFrame =
    Records.idQuality(Tables.events(spark, dir), col("user_id"))
      .orderBy("record_id")

  def r3LookupEnrich(spark: SparkSession, dir: String): DataFrame =
    Records.lookupEnrich(
        Tables.lineitem(spark, dir),
        Tables.part(spark, dir).select(col("p_partkey"), col("p_name")),
        col("l_partkey"), col("p_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("p_name").as("parent_name"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey")

  // ---- Validate ----

  def v1ValidateFilter(spark: SparkSession, dir: String): DataFrame =
    Validate.filterValid(Tables.documents(spark, dir), docRules)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")

  def v2InvalidReport(spark: SparkSession, dir: String): DataFrame =
    Validate.invalidReport(Tables.documents(spark, dir), docRules,
        idCol = col("doc_id"),
        identifierCol = col("source"),
        fullRecordCol = col("text"),
        sourceCol = col("source"))
      .orderBy("id")

  def v3ReportAll(spark: SparkSession, dir: String): DataFrame =
    Validate.reportAll(Tables.documents(spark, dir), docRules, col("doc_id"))
      .orderBy("id")

  def v5Profile(spark: SparkSession, dir: String): DataFrame =
    Validate.profile(Tables.documents(spark, dir),
        Seq("doc_id", "lang", "source", "n_chars"))
      .orderBy("col_name")

  def v4FilterStats(spark: SparkSession, dir: String): DataFrame =
    Validate.filterStats(Tables.documents(spark, dir), docRules, col("source"))
      .orderBy("source_file")

  // ---- Transform ----

  def t1Crosswalk(spark: SparkSession, dir: String): DataFrame =
    Transform.crosswalk(Tables.documents(spark, dir), Seq(
        "id" -> col("doc_id"),
        "title" -> upper(substring(col("text"), 1, 40)),
        "language" -> (col("lang") match { case l => // crosswalk code table
          when(l === "en", "English").when(l === "de", "German")
            .when(l === "fr", "French").when(l === "es", "Spanish")
            .when(l === "zh", "Chinese").otherwise("Unknown") }),
        "publisher" -> col("source"),
        "extent" -> col("n_chars")))
      .orderBy("id")

  def t2Normalize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(Transform.normalizeText(col("text")).cast("binary")).as("norm_hash"),
        length(Transform.normalizeText(col("text"))).as("norm_len"))
      .orderBy("doc_id")

  /** t4: field-level record merge — Solr atomic-update semantics on
    * the data plane (the reference re-posts partial records across
    * harvests; the serving doc is the union of latest non-null
    * fields, which row-level latest — h7 — gets wrong whenever the
    * newest row is missing a field an older row carried). Field
    * sparsity is simulated deterministically (value missing on
    * event_id%3=0, type on %4=0 — the h8 planted-pattern precedent),
    * so the merge genuinely differs from h7's whole-row winner.
    * Plan: per-field filtered row_number windows + one count/max
    * aggregate, ALL keyed on user_id — same-key shuffles, no global
    * sort; the (ts desc, event_id desc) order is totally unique. */
  def t4FieldMerge(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      col("event_id"), col("ts"), col("user_id"),
      when(col("event_id") % 4 =!= 0, col("event_type")).as("type_n"),
      when(col("event_id") % 3 =!= 0, col("value")).as("value_n"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    def latest(c: String, out: String) =
      e.filter(col(c).isNotNull)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col(c).as(out))
    val base = e.groupBy("user_id")
      .agg(count(lit(1)).as("n_updates"), max(col("ts")).as("last_ts"))
    base
      .join(latest("type_n", "merged_type"), Seq("user_id"), "left")
      .join(latest("value_n", "merged_value"), Seq("user_id"), "left")
      .select("user_id", "merged_type", "merged_value", "n_updates", "last_ts")
      .orderBy("user_id")
  }

  // ---- Indexing ----

  def x1SolrDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), Indexing.solrDoc(Seq(
        "id" -> col("doc_id"),
        "lang" -> concat(lit("\""), col("lang"), lit("\"")),
        "source" -> concat(lit("\""), col("source"), lit("\"")),
        "n_chars" -> col("n_chars"))).as("solr_doc"))
      .orderBy("doc_id")

  def x2LatestVersion(spark: SparkSession, dir: String): DataFrame =
    Indexing.latestVersion(
        Tables.documents(spark, dir)
          .select(concat(col("source"), lit("-"), col("doc_id").cast("string")).as("cs")),
        col("cs"))
      .orderBy("configset")

  def x3AliasResolve(spark: SparkSession, dir: String): DataFrame =
    Indexing.filterInitCollections(
        Tables.events(spark, dir)
          .select(concat(col("event_type"), lit("-"),
            when(col("user_id") % 10 === 0, "init")
              .otherwise(col("user_id").cast("string"))).as("collection"))
          .distinct(),
        col("collection"))
      .orderBy("collection")

  /** x4: index maintenance — apply an update batch (docs with id%3=1,
    * re-titled) and a delete batch (id%10=0) to the document base. */
  def x4ApplyChanges(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val updates = base.filter(col("doc_id") % 3 === 1)
      .withColumn("source", concat(lit("updated-"), col("source")))
    val deletes = base.filter(col("doc_id") % 10 === 0).select("doc_id")
    Indexing.applyChanges(base, updates, deletes, "doc_id")
      .orderBy("doc_id")
  }

  /** x5: distributed inverted-index build over documents, postings
    * sharded into 8 doc-id blocks (skew-bounded posting lists). */
  def x5Inverted(spark: SparkSession, dir: String): DataFrame =
    Indexing.invertedPostings(Tables.documents(spark, dir),
        col("doc_id"), col("text"), nBlocks = 8)
      .orderBy("tok", "block")

  /** x6: compaction plan over a synthetic file inventory (one "file"
    * per 20 docs per source, sized by character count) — contiguous
    * ~20 KB output groups per source partition. */
  def x6Compact(spark: SparkSession, dir: String): DataFrame = {
    val files = Tables.documents(spark, dir)
      .groupBy(col("source").as("part_key"), expr("doc_id div 20").as("file_id"))
      .agg(sum("n_chars").as("bytes"))
    Indexing.compactionPlan(files, col("part_key"), col("file_id"),
        col("bytes"), targetBytes = 20000L)
      .orderBy("part_key", "file_id")
  }

  /** v7: per-type daily volume anomaly flags (|z| >= 2 vs the type's
    * own daily history). */
  def v7VolumeAnomaly(spark: SparkSession, dir: String): DataFrame =
    Validate.volumeAnomaly(Tables.events(spark, dir), col("event_type"),
        col("ts"), zThreshold = 2.0)
      .orderBy("vol_key", "day")

  /** x7: BM25 ranked retrieval — the 5 lowest-id documents play the
    * query set ("more like this" against their token sets), corpus =
    * everything else; top-5 per query. Runs against the PERSISTED
    * BM25 index (built once per dataset, reused across calls — the
    * build-once/search-many lifecycle the x5 index exists for): the
    * probe prunes to query-term hash buckets, broadcasts query terms
    * and the O(|query terms|) df table, shuffles one (q, doc) stream
    * of quantized partial scores, and takes bounded-heap top-k via
    * the TopKPerKey rewrite. The corpus is never re-tokenized on the
    * query path. */
  def x7Bm25(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val idx = Retrieval.ensureIndex(
      docs.filter(col("doc_id") >= 5), "doc_id", "text", dir)
    Retrieval.searchIndex(spark, idx, docs.filter(col("doc_id") < 5),
        "doc_id", "text", k = 5)
      .orderBy("q_id", "rank")
  }

  /** x21: authority-boosted retrieval — Solr's multiplicative
    * boost-function query (`boost=`) fed by an external per-document
    * signal, here the g2 source-authority PageRank: boosted(q, d) =
    * score_q(q, d) · rank(source(d)), both EXACT INTEGERS (the BM25
    * sum pre-rounding × the integer PageRank value), so the boosted
    * ranking needs no float re-round and hash-matches cross-engine.
    * The boost joins BEFORE top-k selection — boosting reorders
    * candidates, so filtering the unboosted top-5 would be wrong —
    * and the join is bounded by the candidate frame (the doc→weight
    * table behaves like Solr's ExternalFileField: corpus-sized, but
    * only candidate rows are ever touched). Probes the same
    * persisted x7 index. */
  def x21BoostedSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val idx = Retrieval.ensureIndex(
      docs.filter(col("doc_id") >= 5), "doc_id", "text", dir)
    // the authority signal is PERSISTED (built once per dataset,
    // like the index itself — Solr's ExternalFileField is an offline
    // artifact): the probe reads the tiny rank table, never re-runs
    // the overlap-graph pass
    // resolved through the front door: no stream maintainer owns the
    // bench corpus, so this is the batch build-if-absent artifact —
    // a RankStream-owned corpus would serve incrementally instead
    val authority = graft.operators.Graph
      .authorityRanks(spark, docs, dir, streamStateDir = None)
    val boosts = docs.filter(col("doc_id") >= 5)
      .select(col("doc_id").as("n_id"), col("source"))
      .join(authority.select(col("source"), col("rank_i3").as("bw")), "source")
      .select("n_id", "bw")
    Retrieval.searchIndexBoosted(spark, idx,
        docs.filter(col("doc_id") < 5), "doc_id", "text", k = 5, boosts)
      .orderBy("q_id", "rank")
  }

  /** x24: Solr StatsComponent — `stats.field` (event value in integer
    * cents) under a `stats.facet` (event type), `q` = the non-error
    * stream ([[Indexing.statsComponent]]): count, min, max, sum,
    * integer mean, countDistinct, sumOfSquares and the exact
    * n·Σx²−(Σx)² variance numerator — every column BIGINT so the
    * output has one canonical rendering in any engine (Solr's own
    * double accumulation is order-sensitive — the integer form is
    * the distributed-mergeable improvement). Cents come from
    * floor(value*100 + 0.5): pure IEEE double math, bit-identical
    * everywhere, unlike decimal `round` whose half-way ties depend
    * on the engine's string-vs-binary rounding. The `q` filter
    * keeps the facet set data-exercised at 4 of 5 types. */
  def x24Stats(spark: SparkSession, dir: String): DataFrame =
    Indexing.statsComponent(Tables.events(spark, dir),
        predicate = col("event_type") =!= "error",
        facetCol = col("event_type"),
        centsCol = expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .orderBy("facet")

  /** x23: query elevation — Solr's QueryElevationComponent
    * (elevate.xml): per-query editorially PINNED documents served
    * above the organic BM25 ranking in config order, with the
    * forceElevation posture (a pinned id appears even when retrieval
    * did not surface it) and pinned ids EXCLUDED from the organic
    * fill so nothing double-serves. Probes the same persisted x7
    * index with k' = k + E candidates (top-3-of-exclusion ⊆ top-5 ⊆
    * the fetched top-7, so the organic fill can never run short);
    * the elevation config is a deterministic literal, two pinned ids
    * per query, high ids data-exercising the not-organically-ranked
    * branch. The oracle replays the x7 score chain, excludes the
    * same literal map, and re-ranks below the pins. */
  def x23Elevation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val idx = Retrieval.ensureIndex(
      docs.filter(col("doc_id") >= 5), "doc_id", "text", dir)
    val organic = Retrieval.searchIndex(spark, idx,
      docs.filter(col("doc_id") < 5), "doc_id", "text", k = 7)
    val elevation = (0L until 5L)
      .flatMap(q => Seq((q, 20L + 13L * q, 1), (q, 40L + 17L * q, 2)))
      .toDF("q_id", "n_id", "pos")
    Indexing.elevate(organic, elevation, k = 5)
      .orderBy("q_id", "rank")
  }

  /** x22: pivot facet — Solr's `facet.pivot=source,lang` with
    * `facet.limit` at each level (top-5 sources, top-3 langs within
    * each) and the stats component inside the pivot (n_chars sums
    * per node). Parent rows carry child `(all)` and count ALL the
    * parent's matching docs — Solr's parent count is not the sum of
    * its surfaced children. The near-uniform source counts make the
    * (count desc, value asc) tie-break carry real weight at every
    * SF. One doc-level shuffle total: parents roll up from the
    * (parent, child) cells. */
  def x22PivotFacet(spark: SparkSession, dir: String): DataFrame =
    Indexing.pivotFacet(Tables.documents(spark, dir),
        predicate = col("n_chars") >= 200, parentField = "source",
        childField = "lang", statCol = col("n_chars"),
        limit1 = 5, limit2 = 3)
      .orderBy("parent", "child")

  /** x25: Solr TermsComponent ([[Indexing.termsComponent]]) over the
    * BIGRAM shingle field — terms.prefix='s', terms.mincount=5,
    * terms.limit=50, terms.sort=count. Bigrams give the word-soup
    * corpus a genuinely long-tailed df distribution, so the mincount
    * cut is data-live at small SF and the limit page binds once dfs
    * grow; (df desc, term asc) is a total order, so the page is the
    * same in both engines. */
  def x25Terms(spark: SparkSession, dir: String): DataFrame =
    Indexing.termsComponent(Tables.documents(spark, dir), col("text"),
        prefix = "s", minCount = 5L, limit = 50, nGram = 2)
      .orderBy(col("df").desc, col("term"))

  /** x8: search over the SEGMENTED incrementally-maintained BM25
    * index (operators/SegmentedBm25.scala — the Lucene/Solr segment
    * lifecycle: harvest.py:185-208 feeds a long-lived collection
    * incrementally). Two appends build the index: batch 1 is the
    * corpus minus the ≡1-mod-3 stripe; batch 2 adds that stripe AND
    * re-ingests the ≡0-mod-7 docs of batch 1 with changed text, so
    * the search must serve batch-2 text via tombstoned replacement —
    * the oracle scores the logical live corpus directly, proving the
    * dead postings stay dead and the manifest stats corrections are
    * exact (nDocs/avgdl feed every score). */
  def x8SegSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") >= 5)
    val idx = SegmentedBm25.ensureIndex(dir, "x8") { d =>
      val batch1 = corpus.filter(col("doc_id") % 3 =!= 1)
      val replaced = corpus
        .filter(col("doc_id") % 3 =!= 1 && col("doc_id") % 7 === 0)
        .withColumn("text", concat(col("text"), lit(" appendix")))
      SegmentedBm25.append(batch1, "doc_id", "text", d)
      SegmentedBm25.append(
        corpus.filter(col("doc_id") % 3 === 1).unionByName(replaced),
        "doc_id", "text", d)
      ()
    }
    SegmentedBm25.search(spark, idx, docs.filter(col("doc_id") < 5),
        "doc_id", "text", k = 5)
      .orderBy("q_id", "rank")
  }

  /** v10: fixed-width histogram of document lengths — engine-stable
    * bucket math (exact integer products, floored quotient, span+1
    * denominator so the max lands in the last bucket). */
  def v10Histogram(spark: SparkSession, dir: String): DataFrame =
    Validate.histogram(Tables.documents(spark, dir), col("n_chars"), bins = 20)
      .orderBy("bucket")

  /** x14: keyset-paginated scan — Solr cursorMark deep paging: the
    * page strictly after cursor (n_chars=800, doc_id=100), 25 rows,
    * O(page) not O(depth) (the predicate rides the scan and the
    * TopK rewrite bounds the sort). */
  def x14CursorPage(spark: SparkSession, dir: String): DataFrame =
    Indexing.pageAfter(
        Tables.documents(spark, dir).select("doc_id", "n_chars", "lang"),
        col("n_chars"), col("doc_id"), afterKey = 300L, afterId = 100L,
        pageSize = 25)

  /** x13: range facet — Solr facet.range over n_chars for the docs
    * matching the text query: explicit [0, 4000) grid in 400-wide
    * buckets, edge-clamped (facet.range.other folded in), one scan +
    * one groupBy. */
  /** x16: prefix suggester table — top-3 completions per 3-char
    * token prefix by corpus frequency (operators/Indexing.suggest;
    * the Solr suggester component's data plane, reference:
    * solr_api_utils.py's collection serving surface). */
  def x16Suggest(spark: SparkSession, dir: String): DataFrame =
    Indexing.suggest(Tables.documents(spark, dir), col("text"),
        prefixLen = 3, k = 3)
      .orderBy("prefix", "rank")

  /** x19: MoreLikeThis (Solr's MLT component data plane — given seed
    * documents, the top-k most similar other documents). "Interesting
    * terms" are 3-shingles with df ∈ [2, p99(df)] — the cap is now
    * SELF-TUNING (the 10×-soak's measured operating rule made
    * automatic): the 99th percentile of the shingle-df distribution,
    * exact via the KLL sketch at capacity ≥ |distinct shingles|, so
    * the discriminative band tracks corpus growth instead of going
    * silent at a fixed knob. The cap still bounds per-term join
    * fanout (d14's discriminative-index lesson — a term in half the
    * corpus scores everything against everything and carries no
    * signal), and the seed side is tiny by definition (an MLT request
    * names a handful of docs) so it broadcasts. Score = count of shared rare shingles (ALL-INTEGER),
    * top-3 per seed by (shared desc, cand_id asc); rank kept in the
    * output so the ORDER BY is totally unique. One shingle scan feeds
    * the df, seed, and candidate branches of ONE plan (single-plan
    * multi-read lazy checkpoint). */
  def x19Mlt(spark: SparkSession, dir: String): DataFrame =
    Indexing.moreLikeThisAuto(Tables.documents(spark, dir),
        seedPred = col("doc_id") < 5, dfMin = 2, dfPct = 99, k = 3)
      .orderBy("seed_id", "rank")

  /** x20: field collapsing (Solr's CollapsingQParserPlugin): the
    * result set for a term query — docs scored by total query-term
    * occurrences — collapsed to the best doc per `source` group,
    * with the group's hit count kept (the "show one result per
    * domain" SERP shape). Plan: the x10 posture — the token explode
    * is map-THINNED to the two query terms before the only
    * corpus-wide shuffle (doc-keyed score count), then both windows
    * (rank + group size) share one source-keyed shuffle. ALL-INTEGER
    * scores; group heads are unique via the (score desc, doc_id asc)
    * tie-break, so `source` alone is a total order. */
  def x20Collapse(spark: SparkSession, dir: String): DataFrame = {
    val terms = Seq("table", "hash")
    val hits = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "source").agg(count(lit(1)).as("score"))
    val w = Window.partitionBy("source")
      .orderBy(col("score").desc, col("doc_id").asc)
    val grp = Window.partitionBy("source")
    hits.withColumn("rank", row_number().over(w))
      .withColumn("n_group_hits", count(lit(1)).over(grp))
      .filter(col("rank") === 1)
      .select("source", "doc_id", "score", "n_group_hits")
      .orderBy("source")
  }

  /** x26: the expand component (Solr's ExpandComponent, x20's other
    * half): alongside each collapsed group head, return the next
    * `expand.rows` group members so the SERP can show "more from this
    * domain" under the head. Different query terms than x20 so the
    * two oracles exercise different score surfaces. Plan: x20's
    * map-thinned explode + ONE doc-keyed score shuffle, then ONE
    * source-keyed window pass computes rank AND the head id
    * (first_value over the same ordered frame — no self-join, so the
    * rollup/cube DetectAmbiguousSelfJoin hazard never arises); the
    * expand rows are a pure filter on rank ∈ [2, 1+rows]. ALL-INTEGER
    * scores; (score desc, doc_id asc) is a total order so head and
    * page are engine-identical. */
  def x26Expand(spark: SparkSession, dir: String): DataFrame = {
    val terms = Seq("scan", "merge")
    val expandRows = 3
    val hits = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "source").agg(count(lit(1)).as("score"))
    val w = Window.partitionBy("source")
      .orderBy(col("score").desc, col("doc_id").asc)
    hits
      .withColumn("rank", row_number().over(w))
      .withColumn("head_id", first("doc_id").over(w))
      .filter(col("rank").between(2, 1 + expandRows))
      .select(col("source"), col("head_id"), col("doc_id"), col("score"),
        (col("rank") - 1).as("expand_rank"))
      .orderBy("source", "expand_rank")
  }

  /** x27: result grouping (Solr's `group=true&group.field=source&
    * group.limit=2&rows=3` — the third of the grouping trio: x20
    * collapses to heads, x26 expands under heads, this RANKS THE
    * GROUPS and pages them): groups ordered by their best doc's
    * score (Solr's default group sort), top `rows` groups returned,
    * each carrying its top `group.limit` docs and the group's total
    * hit count. Third distinct term pair so the three grouping
    * oracles exercise three score surfaces. Plan: x20's map-thinned
    * explode + ONE doc-keyed score shuffle + ONE source-keyed window
    * pass (rank, group size, best score via first_value on the same
    * ordered frame); the group-level rank is a window over the
    * ALREADY doc-limited frame — O(group.limit·|groups|) rows, the
    * x22 tiny-final-reduction shape, never doc rows. ALL-INTEGER;
    * (best desc, source asc) and (score desc, doc_id asc) are total
    * orders so both pages are engine-identical. */
  def x27Grouping(spark: SparkSession, dir: String): DataFrame = {
    val terms = Seq("spark", "filter")
    val hits = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "source").agg(count(lit(1)).as("score"))
    val w = Window.partitionBy("source")
      .orderBy(col("score").desc, col("doc_id").asc)
    val small = hits
      .withColumn("doc_rank", row_number().over(w))
      .withColumn("n_group_hits",
        count(lit(1)).over(Window.partitionBy("source")))
      .withColumn("best", first("score").over(w))
      .filter(col("doc_rank") <= 2)
    val gw = Window.orderBy(col("best").desc, col("source").asc)
    small.withColumn("group_rank", dense_rank().over(gw))
      .filter(col("group_rank") <= 3)
      .select(col("group_rank"), col("source"), col("doc_id"),
        col("score"), col("doc_rank"), col("n_group_hits"))
      .orderBy("group_rank", "doc_rank")
  }

  /** x17: spellcheck suggestions — deterministic misspellings (every
    * ≥4-char vocab token with its 2nd character dropped, minus forms
    * that collide with real tokens) resolved back through
    * Indexing.spellcheck. The vocab aggregate feeds three branches
    * of ONE plan (lazy checkpoint per the single-plan multi-read
    * rule) so the corpus is scanned once, not three times. */
  def x17Spellcheck(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Indexing.tokenCounts(Tables.documents(spark, dir),
        col("text"))
      .localCheckpoint(false)
    val qs = vocab.filter(length(col("tok")) >= 4)
      .select(concat(substring(col("tok"), 1, 1),
        expr("substring(tok, 3)")).as("query")).distinct()
      .join(vocab.select(col("tok").as("query")), Seq("query"), "left_anti")
    Indexing.spellcheck(qs, vocab, maxDist = 2).orderBy("query")
  }

  /** x18: the suggester SERVING path — completions read through the
    * persisted VocabIndex (build-if-absent, fingerprint-keyed like
    * x7's BM25 index: build charged once, never to the probe), at
    * prefixLen=1 where the fixture vocabulary actually makes ranks
    * COMPETE (8 prefixes carry ≥2 candidate tokens at every SF —
    * x16's 3-char prefixes are unique per token in this corpus, so
    * its rank column never exercises the freq-desc/tok-asc order;
    * this query does). */
  def x18SuggestServing(spark: SparkSession, dir: String): DataFrame = {
    val idx = VocabIndex.ensureVocabIndex(
      Tables.documents(spark, dir), "text", dir, prefixLen = 1, k = 3)
    VocabIndex.servingSuggest(spark, idx).orderBy("prefix", "rank")
  }

  /** x13: range facet over a [100,500) grid chosen so BOTH edge-clamp
    * branches (Solr facet.range.other=before/after folded into the
    * edge buckets) carry real mass at every SF — matching docs run
    * n_chars 48..577, so rows below 100 clamp into bucket 0 and rows
    * at/above 500 clamp into bucket 7 (r6 verdict: the old [0,4000)
    * grid left the clamp arithmetic oracle-dead). */
  def x13RangeFacet(spark: SparkSession, dir: String): DataFrame =
    Indexing.rangeFacet(Tables.documents(spark, dir),
        col("text").contains("vector"), col("n_chars"),
        lo = 100L, gap = 50L, nBuckets = 8)
      .orderBy("bucket")

  /** x12: search-hit highlighting — ±20-char snippet around the
    * first 'vector' hit, map-only at scan speed. */
  def x12Highlight(spark: SparkSession, dir: String): DataFrame =
    Indexing.highlight(Tables.documents(spark, dir),
        col("doc_id"), col("text"), term = "vector", context = 20)
      .orderBy("doc_id")

  /** x11: faceted search — Solr facet.field=[lang, source] over the
    * docs matching a text query, every facet from ONE scan + ONE
    * shuffle (Indexing.facetCounts). */
  def x11Facets(spark: SparkSession, dir: String): DataFrame =
    Indexing.facetCounts(Tables.documents(spark, dir),
        col("text").contains("vector"), Seq("lang", "source"))
      .orderBy("facet_field", "facet_value")

  /** x10: exact-phrase search (Solr phrase query on the data plane):
    * docs where "table hash" occur as consecutive tokens, with hit
    * counts and first position. One scan + one join on term-sized
    * frames (Indexing.phraseSearch). */
  def x10Phrase(spark: SparkSession, dir: String): DataFrame =
    Indexing.phraseSearch(Tables.documents(spark, dir),
        col("doc_id"), col("text"), Seq("table", "hash"))
      .orderBy("doc_id")

  /** v11: referential-integrity report over the TPC-H FK chain —
    * one row per relationship with child/orphan/null-key counts
    * (Validate.fkIntegrity; each relation is one left join + one
    * aggregate). */
  def v11Integrity(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    Validate.fkIntegrity(li, col("l_orderkey"), o, col("o_orderkey"),
        "lineitem->orders")
      .unionByName(Validate.fkIntegrity(o, col("o_custkey"), c,
        col("c_custkey"), "orders->customer"))
      .orderBy("relation")
  }

  /** x9: z-value (Morton) computation parity — the bit-interleave
    * behind the multi-dimensional layout (Indexing.zValue; the
    * pruning property itself is ZorderSpec's footer-stat assertion,
    * this query pins the curve arithmetic against an independent
    * engine). Both dims quantized to 6 bits. */
  def x9Zorder(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        (col("doc_id") % 64).cast("long").as("xq"),
        (col("n_chars") % 64).cast("long").as("yq"))
      .withColumn("z", Indexing.zValue(col("xq"), col("yq"), 6))
      .orderBy("z", "doc_id")

  /** v8: profile drift between the corpus and a perturbed snapshot
    * (20% of rows dropped, lang nulled on a 1-in-7 stripe) — the
    * schema-erosion guard that should fail a run before the index
    * swap. The perturbation is deterministic and mirrored in the
    * oracle. */
  /** v12: distribution drift via quantile-sketch deltas — the shape
    * change v8's min/max/null-rate profile CANNOT see: the synthetic
    * "current" feed halves n_chars for even doc_ids (interior mass
    * collapses; bounds barely move) while doc_id thins uniformly
    * (quantiles hold). Exact at fixture scale (sketch capacity ≥
    * rows, the e12 trick) and ALL-INTEGER end to end. Both verdict
    * branches are live: n_chars quantiles shift past 10%, doc_id's
    * don't. */
  def v12QuantileDrift(spark: SparkSession, dir: String): DataFrame = {
    val prev = Tables.documents(spark, dir)
    val cur = prev.filter(col("doc_id") % 5 =!= 0)
      .withColumn("n_chars", when(col("doc_id") % 2 === 0,
        expr("n_chars DIV 2")).otherwise(col("n_chars").cast("long")))
    Validate.quantileDrift(prev, cur, Seq("doc_id", "n_chars"))
      .orderBy("col_name", "pct")
  }

  def v8ProfileDrift(spark: SparkSession, dir: String): DataFrame = {
    val prev = Tables.documents(spark, dir)
    val cur = prev.filter(col("doc_id") % 5 =!= 0)
      .withColumn("lang", when(col("doc_id") % 7 === 0,
        lit(null).cast("string")).otherwise(col("lang")))
    Validate.profileDrift(prev, cur,
        Seq("doc_id", "lang", "source", "n_chars"))
      .orderBy("col_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t4_field_merge" -> (t4FieldMerge _),
    "x16_suggest" -> (x16Suggest _),
    "x19_mlt" -> (x19Mlt _),
    "x20_collapse" -> (x20Collapse _),
    "x26_expand" -> (x26Expand _),
    "x27_grouping" -> (x27Grouping _),
    "x17_spellcheck" -> (x17Spellcheck _),
    "x18_suggest_serving" -> (x18SuggestServing _),
    "x8_seg_search" -> (x8SegSearch _),
    "x9_zorder" -> (x9Zorder _),
    "x10_phrase" -> (x10Phrase _),
    "x11_facets" -> (x11Facets _),
    "x12_highlight" -> (x12Highlight _),
    "x13_range_facet" -> (x13RangeFacet _),
    "x14_cursor_page" -> (x14CursorPage _),
    "v10_histogram" -> (v10Histogram _),
    "v11_integrity" -> (v11Integrity _),
    "x6_compact" -> (x6Compact _),
    "v8_profile_drift" -> (v8ProfileDrift _),
    "v12_quantile_drift" -> (v12QuantileDrift _),
    "x7_bm25" -> (x7Bm25 _),
    "x21_boosted_search" -> (x21BoostedSearch _),
    "x22_pivot_facet" -> (x22PivotFacet _),
    "x25_terms" -> (x25Terms _),
    "x23_elevation" -> (x23Elevation _),
    "x24_stats" -> (x24Stats _),
    "v7_volume_anomaly" -> (v7VolumeAnomaly _),
    "h8_harvest_diff" -> (h8HarvestDiff _),
    "h9_missing_days" -> (h9MissingDays _),
    "h10_harvest_windows" -> (h10HarvestWindows _),
    "x5_inverted" -> (x5Inverted _),
    "x4_apply_changes" -> (x4ApplyChanges _),
    "h1_partition_status" -> (h1PartitionStatus _),
    "h2_set_include" -> (h2SetInclude _),
    "h3_set_exclude" -> (h3SetExclude _),
    "h4_date_window" -> (h4DateWindow _),
    "h5_batch_assign" -> (h5BatchAssign _),
    "h6_content_hash" -> (h6ContentHash _),
    "h7_dedup_latest" -> (h7DedupLatest _),
    "r1_field_extract" -> (r1FieldExtract _),
    "r2_id_quality" -> (r2IdQuality _),
    "r3_lookup_enrich" -> (r3LookupEnrich _),
    "v1_validate_filter" -> (v1ValidateFilter _),
    "v2_invalid_report" -> (v2InvalidReport _),
    "v3_report_all" -> (v3ReportAll _),
    "v4_filter_stats" -> (v4FilterStats _),
    "v5_profile" -> (v5Profile _),
    "t1_crosswalk" -> (t1Crosswalk _),
    "t2_normalize" -> (t2Normalize _),
    "x1_solr_docs" -> (x1SolrDocs _),
    "x2_latest_version" -> (x2LatestVersion _),
    "x3_alias_resolve" -> (x3AliasResolve _),
  )

  /** The x7 BM25 scoring chain through the per-term quantized
    * contributions `sc` (cq = round(term score · 10⁶) BIGINT) —
    * shared by the x7 oracle (rounds the exact sum back to a 4-dp
    * score) and the x21 oracle (keeps the integer sum and multiplies
    * by the integer authority weight). */
  private val bm25ScoreCtes: String =
    """toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
           FROM documents WHERE doc_id >= 5),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
         dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS total_len FROM dl),
         q AS (SELECT DISTINCT doc_id AS q_id,
             unnest(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS tok
           FROM documents WHERE doc_id < 5),
         d AS (SELECT tok, count(*) AS df FROM tf
           WHERE tok IN (SELECT tok FROM q) GROUP BY 1),
         sc AS (
           SELECT q.q_id, tf.doc_id AS n_id,
             CAST(round(
               ln((CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5) + 1.0)
                 * (tf.tf * CAST(1.2 + 1.0 AS DOUBLE)
                    / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl
                         / (CAST(s.total_len AS DOUBLE) / s.n_docs))))
               * 1000000.0) AS BIGINT) AS cq
           FROM tf JOIN q USING (tok) JOIN d USING (tok)
             JOIN dl ON tf.doc_id = dl.doc_id
             CROSS JOIN stats s)"""

  val oracleSql: Map[String, String] = Map(
    // x19: same '0:'-seeded md5 shingle hashing as the dedup oracles,
    // over the RAW documents table (no augmentation)
    "x19_mlt" ->
      """WITH toks AS (
           SELECT doc_id,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+') AS tks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               list_transform(range(1, greatest(len(tks) - 2, 1) + 1),
                 i -> array_to_string(tks[i:i+2], ' ')),
               s -> CAST(concat('0x', substr(md5(concat('0:', s)), 1, 8)) AS BIGINT))) AS sh
           FROM toks),
         posts AS (SELECT doc_id, unnest(sh) AS h FROM sh),
         dfs AS (SELECT h, count(*) AS df FROM posts GROUP BY 1),
         cut AS (SELECT max(CASE WHEN rn = (99*n + 99) // 100 THEN df END) AS df_max
           FROM (SELECT df, row_number() OVER (ORDER BY df) AS rn,
                   count(*) OVER () AS n FROM dfs)),
         rare AS (SELECT h FROM dfs, cut WHERE df BETWEEN 2 AND df_max),
         rp AS (SELECT doc_id, h FROM posts JOIN rare USING (h)),
         scored AS (
           SELECT s.doc_id AS seed_id, c.doc_id AS cand_id,
             CAST(count(*) AS BIGINT) AS n_shared
           FROM rp s JOIN rp c ON s.h = c.h AND c.doc_id != s.doc_id
           WHERE s.doc_id < 5 GROUP BY 1, 2)
         SELECT seed_id, cand_id, n_shared, rank FROM (
           SELECT seed_id, cand_id, n_shared,
             CAST(row_number() OVER (PARTITION BY seed_id
               ORDER BY n_shared DESC, cand_id ASC) AS INT) AS rank
           FROM scored)
         WHERE rank <= 3 ORDER BY seed_id, rank""",
    // x20: same thinned-explode scoring + one collapse window
    "x20_collapse" ->
      """WITH hits AS (
           SELECT doc_id, source, CAST(count(*) AS BIGINT) AS score
           FROM (
             SELECT doc_id, source,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
             FROM documents)
           WHERE tok IN ('table', 'hash') GROUP BY 1, 2),
         r AS (
           SELECT source, doc_id, score,
             row_number() OVER (PARTITION BY source
               ORDER BY score DESC, doc_id ASC) AS rank,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_group_hits
           FROM hits)
         SELECT source, doc_id, score, n_group_hits
         FROM r WHERE rank = 1 ORDER BY source""",
    // x27: the grouping trio's group-level page — dense_rank over the
    // doc-limited frame on (best desc, source asc)
    "x27_grouping" ->
      """WITH hits AS (
           SELECT doc_id, source, CAST(count(*) AS BIGINT) AS score
           FROM (
             SELECT doc_id, source,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
             FROM documents)
           WHERE tok IN ('spark', 'filter') GROUP BY 1, 2),
         r AS (
           SELECT source, doc_id, score,
             row_number() OVER (PARTITION BY source
               ORDER BY score DESC, doc_id ASC) AS doc_rank,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_group_hits,
             first_value(score) OVER (PARTITION BY source
               ORDER BY score DESC, doc_id ASC) AS best
           FROM hits),
         s AS (SELECT * FROM r WHERE doc_rank <= 2),
         g AS (
           SELECT *, dense_rank() OVER (ORDER BY best DESC, source ASC) AS group_rank
           FROM s)
         SELECT CAST(group_rank AS INT) AS group_rank, source, doc_id, score,
           CAST(doc_rank AS INT) AS doc_rank, n_group_hits
         FROM g WHERE group_rank <= 3
         ORDER BY group_rank, doc_rank""",
    // x26: x20's window with first_value carrying the head id; the
    // expand page is the rank in [2, 4] slice of the same total order
    "x26_expand" ->
      """WITH hits AS (
           SELECT doc_id, source, CAST(count(*) AS BIGINT) AS score
           FROM (
             SELECT doc_id, source,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
             FROM documents)
           WHERE tok IN ('scan', 'merge') GROUP BY 1, 2),
         r AS (
           SELECT source, doc_id, score,
             row_number() OVER (PARTITION BY source
               ORDER BY score DESC, doc_id ASC) AS rank,
             first_value(doc_id) OVER (PARTITION BY source
               ORDER BY score DESC, doc_id ASC) AS head_id
           FROM hits)
         SELECT source, head_id, doc_id, score,
           CAST(rank - 1 AS INT) AS expand_rank
         FROM r WHERE rank BETWEEN 2 AND 4
         ORDER BY source, expand_rank""",
    "x6_compact" ->
      """WITH files AS (
           SELECT source AS part_key, doc_id // 20 AS file_id,
             CAST(sum(n_chars) AS BIGINT) AS bytes
           FROM documents GROUP BY 1, 2),
         c AS (
           SELECT part_key, file_id, bytes,
             CAST(sum(bytes) OVER (PARTITION BY part_key ORDER BY file_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_bytes
           FROM files)
         SELECT part_key, file_id, bytes, cum_bytes,
           CAST(floor((cum_bytes - bytes) / 20000) AS BIGINT) AS group_id
         FROM c ORDER BY part_key, file_id""",
    // h9: the calendar re-derived with generate_series; the same
    // h10: span → integer-ceil window count → date arithmetic per
    // slice, the clipped last window via least(); inclusive OAI
    // bounds re-derived as until − 1 day (single-day for a
    // zero-length plan row — oracle-dead here, spec-pinned)
    "h10_harvest_windows" ->
      """WITH s AS (
           SELECT event_type AS key,
             min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
           FROM events GROUP BY 1),
         n AS (SELECT key, lo, hi,
             greatest(((hi - lo) + 6) // 7, 1) AS n_win FROM s),
         w AS (SELECT key, lo, hi, unnest(range(0, n_win)) AS w FROM n),
         p AS (SELECT key, CAST(w AS INT) AS win_idx,
             lo + CAST(w * 7 AS INT) AS from_date,
             least(lo + CAST((w + 1) * 7 AS INT), hi) AS until_date,
             CAST(least(lo + CAST((w + 1) * 7 AS INT), hi)
               - (lo + CAST(w * 7 AS INT)) AS BIGINT) AS n_days
           FROM w)
         SELECT key, win_idx, from_date, until_date, n_days,
           from_date AS oai_from,
           CASE WHEN n_days > 0 THEN until_date - 1
                ELSE from_date END AS oai_until
         FROM p ORDER BY key, win_idx""",
    // planted day-of-month gaps come back as the missing set
    "h9_missing_days" ->
      """WITH e AS (
           SELECT event_type AS key, CAST(ts AS DATE) AS d FROM events
           WHERE extract(day FROM ts) % 7 <> 3 GROUP BY 1, 2),
         s AS (SELECT key, min(d) AS lo, max(d) AS hi FROM e GROUP BY 1),
         x AS (SELECT key,
             CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
               CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
           FROM s)
         SELECT x.key AS key, x.d AS missing_day
         FROM x LEFT JOIN e ON x.key = e.key AND x.d = e.d
         WHERE e.d IS NULL ORDER BY 1, 2""",
    "h8_harvest_diff" ->
      """WITH cur AS (SELECT doc_id AS rec_id, md5(text) AS h FROM documents),
         prev AS (
           SELECT doc_id AS rec_id,
             md5(CASE WHEN doc_id % 5 = 0 THEN concat('old:', text) ELSE text END) AS h
           FROM documents WHERE doc_id % 7 != 0
           UNION ALL
           SELECT doc_id + 5000000, md5(concat('gone:', CAST(doc_id AS VARCHAR)))
           FROM documents WHERE doc_id < 20)
         SELECT coalesce(cur.rec_id, prev.rec_id) AS rec_id,
           CASE WHEN prev.h IS NULL THEN 'added'
                WHEN cur.h IS NULL THEN 'deleted'
                WHEN cur.h = prev.h THEN 'unchanged'
                ELSE 'changed' END AS status
         FROM cur FULL OUTER JOIN prev ON cur.rec_id = prev.rec_id
         ORDER BY rec_id""",
    "v7_volume_anomaly" ->
      """WITH daily AS (
           SELECT event_type AS vol_key, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         s AS (
           SELECT vol_key, day, n,
             avg(n) OVER (PARTITION BY vol_key) AS m,
             stddev_samp(n) OVER (PARTITION BY vol_key) AS sd
           FROM daily)
         SELECT vol_key, day, n, round(m, 4) AS mean_n,
           CASE WHEN sd > 0 THEN round((n - m) / sd, 4) END AS z,
           CASE WHEN sd > 0 AND abs(round((n - m) / sd, 4)) >= 2.0
             THEN true ELSE false END AS is_anomaly
         FROM s ORDER BY vol_key, day""",
    "h1_partition_status" ->
      """SELECT event_id, event_type, (event_type = 'error') AS is_deleted
         FROM events ORDER BY event_id""",
    "h2_set_include" ->
      """SELECT event_id, event_type, user_id FROM events
         WHERE event_type IN ('click','view') ORDER BY event_id""",
    "h3_set_exclude" ->
      """SELECT event_id, event_type, user_id FROM events
         WHERE event_type IN (
           SELECT DISTINCT event_type FROM events
           WHERE event_type NOT IN ('error'))
         ORDER BY event_id""",
    "h4_date_window" ->
      """SELECT event_id, ts, event_type FROM events
         WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-22'
         ORDER BY event_id""",
    "h5_batch_assign" ->
      """SELECT event_id, is_deleted,
           CAST(floor((row_number() OVER (PARTITION BY is_deleted ORDER BY event_id) - 1) / 1000.0) AS BIGINT) AS file_idx
         FROM (SELECT event_id, (event_type = 'error') AS is_deleted FROM events)
         ORDER BY event_id""",
    "h6_content_hash" ->
      """SELECT doc_id, concat('dag/ts/new-updated/', md5(text)) AS s3_key
         FROM documents ORDER BY doc_id""",
    "h7_dedup_latest" ->
      """SELECT user_id, event_id AS latest_event_id FROM (
           SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
         WHERE rn = 1 ORDER BY user_id""",
    "r1_field_extract" ->
      """SELECT event_id,
           CAST(nullif(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS BIGINT) AS k
         FROM events ORDER BY event_id""",
    "r2_id_quality" ->
      """SELECT user_id AS record_id, count(*) AS n_records,
           CASE WHEN user_id IS NULL THEN 'missing'
                WHEN count(*) > 1 THEN 'duplicate'
                ELSE 'ok' END AS status
         FROM events GROUP BY user_id ORDER BY record_id""",
    "r3_lookup_enrich" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, p_name AS parent_name
         FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
         ORDER BY l_orderkey, l_linenumber, l_partkey""",
    "v1_validate_filter" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
         WHERE length(text) > 0 AND n_chars >= 100
           AND lang IN ('en','de','fr','es','zh')
           AND n_chars = length(text)
           AND source IS NOT NULL AND source <> ''
         ORDER BY doc_id""",
    // NULL assertions uniformly mean failed-and-reported (mirrors
    // Validate.holds): every failure test is NOT coalesce(a, FALSE).
    "v2_invalid_report" ->
      """SELECT doc_id AS id,
           concat_ws(chr(10),
             CASE WHEN NOT coalesce(length(text) > 0, FALSE) THEN 'record has no content' END,
             CASE WHEN NOT coalesce(n_chars >= 100, FALSE) THEN 'record shorter than 100 chars' END,
             CASE WHEN NOT coalesce(lang IN ('en','de','fr','es','zh'), FALSE) THEN 'unknown language code' END,
             CASE WHEN NOT coalesce(n_chars = length(text), FALSE) THEN 'n_chars does not match text length' END,
             CASE WHEN NOT coalesce(source IS NOT NULL AND source <> '', FALSE) THEN 'missing source' END
           ) AS report,
           CASE WHEN source IS NOT NULL AND source <> '' THEN source ELSE text END AS record,
           source AS source_file
         FROM documents
         WHERE NOT coalesce(length(text) > 0, FALSE) OR NOT coalesce(n_chars >= 100, FALSE)
            OR NOT coalesce(lang IN ('en','de','fr','es','zh'), FALSE)
            OR NOT coalesce(n_chars = length(text), FALSE)
            OR NOT coalesce(source IS NOT NULL AND source <> '', FALSE)
         ORDER BY id""",
    "v3_report_all" ->
      """SELECT doc_id AS id,
           coalesce(length(text) > 0, FALSE) AS passed_nonempty,
           coalesce(n_chars >= 100, FALSE) AS passed_min_length,
           coalesce(lang IN ('en','de','fr','es','zh'), FALSE) AS passed_known_lang,
           coalesce(n_chars = length(text), FALSE) AS passed_chars_consistent,
           coalesce(source IS NOT NULL AND source <> '', FALSE) AS passed_source_present,
           (CASE WHEN NOT coalesce(length(text) > 0, FALSE) THEN 1 ELSE 0 END
            + CASE WHEN NOT coalesce(n_chars >= 100, FALSE) THEN 1 ELSE 0 END
            + CASE WHEN NOT coalesce(lang IN ('en','de','fr','es','zh'), FALSE) THEN 1 ELSE 0 END
            + CASE WHEN NOT coalesce(n_chars = length(text), FALSE) THEN 1 ELSE 0 END
            + CASE WHEN NOT coalesce(source IS NOT NULL AND source <> '', FALSE) THEN 1 ELSE 0 END) AS n_failed
         FROM documents ORDER BY id""",
    "v4_filter_stats" ->
      """SELECT source AS source_file, count(*) AS n_records,
           count(CASE WHEN NOT coalesce(length(text) > 0, FALSE) OR NOT coalesce(n_chars >= 100, FALSE)
             OR NOT coalesce(lang IN ('en','de','fr','es','zh'), FALSE)
             OR NOT coalesce(n_chars = length(text), FALSE)
             OR NOT coalesce(source IS NOT NULL AND source <> '', FALSE) THEN 1 END) AS n_invalid,
           (count(*) = count(CASE WHEN NOT coalesce(length(text) > 0, FALSE) OR NOT coalesce(n_chars >= 100, FALSE)
             OR NOT coalesce(lang IN ('en','de','fr','es','zh'), FALSE)
             OR NOT coalesce(n_chars = length(text), FALSE)
             OR NOT coalesce(source IS NOT NULL AND source <> '', FALSE) THEN 1 END)) AS all_filtered
         FROM documents GROUP BY source ORDER BY source_file""",
    // v8: per-column stat profiles of both snapshots via the v5
    // union-all pattern, joined; verdicts compare ROUNDED deltas
    // v12: the sketch's exact path replayed as order statistics —
    // rank = ceil(pct*n/100) via (pct*n + 99) // 100 (the e12
    // identity), all-integer deltas and verdicts
    "v12_quantile_drift" ->
      """WITH prev_src AS (
           SELECT 'doc_id' AS col_name, CAST(doc_id AS BIGINT) AS v FROM documents
           UNION ALL
           SELECT 'n_chars', CAST(n_chars AS BIGINT) FROM documents),
         cur_base AS (
           SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN CAST(n_chars AS BIGINT) // 2
                  ELSE CAST(n_chars AS BIGINT) END AS n_chars
           FROM documents WHERE doc_id % 5 <> 0),
         cur_src AS (
           SELECT 'doc_id' AS col_name, CAST(doc_id AS BIGINT) AS v FROM cur_base
           UNION ALL
           SELECT 'n_chars', n_chars FROM cur_base),
         pcts AS (SELECT CAST(unnest([25, 50, 75, 90]) AS INT) AS pct),
         pr AS (
           SELECT col_name, v,
             row_number() OVER (PARTITION BY col_name ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY col_name) AS n
           FROM prev_src),
         p AS (
           SELECT col_name, pct, max(CASE WHEN rn = (pct*n + 99) // 100 THEN v END) AS prev_q
           FROM pr CROSS JOIN pcts GROUP BY 1, 2),
         cr AS (
           SELECT col_name, v,
             row_number() OVER (PARTITION BY col_name ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY col_name) AS n
           FROM cur_src),
         c AS (
           SELECT col_name, pct, max(CASE WHEN rn = (pct*n + 99) // 100 THEN v END) AS cur_q
           FROM cr CROSS JOIN pcts GROUP BY 1, 2)
         SELECT p.col_name, p.pct,
           CAST(p.prev_q AS BIGINT) AS prev_q, CAST(c.cur_q AS BIGINT) AS cur_q,
           CAST(c.cur_q - p.prev_q AS BIGINT) AS delta,
           (abs(c.cur_q - p.prev_q) * 100 > 10 * greatest(abs(p.prev_q), 1)) AS shifted
         FROM p JOIN c ON p.col_name = c.col_name AND p.pct = c.pct
         ORDER BY 1, 2""",
    "v8_profile_drift" ->
      """WITH cur AS (
           SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang,
             source, n_chars
           FROM documents WHERE doc_id % 5 <> 0),
         pp AS (
           SELECT 'doc_id' AS col_name, count(*) AS prev_rows,
             count(CASE WHEN doc_id IS NULL THEN 1 END) AS prev_null,
             count(DISTINCT doc_id) AS prev_distinct,
             min(CAST(doc_id AS VARCHAR)) AS prev_min,
             max(CAST(doc_id AS VARCHAR)) AS prev_max FROM documents
           UNION ALL SELECT 'lang', count(*),
             count(CASE WHEN lang IS NULL THEN 1 END),
             count(DISTINCT lang), min(lang), max(lang) FROM documents
           UNION ALL SELECT 'source', count(*),
             count(CASE WHEN source IS NULL THEN 1 END),
             count(DISTINCT source), min(source), max(source) FROM documents
           UNION ALL SELECT 'n_chars', count(*),
             count(CASE WHEN n_chars IS NULL THEN 1 END),
             count(DISTINCT n_chars),
             min(CAST(n_chars AS VARCHAR)), max(CAST(n_chars AS VARCHAR))
           FROM documents),
         cc AS (
           SELECT 'doc_id' AS col_name, count(*) AS cur_rows,
             count(CASE WHEN doc_id IS NULL THEN 1 END) AS cur_null,
             count(DISTINCT doc_id) AS cur_distinct,
             min(CAST(doc_id AS VARCHAR)) AS cur_min,
             max(CAST(doc_id AS VARCHAR)) AS cur_max FROM cur
           UNION ALL SELECT 'lang', count(*),
             count(CASE WHEN lang IS NULL THEN 1 END),
             count(DISTINCT lang), min(lang), max(lang) FROM cur
           UNION ALL SELECT 'source', count(*),
             count(CASE WHEN source IS NULL THEN 1 END),
             count(DISTINCT source), min(source), max(source) FROM cur
           UNION ALL SELECT 'n_chars', count(*),
             count(CASE WHEN n_chars IS NULL THEN 1 END),
             count(DISTINCT n_chars),
             min(CAST(n_chars AS VARCHAR)), max(CAST(n_chars AS VARCHAR))
           FROM cur),
         j AS (
           SELECT col_name, CAST(prev_rows AS BIGINT) AS prev_rows,
             CAST(cur_rows AS BIGINT) AS cur_rows,
             round(cur_null / cur_rows - prev_null / prev_rows, 4) + 0.0 AS null_rate_delta,
             round(cur_distinct / nullif(prev_distinct, 0), 4) AS distinct_ratio,
             (prev_min IS DISTINCT FROM cur_min
              OR prev_max IS DISTINCT FROM cur_max) AS bounds_changed
           FROM pp JOIN cc USING (col_name))
         SELECT col_name, prev_rows, cur_rows, null_rate_delta,
           distinct_ratio, bounds_changed,
           (abs(null_rate_delta) >= 0.05 OR distinct_ratio <= 0.5
            OR distinct_ratio >= 2.0 OR distinct_ratio IS NULL
            OR bounds_changed) AS drifted
         FROM j ORDER BY col_name""",
    // v10: identical exact-integer bucket arithmetic; min/max come
    // from a scalar subquery instead of a driver pre-pass
    "v10_histogram" ->
      """WITH mm AS (SELECT CAST(min(n_chars) AS BIGINT) AS lo,
             CAST(max(n_chars) AS BIGINT) AS hi FROM documents)
         SELECT CAST(floor((CAST(n_chars AS BIGINT) - lo) * 20.0 / (hi - lo + 1)) AS BIGINT) AS bucket,
           CAST(lo + floor(CAST(floor((CAST(n_chars AS BIGINT) - lo) * 20.0 / (hi - lo + 1)) AS BIGINT)
             * (hi - lo + 1) / 20.0) AS BIGINT) AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n_rows
         FROM documents, mm
         GROUP BY 1, 2 ORDER BY bucket""",
    // x14: the same strict (key, id) keyset predicate and total
    // order; LIMIT after ORDER BY is deterministic because the sort
    // is total
    "x14_cursor_page" ->
      """SELECT doc_id, n_chars, lang FROM documents
         WHERE n_chars > 300 OR (n_chars = 300 AND doc_id > 100)
         ORDER BY n_chars, doc_id LIMIT 25""",
    // x13: same shifted floored-div bucket math, same edge clamp
    // t4: identical sparsity simulation, per-field latest-non-null by
    // the totally unique (ts desc, event_id desc) order
    "t4_field_merge" ->
      """WITH e2 AS (
           SELECT event_id, ts, user_id,
             CASE WHEN event_id % 4 <> 0 THEN event_type END AS type_n,
             CASE WHEN event_id % 3 <> 0 THEN value END AS value_n
           FROM events),
         base AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n_updates,
             max(ts) AS last_ts
           FROM e2 GROUP BY 1),
         tl AS (
           SELECT user_id, type_n AS merged_type FROM (
             SELECT user_id, type_n,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
             FROM e2 WHERE type_n IS NOT NULL) WHERE rn = 1),
         vl AS (
           SELECT user_id, value_n AS merged_value FROM (
             SELECT user_id, value_n,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
             FROM e2 WHERE value_n IS NOT NULL) WHERE rn = 1)
         SELECT b.user_id, tl.merged_type, vl.merged_value,
           b.n_updates, b.last_ts
         FROM base b
         LEFT JOIN tl USING (user_id) LEFT JOIN vl USING (user_id)
         ORDER BY b.user_id""",
    // x17: identical misspelling derivation, first-char + ±1-length
    // blocking, and (dist, freq desc, tok) best-suggestion order;
    // levenshtein uncast on both engines (the d6 precedent)
    "x17_spellcheck" ->
      """WITH toks AS (
           SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
           FROM documents),
         vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY 1),
         qs AS (
           SELECT DISTINCT concat(substr(tok, 1, 1), substr(tok, 3)) AS query
           FROM vocab WHERE length(tok) >= 4),
         qs2 AS (SELECT query FROM qs WHERE query NOT IN (SELECT tok FROM vocab)),
         cand AS (
           SELECT q.query, v.tok, v.freq, levenshtein(q.query, v.tok) AS dist
           FROM qs2 q JOIN vocab v
             ON substr(q.query, 1, 1) = substr(v.tok, 1, 1)
             AND abs(length(q.query) - length(v.tok)) <= 1),
         best AS (
           SELECT query, tok AS suggestion, dist, freq,
             row_number() OVER (PARTITION BY query
               ORDER BY dist ASC, freq DESC, tok ASC) AS rn
           FROM cand WHERE dist <= 2)
         SELECT query, suggestion, dist, freq FROM best WHERE rn = 1
         ORDER BY query""",
    // x16: same \s+ split, substr prefix, and (freq desc, tok asc)
    // tie-break; (prefix, rank) is a totally unique ORDER BY key
    "x16_suggest" ->
      """WITH toks AS (
           SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
           FROM documents),
         f AS (
           SELECT substr(tok, 1, 3) AS prefix, tok, CAST(count(*) AS BIGINT) AS freq
           FROM toks WHERE length(tok) >= 3 GROUP BY 1, 2)
         SELECT prefix, rank, tok, freq FROM (
           SELECT prefix, tok, freq,
             CAST(row_number() OVER (PARTITION BY prefix
               ORDER BY freq DESC, tok ASC) AS INT) AS rank
           FROM f)
         WHERE rank <= 3 ORDER BY prefix, rank""",
    "x18_suggest_serving" ->
      """WITH toks AS (
           SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
           FROM documents),
         f AS (
           SELECT substr(tok, 1, 1) AS prefix, tok, CAST(count(*) AS BIGINT) AS freq
           FROM toks WHERE length(tok) >= 1 GROUP BY 1, 2)
         SELECT prefix, rank, tok, freq FROM (
           SELECT prefix, tok, freq,
             CAST(row_number() OVER (PARTITION BY prefix
               ORDER BY freq DESC, tok ASC) AS INT) AS rank
           FROM f)
         WHERE rank <= 3 ORDER BY prefix, rank""",
    "x13_range_facet" ->
      """SELECT bucket, 100 + bucket * 50 AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n
         FROM (
           SELECT least(greatest(CAST(floor((CAST(n_chars AS BIGINT) - 100) / 50.0) AS BIGINT), 0), 7) AS bucket
           FROM documents WHERE contains(text, 'vector'))
         GROUP BY bucket ORDER BY bucket""",
    // x12: identical window arithmetic from strpos; substr handles
    // the end-of-string clamp the same way in both engines
    "x12_highlight" ->
      """SELECT doc_id, CAST(strpos(text, 'vector') AS INT) AS pos,
           concat(
             substr(text, greatest(strpos(text, 'vector') - 20, 1),
               strpos(text, 'vector') - greatest(strpos(text, 'vector') - 20, 1)),
             '<em>', 'vector', '</em>',
             substr(text, strpos(text, 'vector') + 6, 20)) AS snippet
         FROM documents WHERE strpos(text, 'vector') > 0
         ORDER BY doc_id""",
    // x11: each facet re-derived as its own group-by, unioned —
    // the single-pass property is the Spark plan's job, not the
    // oracle's
    "x11_facets" ->
      """WITH m AS (SELECT * FROM documents WHERE contains(text, 'vector'))
         SELECT facet_field, facet_value, CAST(n AS BIGINT) AS n FROM (
           SELECT 'lang' AS facet_field,
             coalesce(CAST(lang AS VARCHAR), '(missing)') AS facet_value,
             count(*) AS n FROM m GROUP BY 2
           UNION ALL
           SELECT 'source', coalesce(CAST(source AS VARCHAR), '(missing)'),
             count(*) FROM m GROUP BY 2)
         ORDER BY facet_field, facet_value""",
    // x10: consecutive-token phrase match re-derived from the raw
    // token array — start is the 0-based first-word position, same
    // as Spark's posexplode index
    "x10_phrase" ->
      """WITH t AS (SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS tks
           FROM documents),
         p AS (SELECT doc_id, unnest(range(1, len(tks) + 1)) AS i, tks FROM t),
         m AS (SELECT doc_id, i - 1 AS start FROM p
           WHERE tks[i] = 'table' AND i + 1 <= len(tks) AND tks[i + 1] = 'hash')
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
           CAST(min(start) AS BIGINT) AS first_pos
         FROM m GROUP BY doc_id ORDER BY doc_id""",
    // v11: same per-relation left-join aggregate
    "v11_integrity" ->
      """WITH r1 AS (
           SELECT 'lineitem->orders' AS relation,
             CAST(count(*) AS BIGINT) AS n_child,
             CAST(count(CASE WHEN l.l_orderkey IS NOT NULL AND o._pk IS NULL THEN 1 END) AS BIGINT) AS n_orphans,
             CAST(count(CASE WHEN l.l_orderkey IS NULL THEN 1 END) AS BIGINT) AS n_null_keys
           FROM lineitem l LEFT JOIN
             (SELECT DISTINCT o_orderkey AS _pk FROM orders) o
             ON l.l_orderkey = o._pk),
         r2 AS (
           SELECT 'orders->customer' AS relation,
             CAST(count(*) AS BIGINT) AS n_child,
             CAST(count(CASE WHEN od.o_custkey IS NOT NULL AND c._pk IS NULL THEN 1 END) AS BIGINT) AS n_orphans,
             CAST(count(CASE WHEN od.o_custkey IS NULL THEN 1 END) AS BIGINT) AS n_null_keys
           FROM orders od LEFT JOIN
             (SELECT DISTINCT c_custkey AS _pk FROM customer) c
             ON od.o_custkey = c._pk)
         SELECT * FROM r1 UNION ALL SELECT * FROM r2 ORDER BY relation""",
    // x9: the Morton interleave re-derived term by term with SQL bit
    // ops — any bit-position slip breaks the hash
    "x9_zorder" -> {
      val zTerms = (0 until 6).map(i =>
        s"(((xq >> $i) & 1) << ${2 * i}) + (((yq >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH b AS (SELECT doc_id,
             CAST(doc_id % 64 AS BIGINT) AS xq,
             CAST(n_chars % 64 AS BIGINT) AS yq
           FROM documents)
         SELECT doc_id, xq, yq, CAST($zTerms AS BIGINT) AS z
         FROM b ORDER BY z, doc_id"""
    },
    // x8: identical BM25 arithmetic to x7, but over the LOGICAL LIVE
    // corpus after the segmented index's two appends — the ≡0-mod-7
    // non-stripe docs carry their batch-2 replacement text. A stale
    // posting or a wrong stats correction on the Spark side shifts
    // scores and breaks the hash.
    "x8_seg_search" ->
      """WITH corpus AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 != 1 AND doc_id % 7 = 0
                  THEN text || ' appendix' ELSE text END AS text
           FROM documents WHERE doc_id >= 5),
         toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
           FROM corpus),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
         dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS total_len FROM dl),
         q AS (SELECT DISTINCT doc_id AS q_id,
             unnest(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS tok
           FROM documents WHERE doc_id < 5),
         d AS (SELECT tok, count(*) AS df FROM tf
           WHERE tok IN (SELECT tok FROM q) GROUP BY 1),
         sc AS (
           SELECT q.q_id, tf.doc_id AS n_id,
             CAST(round(
               ln((CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5) + 1.0)
                 * (tf.tf * CAST(1.2 + 1.0 AS DOUBLE)
                    / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl
                         / (CAST(s.total_len AS DOUBLE) / s.n_docs))))
               * 1000000.0) AS BIGINT) AS cq
           FROM tf JOIN q USING (tok) JOIN d USING (tok)
             JOIN dl ON tf.doc_id = dl.doc_id
             CROSS JOIN stats s),
         agg AS (SELECT q_id, n_id,
             round(CAST(sum(cq) AS BIGINT) / 1000000.0, 4) AS score
           FROM sc GROUP BY 1, 2)
         SELECT q_id, n_id, score, rank FROM (
           SELECT q_id, n_id, score,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY score DESC, n_id ASC) AS INT) AS rank
           FROM agg)
         WHERE rank <= 5 ORDER BY q_id, rank""",
    // x7: the BM25 arithmetic replays exactly — every per-term
    // contribution is computed in the same scalar op order as the
    // Spark expression, quantized to a long at 1e-6 before the sum
    // (exact integer aggregation, order-independent), and only then
    // rounded for display
    "x7_bm25" ->
      s"""WITH $bm25ScoreCtes,
         agg AS (SELECT q_id, n_id,
             round(CAST(sum(cq) AS BIGINT) / 1000000.0, 4) AS score
           FROM sc GROUP BY 1, 2)
         SELECT q_id, n_id, score, rank FROM (
           SELECT q_id, n_id, score,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY score DESC, n_id ASC) AS INT) AS rank
           FROM agg)
         WHERE rank <= 5 ORDER BY q_id, rank""",
    // x24: identical integer-cents stats, every column BIGINT (one
    // canonical rendering cross-engine); cents via floor(x*100+0.5)
    // — bit-identical IEEE double math in both engines
    "x24_stats" ->
      """WITH c AS (
           SELECT event_type AS facet,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events WHERE event_type != 'error')
         SELECT facet,
           CAST(count(*) AS BIGINT) AS n,
           min(cents) AS min_cents,
           max(cents) AS max_cents,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(sum(cents) AS BIGINT) // count(*) AS mean_cents,
           CAST(count(DISTINCT cents) AS BIGINT) AS n_distinct,
           CAST(sum(cents * cents) AS BIGINT) AS sumsq_cents,
           count(*) * CAST(sum(cents * cents) AS BIGINT)
             - CAST(sum(cents) AS BIGINT) * CAST(sum(cents) AS BIGINT)
             AS var_num
         FROM c GROUP BY facet ORDER BY facet""",
    // x23: the x7 score chain (identical rounded ordering), the same
    // literal elevation map, exclusion before the organic re-rank
    "x23_elevation" ->
      s"""WITH $bm25ScoreCtes,
         agg AS (SELECT q_id, n_id,
             round(CAST(sum(cq) AS BIGINT) / 1000000.0, 4) AS score
           FROM sc GROUP BY 1, 2),
         elev(q_id, n_id, pos) AS (VALUES
           (0, 20, 1), (0, 40, 2), (1, 33, 1), (1, 57, 2),
           (2, 46, 1), (2, 74, 2), (3, 59, 1), (3, 91, 2),
           (4, 72, 1), (4, 108, 2)),
         org AS (SELECT a.q_id, a.n_id,
             CAST(row_number() OVER (PARTITION BY a.q_id
               ORDER BY a.score DESC, a.n_id ASC) + 2 AS INT) AS rank,
             FALSE AS elevated
           FROM agg a LEFT JOIN elev e
             ON a.q_id = e.q_id AND a.n_id = e.n_id
           WHERE e.q_id IS NULL)
         SELECT q_id, n_id, rank, elevated FROM (
           SELECT CAST(q_id AS BIGINT) AS q_id, CAST(n_id AS BIGINT) AS n_id,
             CAST(pos AS INT) AS rank, TRUE AS elevated FROM elev
           UNION ALL
           SELECT q_id, n_id, rank, elevated FROM org)
         WHERE rank <= 5 ORDER BY q_id, rank""",
    // x25: per-doc DISTINCT bigrams (df counts docs), prefix +
    // mincount + count-sorted limit — the (df desc, term) order is
    // total, so LIMIT pages identically in both engines
    "x25_terms" ->
      """WITH arr AS (
           SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
           FROM documents),
         bi AS (
           SELECT doc_id, unnest(list_distinct(list_transform(
             generate_series(1, len(a) - 1),
             i -> concat(a[i], ' ', a[i + 1])))) AS term
           FROM arr)
         SELECT term, CAST(count(*) AS BIGINT) AS df
         FROM bi WHERE term LIKE 's%'
         GROUP BY term HAVING count(*) >= 5
         ORDER BY df DESC, term LIMIT 50""",
    "x22_pivot_facet" ->
      """WITH base AS (SELECT
             coalesce(CAST(source AS VARCHAR), '(missing)') AS parent,
             coalesce(CAST(lang AS VARCHAR), '(missing)') AS child,
             n_chars
           FROM documents WHERE n_chars >= 200),
         cells AS (SELECT parent, child, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS stat_sum
           FROM base GROUP BY 1, 2),
         parents AS (SELECT parent, CAST(sum(n_docs) AS BIGINT) AS n_docs,
             CAST(sum(stat_sum) AS BIGINT) AS stat_sum
           FROM cells GROUP BY 1),
         topp AS (SELECT parent, n_docs, stat_sum FROM (
             SELECT parent, n_docs, stat_sum,
               row_number() OVER (ORDER BY n_docs DESC, parent ASC) AS r
             FROM parents)
           WHERE r <= 5),
         topc AS (SELECT parent, child, n_docs, stat_sum FROM (
             SELECT c.parent, c.child, c.n_docs, c.stat_sum,
               row_number() OVER (PARTITION BY c.parent
                 ORDER BY c.n_docs DESC, c.child ASC) AS r
             FROM cells c JOIN topp t ON c.parent = t.parent)
           WHERE r <= 3)
         SELECT parent, child, n_docs, stat_sum FROM (
           SELECT parent, '(all)' AS child, n_docs, stat_sum FROM topp
           UNION ALL
           SELECT parent, child, n_docs, stat_sum FROM topc)
         ORDER BY parent, child""",
    // x21: the g2 weighted-PageRank replay (DedupSim.weightedRankCtes,
    // ending in r3) supplies the per-source integer authority; the
    // bm25 chain's exact integer sum is multiplied — never re-rounded
    "x21_boosted_search" ->
      s"""WITH ${DedupSim.weightedRankCtes},
         $bm25ScoreCtes,
         agg AS (SELECT q_id, n_id, CAST(sum(cq) AS BIGINT) AS score_q
           FROM sc GROUP BY 1, 2),
         bst AS (SELECT a.q_id, a.n_id,
             CAST(a.score_q * r3.r AS BIGINT) AS boosted
           FROM agg a JOIN documents ds ON a.n_id = ds.doc_id
           JOIN r3 ON ds.source = r3.source)
         SELECT q_id, n_id, boosted, rank FROM (
           SELECT q_id, n_id, boosted,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY boosted DESC, n_id ASC) AS INT) AS rank
           FROM bst)
         WHERE rank <= 5 ORDER BY q_id, rank""",
    "x5_inverted" ->
      """WITH toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
           FROM documents),
         tf AS (SELECT tok, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2)
         SELECT tok, CAST(doc_id % 8 AS INT) AS block,
           count(*) AS df_block,
           string_agg(concat(CAST(doc_id AS VARCHAR), ':', CAST(tf AS VARCHAR)), ' ' ORDER BY doc_id) AS postings
         FROM tf GROUP BY 1, 2 ORDER BY tok, block""",
    "x4_apply_changes" ->
      """WITH base AS (SELECT doc_id, lang, source, n_chars FROM documents),
         updates AS (SELECT doc_id, lang, concat('updated-', source) AS source, n_chars
                     FROM base WHERE doc_id % 3 = 1),
         deletes AS (SELECT doc_id FROM base WHERE doc_id % 10 = 0)
         SELECT doc_id, lang, source, n_chars FROM base
         WHERE doc_id NOT IN (SELECT doc_id FROM updates)
           AND doc_id NOT IN (SELECT doc_id FROM deletes)
         UNION ALL
         SELECT * FROM updates
         ORDER BY doc_id""",
    "v5_profile" ->
      """SELECT col_name, n_rows, n_null, n_distinct, min_str, max_str FROM (
           SELECT 'doc_id' AS col_name, count(*) AS n_rows,
             count(CASE WHEN doc_id IS NULL THEN 1 END) AS n_null,
             count(DISTINCT doc_id) AS n_distinct,
             min(CAST(doc_id AS VARCHAR)) AS min_str, max(CAST(doc_id AS VARCHAR)) AS max_str
           FROM documents
           UNION ALL
           SELECT 'lang', count(*), count(CASE WHEN lang IS NULL THEN 1 END),
             count(DISTINCT lang), min(lang), max(lang) FROM documents
           UNION ALL
           SELECT 'source', count(*), count(CASE WHEN source IS NULL THEN 1 END),
             count(DISTINCT source), min(source), max(source) FROM documents
           UNION ALL
           SELECT 'n_chars', count(*), count(CASE WHEN n_chars IS NULL THEN 1 END),
             count(DISTINCT n_chars), min(CAST(n_chars AS VARCHAR)), max(CAST(n_chars AS VARCHAR)) FROM documents)
         ORDER BY col_name""",
    "t1_crosswalk" ->
      """SELECT doc_id AS id, upper(substr(text, 1, 40)) AS title,
           CASE lang WHEN 'en' THEN 'English' WHEN 'de' THEN 'German'
             WHEN 'fr' THEN 'French' WHEN 'es' THEN 'Spanish'
             WHEN 'zh' THEN 'Chinese' ELSE 'Unknown' END AS language,
           source AS publisher, n_chars AS extent
         FROM documents ORDER BY id""",
    "t2_normalize" ->
      """SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm_hash,
           length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm_len
         FROM documents ORDER BY doc_id""",
    "x1_solr_docs" ->
      """SELECT doc_id,
           concat('{"id":', CAST(doc_id AS VARCHAR),
                  ',"lang":"', lang,
                  '","source":"', source,
                  '","n_chars":', CAST(n_chars AS VARCHAR), '}') AS solr_doc
         FROM documents ORDER BY doc_id""",
    "x2_latest_version" ->
      """SELECT configset, concat(configset, '-', CAST(max(version) AS VARCHAR)) AS latest
         FROM (
           SELECT regexp_extract(cs, '^(.*)-([0-9]+)$', 1) AS configset,
                  CAST(regexp_extract(cs, '^(.*)-([0-9]+)$', 2) AS BIGINT) AS version
           FROM (SELECT concat(source, '-', CAST(doc_id AS VARCHAR)) AS cs
                 FROM documents))
         GROUP BY configset ORDER BY configset""",
    "x3_alias_resolve" ->
      """SELECT DISTINCT concat(event_type, '-',
             CASE WHEN user_id % 10 = 0 THEN 'init'
                  ELSE CAST(user_id AS VARCHAR) END) AS collection
         FROM events
         WHERE NOT (concat(event_type, '-',
             CASE WHEN user_id % 10 = 0 THEN 'init'
                  ELSE CAST(user_id AS VARCHAR) END)) LIKE '%-init'
         ORDER BY collection""",
  )
}
