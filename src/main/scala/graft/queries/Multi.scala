package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal query surface (SURVEY.md §2: m1). The documents table
  * plays the payload store: text bytes stand in for an opaque media
  * payload; the plumbing (binary casts, metadata extraction, hashing)
  * is byte-identical to what a real media column gets.
  */
object Multi {

  def m1BinaryMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.binaryMeta(
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("text").cast("binary").as("payload")),
        idCol = "doc_id", payloadCol = "payload")
      .orderBy("doc_id")

  /** m2: corpus modality inventory — items / bytes per (source,
    * modality), the storage-accounting pass a multimodal pipeline
    * runs before budgeting decode compute. Modality is derived
    * deterministically from the id hash (the fixture's payloads are
    * all text; a real corpus reads it from the magic prefix m1
    * extracts). Map-side classify + one tiny groupBy. The mean byte
    * size is emitted as an EXACT integer (bytes*100, half-up integer
    * division) — never float round(avg(...)), which diverges across
    * engines on binary .5-decimal boundaries (the ta10 bug class;
    * CLAUDE.md invariant). */
  def m2ModalityStats(spark: SparkSession, dir: String): DataFrame = {
    val mods = array(lit("text"), lit("image"), lit("audio"), lit("video"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))
      .withColumn("modality", element_at(mods,
        (pmod(graft.functions.Hashing.h32(23, col("doc_id").cast("string")),
          lit(4)) + 1).cast("int")))
      .groupBy("source", "modality")
      .agg(count(lit(1)).as("n_items"),
        sum(length(col("payload"))).as("total_bytes"))
      .withColumn("avg_bytes_x100",
        expr("(total_bytes * 100 + n_items DIV 2) DIV n_items"))
      .orderBy("source", "modality")
  }

  /** m6: per-modality byte-budget selection — the decode-compute
    * budgeting pass m2's inventory exists to feed: within each
    * modality, keep items in doc_id order while the running byte
    * total stays within 50% of that modality's bytes (decode cost
    * tracks payload bytes, and each modality's decoder pool is
    * budgeted separately). ALL-INTEGER 50% rule (cum·2 ≤ total — no
    * ratio), both verdicts live in every modality at every SF. Plan:
    * map-side classify (m2's id-hash modality), then the cumsum and
    * total windows share ONE modality-keyed shuffle; at 100 TB the
    * four modality partitions are the coarse-grained unit — the
    * sharded two-level cut (batchAssignScalable) is the documented
    * path if a single modality outgrows one partition's window. */
  def m6ModalityBudget(spark: SparkSession, dir: String): DataFrame = {
    val mods = array(lit("text"), lit("image"), lit("audio"), lit("video"))
    val items = Tables.documents(spark, dir)
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .withColumn("modality", element_at(mods,
        (pmod(graft.functions.Hashing.h32(23, col("doc_id").cast("string")),
          lit(4)) + 1).cast("int")))
    val wcum = org.apache.spark.sql.expressions.Window
      .partitionBy("modality").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wtot = org.apache.spark.sql.expressions.Window.partitionBy("modality")
    items
      .withColumn("cum_bytes", sum("n_bytes").over(wcum))
      .withColumn("total_bytes", sum("n_bytes").over(wtot))
      .withColumn("kept", col("cum_bytes") * 2 <= col("total_bytes"))
      .select("doc_id", "modality", "n_bytes", "cum_bytes", "kept")
      .orderBy("doc_id")
  }

  /** m3: the decode pipeline itself, oracled — documents ride the
    * typed mapPartitions decode path (payload bytes never shuffle)
    * through the deterministic stub codec, and the decoded metadata +
    * feature summary are hash-checked against the stub's arithmetic
    * re-derived in SQL (the corpus is ASCII, so ascii(char) IS the
    * payload byte). A real codec changes only the decoder object;
    * this query pins the plumbing: batch shape, schema, row count,
    * byte math. Features are exact 1/128-grained binary fractions, so
    * the float→double comparisons are exact, not tolerance-based. */
  def m3DecodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("payload"),
        col("source").as("kind"))
      .as[Multimodal.BinaryRecord]
    Multimodal.decodeBatch(ds, Multimodal.StubDecoder).toDF()
      .select(col("id").as("doc_id"), col("kind"), col("n_bytes"),
        col("width"), col("height"), col("format"),
        element_at(col("features"), 1).cast("double").as("feat0"),
        element_at(col("features"), 8).cast("double").as("feat7"),
        expr("CAST(aggregate(features, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE)) AS DOUBLE)")
          .as("feat_sum"))
      .orderBy("doc_id")
  }

  /** m4: frame sampling over binary payloads — every 3rd 100-byte
    * "frame" up to 5 per record (the video-keyframe access pattern),
    * fanned out MAP-SIDE by sampleFrames' explode (payloads never
    * shuffle), each sampled frame content-hashed. Records shorter
    * than one frame drop (the n_frames=0 branch is live: the fixture
    * has sub-100-byte docs). */
  def m4FrameSample(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .withColumn("n_frames",
        floor(length(col("payload")) / 100).cast("int"))
      .filter(col("n_frames") >= 1)
    Multimodal.sampleFrames(df, "n_frames", stride = 3, maxFrames = 5)
      .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
        md5(expr("substring(payload, frame_idx * 100 + 1, 100)")).as("frame_hash"))
      .orderBy("doc_id", "frame_idx")
  }

  /** m5: perceptual-hash near-dup detection over binary payloads —
    * the multimodal twin of d4's SimHash dedup. Fixture plants
    * near-dups: docs 0–49 reappear (id+1,000,000) with ONE byte
    * changed, which flips at most the hash bits sampling that
    * position, so every planted pair sits within Hamming ≤ 5 and is
    * found through the pigeonhole chunk join (no all-pairs scan).
    * The oracle re-derives the 60-bit hash term by term. */
  def m5PhashDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("n_chars") >= 64)
    val base = docs.select(col("doc_id").as("id"), col("text"))
    val planted = docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 1000000L).as("id"),
        concat(substring(col("text"), 1, 7), lit("q"),
          expr("substring(text, 9)")).as("text"))
    val hashed = base.unionByName(planted)
      .select(col("id"),
        Multimodal.blockHash60(col("text").cast("binary")).as("phash"))
    Multimodal.phashNearDupPairs(hashed, "id", "phash", maxHamming = 5)
      .orderBy("a_id", "b_id")
  }

  /** m7: VIDEO-level near-dup via shared sampled-frame fingerprints —
    * the m4×m5 composition a multimodal pipeline actually runs (two
    * uploads of one video differ by an overlay/credit frame; frame
    * fingerprints, not whole-file hashes, find them). Candidate
    * generation is an inverted index on EXACT frame hashes with a df
    * cap (the d14/d17 discriminative-index posture: a frame in more
    * than maxDf=3 videos is boilerplate — intros, black frames — and
    * is dropped BEFORE pair generation, bounding pair fanout by
    * maxDf·Σdf, never |videos|²; the cap bites at every SF: 4/3/3
    * hashes dropped). Fixture plants near-dup videos: docs 0–49
    * re-uploaded (id+1,000,000) with ONE byte changed, which
    * perturbs frame 0 only — the planted pairs share every other
    * sampled frame. Pairs with ≥2 shared distinct frames survive;
    * ALL-INTEGER scores, (a_id, b_id) a total order. One frame scan,
    * one fh-keyed aggregate, pairs generated inside each capped id
    * list — no self-join, no checkpoint. */
  def m7VideoNeardup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("n_chars") >= 64)
    val base = docs.select(col("doc_id").as("id"), col("text"))
    val planted = docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 1000000L).as("id"),
        concat(substring(col("text"), 1, 7), lit("q"),
          expr("substring(text, 9)")).as("text"))
    val vids = base.unionByName(planted)
      .select(col("id"), col("text").cast("binary").as("payload"))
      .withColumn("n_frames",
        floor(length(col("payload")) / 100).cast("int"))
      .filter(col("n_frames") >= 1)
    // Single-plan shape (r15, the d26 pattern): ONE fh-keyed
    // capped-set aggregation replaces the former distinct + df-count
    // + semi-join + self-join chain and its hot-path localCheckpoint
    // (the block-manager materialization a cold driver run paid —
    // flagged r13+r14). Since r16 the collector is the size-capped
    // CappedCollectSet at maxDf+1 (the r15 verdict's item 1): an
    // uncapped collect_set would build a multi-million-element id
    // array for a boilerplate frame (intro card, black frame) shared
    // corpus-wide BEFORE the size filter dropped it; the capped
    // buffer saturates at 4 ids, keeps exact sets for every kept key
    // (df ≤ 3), and the between(2, 3) filter kills the saturation
    // sentinel — byte-identical output, bounded memory
    // (Round16OpsSpec pins both on a planted df≫maxDf hash). It
    // dedups (id, fh) map-side, its size IS the df, and pairs come
    // from within each ≤ maxDf id list — pair fanout stays bounded
    // by maxDf·Σdf, never |videos|². `sids` is projected to a column
    // BEFORE the pair lambda (the x25 outer-expression rule);
    // per-element work on a ≤3 array is the light-HOF carve-out.
    val byFrame = Multimodal
      .sampleFrames(vids, "n_frames", stride = 1, maxFrames = 5)
      .select(col("id"),
        md5(expr("substring(payload, frame_idx * 100 + 1, 100)")).as("fh"))
      .groupBy("fh").agg(graft.plans.CappedCollectSet
        .cappedCollectSet(col("id"), cap = 4).as("ids"))
      .filter(size(col("ids")).between(2, 3))
    byFrame
      .withColumn("sids", array_sort(col("ids")))
      .select(explode(flatten(transform(col("sids"), (x, i) =>
        transform(slice(col("sids"), i + 2, size(col("sids"))), y =>
          struct(x.as("a_id"), y.as("b_id")))))).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("n_shared_frames"))
      .filter(col("n_shared_frames") >= 2)
      .orderBy("a_id", "b_id")
  }

  /** m8: audio activity segmentation (the ASR-pipeline rung: split a
    * recording into voiced segments before transcription/packing).
    * Payload bytes in 50-byte windows, window energy = exact integer
    * byte sum (ASCII corpus: ascii(char) IS the byte — the m3
    * contract), maximal runs of windows with energy ≥ 4720 merge
    * into segments. The threshold sits just above the corpus's mean
    * window energy, so silence (space-dense windows) and speech both
    * carry real mass at every SF — the islands arithmetic (run id =
    * w − row_number) is what the oracle exercises. All-integer
    * output; payloads never shuffle (only (doc_id, w, energy)). */
  def m8AudioSegments(spark: SparkSession, dir: String): DataFrame =
    Multimodal.audioSegments(
        Tables.documents(spark, dir)
          .select(col("doc_id"), trim(col("text")).cast("binary").as("payload")),
        idCol = "doc_id", payloadCol = "payload",
        windowBytes = 50, threshold = 4720L)
      .orderBy("doc_id", "seg_idx")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_meta" -> (m1BinaryMeta _),
    "m8_audio_segments" -> (m8AudioSegments _),
    "m2_modality_stats" -> (m2ModalityStats _),
    "m3_decode_features" -> (m3DecodeFeatures _),
    "m4_frame_sample" -> (m4FrameSample _),
    "m5_phash_dedup" -> (m5PhashDedup _),
    "m6_modality_budget" -> (m6ModalityBudget _),
    "m7_video_neardup" -> (m7VideoNeardup _))

  val oracleSql: Map[String, String] = Map(
    // m8: the window grid, per-window byte-sum energy, islands run id
    // (w − row_number) and segment rollup all re-derived; ASCII makes
    // ascii(substr(t, i, 1)) ≡ payload byte i
    "m8_audio_segments" ->
      """WITH d AS (
           SELECT doc_id, trim(text) AS t, length(trim(text)) // 50 AS nw
           FROM documents WHERE length(trim(text)) >= 50),
         w AS (SELECT doc_id, t, unnest(range(0, nw)) AS w FROM d),
         en AS (SELECT doc_id, w,
             CAST(list_sum(list_transform(range(1, 51),
               i -> ascii(substr(t, CAST(w * 50 + i AS INT), 1)))) AS BIGINT)
               AS energy
           FROM w),
         sp AS (SELECT doc_id, w, energy,
             w - row_number() OVER (PARTITION BY doc_id ORDER BY w) AS grp
           FROM en WHERE energy >= 4720),
         seg AS (SELECT doc_id,
             CAST(min(w) AS BIGINT) AS start_window,
             CAST(count(*) AS BIGINT) AS n_windows,
             CAST(sum(energy) AS BIGINT) AS energy_total
           FROM sp GROUP BY doc_id, grp)
         SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id
             ORDER BY start_window) AS INT) AS seg_idx,
           start_window, n_windows, energy_total
         FROM seg ORDER BY doc_id, seg_idx""",
    "m1_binary_meta" ->
      """SELECT doc_id,
           octet_length(CAST(text AS BLOB)) AS n_bytes,
           substr(text, 1, 4) AS magic,
           md5(text) AS content_md5
         FROM documents ORDER BY doc_id""",
    // m4: frame grid replayed with range() (end-exclusive, hence +1)
    // over the same 100-byte slices; ASCII makes substr(text) ≡ the
    // byte slice
    "m4_frame_sample" ->
      """WITH d AS (
           SELECT doc_id, text,
             CAST(floor(octet_length(CAST(text AS BLOB)) / 100) AS INT) AS n_frames
           FROM documents),
         f AS (
           SELECT doc_id, text,
             unnest(range(0, least(n_frames - 1, 12) + 1, 3)) AS frame_idx
           FROM d WHERE n_frames >= 1)
         SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           md5(substr(text, frame_idx * 100 + 1, 100)) AS frame_hash
         FROM f ORDER BY doc_id, frame_idx""",
    // m7: the same frame grid at stride 1, df-capped inverted index,
    // ≥2 shared distinct frames
    "m7_video_neardup" ->
      """WITH d AS (
           SELECT doc_id AS id, text FROM documents WHERE n_chars >= 64
           UNION ALL
           SELECT doc_id + 1000000, concat(substr(text, 1, 7), 'q', substr(text, 9))
           FROM documents WHERE n_chars >= 64 AND doc_id < 50),
         v AS (SELECT id, text,
             CAST(floor(octet_length(CAST(text AS BLOB)) / 100) AS INT) AS nf
           FROM d),
         f AS (SELECT DISTINCT id, md5(substr(text, fi * 100 + 1, 100)) AS fh
           FROM (SELECT id, text, unnest(range(0, least(nf - 1, 4) + 1, 1)) AS fi
                 FROM v WHERE nf >= 1)),
         keep AS (SELECT fh FROM (SELECT fh, count(*) AS df FROM f GROUP BY 1)
           WHERE df <= 3),
         k AS (SELECT id, fh FROM f WHERE fh IN (SELECT fh FROM keep))
         SELECT a_id, b_id, n_shared_frames FROM (
           SELECT a.id AS a_id, b.id AS b_id,
             CAST(count(*) AS BIGINT) AS n_shared_frames
           FROM k a JOIN k b ON a.fh = b.fh AND a.id < b.id
           GROUP BY 1, 2)
         WHERE n_shared_frames >= 2 ORDER BY a_id, b_id""",
    // m3: StubDecoder replayed — the corpus is ASCII so ascii(char_i)
    // equals payload byte i; every feature is byte/128, an exact
    // binary fraction, so float-vs-double compare is exact
    "m3_decode_features" ->
      """SELECT doc_id, source AS kind,
           octet_length(CAST(text AS BLOB)) AS n_bytes,
           64 + (ascii(substr(text, 1, 1)) % 192) AS width,
           64 + (ascii(substr(text, 2, 1)) % 192) AS height,
           'stub' AS format,
           ascii(substr(text, 1, 1)) / 128.0 AS feat0,
           ascii(substr(text, 8, 1)) / 128.0 AS feat7,
           (ascii(substr(text, 1, 1)) + ascii(substr(text, 2, 1))
            + ascii(substr(text, 3, 1)) + ascii(substr(text, 4, 1))
            + ascii(substr(text, 5, 1)) + ascii(substr(text, 6, 1))
            + ascii(substr(text, 7, 1)) + ascii(substr(text, 8, 1))) / 128.0 AS feat_sum
         FROM documents ORDER BY doc_id""",
    // m6: m2's modality classify + one modality-keyed window pair
    "m6_modality_budget" ->
      """WITH m AS (
           SELECT doc_id,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
             ['text', 'image', 'audio', 'video'][
               CAST(CAST(concat('0x', substr(md5(concat('23:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 4 AS INT) + 1] AS modality
           FROM documents),
         c AS (
           SELECT doc_id, modality, n_bytes,
             CAST(sum(n_bytes) OVER (PARTITION BY modality ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_bytes,
             CAST(sum(n_bytes) OVER (PARTITION BY modality) AS BIGINT) AS total_bytes
           FROM m)
         SELECT doc_id, modality, n_bytes, cum_bytes,
           (cum_bytes * 2 <= total_bytes) AS kept
         FROM c ORDER BY doc_id""",
    "m2_modality_stats" ->
      """WITH m AS (
           SELECT source, octet_length(CAST(text AS BLOB)) AS nb,
             ['text', 'image', 'audio', 'video'][
               CAST(CAST(concat('0x', substr(md5(concat('23:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 4 AS INT) + 1] AS modality
           FROM documents)
         SELECT source, modality, count(*) AS n_items,
           CAST(sum(nb) AS BIGINT) AS total_bytes,
           CAST((CAST(sum(nb) AS BIGINT) * 100 + count(*) // 2) // count(*) AS BIGINT) AS avg_bytes_x100
         FROM m GROUP BY 1, 2 ORDER BY 1, 2""",
    // m5: the 60-bit block hash re-derived term by term (any slipped
    // sample position or threshold breaks the hash), then the same
    // pigeonhole chunk join and exact bit_count filter
    "m5_phash_dedup" -> {
      val terms = (0 until 60).map(j =>
        s"CASE WHEN ascii(substr(text, CAST(floor($j * length(text) / 60.0) AS INT) + 1, 1)) > 96 THEN ${1L << j} ELSE 0 END")
        .mkString("\n             + ")
      s"""WITH docs64 AS (SELECT doc_id, text FROM documents WHERE n_chars >= 64),
         base AS (
           SELECT doc_id AS id, text FROM docs64
           UNION ALL
           SELECT doc_id + 1000000 AS id,
             concat(substr(text, 1, 7), 'q', substr(text, 9)) AS text
           FROM docs64 WHERE doc_id < 50),
         h AS (SELECT id, ($terms) AS phash FROM base),
         c AS (SELECT id, phash, unnest(range(0, 6)) AS ci FROM h),
         cc AS (SELECT id, phash, (phash >> CAST(ci * 10 AS INT)) & 1023 AS cv, ci FROM c),
         p AS (SELECT DISTINCT a.id AS a_id, b.id AS b_id,
                 CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
               FROM cc a JOIN cc b ON a.ci = b.ci AND a.cv = b.cv AND a.id < b.id)
         SELECT a_id, b_id, hamming FROM p WHERE hamming <= 5
         ORDER BY a_id, b_id"""
    })
}
