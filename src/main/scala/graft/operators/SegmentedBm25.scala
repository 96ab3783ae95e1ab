package graft.operators

import graft.sources.{FingerprintCache, VersionedTable}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally maintained BM25 index — the Lucene/Solr segment
  * model re-expressed on parquet + one atomic pointer (the
  * reference's Solr collections are fed INCREMENTALLY by the harvest
  * loop: new-updated/ record sets are posted, deleted/ sets removed,
  * and readers keep serving throughout — harvest.py:185-208 +
  * solr_api_utils.py's alias lifecycle).
  *
  * Layout under `indexDir`:
  *  - `segdata/seg=<N>/tok_bucket=<b>/` — per-segment postings
  *    (doc_id, tok, tf, dl), append-only, bucket-partitioned like
  *    the [[Retrieval.buildIndex]] table so query-term pruning works
  *    per segment.
  *  - `docmeta/seg=<N>/doc_bucket=<b>/` — per-segment (doc_id, dl)
  *    sidecar, hash-bucketed by doc id: the probe that finds a
  *    re-ingested doc's PREVIOUS length reads only the batch's doc
  *    buckets — never a corpus scan.
  *  - `manifest/` — a [[VersionedTable]] whose single atomic pointer
  *    makes every append all-or-nothing for readers: one `seg` row
  *    per live segment (with its exact doc-count/length stats) and
  *    one `tomb` row per superseded document copy
  *    (doc_id, before_seg, dl) — postings of `doc_id` in segments
  *    `< before_seg` are dead. A crash between the segment write and
  *    the manifest flip leaves an orphan directory the manifest
  *    never references (and the next seg id skips past it).
  *
  * Search reads only manifest-listed segments, prunes to query-term
  * buckets, anti-joins the tombstones (equi-keyed on doc_id), and
  * corrects global stats from the manifest's own exact
  * per-segment/per-tomb numbers — no full-corpus aggregation on any
  * query path. [[compact]] folds live postings into one fresh
  * segment and drops all tombstones (Solr's merge), bounding both
  * the segment count and the tombstone anti-join side.
  *
  * Ids are long (cast upstream; dictionary-encode string ids first).
  */
object SegmentedBm25 {

  val DocBuckets = 64

  private def manifestDir(indexDir: String) = s"$indexDir/manifest"
  private def segDataRoot(indexDir: String) = s"$indexDir/segdata"
  private def docMetaRoot(indexDir: String) = s"$indexDir/docmeta"

  private val manifestSchema = StructType(Seq(
    StructField("kind", StringType),
    StructField("seg_id", LongType),
    StructField("n_docs", LongType),
    StructField("total_len", LongType),
    StructField("n_buckets", IntegerType),
    StructField("doc_id", LongType),
    StructField("before_seg", LongType),
    StructField("dl", LongType)))

  private def tokBucket(nBuckets: Int) =
    pmod(xxhash64(col("tok")), lit(nBuckets.toLong))
  private def docBucket =
    pmod(xxhash64(col("doc_id")), lit(DocBuckets.toLong))

  private def listSegDirsUnder(root: String): Seq[Long] = {
    val d = new java.io.File(root)
    if (!d.exists()) Seq.empty
    else d.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("seg="))
      .map(_.getName.stripPrefix("seg=").toLong).sorted
  }

  private def listSegDirs(indexDir: String): Seq[Long] =
    listSegDirsUnder(segDataRoot(indexDir))

  /** Read ONLY the named segment directories (basePath keeps the
    * `seg`/bucket partition columns). Reading the root instead would
    * re-list every segment directory ever written — superseded
    * segments stay on disk for manifest rollback until [[vacuum]] —
    * so the per-append/per-search file-listing cost would grow with
    * index AGE, not live size (the r10 soak's 3.3→5.7 s append-wall
    * drift). */
  private def readSegs(spark: SparkSession, root: String,
      segs: Seq[Long]): DataFrame = {
    require(segs.nonEmpty, s"no live segments under $root")
    spark.read.option("basePath", root)
      .parquet(segs.map(s => s"$root/seg=$s"): _*)
  }

  private def readManifest(spark: SparkSession, indexDir: String): Option[DataFrame] =
    // per-version LOCAL manifest read (r19): the maintain() cadence
    // bounds the manifest to O(maxSegments + recent tombstones)
    // forever, a manifest version is immutable, and every
    // search/append/maintain was paying a parquet scan job to read it
    VersionedTable.latestVersion(manifestDir(indexDir))
      .map(_ => VersionedTable.readLatestLocal(spark, manifestDir(indexDir)))

  /** Append one batch of documents as a new segment. Documents whose
    * id already exists in a live prior segment are REPLACED: their
    * previous copy is tombstoned (found via the bucket-pruned docmeta
    * probe, cost O(batch), and the tombstone carries the old dl so
    * global stats stay exact). Returns the new segment id. */
  def append(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, nBuckets: Int = Retrieval.TfBuckets): Long = {
    val spark = docs.sparkSession
    val manifest = readManifest(spark, indexDir)
    val priorSegRows = manifest
      .map(_.filter(col("kind") === "seg").select("seg_id", "n_buckets")
        .collect().toSeq)
      .getOrElse(Seq.empty)
    val priorSegs = priorSegRows.map(_.getLong(0))
    // tok_bucket values are hash(tok) mod n_buckets: a segment written
    // with a different bucket count would silently miss postings under
    // the isin pruning in search/compact — refuse mixed counts up
    // front (compact + rebuild to change the bucket count)
    val priorNb = priorSegRows.map(_.getInt(1)).distinct
    require(priorNb.forall(_ == nBuckets),
      s"append nBuckets=$nBuckets but index has n_buckets=${priorNb.mkString(",")}; " +
        "bucket pruning requires one uniform count per index")
    // skip past orphans from crashed appends too
    val segId = ((priorSegs ++ listSegDirs(indexDir)) :+ 0L).max + 1

    val tf = Retrieval.termFrequencies(docs,
        col(idCol).cast("long"), col(textCol))
      .withColumn("tok_bucket", tokBucket(nBuckets))
    tf.write.mode("errorifexists").partitionBy("tok_bucket")
      .parquet(s"${segDataRoot(indexDir)}/seg=$segId")
    val dm = tf.select(col("doc_id"), col("dl")).distinct()
      .withColumn("doc_bucket", docBucket)
    dm.write.mode("errorifexists").partitionBy("doc_bucket")
      .parquet(s"${docMetaRoot(indexDir)}/seg=$segId")

    // stats + replacement probe run off the just-written sidecar —
    // the materialization IS the checkpoint, no lazy frame crosses
    // executions
    val dmBack = spark.read.parquet(s"${docMetaRoot(indexDir)}/seg=$segId")
      .localCheckpoint(true)
    val st = dmBack.agg(count(lit(1)).as("n"), sum("dl").as("len")).head()
    val (nNew, lenNew) = (st.getLong(0), st.getAs[Long]("len"))

    val tombNew: DataFrame = manifest match {
      case Some(m) if priorSegs.nonEmpty =>
        val batchBuckets = dmBack.select("doc_bucket").distinct()
          .collect().map(_.getAs[Number]("doc_bucket").longValue()).toSeq
        val priorTombs = m.filter(col("kind") === "tomb")
          .select(col("doc_id").as("t_doc"), col("before_seg"))
        // manifest-listed prior segments ONLY (explicit paths): orphan
        // docmeta dirs a crashed/replayed append left behind must not
        // be read (they'd tombstone "prior copies" the manifest never
        // served, corrupting nDocs/avgdl), and superseded dirs
        // awaiting vacuum must not even be LISTED
        val priorMeta = readSegs(spark, docMetaRoot(indexDir), priorSegs)
          .filter(col("doc_bucket").isin(batchBuckets: _*))
          .join(dmBack.select(col("doc_id")), "doc_id")
          .join(priorTombs,
            col("doc_id") === col("t_doc") && col("seg") < col("before_seg"),
            "left_anti")
        // invariant: at most one live prior copy per doc (every
        // earlier copy was tombstoned by ITS replacing append) — the
        // max-struct is a belt against manual segment surgery
        priorMeta.groupBy("doc_id")
          .agg(max(struct(col("seg"), col("dl"))).as("s"))
          .select(
            lit("tomb").as("kind"), lit(null).cast("long").as("seg_id"),
            lit(null).cast("long").as("n_docs"),
            lit(null).cast("long").as("total_len"),
            lit(null).cast("int").as("n_buckets"),
            col("doc_id"), lit(segId).as("before_seg"),
            col("s.dl").as("dl"))
      case _ => spark.createDataFrame(
        java.util.Collections.emptyList[Row](), manifestSchema)
    }
    val segRow = spark.createDataFrame(java.util.Arrays.asList(
      Row("seg", segId, nNew, lenNew, nBuckets, null, null, null)), manifestSchema)
    val newManifest = manifest.map(_.unionByName(segRow))
      .getOrElse(segRow).unionByName(tombNew)
    VersionedTable.write(newManifest, manifestDir(indexDir))
    segId
  }

  /** Search the live index: manifest-listed segments only, pruned to
    * query-term buckets, tombstoned copies anti-joined out, global
    * stats corrected from the manifest's exact numbers (one tiny
    * aggregate job — never a corpus scan). Same driver-side query
    * handling as [[Retrieval.searchIndex]]. */
  def search(spark: SparkSession, indexDir: String, queries: DataFrame,
      idCol: String, textCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val manifest = readManifest(spark, indexDir).getOrElse(
      throw new IllegalStateException(s"no segmented index at $indexDir"))
    // one job: seg list + seg stats + tombstone corrections together
    val isSeg = col("kind") === "seg"
    val agg = manifest.agg(
      collect_list(when(isSeg, col("seg_id"))).as("segs"),
      sum(when(isSeg, col("n_docs"))).as("seg_docs"),
      sum(when(isSeg, col("total_len"))).as("seg_len"),
      max(when(isSeg, col("n_buckets"))).as("n_buckets"),
      count(when(!isSeg, lit(1))).as("n_tomb"),
      coalesce(sum(when(!isSeg, col("dl"))), lit(0L)).as("tomb_len"),
      count_distinct(when(isSeg, col("n_buckets"))).as("nb_distinct")).head()
    val segs = agg.getSeq[Long](0)
    val nDocs = agg.getLong(1) - agg.getLong(4)
    val totalLen = agg.getLong(2) - agg.getLong(5)
    val nBuckets = agg.getInt(3)
    // append enforces uniformity; this guards manual segment surgery —
    // mixed counts would silently drop matching postings under pruning
    require(agg.getLong(6) <= 1L,
      s"segments disagree on n_buckets at $indexDir; compact to repair")
    val avgdl = totalLen.toDouble / nDocs

    val qRows = Retrieval.queryTerms(queries, idCol, textCol)
      .withColumn("__tb", tokBucket(nBuckets)).collect()
    val buckets = qRows.map(_.getAs[Long]("__tb")).distinct.toSeq
    val qSchema = StructType(Seq(
      StructField("q_id", queries.schema(idCol).dataType),
      StructField("tok", StringType)))
    val qTerms = spark.createDataFrame(
      java.util.Arrays.asList(qRows.map(r => Row(r.get(0), r.get(1))): _*), qSchema)

    val tombs = manifest.filter(col("kind") === "tomb")
      .select(col("doc_id").as("t_doc"), col("before_seg"))
    val live = readSegs(spark, segDataRoot(indexDir), segs)
      .filter(col("tok_bucket").isin(buckets: _*))
      .join(tombs,
        col("doc_id") === col("t_doc") && col("seg") < col("before_seg"),
        "left_anti")
    Retrieval.scoreBm25(live, nDocs, avgdl, qTerms, k, k1, b)
  }

  /** Build-if-absent convenience mirroring [[Retrieval.ensureIndex]]'s
    * fingerprint contract (keyed on the dataset's documents.parquet
    * plus a tag so differently-shaped demo indexes don't collide). */
  def ensureIndex(dataDir: String, tag: String)(build: String => Unit): String =
    synchronized {
      val f = new java.io.File(s"$dataDir/documents.parquet")
      val live = ":segbm25:v1"
      val key =
        s"${f.getAbsolutePath}:${f.lastModified}:${f.length}:$tag$live"
      val dir = FingerprintCache.prepare("graft_segbm25", key, live)
      if (VersionedTable.latestVersion(manifestDir(dir)).isEmpty) build(dir)
      dir
    }

  /** Compaction-cadence contract (the bound that keeps a year of
    * micro-batches from growing the driver-side manifest without
    * limit): call after every append — the streaming maintainer
    * [[graft.streaming.Bm25Stream]] does — and compaction fires
    * whenever live segments exceed `maxSegments` OR tombstones exceed
    * `maxTombPct`% of live docs (dead postings ride along in every
    * probe until compacted away). Under that cadence the manifest
    * holds ≤ maxSegments+1 seg rows plus only the tombstones created
    * since the last compact — which at most `maxSegments` appends ago
    * — so every driver-side manifest `collect()` in append/search/
    * compact stays O(maxSegments + recent batch sizes) FOREVER,
    * independent of index age or total corpus size. Returns the
    * compacted segment id when compaction ran. */
  def maintain(spark: SparkSession, indexDir: String, maxSegments: Int = 8,
      maxTombPct: Int = 20, keepManifests: Int = 3): Option[Long] =
    readManifest(spark, indexDir).flatMap { m =>
      val isSeg = col("kind") === "seg"
      val r = m.agg(
        count(when(isSeg, lit(1))).as("n_seg"),
        coalesce(sum(when(isSeg, col("n_docs"))), lit(0L)).as("gross_docs"),
        count(when(!isSeg, lit(1))).as("n_tomb")).head()
      val (nSeg, nTomb) = (r.getLong(0), r.getLong(2))
      val nLive = r.getLong(1) - nTomb
      if (nSeg > maxSegments || nTomb * 100L > nLive.max(1L) * maxTombPct) {
        val seg = compact(spark, indexDir)
        vacuum(spark, indexDir, keepManifests)
        Some(seg)
      } else None
    }

  /** Bound on-disk state by index LIVENESS instead of index AGE:
    * prune manifest history to the newest `keepManifests` versions
    * (the rollback window) and delete every segment directory no
    * retained manifest version references. Without this, superseded
    * segments and manifest versions accumulate one per append
    * forever; with it, total directory count is O(live segments +
    * rollback window) no matter how many micro-batches the index has
    * absorbed. Single-writer contract (same as append/compact): must
    * not run concurrently with an append — a not-yet-committed
    * segment is protected only by being newer than every referenced
    * id, which a racing append can violate. */
  def vacuum(spark: SparkSession, indexDir: String,
      keepManifests: Int = 3): Unit = {
    val mDir = manifestDir(indexDir)
    if (VersionedTable.latestVersion(mDir).isEmpty) return
    VersionedTable.pruneVersions(mDir, keepManifests)
    val referenced = VersionedTable.listVersions(mDir).flatMap { v =>
      spark.read.parquet(s"$mDir/v=$v").filter(col("kind") === "seg")
        .select("seg_id").collect().map(_.getLong(0))
    }.toSet
    if (referenced.isEmpty) return
    // ids above the newest referenced one belong to an append/compact
    // whose manifest flip hasn't landed (or a crashed one the next
    // append will skip past) — never touch those
    val maxRef = referenced.max
    Seq(segDataRoot(indexDir), docMetaRoot(indexDir)).foreach { root =>
      listSegDirsUnder(root)
        .filter(s => s < maxRef && !referenced(s))
        .foreach { s =>
          VersionedTable.deleteRecursively(
            java.nio.file.Paths.get(root, s"seg=$s"))
        }
    }
  }

  /** Fold all live postings into one fresh segment and clear the
    * tombstones (Solr/Lucene merge): bounds the segment count and the
    * anti-join side. Superseded segment directories stay on disk for
    * manifest-version rollback. Returns the new segment id. */
  def compact(spark: SparkSession, indexDir: String): Long = {
    val manifest = readManifest(spark, indexDir).getOrElse(
      throw new IllegalStateException(s"no segmented index at $indexDir"))
    val segRows = manifest.filter(col("kind") === "seg")
      .select("seg_id", "n_buckets").collect()
    val segs = segRows.map(_.getLong(0)).toSeq
    val nbs = segRows.map(_.getInt(1)).distinct
    require(nbs.length == 1,
      s"segments disagree on n_buckets (${nbs.mkString(",")}) at $indexDir")
    val nBuckets = nbs.head
    val segId = (segs ++ listSegDirs(indexDir)).max + 1
    val tombs = manifest.filter(col("kind") === "tomb")
      .select(col("doc_id").as("t_doc"), col("before_seg"))
    val live = readSegs(spark, segDataRoot(indexDir), segs)
      .join(tombs,
        col("doc_id") === col("t_doc") && col("seg") < col("before_seg"),
        "left_anti")
      .select("doc_id", "dl", "tok", "tf", "tok_bucket")
    live.write.mode("errorifexists").partitionBy("tok_bucket")
      .parquet(s"${segDataRoot(indexDir)}/seg=$segId")
    val dm = spark.read.parquet(s"${segDataRoot(indexDir)}/seg=$segId")
      .select(col("doc_id"), col("dl")).distinct()
      .withColumn("doc_bucket", docBucket)
    dm.write.mode("errorifexists").partitionBy("doc_bucket")
      .parquet(s"${docMetaRoot(indexDir)}/seg=$segId")
    val st = spark.read.parquet(s"${docMetaRoot(indexDir)}/seg=$segId")
      .agg(count(lit(1)), sum("dl")).head()
    val segRow = spark.createDataFrame(java.util.Arrays.asList(
      Row("seg", segId, st.getLong(0), st.getAs[Long](1), nBuckets,
        null, null, null)), manifestSchema)
    VersionedTable.write(segRow, manifestDir(indexDir))
    segId
  }
}
