package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned table with atomic latest-pointer swap — the data-plane
  * form of the reference's collection/alias lifecycle
  * (solr_api_utils.py:14-60: build a fresh collection, then swap the
  * serving alias to it; readers never see a half-built collection).
  *
  * Layout: `<dir>/v=<N>/` parquet per version; `<dir>/_LATEST` holds
  * the serving version number and is replaced atomically (write
  * temp + ATOMIC_MOVE), so concurrent readers resolve either the old
  * or the new version, never a torn state. Old versions stay for
  * rollback — `swapTo` is the alias CRUD analog.
  */
object VersionedTable {

  private def pointerPath(dir: String) = Paths.get(dir, "_LATEST")

  def listVersions(dir: String): Seq[Long] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Seq.empty
    else d.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong).sorted
  }

  def latestVersion(dir: String): Option[Long] = {
    val p = pointerPath(dir)
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** Write `df` as the next version and atomically swap the pointer
    * to it. Returns the new version number.
    *
    * `tag` makes the write IDEMPOTENCE-CHECKABLE for replayed
    * writers: the tag lands in `v=N/_TAG` after the parquet completes
    * and before the swap, so [[taggedVersion]] finds a committed
    * version even if the writer crashed before the swap (a tagged
    * version always has complete data; a half-written version can
    * never carry a tag). This is what lets a non-idempotent merge
    * (e.g. VocabIndex's count accumulation) run exactly once under
    * the streaming `(lineage, batchId)` replay protocol. */
  def write(df: DataFrame, dir: String, tag: Option[String] = None): Long = {
    val next = listVersions(dir).lastOption.getOrElse(0L) + 1
    df.write.mode("errorifexists").parquet(s"$dir/v=$next")
    tag.foreach { t =>
      Files.writeString(Paths.get(dir, s"v=$next", "_TAG"), t); () }
    swapTo(dir, next)
    next
  }

  /** Newest version carrying `tag`, if any (committed data; the
    * pointer may still lag it if the writer crashed pre-swap). */
  def taggedVersion(dir: String, tag: String): Option[Long] =
    listVersions(dir).filter { v =>
      val p = Paths.get(dir, s"v=$v", "_TAG")
      Files.exists(p) && Files.readString(p).trim == tag
    }.maxOption

  /** Tag carried by the SERVING version, if any — what lets a live
    * reader know which inputs the version it is about to read
    * already folded in (the compaction-window dedup in
    * [[graft.similarity.Ivf.foldedSegIds]]). */
  def servingTag(dir: String): Option[String] =
    latestVersion(dir).flatMap { v =>
      val p = Paths.get(dir, s"v=$v", "_TAG")
      if (Files.exists(p)) Some(Files.readString(p).trim) else None
    }

  /** Like [[write]], but the version is laid out partitioned by
    * `partCol` — readers filtering on it prune whole directories
    * (the IVF index's probed-lists-only scan relies on this). `tag`
    * follows [[write]]'s contract: landed after the parquet
    * completes and before the pointer swap, so a tagged version is
    * committed data even when the swap was lost. */
  def writePartitioned(df: DataFrame, dir: String, partCol: String,
      tag: Option[String] = None): Long = {
    val next = listVersions(dir).lastOption.getOrElse(0L) + 1
    df.write.mode("errorifexists").partitionBy(partCol).parquet(s"$dir/v=$next")
    tag.foreach { t =>
      Files.writeString(Paths.get(dir, s"v=$next", "_TAG"), t); () }
    swapTo(dir, next)
    next
  }

  /** Point the alias at an existing version (swap / rollback). */
  def swapTo(dir: String, version: Long): Unit = {
    require(listVersions(dir).contains(version),
      s"version $version does not exist under $dir")
    val tmp = Paths.get(dir, s"_LATEST.tmp.${System.nanoTime()}")
    Files.writeString(tmp, version.toString)
    Files.move(tmp, pointerPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read through the alias: whatever version the pointer serves. */
  def readLatest(spark: SparkSession, dir: String): DataFrame = {
    val v = latestVersion(dir).getOrElse(
      throw new IllegalStateException(s"no serving version under $dir"))
    spark.read.parquet(s"$dir/v=$v")
  }

  /** Per-(dir, version) cache of SMALL versioned-table reads, served
    * as a local relation (r19, the metadata-read item of the r18
    * verdict — the x7 statsCache pattern generalized). For
    * metadata-class tables — IVF/PQ centroids and codebooks, segment
    * manifests, one-row stats — every probe re-ran a parquet scan job
    * (driver file listing + footer decode + a task wave) per query
    * execution even though a published version is IMMUTABLE by the
    * table contract. Caching the collected rows once per version and
    * rebuilding a LocalRelation per call removes that scan job from
    * every probe while keeping the serving semantics exactly:
    * `latestVersion` re-reads the pointer file on EVERY call, so a
    * compaction/publish flip — which always lands as a NEW version +
    * atomic pointer swap, never an in-place mutation — is seen by the
    * very next read (the versioned-consistency contract; spec-pinned).
    *
    * DRIVER-SAFETY: callers must only point this at tables bounded by
    * a design knob (list/codebook/manifest cardinality), never at
    * corpus-proportional tables — `maxRows` is the guard rail and the
    * call throws rather than silently collecting a corpus. The cached
    * rows are plain JVM data, shared across sessions; the returned
    * frame is bound to the calling session. Entries for superseded
    * versions of the same dir are dropped on insert, so a long-lived
    * maintainer holds O(live tables) rows, not O(history). */
  private val localCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long),
    (Seq[org.apache.spark.sql.Row], org.apache.spark.sql.types.StructType)]()

  def readLatestLocal(spark: SparkSession, dir: String,
      maxRows: Int = 1 << 20): DataFrame = {
    val v = latestVersion(dir).getOrElse(
      throw new IllegalStateException(s"no serving version under $dir"))
    val (rows, schema) = localCache.computeIfAbsent((dir, v), { _ =>
      val df = spark.read.parquet(s"$dir/v=$v")
      val collected = df.collect().toSeq
      require(collected.length <= maxRows,
        s"readLatestLocal($dir): ${collected.length} rows exceeds the " +
          s"metadata bound $maxRows — this table is not metadata-class; " +
          "read it with readLatest instead")
      (collected, df.schema)
    })
    // drop superseded versions of this dir (bounded memory)
    localCache.keySet.removeIf(k => k._1 == dir && k._2 < v)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  /** Bounded-history maintenance: delete all but the newest `keep`
    * versions, never the serving one — the cadence contract every
    * long-lived maintainer needs so a year of micro-batches can't
    * grow version dirs without limit. Safe to call at any batch
    * boundary: the serving version is exempt even if it is old (a
    * rolled-back pointer). */
  def pruneVersions(dir: String, keep: Int): Unit = {
    require(keep >= 1, "must keep at least one version")
    val serving = latestVersion(dir).getOrElse(-1L)
    listVersions(dir).sorted.dropRight(keep)
      .filter(_ != serving)
      .foreach { v => deleteRecursively(Paths.get(dir, s"v=$v")) }
  }

  /** Recursive delete (children before parents). */
  def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p)
      val paths = try walk.iterator().asScala.toSeq finally walk.close()
      paths.sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
    }
}
