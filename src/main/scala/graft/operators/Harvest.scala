package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Spark-native re-expression of the reference's OAI-PMH harvest
  * semantics (reference: harvest.py).
  *
  * The reference pulls a record stream from an OAI endpoint and, per
  * record: skips/flags deleted records, windows by from/until
  * datestamp, selects sets (include, or all-minus-excluded), batches
  * into files of `records_per_file`, and writes each batch to a
  * content-addressed key (md5). Here every step is a declarative,
  * map-only (or single-shuffle) transformation over a record
  * DataFrame, so the same pipeline runs unchanged over 100 TB of
  * harvested records.
  */
object Harvest {

  /** Flag deleted records instead of branch-per-record
    * (reference: harvest.py:185-208 `process_xml` splits the stream
    * into new-updated vs deleted collections). One scan, both sides:
    * downstream writers partition on the flag. Map-only, no shuffle. */
  def flagDeleted(df: DataFrame, statusCol: Column, deletedValue: Any): DataFrame =
    df.withColumn("is_deleted", statusCol === lit(deletedValue))

  /** Included-sets selection (reference: harvest.py:72-79): keep only
    * records whose set is in `sets`. An IN-filter pushes to the scan. */
  def includeSets(df: DataFrame, setCol: Column, sets: Seq[String]): DataFrame =
    df.filter(setCol.isInCollection(sets))

  /** Excluded-sets selection (reference: harvest.py:80-88): the
    * reference asks the endpoint for ListSets, subtracts `excluded`,
    * then harvests the remainder. Here: distinct sets from the data
    * (tiny; broadcast), minus excluded, semi-joined back. */
  def excludeSets(df: DataFrame, setCol: Column, excluded: Seq[String]): DataFrame = {
    val remaining = df.select(setCol.as("__set")).distinct()
      .filter(!col("__set").isInCollection(excluded))
    df.join(broadcast(remaining), setCol === col("__set"), "left_semi")
  }

  /** from/until datestamp window (reference: harvest.py:29-33
    * `harvest_params`). Range predicates push to the parquet scan and
    * prune partitions when the table is date-partitioned. */
  def dateWindow(df: DataFrame, tsCol: Column,
      from: Option[java.sql.Timestamp], until: Option[java.sql.Timestamp]): DataFrame = {
    val lo = from.map(tsCol >= lit(_)).getOrElse(lit(true))
    val hi = until.map(tsCol < lit(_)).getOrElse(lit(true))
    df.filter(lo && hi)
  }

  /** Missing-day detection per feed — the scheduler-gap audit (a
    * daily OAI harvest that silently skipped days should fail the
    * backfill check, not surface as a mysteriously thin corpus):
    * expected = the calendar between each feed's own first and last
    * day, missing = expected ANTI-JOIN present. The sequence explode
    * is calendar-bounded (days in span, never rows), and the present
    * set is the distinct (feed, day) frame — one groupBy regardless
    * of corpus size. */
  def missingDays(df: DataFrame, keyCol: Column, tsCol: Column): DataFrame = {
    val days = df.select(keyCol.as("key"), to_date(tsCol).as("d")).distinct()
    val spans = days.groupBy("key").agg(min("d").as("lo"), max("d").as("hi"))
    spans
      .select(col("key"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("d"))
      .join(days, Seq("key", "d"), "left_anti")
      .select(col("key"), col("d").as("missing_day"))
  }

  /** Incremental-harvest window planner — the from/until date slicing
    * the reference's scheduler side computes around every OAI run
    * (harvest.py's harvest_oai takes from/until bounds; the DAG
    * derives them from the last successful run), expressed as a
    * data-plane operator over per-feed state: each feed's
    * [lo, hi) resume span is cut into consecutive `widthDays`-day
    * [from, until) slices, the LAST slice clipped at hi (OAI
    * endpoints throttle long ranges — bounded windows are how a
    * re-harvest resumes politely and retries stay small). A feed
    * with an empty span still plans one zero-length window (the
    * "harvest today" run that discovers nothing new). All date/int
    * arithmetic — `ceil` via integer (span + w − 1) DIV w, so the
    * plan replays in any engine. Scale: the per-feed explode is
    * calendar-bounded (O(span/width) rows per feed), never
    * corpus-sized — the state frame IS the tiny side.
    *
    * BOUNDS CONTRACT: windows are HALF-OPEN [from, until) day slices
    * — window N's until_date equals window N+1's from_date, the
    * natural form for composing with [[dateWindow]]-style `>= from
    * AND < until` predicates. OAI-PMH itself treats BOTH from and
    * until as INCLUSIVE at datestamp granularity, so feeding these
    * columns verbatim to a ListRecords request double-harvests every
    * boundary day (and the zero-length from==until plan row requests
    * a full day). Convert with [[oaiInclusiveBounds]] before handing
    * a window to an OAI endpoint. */
  def harvestWindows(state: DataFrame, keyCol: Column, loCol: Column,
      hiCol: Column, widthDays: Int): DataFrame =
    state
      .select(keyCol.as("key"), loCol.as("lo"), hiCol.as("hi"))
      .withColumn("n_win",
        greatest(expr(s"(datediff(hi, lo) + $widthDays - 1) DIV $widthDays"),
          lit(1L)))
      .select(col("key"), col("lo"), col("hi"),
        posexplode(sequence(lit(0L), col("n_win") - 1)).as(Seq("i", "w")))
      .select(col("key"), col("i").cast("int").as("win_idx"),
        date_add(col("lo"), (col("w") * widthDays).cast("int"))
          .as("from_date"),
        least(date_add(col("lo"), ((col("w") + 1) * widthDays).cast("int")),
          col("hi")).as("until_date"))
      .withColumn("n_days",
        datediff(col("until_date"), col("from_date")).cast("long"))

  /** Convert a [[harvestWindows]] plan's half-open [from, until) day
    * slices to the INCLUSIVE [oai_from, oai_until] bounds OAI-PMH
    * ListRecords expects (both ends inclusive at datestamp
    * granularity — harvest.py:29-33 passes them verbatim into the
    * request): a non-empty window's oai_until is until_date minus one
    * day, so consecutive windows touch but never overlap (no
    * boundary-day double-harvest); the zero-length from==until
    * "harvest today" row maps to the single-day request
    * [from, from]. Map-only; original plan columns carried through. */
  def oaiInclusiveBounds(windows: DataFrame): DataFrame =
    windows
      .withColumn("oai_from", col("from_date"))
      .withColumn("oai_until",
        when(col("n_days") > 0, date_sub(col("until_date"), 1))
          .otherwise(col("from_date")))

  /** records_per_file batching (reference: harvest.py:185-208): the
    * reference counts records and cuts a new output file every
    * `recordsPerFile`. Here: deterministic file index per group via
    * row_number. NOTE scale posture: a global row_number per group is
    * a single-partition sort per group; at 100 TB use
    * per-partition ids + a cumsum of partition counts (same file
    * boundaries, fully parallel). The group-local window below is the
    * correctness spec. */
  def batchAssign(df: DataFrame, groupCols: Seq[Column], orderCol: Column,
      recordsPerFile: Int): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCol)
    df.withColumn("file_idx",
      floor((row_number().over(w) - lit(1)) / lit(recordsPerFile)).cast("long"))
  }

  /** The 100 TB form of batchAssign: instead of one global
    * row_number per group (a single sort partition per group — the
    * h5 correctness spec), rank within (group, hash-bucket of the
    * order column) and add per-bucket offsets from a tiny cumsum
    * table. The heavy shuffle key space is groups × `buckets`, so no
    * single group serializes; batch boundaries still hold exactly
    * `recordsPerFile` records per (group, file_idx). Buckets derive
    * from the data (hash of orderCol), not the physical layout —
    * spark_partition_id would differ between the rank branch and the
    * count branch of the plan. Same contract as batchAssign,
    * different (still deterministic) record-to-file tie-breaking. */
  def batchAssignScalable(df: DataFrame, groupCols: Seq[Column], orderCol: Column,
      recordsPerFile: Int, buckets: Int = 64): DataFrame = {
    val names = groupCols.map(_.toString)
    val withB = df.withColumn("__bkt", pmod(hash(orderCol), lit(buckets)))
    val wLocal = Window.partitionBy((groupCols :+ col("__bkt")): _*).orderBy(orderCol)
    val local = withB.withColumn("__lidx", row_number().over(wLocal) - lit(1))
    // per-(group, bucket) counts: tiny (groups × buckets rows)
    val counts = withB.groupBy((groupCols :+ col("__bkt")): _*)
      .agg(count(lit(1)).as("__cnt"))
    val wOff = Window.partitionBy(groupCols: _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.withColumn("__off",
      coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .drop("__cnt")
    local.join(broadcast(offsets), names :+ "__bkt")
      .withColumn("file_idx",
        floor((col("__off") + col("__lidx")) / recordsPerFile).cast("long"))
      .drop("__bkt", "__lidx", "__off")
  }

  /** md5 content-addressed output key (reference: harvest.py:253-261
    * `dag_write_string_to_s3` names each object md5(content) under a
    * `dag_id/timestamp` prefix). Codegen'd md5, map-only. */
  def contentKey(df: DataFrame, contentCol: Column, prefix: String): DataFrame =
    df.withColumn("s3_key", concat(lit(prefix), lit("/"), md5(contentCol.cast("binary"))))

  /** Stamp run provenance on every record (reference: harvest.py
    * OaiXml sets dag-id/dag-timestamp attributes on each output
    * collection, and every record carries airflow-record-id).
    * Columnar form: two constant columns the sink can partition or
    * audit by — free at scan time, pruned like any other column. */
  def stampRun(df: DataFrame, runId: String, timestamp: String): DataFrame =
    df.withColumn("run_id", lit(runId))
      .withColumn("run_ts", lit(timestamp))

  /** Latest record per identifier (OAI re-harvest semantics: a record
    * re-appears with a newer datestamp; the newest wins). Single
    * shuffle on the identifier. */
  def latestPerIdentifier(df: DataFrame, idCol: Column, tsCol: Column,
      tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(tsCol.desc, tieBreak.desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Incremental harvest diff: classify every record id as
    * added / changed / unchanged / deleted by comparing the current
    * snapshot's content hashes (h6's md5 keys) against the previous
    * run's. The data-plane form of an OAI incremental harvest
    * decision: only `added`+`changed` need re-transform/re-index
    * (they feed x4's upsert set), `deleted` feeds its delete set.
    * One full-outer equi-join on the record id — hashes are 16
    * bytes, so the shuffle carries (id, hash) pairs, never payloads;
    * at 100 TB this is the cheap pass that lets the expensive ones
    * touch only what moved. */
  def harvestDiff(current: DataFrame, previous: DataFrame): DataFrame =
    current.select(col("rec_id"), col("content_hash").as("cur_hash"))
      .join(previous.select(col("rec_id"), col("content_hash").as("prev_hash")),
        Seq("rec_id"), "full_outer")
      .select(col("rec_id"),
        when(col("prev_hash").isNull, "added")
          .when(col("cur_hash").isNull, "deleted")
          .when(col("cur_hash") === col("prev_hash"), "unchanged")
          .otherwise("changed").as("status"))
}
