package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface re-expressing the reference's I/O layer
  * (process.py: S3 get/list/put, CSV lookup fetch, tarball
  * expansion; harvest.py: prefix layout + records-per-file output).
  *
  * S3-object semantics map onto path-based DataFrame reads/writes:
  * `get_s3_content`/`list_s3_content` are a scan over a prefix glob,
  * `generate_s3_object` is a partitioned write, and the
  * `dag_id/timestamp/{new-updated,deleted}` key layout becomes a
  * partition column layout the scanner prunes on.
  */
object Sources {

  /** The boundwith lookup CSV (reference: harvest.py:203-236 reads a
    * child_id→parent_xml CSV once per run). Schema-checked CSV read;
    * the broadcast-join consumption side is Records.lookupEnrich. */
  def csvLookup(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** Prefix-layout batched sink (reference: harvest.py:185-208 cuts
    * output files every records_per_file and writes them under
    * new-updated/ vs deleted/ prefixes). `statusCol`/`fileIdxCol`
    * become partition columns: one directory per (status, batch),
    * scanner-prunable, no driver-side file bookkeeping. */
  def writeBatched(df: DataFrame, statusCol: String, fileIdxCol: String,
      outDir: String): Unit =
    df.write
      .partitionBy(statusCol, fileIdxCol)
      .mode("overwrite")
      .parquet(outDir)

  /** Read a prefix written by writeBatched, pruned to one status —
    * the read side of the new-updated/deleted split. */
  def readStatus(spark: SparkSession, dir: String, statusCol: String,
      status: Any): DataFrame =
    spark.read.parquet(dir).filter(col(statusCol) === lit(status))

  /** Quarantine ingest: malformed rows land in a quarantine frame
    * (raw record + source file) instead of failing the run — the
    * ingest-robustness behavior an unattended harvest needs
    * (reference analog: validate.py filters bad records into a
    * report rather than aborting). PERMISSIVE parsing keeps the scan
    * map-only; the split is two filters over one cached pass (Spark
    * requires the cache before filtering on the corrupt column).
    * Both sides are materialized eagerly (localCheckpoint) and the
    * intermediate cache is dropped before returning — repeated /
    * per-micro-batch calls leave no storage-memory residue behind
    * (checkpoint blocks are context-cleaned when the returned frames
    * go out of scope). For corpora too large to materialize, run a
    * DROPMALFORMED pass for the good side and diff counts instead.
    * Returns (good rows with the declared schema, quarantined rows
    * as (raw, source_file)). */
  def quarantineIngest(spark: SparkSession, path: String, schema: StructType,
      format: String = "csv"): (DataFrame, DataFrame) = {
    val corrupt = "_corrupt_record"
    val df = spark.read
      .schema(schema.add(corrupt, org.apache.spark.sql.types.StringType))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .format(format).load(path)
      // input_file_name must bind BEFORE the cache boundary — after
      // it the rows no longer carry scan-file lineage
      .withColumn("__source_file", input_file_name())
      .cache()
    try {
      val good = df.filter(col(corrupt).isNull).drop(corrupt, "__source_file")
        .localCheckpoint(true)
      val quarantined = df.filter(col(corrupt).isNotNull)
        .select(col(corrupt).as("raw"), col("__source_file").as("source_file"))
        .localCheckpoint(true)
      (good, quarantined)
    } finally df.unpersist(false)
  }

  /** JSONL shard export — the interchange format training corpora
    * actually ship as (one JSON object per line, one directory per
    * shard): every row serializes with `to_json` over all columns,
    * lands under `shard=<id>/` via the text writer's partitionBy (so
    * a consumer prunes shards at the path level exactly like the
    * parquet sinks), and a `_manifest` parquet alongside records per
    * shard row and byte totals — the completeness receipt a transfer
    * job checks before deleting the source. Deterministic overwrite;
    * read back with `spark.read.json(dir + "/shard=*")`. Payload
    * bytes stream straight from the executors to the files — nothing
    * collects, nothing extra shuffles beyond the caller's own shard
    * partitioning. */
  def writeJsonlShards(df: DataFrame, shardCol: String,
      outDir: String): Unit = {
    val lines = df.withColumn("__line",
      to_json(struct(df.columns.filter(_ != shardCol).map(col): _*)))
    lines.select(col(shardCol).as("shard"), col("__line"))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard")
      .text(s"$outDir/data")
    lines.groupBy(col(shardCol).as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        // octet_length, not length: to_json emits raw multi-byte
        // UTF-8, so character count under-bills every non-ASCII row
        // and the transfer job would delete a source it hasn't fully
        // copied. +1 per row: the newline the text writer appends.
        (sum(octet_length(col("__line")).cast("long")) + count(lit(1)))
          .as("n_bytes"))
      .write.mode("overwrite").parquet(s"$outDir/_manifest")
  }

  /** CSV report sink (reference: validate.py:77-99 writes the
    * invalid-record report with csv.DictWriter — header row, every
    * field quoted). The reference emits ONE artifact, so the default
    * coalesces to a single part file; pass coalesceTo = 0 to keep
    * the input partitioning for large reports. */
  def writeCsvReport(df: DataFrame, outDir: String, coalesceTo: Int = 1): Unit =
    (if (coalesceTo > 0) df.coalesce(coalesceTo) else df)
      .write.mode("overwrite")
      .option("header", "true")
      .option("quoteAll", "true")
      .option("escape", "\"")
      .csv(outDir)
}
