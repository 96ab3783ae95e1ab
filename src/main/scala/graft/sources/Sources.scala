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
}
