package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the driver-generated testdata star schema
  * (see TESTDATA.md). One parquet file per table under `dir`.
  *
  * All graft operators take DataFrames, so these helpers are the only
  * place that knows the on-disk layout. At cluster scale the same
  * loaders point at partitioned directories instead of single files —
  * nothing downstream changes.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet has shipped `ts` in two layouts over time:
    * TIMESTAMP(NANOS) (read as ns-epoch INT64 via the legacy conf) and,
    * since the r8 testdata refresh, plain timestamp[us] with no
    * timezone (Spark: TIMESTAMP_NTZ). Branch on the loaded dtype so
    * both keep working:
    *   - LongType → exact integer ns→µs division (`div`, not `/`:
    *     double division loses precision at ns-epoch magnitudes,
    *     ~2^60 > double's 53-bit mantissa), then timestamp_micros.
    *   - TIMESTAMP_NTZ → cast to the session TimestampType; the graft
    *     session is pinned to UTC (GraftSession), so the cast keeps
    *     the wall-clock values identical to what DuckDB reads natively
    *     from the same file.
    *   - TimestampType → already what downstream expects. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
