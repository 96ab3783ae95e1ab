package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative per-record transformation (reference: transform.py).
  *
  * The reference shells out to Saxon to run an XSLT crosswalk over
  * every record of every file, carrying `airflow-record-id` through
  * (transform.py:20-76). An XSLT crosswalk *declares* output fields
  * as expressions over input fields — in Spark that is a `select` of
  * named Columns: fully codegen'd, map-only, no per-record process
  * spawn (the reference forks a JVM per record — the single biggest
  * scale win of the re-expression).
  */
object Transform {

  /** Apply a crosswalk: ordered (outputName -> expression) pairs.
    * The record id should be one of the mappings, mirroring how the
    * reference stamps `airflow-record-id` on every result. */
  def crosswalk(df: DataFrame, mapping: Seq[(String, Column)]): DataFrame =
    df.select(mapping.map { case (name, expr) => expr.as(name) }: _*)

  /** Text normalization used before hashing/dedup: lowercase,
    * collapse whitespace, trim. Matches the oracle formula
    * `trim(regexp_replace(lower(x),'\s+',' ','g'))`. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))
}
