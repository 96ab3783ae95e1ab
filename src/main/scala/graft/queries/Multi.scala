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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_meta" -> (m1BinaryMeta _))

  val oracleSql: Map[String, String] = Map(
    "m1_binary_meta" ->
      """SELECT doc_id,
           octet_length(CAST(text AS BLOB)) AS n_bytes,
           substr(text, 1, 4) AS magic,
           md5(text) AS content_md5
         FROM documents ORDER BY doc_id""")
}
