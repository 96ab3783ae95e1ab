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
    * extracts). Map-side classify + one tiny groupBy. */
  def m2ModalityStats(spark: SparkSession, dir: String): DataFrame = {
    val mods = array(lit("text"), lit("image"), lit("audio"), lit("video"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))
      .withColumn("modality", element_at(mods,
        (pmod(graft.functions.Hashing.h32(23, col("doc_id").cast("string")),
          lit(4)) + 1).cast("int")))
      .groupBy("source", "modality")
      .agg(count(lit(1)).as("n_items"),
        sum(length(col("payload"))).as("total_bytes"),
        round(avg(length(col("payload"))), 2).as("avg_bytes"))
      .orderBy("source", "modality")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_meta" -> (m1BinaryMeta _),
    "m2_modality_stats" -> (m2ModalityStats _))

  val oracleSql: Map[String, String] = Map(
    "m1_binary_meta" ->
      """SELECT doc_id,
           octet_length(CAST(text AS BLOB)) AS n_bytes,
           substr(text, 1, 4) AS magic,
           md5(text) AS content_md5
         FROM documents ORDER BY doc_id""",
    "m2_modality_stats" ->
      """WITH m AS (
           SELECT source, octet_length(CAST(text AS BLOB)) AS nb,
             ['text', 'image', 'audio', 'video'][
               CAST(CAST(concat('0x', substr(md5(concat('23:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 4 AS INT) + 1] AS modality
           FROM documents)
         SELECT source, modality, count(*) AS n_items,
           CAST(sum(nb) AS BIGINT) AS total_bytes,
           round(avg(nb), 2) AS avg_bytes
         FROM m GROUP BY 1, 2 ORDER BY 1, 2""")
}
