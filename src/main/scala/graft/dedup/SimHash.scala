package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** 64-bit SimHash near-duplicate detection.
  *
  * SimHash folds a document's shingle set into one 64-bit signature
  * whose Hamming distance approximates set dissimilarity. The fold
  * (per-bit vote counting) is not expressible as a flat Column
  * formula, so it is a custom typed `Aggregator` — a single-pass,
  * map-side-combining aggregate with a 64-int buffer (256 B/group),
  * exactly the shape Spark distributes well at 100 TB.
  */
object SimHash {

  /** 64-bit shingle hash: first 16 hex chars of md5, parsed unsigned.
    * JVM-side, matching graft.functions.Hashing's md5 convention. */
  private def h64(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s.getBytes("UTF-8")).take(8)
    java.nio.ByteBuffer.wrap(hex).getLong
  }

  /** Aggregator: shingle strings in, per-bit ±1 votes, signed
    * majority sign-vector out as a packed Long. */
  private object SimHashAgg extends Aggregator[String, Array[Int], Long] {
    def zero: Array[Int] = new Array[Int](64)
    def reduce(buf: Array[Int], shingle: String): Array[Int] = {
      val h = h64(shingle)
      var j = 0
      while (j < 64) {
        buf(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      buf
    }
    def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var j = 0
      while (j < 64) { a(j) += b(j); j += 1 }
      a
    }
    def finish(buf: Array[Int]): Long = {
      var out = 0L
      var j = 0
      while (j < 64) {
        if (buf(j) > 0) out |= (1L << j)
        j += 1
      }
      out
    }
    def bufferEncoder: Encoder[Array[Int]] = implicitly(Encoders.javaSerialization[Array[Int]])
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column form of the aggregator, usable in groupBy().agg(). */
  def simhashAgg(shingle: Column): Column = udaf(SimHashAgg).apply(shingle)

  /** doc_id -> 64-bit simhash over its shingle set. One explode, one
    * shuffle on doc_id with map-side partial aggregation. */
  def signatures(docs: DataFrame): DataFrame =
    Dedup.withShingles(docs)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .groupBy("doc_id")
      .agg(simhashAgg(col("shingle")).as("simhash"))

  /** Near-dup pairs: Hamming distance of signatures within blocks.
    * At scale, block on signature bytes (each 16-bit chunk equal in
    * at least one position for hamming<=k — pigeonhole) instead of a
    * metadata block; here the lang block mirrors ngramJaccard. */
  def nearDupPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sig = signatures(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val a = sig.select(col("doc_id").as("a_id"), col("simhash").as("a_sig"),
      col("lang").as("a_lang"))
    val b = sig.select(col("doc_id").as("b_id"), col("simhash").as("b_sig"),
      col("lang").as("b_lang"))
    a.join(b, col("a_lang") === col("b_lang") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
