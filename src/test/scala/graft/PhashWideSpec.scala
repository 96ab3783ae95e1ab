package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r14 verdict's item 6: the "widen the HASH, not the blocking"
  * 100-TB knob is now code (`blockHash(payload, bits)` +
  * `phashNearDupPairsWide`), not a scaladoc promise. These pins:
  * 60-bit word parity with the oracled blockHash60, pigeonhole
  * EXACTNESS of the wide banded join against brute force at 120-bit
  * (completeness and soundness — same pairs, same hamming), and the
  * m5 planted-pair recall replayed at 120-bit. */
class PhashWideSpec extends AnyFunSuite {
  import TestSession._

  test("blockHash(p, 60) word 0 is bit-identical to blockHash60; words stay in [0, 2^60)") {
    val h = Tables.documents(spark, sf).select(
      Multimodal.blockHash60(col("text").cast("binary")).as("h60"),
      element_at(Multimodal.blockHash(col("text").cast("binary"), 60), 1).as("hw"))
    assert(h.filter(col("h60") =!= col("hw")).count() == 0,
      "60-bit wide word drifts from blockHash60")
    val words = Tables.documents(spark, sf).select(
      explode(Multimodal.blockHash(col("text").cast("binary"), 120)).as("w"))
    assert(words.filter(col("w") < 0L || col("w") >= (1L << 60)).count() == 0,
      "wide words must stay positive 60-bit")
  }

  test("120-bit banded join equals brute-force hamming pairs (pigeonhole exactness)") {
    val hashed = Tables.documents(spark, sf).filter(col("doc_id") < 200)
      .select(col("doc_id").as("id"),
        Multimodal.blockHash(col("text").cast("binary"), 120).as("ph"))
      .localCheckpoint(true)
    def hamming(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
        lit(0), (s, v) => s + v).cast("int")
    val got = Multimodal.phashNearDupPairsWide(hashed, "id", "ph", 120, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = hashed.as("a").join(hashed.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        hamming(col("a.ph"), col("b.ph")).as("hm"))
      .filter(col("hm") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute,
      s"wide band drift: missing ${brute -- got}, extra ${got -- brute}")
  }

  test("chunk values spanning word boundaries reassemble correctly (bits=120, maxHamming=4)") {
    // 120 bits / 5 chunks = 24-bit chunks: chunk 2 covers bits
    // 48..71, straddling the word-0/word-1 boundary — the two-shift
    // reassembly path
    val hashed = Tables.documents(spark, sf).filter(col("doc_id") < 120)
      .select(col("doc_id").as("id"),
        Multimodal.blockHash(col("text").cast("binary"), 120).as("ph"))
      .localCheckpoint(true)
    val chunks = hashed
      .select(col("id"), col("ph"), posexplode(array((0 until 5).map { c =>
        // reference: bit-by-bit reassembly from the word array
        (0 until 24).map { b =>
          val j = c * 24 + b
          shiftrightunsigned(element_at(col("ph"), j / 60 + 1), j % 60)
            .bitwiseAND(lit(1L)) * lit(1L << b)
        }.reduce(_ + _)
      }: _*)).as(Seq("ci", "ref")))
    val wide = Multimodal.phashChunksWide(hashed, "id", "ph", 120, 4)
      .withColumnRenamed("chunk_idx", "ci")
    val joined = chunks.join(wide, Seq("id", "ci"))
      .filter(col("ref") =!= col("chunk_val"))
    assert(joined.count() == 0, "cross-word chunk reassembly drift")
  }

  test("m5 recall replayed at 120-bit: every planted one-byte perturbation found") {
    val docs = Tables.documents(spark, sf).filter(col("n_chars") >= 64)
    val base = docs.select(col("doc_id").as("id"), col("text"))
    val planted = docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 1000000L).as("id"),
        concat(substring(col("text"), 1, 7), lit("q"),
          expr("substring(text, 9)")).as("text"))
    val hashed = base.unionByName(planted)
      .select(col("id"), Multimodal.blockHash(col("text").cast("binary"), 120).as("ph"))
    val pairs = Multimodal.phashNearDupPairsWide(hashed, "id", "ph", 120, 5)
      .filter(col("b_id") >= 1000000L && col("a_id") === col("b_id") - 1000000L)
    val expected = docs.filter(col("doc_id") < 50).count()
    assert(pairs.count() == expected,
      s"expected $expected planted pairs at 120-bit, found ${pairs.count()}")
    assert(pairs.filter(col("hamming") > 5).count() == 0)
  }
}
