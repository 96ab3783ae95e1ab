package graft

import graft.text.Bpe
import org.scalatest.funsuite.AnyFunSuite

/** BPE training contract: the distributed merge loop must produce
  * EXACTLY the merge sequence of a sequential reference
  * implementation (same count-desc, (a,b)-lexicographic tie-break),
  * and encoding must re-apply merges consistently. */
class BpeSpec extends AnyFunSuite {
  import TestSession._

  /** Sequential reference: classic in-memory BPE over word counts. */
  private def referenceTrain(words: Map[String, Long],
      nMerges: Int): Seq[(String, String)] = {
    var syms: Map[Vector[String], Long] =
      words.map { case (w, n) => w.map(_.toString).toVector -> n }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (s, n) =>
        s.zip(s.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + n)
      }
      if (counts.isEmpty) done = true
      else {
        val (a, b) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += ((a, b))
        syms = syms.map { case (s, n) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < s.length) {
            if (j + 1 < s.length && s(j) == a && s(j + 1) == b) {
              out += (a + b); j += 2
            } else { out += s(j); j += 1 }
          }
          out.result() -> n
        }.groupMapReduce(_._1)(_._2)(_ + _)
        i += 1
      }
    }
    merges.toSeq
  }

  test("distributed BPE training equals the sequential reference merge-for-merge") {
    val wc = Bpe.wordCounts(Tables.documents(spark, sf), "text")
      .localCheckpoint(true)
    val inMem = wc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Bpe.train(wc, nMerges = 20)
    val want = referenceTrain(inMem, nMerges = 20)
    assert(got == want, s"merge sequences diverged:\n got=$got\nwant=$want")
    assert(got.size == 20, "corpus is rich enough for 20 merges")
    // determinism across runs
    assert(Bpe.train(wc, nMerges = 20) == got)
  }

  test("encoding round-trips and compresses frequent words") {
    val wc = Bpe.wordCounts(Tables.documents(spark, sf), "text")
      .localCheckpoint(true)
    val merges = Bpe.train(wc, nMerges = 30)
    val words = wc.orderBy(org.apache.spark.sql.functions.col("n").desc)
      .limit(10).collect().map(_.getString(0))
    words.foreach { w =>
      val enc = Bpe.encodeWord(w, merges)
      assert(enc.mkString == w, s"lossless: $w -> $enc")
    }
    // the most frequent words end up as few symbols
    val avgLen = words.map(w => Bpe.encodeWord(w, merges).size.toDouble)
      .sum / words.length
    assert(avgLen < words.map(_.length.toDouble).sum / words.length,
      "BPE must compress the frequent words it was trained on")
  }
}
