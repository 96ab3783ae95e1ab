package graft

import graft.text.{Bpe, Unigram}
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer training contract (the BpeSpec posture for
  * the second tokenizer family): the distributed EM loop must equal
  * a sequential in-memory reference round-for-round, the
  * exact-integer Viterbi must pick the maximum-likelihood
  * segmentation on a hand-computable fixture, and encoding must be
  * lossless + deterministic. */
class UnigramSpec extends AnyFunSuite {
  import TestSession._

  /** Sequential reference EM round over an in-memory word map —
    * same encodeWord, order-independent fold. */
  private def refEmRound(words: Map[String, Long],
      v: Unigram.Vocab): Map[String, Long] =
    words.toSeq.flatMap { case (w, n) =>
      Unigram.encodeWord(w, v).map(_ -> n)
    }.groupMapReduce(_._1)(_._2)(_ + _)

  /** Sequential reference seed: every substring occurrence up to
    * maxL, weighted by word count. */
  private def refSeed(words: Map[String, Long], maxL: Int,
      maxSeed: Int): Unigram.Vocab = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, n) =>
      for (i <- 0 until w.length;
           j <- (i + 1) to math.min(i + maxL, w.length)) {
        val p = w.substring(i, j)
        counts(p) = counts.getOrElse(p, 0L) + n
      }
    }
    Unigram.prune(counts.toMap, maxSeed)
  }

  test("Viterbi picks the max-likelihood segmentation on a hand-computed fixture") {
    // T = 15; value('abc') = 2/15 ≈ .133 beats 'ab'+'c' = 3/225 ≈ .013
    // and 'a'+'b'+'c' = 20/3375 ≈ .006 — the single piece must win
    val v = Unigram.Vocab(
      Map("a" -> 5L, "b" -> 4L, "c" -> 1L, "ab" -> 3L, "abc" -> 2L), 15L)
    assert(Unigram.encodeWord("abc", v) == Seq("abc"))
    // 'abab': 'ab','ab' = 9/225 = .04 beats 'a','b','a','b' =
    // 400/50625 ≈ .0079 and any mix
    assert(Unigram.encodeWord("abab", v) == Seq("ab", "ab"))
    // unknown chars fall back to count 1 and stay segmentable
    assert(Unigram.encodeWord("axc", v) == Seq("a", "x", "c"))
    assert(Unigram.encodeWord("", v).isEmpty)
  }

  test("distributed training equals the sequential reference round-for-round") {
    val wc = Bpe.wordCounts(Tables.documents(spark, sf), "text")
      .localCheckpoint(true)
    val inMem = wc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val seedD = Unigram.seedVocab(wc, maxPieceLen = 5, maxSeed = 500)
    val seedR = refSeed(inMem, maxL = 5, maxSeed = 500)
    assert(seedD == seedR, "seed vocab diverged from the reference")

    var vD = seedD; var vR = seedR
    (0 until 2).foreach { r =>
      vD = Unigram.prune(Unigram.emRound(wc, vD), 300)
      vR = Unigram.prune(refEmRound(inMem, vR), 300)
      assert(vD == vR, s"EM round $r diverged from the reference")
    }
    // the one-call wrapper reproduces the same loop
    assert(Unigram.train(wc, vocabSize = 300, rounds = 2,
      maxPieceLen = 5, maxSeed = 500) == vD)
    // determinism across runs
    assert(Unigram.train(wc, vocabSize = 300, rounds = 2,
      maxPieceLen = 5, maxSeed = 500) == vD)
  }

  test("prune keeps every char, bounds multi-char pieces, floors char counts") {
    val v = Unigram.prune(Map("a" -> 0L, "b" -> 7L, "ab" -> 5L,
      "bc" -> 4L, "cd" -> 3L, "de" -> 0L), vocabSize = 3)
    assert(v.counts.keySet == Set("a", "b", "ab"),
      "chars always kept; one multi slot left after 2 chars; zero-count multi dropped")
    assert(v.counts("a") == 1L, "never-used char floors at count 1")
    assert(v.total == 1L + 7L + 5L)
  }

  test("encoding is lossless and compresses frequent words; corpus pass agrees") {
    val wc = Bpe.wordCounts(Tables.documents(spark, sf), "text")
      .localCheckpoint(true)
    val v = Unigram.train(wc, vocabSize = 400, rounds = 2,
      maxPieceLen = 6, maxSeed = 1000)
    val top = wc.orderBy(org.apache.spark.sql.functions.col("n").desc)
      .limit(20).collect().map(_.getString(0))
    top.foreach { w =>
      assert(Unigram.encodeWord(w, v).mkString == w, s"lossless: $w")
    }
    val avgPieces = top.map(w => Unigram.encodeWord(w, v).size.toDouble)
      .sum / top.length
    assert(avgPieces < top.map(_.length.toDouble).sum / top.length,
      "unigram must compress the frequent words it trained on")

    // corpus-scale encode: per-word parity with the driver encoder +
    // separator losslessness (the ExportSpec round-trip shape)
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).limit(50)
    val enc = Unigram.encodeCorpus(docs, col("doc_id"), col("text"), v)
      .collect()
    val norm = docs.select(col("doc_id"),
      regexp_replace(trim(lower(col("text"))), "\\s+", " ").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    enc.foreach { r =>
      val id = r.getLong(0)
      val toks = r.getSeq[String](1)
      val words = toks.foldLeft(Vector("")) { (acc, t) =>
        if (t == "␠") acc :+ "" else acc.updated(acc.length - 1, acc.last + t)
      }
      assert(words.mkString(" ") == norm(id), s"corpus round-trip: doc $id")
    }
  }

  test("a corpus word containing the separator char still decodes losslessly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // '␠' INSIDE a word would make split-on-separator ambiguous; the
    // encoder strips it during word normalization, so the round-trip
    // target is the separator-free normalized text
    val docs = Seq((1L, "plain a␠b words"), (2L, "␠ only"), (3L, "x ␠␠ y"))
      .toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs, "text").localCheckpoint(true)
    val v = Unigram.train(wc, vocabSize = 50, rounds = 1,
      maxPieceLen = 4, maxSeed = 100)
    val enc = Unigram.encodeCorpus(docs, col("doc_id"), col("text"), v).collect()
    val expect = Map(1L -> "plain ab words", 2L -> "only", 3L -> "x y")
    enc.foreach { r =>
      val toks = r.getSeq[String](1)
      assert(!toks.exists(t => t != "␠" && t.contains("␠")),
        "no content token may carry the separator char")
      val words = toks.foldLeft(Vector("")) { (acc, t) =>
        if (t == "␠") acc :+ "" else acc.updated(acc.length - 1, acc.last + t)
      }
      assert(words.mkString(" ") == expect(r.getLong(0)),
        s"separator round-trip: doc ${r.getLong(0)}")
    }
  }
}
