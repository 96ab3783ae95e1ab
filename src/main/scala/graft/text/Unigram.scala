package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (the SentencePiece unigram model,
  * Kudo 2018) — the OTHER tokenizer-training twin next to [[Bpe]]:
  * where BPE grows a vocabulary bottom-up by merging, unigram starts
  * from a large seed of candidate pieces and shrinks it by
  * EM-reestimating piece usage under maximum-likelihood Viterbi
  * segmentation.
  *
  * Scale split (the Bpe contract): the only corpus-sized stage is
  * the word-frequency aggregation the caller runs once
  * ([[Bpe.wordCounts]] — one shuffle). Seeding, every EM round, and
  * pruning all operate on the DISTINCT-WORD table (vocab-sized,
  * never the corpus): per round one map-only segmentation pass with
  * the (bounded, ≤ vocabSize) piece table in the UDF closure, one
  * piece-keyed aggregate, one driver-side prune of a
  * vocabSize-bounded list. Corpus-scale encoding is the same
  * map-only broadcast shape as [[Bpe.encodeCorpus]].
  *
  * Determinism — EXACT-INTEGER Viterbi: the model's segmentation
  * objective max Π c(pieceᵢ)/T (T = Σ counts) is compared WITHOUT
  * floats — candidate values c₁/Tⁿ¹ vs c₂/Tⁿ² cross-multiply to the
  * BigInt comparison c₁·Tⁿ² vs c₂·Tⁿ¹, so there is no
  * log-sum rounding to break ties differently across JVMs or runs
  * (the CLAUDE.md float-boundary rule applied to a tokenizer). Value
  * ties break on fewer pieces, then on the longer last piece —
  * structural, total, replayable. UnigramSpec pins the distributed
  * loop round-for-round against a sequential in-memory reference,
  * exactly the BpeSpec contract. */
object Unigram {

  /** Piece table: counts plus their total. Chars absent from the
    * table segment as count-1 fallbacks, so every word is always
    * segmentable. */
  final case class Vocab(counts: Map[String, Long], total: Long) {
    def pieceLenMax: Int =
      if (counts.isEmpty) 1 else counts.keysIterator.map(_.length).max
  }

  /** Exact-integer Viterbi segmentation of one word under `vocab`.
    * DP over prefix states (prod: BigInt, n: pieces); prefix order
    * is preserved by suffix multiplication, so optimal substructure
    * holds for the cross-multiplied comparison. */
  def encodeWord(word: String, vocab: Vocab): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val t = BigInt(math.max(vocab.total, 1L))
    val maxL = math.max(vocab.pieceLenMax, 1)
    val len = word.length
    // best(i): value of best segmentation of word[0, i)
    val prod = new Array[BigInt](len + 1)
    val nPieces = new Array[Int](len + 1)
    val back = new Array[Int](len + 1) // start index of last piece
    prod(0) = BigInt(1); nPieces(0) = 0
    var i = 1
    while (i <= len) {
      var bestProd: BigInt = null
      var bestN = 0
      var bestStart = -1
      var s = math.max(0, i - maxL)
      while (s < i) {
        if (prod(s) != null) {
          val piece = word.substring(s, i)
          val c = vocab.counts.getOrElse(piece,
            if (piece.length == 1) 1L else 0L)
          if (c > 0L) {
            val p = prod(s) * c
            val n = nPieces(s) + 1
            // candidate value p/Tⁿ vs incumbent bestProd/Tᵇᵉˢᵗᴺ
            val take =
              if (bestProd == null) true
              else {
                val lhs = p * t.pow(bestN)
                val rhs = bestProd * t.pow(n)
                if (lhs != rhs) lhs > rhs
                else if (n != bestN) n < bestN
                // same value, same piece count: longer last piece
                else s < bestStart
              }
            if (take) { bestProd = p; bestN = n; bestStart = s }
          }
        }
        s += 1
      }
      prod(i) = bestProd; nPieces(i) = bestN; back(i) = bestStart
      i += 1
    }
    // reconstruct (prod(len) is non-null: single chars always score)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var e = len
    while (e > 0) { val s = back(e); out += word.substring(s, e); e = s }
    out.reverseIterator.toSeq
  }

  /** Candidate seed: every substring of every distinct word up to
    * `maxPieceLen` chars (each occurrence counted, weighted by word
    * frequency), pruned to the `maxSeed` heaviest multi-char pieces
    * (count desc, piece asc — total order) plus ALL single chars.
    * Vocab-table-sized fan-out: O(|word|·maxPieceLen) per DISTINCT
    * word, never per corpus token. */
  def seedVocab(words: DataFrame, maxPieceLen: Int, maxSeed: Int): Vocab = {
    val subUdf = udf { (w: String, maxL: Int) =>
      val out = Array.newBuilder[String]
      var i = 0
      while (i < w.length) {
        var j = i + 1
        while (j <= math.min(i + maxL, w.length)) {
          out += w.substring(i, j); j += 1
        }
        i += 1
      }
      out.result()
    }
    val counts = words
      .select(explode(subUdf(col("word"), lit(maxPieceLen))).as("piece"),
        col("n"))
      .groupBy("piece").agg(sum("n").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    prune(counts.toMap, maxSeed)
  }

  /** One hard-EM round: Viterbi-segment every distinct word under
    * the current piece table (map-only, table in the closure),
    * re-estimate piece counts weighted by word frequency (one
    * piece-keyed aggregate). */
  def emRound(words: DataFrame, vocab: Vocab): Map[String, Long] = {
    val v = vocab // stable local for the closure
    val segUdf = udf((w: String) => encodeWord(w, v).toArray)
    words.select(explode(segUdf(col("word"))).as("piece"), col("n"))
      .groupBy("piece").agg(sum("n").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Keep ALL single chars (the segmentability floor — a char never
    * chosen by Viterbi keeps count 1 so its fallback probability
    * stays defined) plus the `vocabSize` heaviest multi-char pieces
    * by (count desc, piece asc). */
  def prune(counts: Map[String, Long], vocabSize: Int): Vocab = {
    val chars = counts.filter(_._1.length == 1)
      .map { case (p, c) => p -> math.max(c, 1L) }
    val multi = counts.filter { case (p, c) => p.length > 1 && c > 0 }
      .toSeq.sortBy { case (p, c) => (-c, p) }
      .take(math.max(vocabSize - chars.size, 0))
    val kept = chars ++ multi
    Vocab(kept, kept.valuesIterator.sum)
  }

  /** Seed → `rounds` × (EM re-estimate → prune to `vocabSize`).
    * Deterministic end to end: integer counts, total-order prunes,
    * exact-integer Viterbi. */
  def train(words: DataFrame, vocabSize: Int, rounds: Int = 2,
      maxPieceLen: Int = 6, maxSeed: Int = 2000): Vocab = {
    var v = seedVocab(words, maxPieceLen, maxSeed)
    var r = 0
    while (r < rounds) {
      v = prune(emRound(words, v), vocabSize)
      r += 1
    }
    v
  }

  /** Corpus-scale encoding: the bounded piece table rides the UDF
    * closure, every document encodes in ONE map-only pass; words
    * join with the explicit separator `"␠"` so the stream is
    * LOSSLESS (the Bpe.encodeCorpus contract — split on the
    * separator, concat subwords, rejoin with spaces = normalized
    * text). Output: (id, tokens, n_tokens).
    *
    * THE one deliberately-UDF corpus stage in the repo (r16 verdict
    * note): Viterbi decoding over the broadcast piece table is a
    * per-word dynamic program — not expressible as Columns/HOFs, and
    * a native Expression would buy nothing (the cost IS the DP, not
    * the ScalaUDF boundary; one converter crossing per document,
    * amortized over the whole token stream). Do NOT "fix" this in a
    * UDF sweep. The surface is ScalaTest-only (no driver oracle), and
    * [[emRound]]'s segUdf is the same trade over DISTINCT WORDS —
    * strictly smaller than any corpus pass. */
  def encodeCorpus(docs: DataFrame, idCol: Column, textCol: Column,
      vocab: Vocab): DataFrame = {
    val v = vocab
    val enc = udf { (text: String) =>
      // the separator char is STRIPPED during word normalization:
      // a corpus word containing the literal '␠' would otherwise
      // decode ambiguously (split-on-separator can't tell word
      // boundary from word content) — losslessness is over the
      // separator-free normalized text
      val ws = text.trim.toLowerCase.split("\\s+").iterator
        .map(_.replace("␠", "")).filter(_.nonEmpty).toArray
      val out = Seq.newBuilder[String]
      var first = true
      ws.foreach { w =>
        if (!first) out += "␠"
        first = false
        out ++= encodeWord(w, v)
      }
      out.result()
    }
    docs.select(idCol.as("id"), enc(textCol).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }
}
