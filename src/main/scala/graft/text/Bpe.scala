package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE vocabulary training (Sennrich et al. 2016) — the tokenizer-
  * TRAINING side of the pipeline (ta1 counts tokens with a trained
  * tokenizer; this trains one from the corpus).
  *
  * Scale split: the only corpus-sized stage is the word-frequency
  * aggregation (one shuffle; at 100 TB this is a plain groupBy the
  * caller runs once — [[wordCounts]]). The merge loop then operates
  * on the WORD-FREQUENCY TABLE, whose size is the distinct-word
  * vocabulary — millions of rows at web scale, never the corpus —
  * so each of the `nMerges` iterations is one explode + one tiny
  * aggregate + one argmax, all on vocab-sized data. Merge choice is
  * deterministic: max total count, ties broken lexicographically on
  * (a, b) — the property the spec pins against a sequential
  * reference implementation.
  *
  * Per-round lineage is cut with an eager localCheckpoint (iterative
  * plan growth, the d8 lesson), and the adjacent-pair fold is an
  * interpreted HOF — acceptable here because it runs over the vocab
  * table, not the corpus (the CLAUDE.md hot-path rule's explicit
  * carve-out).
  */
object Bpe {

  /** Corpus → (word, n) frequency table: the one corpus-scale stage. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** One merge applied to a symbol array: left fold replacing every
    * adjacent (a, b) with the concatenation, left-to-right
    * (the standard BPE application order). */
  private def applyMerge(s: org.apache.spark.sql.Column, a: String, b: String) =
    aggregate(s,
      array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === a && x === b,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Train `nMerges` merges from a (word, n) table. Returns the
    * ordered merge list. Stops early when no pair repeats. */
  def train(words: DataFrame, nMerges: Int): Seq[(String, String)] = {
    var syms = words
      .select(split(col("word"), "").as("s"), col("n"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    var i = 0
    while (i < nMerges && !done) {
      val pairs = syms
        .select(col("n"), explode(arrays_zip(
          slice(col("s"), lit(1), size(col("s")) - 1),
          slice(col("s"), lit(2), size(col("s")) - 1))).as("p"))
        .select(col("p.0").as("a"), col("p.1").as("b"), col("n"))
      val best = pairs.groupBy("a", "b").agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        syms = syms.select(applyMerge(col("s"), a, b).as("s"), col("n"))
          .localCheckpoint(true)
        i += 1
      }
    }
    merges.toSeq
  }

  /** Corpus-scale encoding: the (small) trained merge list broadcasts
    * inside a UDF closure and every document encodes in ONE map-only
    * pass — no shuffle, no state; the corpus-sized work is
    * embarrassingly parallel, which is the whole point of separating
    * tokenizer TRAINING (vocab-table iterations) from APPLICATION.
    * Words are joined with the explicit separator token `"␠"` so the
    * token stream is LOSSLESS: split on the separator, concatenate
    * subwords per word, re-join with spaces = the normalized text
    * (ExportSpec's round-trip). Output: (id, tokens, n_tokens). */
  def encodeCorpus(docs: DataFrame, idCol: org.apache.spark.sql.Column,
      textCol: org.apache.spark.sql.Column,
      merges: Seq[(String, String)]): DataFrame = {
    val ms = merges // stable local for the closure
    val enc = udf { (text: String) =>
      // strip the separator char from word content (the Unigram
      // guard): a word containing the literal '␠' would decode
      // ambiguously — losslessness is over separator-free text
      val words = text.trim.toLowerCase.split("\\s+").iterator
        .map(_.replace("␠", "")).filter(_.nonEmpty).toArray
      val out = Seq.newBuilder[String]
      var first = true
      words.foreach { w =>
        if (!first) out += "␠"
        first = false
        out ++= encodeWord(w, ms)
      }
      out.result()
    }
    docs.select(idCol.as("id"), enc(textCol).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Driver-side single-word encoder with the SAME left-to-right
    * merge-application order as training — usable directly, or
    * wrapped in a UDF with the (small) merge list broadcast for
    * corpus-scale application (iterative merging is genuinely
    * inexpressible in Catalyst). */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var s: Vector[String] = word.map(_.toString).toVector
    merges.foreach { case (a, b) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += s(i); i += 1 }
      }
      s = out.result()
    }
    s
  }
}
