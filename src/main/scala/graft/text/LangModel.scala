package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring — the CCNet-style
  * perplexity filter: score every document by the average log
  * probability its own corpus's bigram statistics assign to it
  * (low = boilerplate-ish/unnatural token streams, high = typical).
  * perplexity = exp(−avg_logprob); the monotone avg_logprob itself is
  * emitted so no transcendental sits on the comparison path.
  *
  * The model and the scoring pass are ONE plan: bigram occurrences
  * carry their own corpus counts via two count-windows (partition by
  * bigram, partition by first token) — the d10 trick, so there is no
  * vocabulary-sized model table to join or broadcast, and the only
  * shuffles are the two count-window exchanges plus the per-doc
  * reduction. At 100 TB the bigram key space is huge but uniform
  * (the windows are counts, not collects); a trained external model
  * would swap in as an equi-join on the same bigram key.
  *
  * Determinism: each bigram's ln(c12/c1) is quantized to a long at
  * 1e-6 before the per-document sum (exact integer aggregation,
  * order-independent — the x7 technique), so the score replays
  * bit-identically in SQL.
  */
object LangModel {

  /** Consecutive token pairs ("w1 w2"), non-distinct, in document
    * order. Since r15 this is the codegen [[graft.plans.TokenGrams]]
    * expression with k=2 over the gram family's SHARED tokenizer
    * (ShingleHash.tokens) — one tokenization codepath for hashed and
    * string grams, no ScalaUDF boundary on ta11's input stage.
    * Mirrors the oracle's
    * list_transform(range(1, len), i -> concat(tks[i],' ',tks[i+1])).
    * [[bigramStrings]] stays as the sequential reference the parity
    * spec (TokenGramsSpec) replays. */
  private val wsPattern = java.util.regex.Pattern.compile("\\s+")
  private[graft] def bigramStrings(text: String): Array[String] = {
    val tks = wsPattern.split(text.toLowerCase.trim)
    if (tks.length < 2) Array.empty
    else Array.tabulate(tks.length - 1)(i => tks(i) + " " + tks(i + 1))
  }
  def bigrams(text: Column): Column =
    graft.plans.TokenGrams.tokenGrams(text, 2)

  /** (doc_id, n_bigrams, avg_logprob) for every document with at
    * least one bigram. avg_logprob = Σ ln(C(w1,w2)/C(w1·)) / n,
    * where C(w1·) counts w1's occurrences as a bigram start — so
    * probabilities are properly conditional and sum to 1 per w1. */
  def bigramLogProb(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val bg = docs.select(idCol.as("doc_id"), explode(bigrams(textCol)).as("bg"))
      .withColumn("w1", split_part(col("bg"), lit(" "), lit(1)))
    val counted = bg
      .withColumn("c12", count(lit(1)).over(Window.partitionBy("bg")))
      .withColumn("c1", count(lit(1)).over(Window.partitionBy("w1")))
    counted
      .select(col("doc_id"),
        round(log(col("c12") / col("c1")) * 1e6).cast("long").as("lp_q"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp_q").as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("s") / (col("n_bigrams") * lit(1000000.0)), 4).as("avg_logprob"))
  }
}
