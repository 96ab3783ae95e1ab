package graft.dedup

import graft.Tables
import graft.functions.Hashing
import graft.operators.Transform
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline.
  *
  * Scale posture (SURVEY.md §4): every near-dup operator is
  * structured as candidate-generation (blocking or LSH banding,
  * bounded output) followed by exact verification on candidates
  * only. The full O(n²) cross join never materializes; the only
  * all-pairs work happens *within* blocks/buckets whose size is
  * controlled by the blocking key.
  */
object Dedup {

  /** Test-corpus augmentation: every document plus (a) a near-copy
    * with the first 20 characters removed (doc_id + 1000000, an
    * "edited near-dup") and (b) an exact copy (doc_id + 2000000).
    * Planted positives for every dedup flavor; the derivation is
    * mirrored verbatim in the oracle SQL. */
  val NearOffset = 1000000L
  val ExactOffset = 2000000L
  def augmentedDocs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select("doc_id", "text", "lang", "n_chars")
    d.unionByName(d.select(
        (col("doc_id") + NearOffset).as("doc_id"),
        substring(col("text"), 21, Int.MaxValue).as("text"),
        col("lang"),
        length(substring(col("text"), 21, Int.MaxValue)).as("n_chars")))
      .unionByName(d.select(
        (col("doc_id") + ExactOffset).as("doc_id"),
        col("text"), col("lang"), col("n_chars")))
  }

  /** Exact dedup: group on md5(text), never on raw text — the
    * shuffle key is 16 bytes regardless of document size, so this
    * holds at 100 TB (the standard hash-first trick). */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))

  /** Distinct 3-token shingles of normalized text. */
  def shingles(text: Column): Column = {
    val tks = split(trim(Transform.normalizeText(text)), "\\s+")
    val idx = sequence(lit(0), greatest(size(tks) - 3, lit(0)))
    array_distinct(transform(idx, i =>
      concat_ws(" ",
        try_element_at(tks, i + 1), try_element_at(tks, i + 2), try_element_at(tks, i + 3))))
  }

  /** docs → (doc_id, lang, n_chars, sh) with shingle sets attached. */
  def withShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("n_chars"),
      shingles(col("text")).as("sh"))

  def jaccard4(a: Column, b: Column): Column =
    round(size(array_intersect(a, b)) / size(array_union(a, b)).cast("double"), 4)

  /** Blocked n-gram Jaccard: candidates share a language and sit
    * within `charWindow` characters of each other; each candidate
    * pair gets an exact Jaccard, thresholded on the rounded value.
    * This is the *verified-naive* baseline; minhashLsh below is the
    * scale path (blocking by lang still admits O(block²) pairs). */
  def ngramJaccard(docs: DataFrame, threshold: Double, charWindow: Int): DataFrame = {
    val s = withShingles(docs)
    val a = s.select(col("doc_id").as("a_id"), col("lang").as("a_lang"),
      col("n_chars").as("a_n"), col("sh").as("a_sh"))
    val b = s.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
      col("n_chars").as("b_n"), col("sh").as("b_sh"))
    a.join(b, col("a_lang") === col("b_lang") && col("a_id") < col("b_id")
        && abs(col("a_n") - col("b_n")) <= charWindow)
      .select(col("a_id"), col("b_id"), jaccard4(col("a_sh"), col("b_sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signature: k independent 32-bit hashes, each the min
    * over the document's shingles. One explode + one shuffle on
    * doc_id (map-side partial min), signature width k*8 bytes. */
  def minhashSignatures(docs: DataFrame, k: Int): DataFrame = {
    val exploded = withShingles(docs)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
    val mins = (0 until k).map(i => min(Hashing.h32(i, col("shingle"))).as(s"m$i"))
    exploded.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH banding: k hashes in `bands` bands of k/bands
    * rows. Docs sharing any band value become candidates; candidates
    * are verified with exact Jaccard. The shuffle key is
    * (band, band-value) — collision probability for true jaccard j
    * is 1-(1-j^r)^b, so the bucket join only sees near-dups and
    * hash-collision noise, never all pairs. */
  def minhashLsh(docs: DataFrame, k: Int, bands: Int,
      threshold: Double): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val r = k / bands
    val sig = minhashSignatures(docs, k)
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until r).map(i => col(s"m${b * r + i}").cast("string"))
      struct(lit(b).as("band"), concat_ws("_", parts: _*).as("bv"))
    }
    val banded = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bv").as("bv"))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val s = withShingles(docs)
    cands
      .join(s.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(s.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .select(col("a_id"), col("b_id"), jaccard4(col("a_sh"), col("b_sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding near-dup pairs: block on a coarse cluster key (here
    * the label column, playing the IVF-centroid role), exact cosine
    * within blocks, threshold on the rounded value. */
  def embeddingCosinePairs(embeddings: DataFrame, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val e = embeddings.select(col("vec_id"), col(blockCol).as("block"),
      graft.functions.Vectors.toDouble(col(vecCol)).as("v"))
    val a = e.select(col("vec_id").as("a_id"), col("block").as("a_block"), col("v").as("a_v"))
    val b = e.select(col("vec_id").as("b_id"), col("block").as("b_block"), col("v").as("b_v"))
    a.join(b, col("a_block") === col("b_block") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        graft.functions.Vectors.cosine4(col("a_v"), col("b_v")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
