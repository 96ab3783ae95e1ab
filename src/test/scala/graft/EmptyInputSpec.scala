package graft

import graft.dedup.Dedup
import graft.functions.Vectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empty-input contracts: a corpus slice with no rows (an empty
  * harvest window, a filter that matches nothing, a quiet
  * micro-batch) must yield empty RESULTS, never a crash — the
  * round-4 ADVICE NPE class (connectedComponents summed an empty
  * labels frame) pinned as a contract across the operator surface. */
class EmptyInputSpec extends AnyFunSuite {
  import TestSession._

  private def emptyDocs = Tables.documents(spark, sf)
    .select("doc_id", "text", "lang", "n_chars").filter(lit(false))

  test("connected components of an empty pair set is empty (the r4 ADVICE NPE)") {
    val pairs = emptyDocs.select(col("doc_id").as("a_id"),
      col("doc_id").as("b_id"))
    assert(Dedup.connectedComponents(pairs, "a_id", "b_id").count() == 0)
    assert(Dedup.connectedComponentsStar(pairs, "a_id", "b_id").count() == 0)
  }

  test("r5 search/multimodal/sketch ops yield empty results on an empty corpus") {
    import graft.operators.Indexing
    import graft.multimodal.Multimodal
    assert(Indexing.phraseSearch(emptyDocs, col("doc_id"), col("text"),
      Seq("table", "hash")).count() == 0)
    assert(Indexing.facetCounts(emptyDocs, lit(true), Seq("lang")).count() == 0)
    assert(Indexing.highlight(emptyDocs, col("doc_id"), col("text"),
      "vector", 20).count() == 0)
    val hashed = emptyDocs.select(col("doc_id").as("id"),
      Multimodal.blockHash60(col("text").cast("binary")).as("ph"))
    assert(Multimodal.phashNearDupPairs(hashed, "id", "ph", maxHamming = 5)
      .count() == 0)
    // quantile sketch over zero groups: empty result, no null-eval NPE
    assert(emptyDocs.groupBy("lang")
      .agg(graft.plans.QuantileSketch.quantiles(col("n_chars"), 64, Seq(50)))
      .count() == 0)
  }

  test("dedup candidate generators yield empty results on an empty corpus") {
    assert(Dedup.exact(emptyDocs).count() == 0)
    assert(Dedup.minhashLsh(emptyDocs, k = 8, bands = 4, threshold = 0.8).count() == 0)
    assert(Dedup.dupSpanStats(emptyDocs).count() == 0)
    assert(graft.dedup.SimHash.nearDupPairs(emptyDocs, maxHamming = 6).count() == 0)
    // r16 ADVICE: the self-tuning cap's quantile read is null on an
    // empty banded frame — must fall back to the floor, not NPE
    assert(graft.dedup.SimHash.nearDupPairsAuto(emptyDocs, maxHamming = 6).count() == 0)
  }

  test("r15 eval-substring strip: empty eval strips nothing, empty corpus is empty") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").filter(col("doc_id") < 50)
    val stripped = Dedup.stripEvalSubstrings(docs, emptyDocs, k = 10, minLen = 20)
    assert(stripped.filter(col("n_stripped") =!= 0L).count() == 0,
      "an empty eval set must strip nothing")
    assert(stripped.count() == docs.count())
    assert(Dedup.stripEvalSubstrings(emptyDocs, docs, 10, 20).count() == 0)
  }

  test("decontamination against an empty benchmark keeps everything") {
    val docs = Tables.documents(spark, sf).limit(20)
      .select("doc_id", "text").localCheckpoint(true)
    val out = Dedup.decontaminateBloom(docs, emptyDocs.select("doc_id", "text"),
      minSharedShingles = 1)
    assert(out.count() == docs.count())
    assert(out.filter(col("contaminated")).count() == 0)
  }

  test("BM25 search with an empty query set returns no rows") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val idx = graft.operators.Retrieval.ensureIndex(
      docs.filter(col("doc_id") >= 5), "doc_id", "text", sf)
    val out = graft.operators.Retrieval.searchIndex(spark, idx,
      docs.filter(lit(false)), "doc_id", "text", k = 5)
    assert(out.count() == 0)
  }

  test("IVF×PQ search with an empty query set returns no rows") {
    import graft.functions.Vectors
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("label"),
        Vectors.toDouble(col("embedding")).as("v"))
    val idx = graft.similarity.Ivfpq.ensureIndex(
      e.filter(col("id") >= 10), "label", "id", "v", sf)
    val out = graft.similarity.Ivfpq.searchIndex(spark, idx,
      e.filter(lit(false)).select("id", "v"), "id", "v",
      k = 5, nProbe = 2, rerank = 80)
    assert(out.count() == 0)
  }

  test("MMR of an empty candidate frame is empty") {
    val cands = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("q_id"), col("vec_id").as("n_id"),
        lit(0.5).as("cos"), Vectors.toDouble(col("embedding")).as("n_v"))
      .filter(lit(false))
    assert(graft.similarity.Mmr.rerank(cands, k = 3).count() == 0)
  }

  test("TopKPerKey of an empty frame is empty") {
    val df = Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"), col("n_chars")).filter(lit(false))
    assert(graft.plans.TopKPerKey.topKPerKey(
      df, Seq("lang"), Seq(("n_chars", true)), 3).count() == 0)
  }

  test("r6 text/index ops yield empty results on an empty corpus") {
    import graft.operators.Indexing
    import graft.text.TextAnalysis
    assert(TextAnalysis.explodeChunks(emptyDocs, col("text"), 40, 30)
      .count() == 0)
    assert(TextAnalysis.charEntropyQ(emptyDocs, col("text")).count() == 0)
    assert(Indexing.suggest(emptyDocs, col("text"), prefixLen = 3, k = 3)
      .count() == 0)
    // spellcheck: empty queries against a real vocab, and a real
    // query set against an empty vocab — both empty, no crash
    val vocab = Tables.documents(spark, sf)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
    val noQueries = vocab.select(col("tok").as("query")).filter(lit(false))
    assert(Indexing.spellcheck(noQueries, vocab, maxDist = 2).count() == 0)
    val someQueries = vocab.select(col("tok").as("query")).limit(3)
    assert(Indexing.spellcheck(someQueries, vocab.filter(lit(false)),
      maxDist = 2).count() == 0)
    // source overlap: empty corpus → empty matrix, capped and not
    val emptySrc = emptyDocs.withColumn("source", lit("s"))
      .filter(lit(false))
    assert(graft.dedup.Dedup.sourceOverlap(emptySrc, col("source"),
      col("text"), 20, 20, maxDf = None).count() == 0)
    assert(graft.dedup.Dedup.sourceOverlap(emptySrc, col("source"),
      col("text"), 20, 20, maxDf = Some(3)).count() == 0)
  }

  test("histogram of an empty frame and of an all-null column is empty (r5 ADVICE)") {
    import graft.operators.Validate
    val h1 = Validate.histogram(emptyDocs, col("n_chars"), bins = 8)
    assert(h1.count() == 0)
    assert(h1.columns.toSeq == Seq("bucket", "bucket_lo", "n_rows"))
    val allNull = Tables.documents(spark, sf)
      .select(lit(null).cast("long").as("v"))
    assert(Validate.histogram(allNull, col("v"), bins = 8).count() == 0)
  }
}
