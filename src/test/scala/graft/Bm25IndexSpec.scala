package graft

import graft.operators.Retrieval
import graft.sources.VersionedTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted BM25 index: build-once/search-many with versioned
  * publish, token-bucket partition pruning, and rollback — the x7
  * query path (queries never re-tokenize the corpus). */
class Bm25IndexSpec extends AnyFunSuite {
  import TestSession._

  private def docs = Tables.documents(spark, sf)

  test("index search equals the ad-hoc scorer, scanning only query-term buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25").toString
    val corpus = docs.filter(col("doc_id") >= 5)
    val queries = docs.filter(col("doc_id") < 5)
    Retrieval.buildIndex(corpus, "doc_id", "text", dir)
    val fromIndex = Retrieval.searchIndex(spark, dir, queries,
      "doc_id", "text", k = 5)
    val adHoc = Retrieval.bm25MoreLikeThis(corpus, queries,
      "doc_id", "text", k = 5)
    assert(fromIndex.exceptAll(adHoc).isEmpty
      && adHoc.exceptAll(fromIndex).isEmpty,
      "persisted-index search diverged from the ad-hoc scorer")
    // the postings scan must prune on the token hash buckets
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tok_bucket"),
      s"expected a partition filter on tok_bucket in:\n$plan")
  }

  test("stats table carries exact global aggregates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25s").toString
    val corpus = docs.filter(col("doc_id") >= 5).limit(50)
    Retrieval.buildIndex(corpus, "doc_id", "text", dir)
    val st = VersionedTable.readLatest(spark, s"$dir/stats").head()
    val tf = VersionedTable.readLatest(spark, s"$dir/tf")
    assert(st.getAs[Long]("n_docs") ==
      tf.select("doc_id").distinct().count())
    assert(st.getAs[Long]("total_len") ==
      tf.agg(sum("tf")).head().getLong(0))
  }

  test("rebuild publishes a new version; rollback serves the old one") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25r").toString
    val corpus = docs.filter(col("doc_id") >= 5)
    val v1 = Retrieval.buildIndex(corpus, "doc_id", "text", dir)
    val v2 = Retrieval.buildIndex(corpus.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", dir)
    assert(v2 == v1 + 1)
    val n2 = VersionedTable.readLatest(spark, s"$dir/tf")
      .select("doc_id").distinct().count()
    VersionedTable.swapTo(s"$dir/tf", v1)
    val n1 = VersionedTable.readLatest(spark, s"$dir/tf")
      .select("doc_id").distinct().count()
    assert(n1 == corpus.count() && n2 < n1,
      s"rollback must serve the full version again ($n1 vs $n2)")
  }
}
