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

  test("corpus fingerprint keys on EVERY file of a multi-file corpus (r5 VERDICT #5)") {
    // a real corpus directory: two part files under documents.parquet
    val dataDir = java.nio.file.Files.createTempDirectory("graft_fp").toString
    docs.limit(20).repartition(2)
      .write.parquet(s"$dataDir/documents.parquet")
    val root = new java.io.File(s"$dataDir/documents.parquet")
    val parts = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(parts.length == 2, s"fixture should write 2 part files, got ${parts.length}")

    val k0 = Retrieval.corpusFingerprintKey(root)
    // rewriting ONE part (same name, new mtime) must change the key —
    // the old single-file probe missed exactly this
    assert(parts(1).setLastModified(parts(1).lastModified + 60000))
    val k1 = Retrieval.corpusFingerprintKey(root)
    assert(k1 != k0, "mtime change of one part file must change the fingerprint")
    // adding a part must change it too; an untouched dir must not
    java.nio.file.Files.copy(parts(0).toPath,
      new java.io.File(root, "part-extra.parquet").toPath)
    val k2 = Retrieval.corpusFingerprintKey(root)
    assert(k2 != k1, "a new part file must change the fingerprint")
    assert(Retrieval.corpusFingerprintKey(root) == k2,
      "an untouched directory must fingerprint identically")

    // end-to-end: ensureIndex rebuilds into a fresh index dir after
    // the corpus changes
    val corpus = spark.read.parquet(s"$dataDir/documents.parquet")
    val i1 = Retrieval.ensureIndex(corpus, "doc_id", "text", dataDir)
    assert(new java.io.File(root, "part-extra.parquet").setLastModified(
      parts(0).lastModified + 120000))
    val i2 = Retrieval.ensureIndex(corpus, "doc_id", "text", dataDir)
    assert(i1 != i2, "a changed corpus must get a fresh index dir")
  }
}
