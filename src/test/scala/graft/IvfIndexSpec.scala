package graft

import graft.functions.Vectors
import graft.similarity.Ivf
import graft.sources.VersionedTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted IVF index: build-once/search-many with versioned
  * publish, partition-pruned probes, and rollback. */
class IvfIndexSpec extends AnyFunSuite {
  import TestSession._

  private def embs = Tables.embeddings(spark, sf)
    .select(col("vec_id").as("id"), col("label"),
      Vectors.toDouble(col("embedding")).as("v"))

  test("index search equals the in-memory search, scanning only probed partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val data = embs.filter(col("id") >= 10)
    val queries = embs.filter(col("id") < 10).select("id", "v")
    Ivf.buildIndex(data, "label", "v", dir)
    val fromIndex = Ivf.searchIndex(spark, dir, queries, k = 5, nProbe = 2)
    val inMemory = Ivf.search(queries, data, "label", k = 5, nProbe = 2,
      centroidScale = 1000000L).select("q_id", "n_id", "cos", "rank")
    assert(fromIndex.exceptAll(inMemory).isEmpty
      && inMemory.exceptAll(fromIndex).isEmpty,
      "persisted-index search diverged from the in-memory search")
    // the list scan must prune on the probed partitions
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list_id"),
      s"expected a partition filter on list_id in:\n$plan")
  }

  test("rebuild publishes a new version; rollback serves the old one") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf2").toString
    val data = embs.filter(col("id") >= 10)
    val (_, lv1) = Ivf.buildIndex(data, "label", "v", dir)
    // rebuild over a subset (simulating a corpus change)
    val (_, lv2) = Ivf.buildIndex(data.filter(col("id") % 2 === 0),
      "label", "v", dir)
    assert(lv2 == lv1 + 1)
    val n2 = VersionedTable.readLatest(spark, s"$dir/lists").count()
    VersionedTable.swapTo(s"$dir/lists", lv1)
    val n1 = VersionedTable.readLatest(spark, s"$dir/lists").count()
    assert(n1 == data.count() && n2 < n1,
      s"rollback must serve the full version again ($n1 vs $n2)")
  }
}
