package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup → ANN indexing composition (the round-12 verdict item): the
  * Ivfpq scaladoc's serving recommendation — "dedup before indexing"
  * — made executable end-to-end from the PERSISTED dedup artifacts:
  * `Dedup.ensureClusterLabels` (the d15/d18/d22 label cache) →
  * `Dedup.survivorsFromLabels` (one survivor per cluster) → embeddings
  * semi-join (vec_id ≡ doc_id in the corpus contract) →
  * `Ivfpq.buildIndex` → `searchIndex`. The Soak chart's
  * `ivfpq_dedup_8probe_r80` cell carries the measurement twin (the
  * rerank knob returning to k×small on a deduped corpus).
  */
class DedupAnnComposeSpec extends AnyFunSuite {
  import TestSession._

  test("IVFPQ index built from the persisted dedup keep-list serves only survivors") {
    val docs = Dedup.augmentedDocs(spark, sf)
    val labelsDir = Dedup.ensureClusterLabels(docs, sf)
    val mem = graft.sources.VersionedTable.readLatest(spark, labelsDir)
    val surv = Dedup.survivorsFromLabels(mem).cache()

    // keep-list invariants: one survivor per cluster, covering every
    // cluster, each survivor a member of its own cluster
    val nClusters = mem.select("cluster_id").distinct().count()
    assert(surv.count() == nClusters, "one survivor per cluster")
    assert(surv.select("cluster_id").distinct().count() == nClusters)
    assert(surv.join(mem, Seq("doc_id", "cluster_id"), "left_anti").count() == 0,
      "every survivor is a member of its cluster")

    // the composition: embeddings of the survivors only (vec_id ≡
    // doc_id), indexed and served
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("label"),
        graft.functions.Vectors.toDouble(col("embedding")).as("v"))
    val kept = vecs.join(surv.select(col("doc_id").as("id")),
      Seq("id"), "left_semi").cache()
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= vecs.count())

    val dir = java.nio.file.Files
      .createTempDirectory("graft_dedup_ipq").toString
    graft.similarity.Ivfpq.buildIndex(kept, "label", "id", "v", dir)
    val queries = kept.select("id", "v").filter(col("id") % 50 === 0).limit(8)
    val res = graft.similarity.Ivfpq.searchIndex(
      spark, dir, queries, "id", "v", k = 3, nProbe = 8, rerank = 60)
    val keptIds = kept.select("id").collect().map(_.getLong(0)).toSet
    val rows = res.select("q_id", "n_id").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => keptIds.contains(r.getLong(1))),
      "served neighbors must come from the deduped corpus only")
    // every query id is itself a survivor, so its own vector is the
    // top hit at cosine 1 — the composition serves it
    val byQ = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    byQ.foreach { case (q, ns) =>
      assert(ns.contains(q), s"query $q (a survivor) not served its own vector")
    }
  }
}
