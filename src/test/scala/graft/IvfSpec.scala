package graft

import graft.functions.Vectors
import graft.similarity.Ivf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite {
  import TestSession._

  private def embeddings = Tables.embeddings(spark, sf)
    .select(col("vec_id").as("id"), Vectors.toDouble(col("embedding")).as("v"),
      col("label"))

  test("IVF centroids: one per list, correct dimensionality") {
    val c = Ivf.centroids(embeddings, "label", "v")
    assert(c.count() == embeddings.select("label").distinct().count())
    assert(c.select(size(col("centroid"))).head.getInt(0) == 64)
  }

  test("IVF search returns k ranked neighbors from probed lists only") {
    val q = embeddings.filter(col("id") < 5)
    val d = embeddings.filter(col("id") >= 5)
    val res = Ivf.search(q, d, "label", k = 5, nProbe = 3)
    assert(res.groupBy("q_id").count().filter(col("count") > 5).count() == 0)
    assert(res.count() > 0)
  }

  test("IVF recall at full probe width equals brute force") {
    val q = embeddings.filter(col("id") < 5)
    val d = embeddings.filter(col("id") >= 5)
    val nLists = d.select("label").distinct().count().toInt
    val ivf = Ivf.search(q, d, "label", k = 5, nProbe = nLists)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = similarity.Knn.bruteForce(q.select("id", "v"), d.select("id", "v"), 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == brute, s"diff ${(ivf diff brute).take(3)} / ${(brute diff ivf).take(3)}")
  }

  test("k-means refinement keeps all vectors assigned and improves within-list cohesion") {
    val d = embeddings.filter(col("id") >= 10)
    val assigned = Ivf.kmeansAssign(d, "label", "v", iters = 2)
    assert(assigned.count() == d.count())
    assert(assigned.groupBy("id").count().filter(col("count") > 1).count() == 0)
    // refined lists are usable by search directly
    val q = embeddings.filter(col("id") < 5)
    val res = Ivf.search(q, assigned, "list_id", k = 3, nProbe = 3)
    assert(res.count() > 0)
  }

  test("IVF partial probe achieves reasonable recall at a fraction of the scan") {
    val q = embeddings.filter(col("id") < 10)
    val d = embeddings.filter(col("id") >= 10)
    val ivf = Ivf.search(q, d, "label", k = 5, nProbe = 3)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = similarity.Knn.bruteForce(q.select("id", "v"), d.select("id", "v"), 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    // random 64-dim embeddings have weak cluster structure; 3/10
    // lists scanned should still catch a solid fraction of true NNs
    assert(recall >= 0.2, s"recall $recall")
  }
}
