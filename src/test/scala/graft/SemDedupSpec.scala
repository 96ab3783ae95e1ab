package graft

import graft.dedup.{Dedup, SemDedup}
import graft.queries.DedupSim
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for d11 semantic dedup and d12 incremental MinHash
  * probing. */
class SemDedupSpec extends AnyFunSuite {
  import TestSession._

  test("semDedup keeps every cluster's min id and drops only true semantic dups") {
    val vecs = DedupSim.augmentedEmbeddings(spark, sf)
      .select(col("vec_id").as("id"), col("label"), col("v"))
    val out = SemDedup.semDedup(vecs, "label", tau = 0.99).cache()
    assert(out.count() == vecs.count())
    // the minimum id of every cluster can never be dropped (no lower
    // id exists to beat it)
    val minIds = out.groupBy("cluster_id").agg(min("id").as("id"))
      .join(out, Seq("cluster_id", "id"))
    assert(minIds.filter(!col("is_kept")).count() == 0,
      "cluster-min ids must always be kept")
    // every planted perturbed copy whose original landed in the same
    // cluster is dropped (cos ~0.9988 >= 0.99)
    val asn = out.select(col("id"), col("cluster_id"))
    val copies = asn.filter(col("id") >= 1000000L)
      .select((col("id") - 1000000L).as("orig_id"), col("id").as("copy_id"),
        col("cluster_id").as("copy_cluster"))
    val sameCluster = copies.join(
      asn.select(col("id").as("orig_id"), col("cluster_id").as("orig_cluster")),
      "orig_id").filter(col("copy_cluster") === col("orig_cluster"))
    val keptCopies = sameCluster.join(
      out.filter(col("is_kept")).select(col("id").as("copy_id")), "copy_id")
    assert(keptCopies.count() == 0,
      "perturbed copies co-clustered with their original must be dropped")
    out.unpersist()
    ()
  }

  test("semDedupRep picks the centroid-nearest kept member, counts reconcile with semDedup") {
    val vecs = DedupSim.augmentedEmbeddings(spark, sf)
      .select(col("vec_id").as("id"), col("label"), col("v"))
    val full = SemDedup.semDedup(vecs, "label", tau = 0.99).cache()
    val reps = SemDedup.semDedupRep(vecs, "label", tau = 0.99).cache()
    // counts per cluster must reconcile exactly with the full verdict
    val expect = full.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        sum(col("is_kept").cast("long")).as("n_kept"),
        sum((!col("is_kept")).cast("long")).as("n_dropped"))
      .filter(col("n_dropped") >= 1)
    val got = reps.select("cluster_id", "n_members", "n_kept", "n_dropped")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "per-cluster counts must equal the semDedup verdict aggregate")
    // every representative is a KEPT member of its own cluster
    val badRep = reps.select(col("rep_id").as("id"), col("cluster_id"))
      .join(full, Seq("id", "cluster_id"), "left_anti")
    assert(badRep.count() == 0, "rep must be a member of its cluster")
    val droppedRep = reps.select(col("rep_id").as("id"))
      .join(full.filter(!col("is_kept")), "id")
    assert(droppedRep.count() == 0, "rep must be a kept member")
    full.unpersist(); reps.unpersist()
    ()
  }

  test("incremental probe equals the full LSH restricted to delta-base links") {
    val aug = Dedup.augmentedDocs(spark, sf)
    val incr = Dedup.minhashLshIncremental(
        base = aug.filter(col("doc_id") < Dedup.NearOffset),
        delta = aug.filter(col("doc_id") >= Dedup.NearOffset),
        k = 8, bands = 4, threshold = 0.8)
      .select(col("dup_of").as("a_id"), col("new_id").as("b_id"), col("jaccard"))
    // full-corpus pairs with a base-side a and delta-side b (base ids
    // sort below delta ids, so a_id < b_id picks exactly these links)
    val full = Dedup.minhashLsh(aug, k = 8, bands = 4, threshold = 0.8)
      .filter(col("a_id") < Dedup.NearOffset && col("b_id") >= Dedup.NearOffset)
    assert(incr.exceptAll(full).isEmpty && full.exceptAll(incr).isEmpty,
      "incremental links must equal the full pipeline's cross-links")
    // every planted exact copy links back to its original at J = 1
    val exact = incr.filter(col("b_id") >= Dedup.ExactOffset
      && col("a_id") === col("b_id") - Dedup.ExactOffset)
    assert(exact.filter(col("jaccard") =!= 1.0).count() == 0)
    assert(exact.count() == aug.filter(col("doc_id") >= Dedup.ExactOffset).count(),
      "every exact copy must be caught by the index probe")
  }
}
