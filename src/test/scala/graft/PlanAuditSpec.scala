package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface physical-plan audit: every SparkEntry query's
  * executed plan is checked against the scale invariants that
  * individual operator specs assert locally.
  *
  * - A CartesianProduct anywhere is an outright bug at 100 TB —
  *   never allowed.
  * - BroadcastNestedLoopJoin is allowed ONLY where a provably tiny
  *   side broadcasts by design: s1 broadcasts the query set against
  *   the map-only corpus scan, s4 broadcasts the centroid table.
  *   Anything else appearing here means a join lost its equi-key.
  * - Exchange SinglePartition is allowed ONLY on tiny-final-result
  *   reductions (global profile/funnel rollups, a 1-row filter
  *   result): a window or join collapsing to one partition would
  *   serialize the whole dataset through one task.
  *
  * New queries are audited automatically the moment they land in
  * SparkEntry.queries — extending the allowlists is a deliberate,
  * reviewed act.
  */
class PlanAuditSpec extends AnyFunSuite {
  import TestSession._

  private val allowNestedLoop = Set(
    "s1_knn_brute",    // broadcast(query side) × corpus scan, per-partition top-k
    "s4_knn_ivf",      // broadcast(centroids) × query/corpus assignment
    "s6_filtered_knn", // broadcast(query side) × pre-filtered corpus
    "s7_mmr")          // s1's broadcast bruteForce feeds candidates; since the
                       // one-job rerank rewrite there is no checkpoint truncating
                       // the lineage, so the candidate stage's by-design NLJ
                       // shows in s7's (single) plan

  private val allowSinglePartition = Set(
    "e9_funnel",         // O(stages)-row final rollup
    "q5_filter_project", // 1-row result of a selective filter
    "v5_profile",        // global column-profile aggregate (tiny)
    "v8_profile_drift",  // two v5-shaped global profiles + |cols|-row join
    "v11_integrity")     // per-relation global count rollup (1 row each);
                         // the join itself is key-partitioned — only the
                         // 3-counter reduction serializes

  test("no query plan contains a cartesian product") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("nested-loop joins only where a tiny side broadcasts by design") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("BroadcastNestedLoopJoin") && !allowNestedLoop(name))
        Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unexpected nested-loop joins (lost equi-key?) in: $offenders")
  }

  test("single-partition exchanges only on tiny final reductions") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("Exchange SinglePartition") && !allowSinglePartition(name))
        Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unexpected single-partition exchanges (serialization point) in: $offenders")
  }
}
