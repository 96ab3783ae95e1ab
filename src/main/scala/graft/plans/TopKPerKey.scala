package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import scala.collection.mutable

/** Whole-operator Catalyst extension (tier (c) of the custom-operator
  * ladder): per-key top-k without a per-key sort.
  *
  * The composable form — `row_number().over(Window.partitionBy(key)
  * .orderBy(ord)) <= k` — shuffles on the key and then SORTS every
  * partition, O(n log n) per partition with full materialization;
  * the window operator cannot know only k rows survive. This
  * operator keeps a k-bounded heap per key: same single shuffle,
  * O(n log k) and O(keys·k) memory, no sort. At 100 TB the
  * difference is a spilled sort per partition vs a few KB of heap
  * per key.
  *
  * Logical node + planner strategy are injected via
  * SparkSessionExtensions (GraftExtensions) or used directly through
  * `TopKPerKey.topKPerKey`.
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan, partial: Boolean = false) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyPlan =
    copy(child = c)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan, partial: Boolean = false) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  /** All rows of a key must co-locate — unless this is the PARTIAL
    * form, which (like a partial aggregate) runs on whatever
    * partitioning the child already has and truncates each partition
    * to k rows per key before the shuffle. A partial+final pair is
    * the map-side-combine of top-k: only ≤ partitions·keys·k rows
    * ever cross the wire instead of the full scored input. */
  override def requiredChildDistribution: Seq[Distribution] =
    (if (partial) UnspecifiedDistribution else ClusteredDistribution(keys)) :: Nil

  /** Row-filtering operator: partitioning passes through, so the
    * final top-k (and a downstream window on the same keys) reuses
    * the exchange instead of inserting a new one. */
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    // defense in depth with the rewrite rule's k >= 1 guard: a
    // directly-constructed k <= 0 plan is an empty result, not a
    // pq.head crash on an empty heap
    if (kLocal <= 0) return child.execute().mapPartitions(_ => Iterator.empty)
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // BaseOrdering: row a "better" than b  ⇔  compare(a, b) < 0
      val ord = RowOrdering.create(sortOrder, childOutput)
      implicit val rowOrd: Ordering[InternalRow] =
        (a: InternalRow, b: InternalRow) => ord.compare(a, b)
      // max-heap: head is the worst retained row, evicted first
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val pq = heaps.get(key) match {
          case Some(q) => q
          case None =>
            val q = mutable.PriorityQueue.empty[InternalRow]
            heaps.put(key.copy(), q)
            q
        }
        if (pq.size < kLocal) pq += row.copy()
        else if (ord.compare(row, pq.head) < 0) { pq.dequeue(); pq += row.copy() }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child, partial) =>
      TopKPerKeyExec(keys, order, k, planLater(child), partial) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** df → the top `k` rows per `keyNames` group, ranked by `orderBy`
    * (name, descending?) pairs. Attributes are resolved directly
    * against the analyzed child — a generic Column would reach the
    * custom node as an unresolved ColumnNode the analyzer does not
    * descend into. Row order within the result is unspecified —
    * sort downstream if needed. */
  def topKPerKey(df: DataFrame, keyNames: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int,
      partial: Boolean = false): DataFrame = {
    val child = df.queryExecution.analyzed
    def attr(name: String) = child.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not in ${child.output.map(_.name).mkString(", ")}"))
    val keyExprs: Seq[Expression] = keyNames.map(attr)
    val sortOrders = orderBy.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    val spark = df.sparkSession
    // the strategy is injected per-session via GraftExtensions; for
    // driver-owned sessions register it idempotently here
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    GraftShims.ofRows(spark, TopKPerKeyPlan(keyExprs, sortOrders, k, child, partial))
  }
}
