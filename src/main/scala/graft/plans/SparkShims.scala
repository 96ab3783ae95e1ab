package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim: Column ⇄ Expression conversion lives in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]` in Spark 4. graft's custom Catalyst expressions
  * (graft.plans) need exactly these two conversions to expose a
  * Column API, so this object re-exports them from inside the
  * package. No Spark behavior is modified. */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
