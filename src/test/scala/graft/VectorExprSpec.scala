package graft

import graft.functions.Vectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExprSpec extends AnyFunSuite {
  import TestSession._

  test("native DotProduct matches the composable zip_with/aggregate form bit-exactly") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
    val a = e.select(col("vec_id").as("a_id"), col("v").as("a_v"))
    val b = e.select((col("vec_id") + 1).as("a_id"), col("v").as("b_v"))
    val both = a.join(b, "a_id")
      .select(
        Vectors.dot(col("a_v"), col("b_v")).as("native"),
        Vectors.dotComposable(col("a_v"), col("b_v")).as("composable"))
    assert(both.filter(col("native") =!= col("composable")).count() == 0)
    assert(both.count() > 0)
  }

  test("DotProduct participates in WholeStageCodegen") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
    val df = e.select(Vectors.dot(col("v"), col("v")).as("d"))
    // "*(n)" marks a WholeStageCodegen stage in the short plan form
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [dotproduct"), plan.take(1000))
    // and evaluates correctly: self-dot is the squared norm > 0
    assert(df.filter(col("d") <= 0).count() == 0)
  }
}
