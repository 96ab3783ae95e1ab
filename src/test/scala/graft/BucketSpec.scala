package graft

import graft.operators.Harvest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins + scalable batching: the §7 round-2
  * scale items that remove the last fact-side shuffles.
  */
class BucketSpec extends AnyFunSuite {
  import TestSession._

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/o_b").saveAsTable("o_b")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      // bucketing must satisfy the join's distribution: no shuffle
      // before the SortMergeJoin; disable auto-broadcast to force the
      // co-located path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan.take(1200))
        assert(!plan.contains("Exchange hashpartitioning"),
          "bucketed join must not re-shuffle:\n" + plan.take(1500))
        assert(joined.count() == Tables.lineitem(spark, sf).count())
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("scalable batch assignment keeps the batching contract") {
    val flagged = Harvest.flagDeleted(Tables.events(spark, sf),
      col("event_type"), "error").repartition(4)
    val rpf = 100
    val batched = Harvest.batchAssignScalable(flagged,
      Seq(col("is_deleted")), col("event_id"), rpf)
    // nothing lost
    assert(batched.count() == flagged.count())
    // every (group, file) holds at most rpf records, and all files
    // but the last are full
    val sizes = batched.groupBy("is_deleted", "file_idx").count()
    assert(sizes.filter(col("count") > rpf).count() == 0)
    val nonLast = sizes.join(
      sizes.groupBy("is_deleted").agg(max("file_idx").as("last")),
      "is_deleted").filter(col("file_idx") =!= col("last"))
    assert(nonLast.filter(col("count") =!= rpf).count() == 0)
    // dense indexes from 0
    val perGroup = sizes.groupBy("is_deleted")
      .agg(min("file_idx").as("lo"), max("file_idx").as("hi"),
        count(lit(1)).as("n_files"))
    perGroup.collect().foreach { r =>
      assert(r.getLong(1) == 0L)
      assert(r.getLong(3) == r.getLong(2) + 1)
    }
    // same file count per group as the window-based spec
    val specMax = Harvest.batchAssign(flagged, Seq(col("is_deleted")),
      col("event_id"), rpf).groupBy("is_deleted").agg(max("file_idx"))
    val scalMax = batched.groupBy("is_deleted").agg(max("file_idx"))
    assert(specMax.collect().toSet == scalMax.collect().toSet)
  }
}
