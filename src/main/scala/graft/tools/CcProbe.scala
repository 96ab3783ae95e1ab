package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Diagnostic: per-stage wall-time of the d8 clustering pipeline, for
  * tuning the iterative CC loop without running the whole bench.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = t("augmentedDocs+count") {
      val d = Dedup.augmentedDocs(spark, dir).localCheckpoint(); d.count(); d
    }
    val pairs = t("minhashLsh materialize") {
      val p = Dedup.minhashLsh(docs, k = 8, bands = 4, threshold = 0.8)
        .localCheckpoint()
      println(s"PROBE pairs=${p.count()}")
      p
    }
    // replicate the loop with per-round timing
    val ccTimed = t("cc manual") {
      val p = pairs.select(col("a_id").as("a"), col("b_id").as("b"))
        .localCheckpoint(false)
      val edges = p.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
        .unionByName(p.select(col("a").as("src"), col("a").as("dst")))
        .unionByName(p.select(col("b").as("src"), col("b").as("dst")))
        .repartition(col("src"))
        .localCheckpoint(false)
      var labels = t("  init") {
        val l = edges.groupBy("src").agg(min("dst").as("label"))
          .withColumnRenamed("src", "id").localCheckpoint(false)
        def ls(df: org.apache.spark.sql.DataFrame) =
          df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
            lit(java.math.BigDecimal.ZERO))).head.getDecimal(0)
        ls(l); l
      }
      def labelSum(df: org.apache.spark.sql.DataFrame) =
        df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO))).head.getDecimal(0)
      var prev = labelSum(labels)
      var done = false; var it = 0
      while (!done && it < 25) {
        val next = t(s"  round $it") {
          val n = edges.join(labels, edges("src") === labels("id"))
            .groupBy(col("dst").as("id")).agg(min("label").as("label"))
            .localCheckpoint(false)
          val s = labelSum(n); done = s.compareTo(prev) == 0; prev = s; n
        }
        labels = next; it += 1
      }
      println(s"PROBE rounds=$it")
      labels
    }
    val cc = ccTimed.withColumnRenamed("label", "cluster_id")
    t("final join+sort") {
      docs.select(col("doc_id"))
        .join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
        .withColumn("is_canonical", col("cluster_id") === col("doc_id"))
        .orderBy("doc_id").count()
    }

    // ---- r19: per-round plan shape + partitioning-preserving A/B ----
    // What does ONE round's executed plan look like (exchange count on
    // the edge and label sides)? And does an AQE-off loop — where the
    // groupBy's hash partitioning survives the localCheckpoint as
    // LogicalRDD outputPartitioning and matches the edges' — drop the
    // per-round exchanges?
    def roundPlan(tag: String): Unit = {
      val p = pairs.select(col("a_id").as("a"), col("b_id").as("b"))
        .localCheckpoint(false)
      val edges = p.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
        .unionByName(p.select(col("a").as("src"), col("a").as("dst")))
        .unionByName(p.select(col("b").as("src"), col("b").as("dst")))
        .repartition(col("src"))
        .localCheckpoint(false)
      val labels = edges.groupBy("src").agg(min("dst").as("label"))
        .withColumnRenamed("src", "id").localCheckpoint(false)
      labels.count()
      val next = edges.join(labels, edges("src") === labels("id"))
        .groupBy(col("dst").as("id")).agg(min("label").as("label"))
      next.count()
      val plan = next.queryExecution.executedPlan.toString
      val nEx = "Exchange".r.findAllIn(plan).length
      println(s"PROBE round-plan[$tag] exchanges=$nEx")
      println(plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("ShuffledHashJoin") ||
          l.contains("SortMergeJoin") || l.contains("Scan ExistingRDD") ||
          l.contains("AQEShuffleRead")).mkString("\n"))
    }
    roundPlan("aqe-on")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    roundPlan("aqe-off")
    // timed A/B: whole CC loop with AQE off
    t("cc adaptive AQE-off (on ckpt pairs)") {
      Dedup.connectedComponentsAdaptive(pairs, "a_id", "b_id").count()
    }
    t("d8 full AQE-off") {
      graft.SparkEntry.queries("d8_cluster")(spark, dir).count()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    t("cc adaptive AQE-on again") {
      Dedup.connectedComponentsAdaptive(pairs, "a_id", "b_id").count()
    }

    // ---- r19 candidate: partitioner-preserving RDD loop ----
    // edges hash-partitioned ONCE; per-round join is narrow (both
    // sides share the partitioner), only the (dst, label) min-reduce
    // shuffles — 1 shuffle/round of label updates vs AQE's full edge
    // re-shuffle + two sorts. Convergence via the same decreasing
    // label-sum fixpoint (BigInt — exact).
    def ccRdd(): Long = {
      val part = new org.apache.spark.HashPartitioner(
        spark.sparkContext.defaultParallelism)
      val p = pairs.select(col("a_id"), col("b_id"))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).rdd
      val edges = p.flatMap { case (a, b) =>
          Iterator((a, b), (b, a), (a, a), (b, b)) }
        .partitionBy(part)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var labels = edges.reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def lsum(r: org.apache.spark.rdd.RDD[(Long, Long)]): BigInt =
        r.aggregate(BigInt(0))((acc, kv) => acc + kv._2, _ + _)
      var prev = lsum(labels)
      var it = 0; var done = false
      while (!done && it < 25) {
        val next = edges.join(labels, part)
          .map { case (_, (dst, label)) => (dst, label) }
          .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val s = lsum(next)
        labels.unpersist(false)
        labels = next
        done = s == prev
        prev = s
        it += 1
      }
      val n = labels.count()
      println(s"PROBE rdd rounds=$it")
      edges.unpersist(false); labels.unpersist(false)
      n
    }
    t("cc RDD loop (on ckpt pairs)") { ccRdd() }
    t("cc RDD loop again") { ccRdd() }
    t("cc adaptive AQE-on final") {
      Dedup.connectedComponentsAdaptive(pairs, "a_id", "b_id").count()
    }
    spark.stop()
  }
}
