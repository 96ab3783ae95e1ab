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
    spark.stop()
  }
}
