package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: dump `.explain("formatted")` for named declared queries
  * to text files — the optimization-round evidence trail
  * (plans/r<N>/<query>_<tag>.txt). Usage:
  *
  *   sbt "runMain graft.tools.PlanDump <outDir> <tag> q1,q2,..."
  *
  * with SPARK_GRAFT_SF_DIR selecting the data directory. `all` dumps
  * every declared query. Plans are the pre-execution formatted plans
  * (AdaptiveSparkPlan isFinalPlan=false where AQE applies) — the
  * shape evidence: Exchange count, join strategy, PushedFilters,
  * codegen spans.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names: Set[String] =
      if (args.length < 3 || args(2) == "all") graft.SparkEntry.queries.keySet
      else args(2).split(',').toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.installNullCheckSimplifier(spark)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    graft.SparkEntry.queries.filter(q => names(q._1)).foreach {
      case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), plan)
          println(s"PLAN $name -> $outDir/${name}_$tag.txt")
        } catch {
          case e: Throwable => println(s"PLAN $name FAILED: ${e.getMessage}")
        }
    }
    spark.stop()
  }
}
