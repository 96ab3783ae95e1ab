package graft

import org.apache.spark.sql.SparkSession

/** Session factory encoding graft's operating defaults: UTC (oracle
  * parity), AQE on (runtime re-planning, skew-join handling), shuffle
  * partitions sized to the machine rather than Spark's default 200,
  * and graft's SQL functions registered. The driver owns session
  * creation in Verify/Bench (its contract), so they call `tune`
  * on the session they are given; standalone apps use `create`.
  */
object GraftSession {

  def create(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // runtime confs + rule exclusion (InferFiltersFromGenerate — see
    // installNullCheckSimplifier) that the builder route cannot set
    GraftExtensions.register(spark)
    spark
  }

  /** Apply graft defaults to an externally-created session (runtime
    * confs + function registration only; static confs like
    * extensions must come from the builder). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    GraftExtensions.register(spark)
    spark
  }
}
