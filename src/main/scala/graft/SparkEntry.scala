package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Core.q2Join(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Core.queries ++ graft.queries.Etl.queries ++
      graft.queries.TextEvents.queries ++ graft.queries.DedupSim.queries ++
      graft.queries.Multi.queries ++ graft.queries.Xml.queries ++
      graft.queries.PipelineQ.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Core.oracleSql ++ graft.queries.Etl.oracleSql ++
      graft.queries.TextEvents.oracleSql ++ graft.queries.DedupSim.oracleSql ++
      graft.queries.Multi.oracleSql ++ graft.queries.Xml.oracleSql ++
      graft.queries.PipelineQ.oracleSql
}
