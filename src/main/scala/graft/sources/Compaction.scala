package graft.sources

import graft.operators.Indexing
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction EXECUTOR — the rewrite side of
  * `Indexing.compactionPlan` (x6 plans the groups; this rewrites the
  * files), closing the reference's small-object problem end-to-end
  * (harvest.py:185-208 cuts a new object every records_per_file, so
  * a season of harvests leaves thousands of KB-sized files per
  * prefix — the lakehouse OPTIMIZE case).
  *
  * Shape: inventory the table's data files (metadata-only listing —
  * the manifest role; at 100 TB the inventory comes from the table
  * format's manifest and is itself a DataFrame, which is why the
  * PLAN is computed distributed), group them into contiguous
  * ~targetBytes runs per semantic partition with compactionPlan,
  * then rewrite in ONE distributed pass: rows join (file → group)
  * on their scan-time file name, repartition by group — every group
  * lands whole in exactly one task, so a group is never split across
  * output files — and write back partitioned by the semantic
  * partition columns only (the per-batch `file_idx` directory level
  * that caused the fragmentation collapses into an ordinary column).
  * Output schema == input schema; downstream readers see the same
  * table with fewer, right-sized files.
  *
  * A task that happens to hold two groups of one partition merges
  * them into one file (never splits) — file count per partition is
  * ≤ the planned group count, sizes ≥ the target. Sub-linear merge
  * slack is the cheap direction; the contract is parity + reduction.
  */
object Compaction {

  /** One rewritten table's accounting. */
  final case class CompactStats(filesBefore: Long, filesAfter: Long,
    plannedGroups: Long)

  /** Recursively list data files under `dir`: (posix path, bytes).
    * Metadata-only; no data is read. */
  private def listDataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && !name.startsWith("_") && !name.startsWith("."))
        out += ((st.getPath.toUri.getPath, st.getLen))
    }
    out.toSeq
  }

  /** Compact a parquet table directory laid out with hive-style
    * `col=value` partition dirs (the writeBatched sink shape) into
    * `outDir`, keeping `partCols` as the output partitioning and
    * folding every other directory level into plain columns. Returns
    * before/after file counts and the planned group count. */
  def compactTable(spark: SparkSession, tableDir: String,
      partCols: Seq[String], targetBytes: Long, outDir: String): CompactStats = {
    import spark.implicits._
    val inv = listDataFiles(spark, tableDir).toDF("path", "bytes")
    // semantic partition key from the hive dir segments of each path
    val partKey = concat_ws("/", partCols.map(c =>
      regexp_extract(col("path"), java.util.regex.Pattern.quote(c) + "=([^/]+)", 1)): _*)
    val plan = Indexing.compactionPlan(inv.withColumn("pk", partKey),
      col("pk"), col("path"), col("bytes"), targetBytes)
    val mapping = plan.select(col("path"),
      concat_ws("#", col("pk"), col("group_id").cast("string")).as("__grp"))
    val nGroups = mapping.select("__grp").distinct().count()
    // rewrite: rows meet their file's group assignment on the
    // scan-time file name (equi-join; the mapping side is
    // |files|-sized — AQE broadcasts it at any realistic inventory,
    // and per-partition rewrite jobs bound it at manifest scale)
    val data = spark.read.parquet(tableDir)
      .withColumn("__path", regexp_replace(input_file_name(), "^file:/*", "/"))
    val cols = data.columns.filter(c => c != "__path").map(col)
    val grouped = data.join(mapping, col("__path") === col("path"))
      .select(cols :+ col("__grp"): _*)
      .repartition(col("__grp"))
      .drop("__grp")
    grouped.write.mode("overwrite").partitionBy(partCols: _*).parquet(outDir)
    CompactStats(inv.count(), listDataFiles(spark, outDir).size, nGroups)
  }
}
