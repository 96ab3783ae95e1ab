package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared lifecycle for the per-micro-batch parquet state trees the
  * foreachBatch gates keep (`batch=<lineage>-<batchId>` partition
  * dirs under one root — the BoilerplateStream/SubstringStream
  * layout), plus the periodic COMPACTION their scaladocs promise:
  * folding old partitions into one keeps the per-batch state scan
  * O(live partitions), not O(stream lifetime), and the folds are
  * safe because every state family here is (sum, min)-associative.
  *
  * Crash-safe compaction without atomic directory swaps (plain
  * filesystem semantics, same constraints as the marker files):
  *  - a compaction writes its fold into a fresh `compact=<name>` dir,
  *    then ATOMICALLY publishes a `_folded-<name>` manifest listing
  *    the partition dirs it folded, then deletes those dirs
  *    (best-effort garbage collection — also retried on the next
  *    batch);
  *  - readers treat a compact dir as live ONLY once its manifest
  *    exists, and treat every dir named in any manifest as logically
  *    deleted — so a crash between any two steps never double-counts
  *    and never loses counts: before the manifest the fold is
  *    invisible and its inputs still live; after the manifest the
  *    fold is the single truth and its inputs are dead whether or
  *    not their physical delete finished.
  *  - a REPLAYED compaction (its manifest already present) is
  *    skipped except for the delete retry, so foreachBatch replay
  *    stays exactly-once (the marker-file contract). */
object StatePartitions {

  import java.nio.file.{Files, Path, Paths}
  import scala.jdk.CollectionConverters._

  private def list(root: Path): Seq[Path] =
    if (!Files.isDirectory(root)) Seq.empty
    else scala.util.Using.resource(Files.list(root))(_.iterator().asScala.toSeq)

  private def manifests(root: Path): Seq[Path] =
    list(root).filter(p => Files.isRegularFile(p)
      && p.getFileName.toString.startsWith("_folded-"))

  /** Dir names logically deleted by a published compaction. */
  private def deadNames(root: Path): Set[String] =
    manifests(root).flatMap(m =>
      Files.readAllLines(m).asScala.map(_.trim).filter(_.nonEmpty)).toSet

  /** The live partition dirs: every `batch=`/`compact=` dir that is
    * neither folded away nor an unpublished (crashed) compaction. */
  def liveDirs(rootDir: String): Seq[String] = {
    val root = Paths.get(rootDir)
    val dead = deadNames(root)
    list(root).filter(Files.isDirectory(_))
      .filter { d =>
        val n = d.getFileName.toString
        !dead(n) && (!n.startsWith("compact=") ||
          Files.exists(root.resolve(s"_folded-${n.stripPrefix("compact=")}")))
      }
      .map(_.toString).sorted
  }

  /** Union read of the live partitions (uniform child schema — the
    * partition key never materializes as a column). */
  def read(spark: SparkSession, rootDir: String): DataFrame = {
    val dirs = liveDirs(rootDir)
    require(dirs.nonEmpty, s"no live state partitions under $rootDir")
    spark.read.parquet(dirs: _*)
  }

  /** Total row count over the live partitions WITHOUT a Spark job
    * (r17, the r16 known-limits item): the per-batch fpp scaling in
    * [[SubstringStream]] needs only the accumulated state row count,
    * and `read(...).count()` pays a full job (scheduler round-trip,
    * task launch per file) for a number the parquet FOOTERS already
    * carry. This reads each live file's footer metadata driver-side
    * — O(live files) small reads, the same information Spark's own
    * metadata-only count optimization uses. Exactly equals
    * `read(spark, rootDir).count()` by parquet's row-count contract
    * (spec-pinned, including across a compaction fold). */
  def rowCount(spark: SparkSession, rootDir: String): Long =
    rowCountDirs(spark, liveDirs(rootDir))

  /** [[rowCount]] over an EXPLICIT partition-dir list — what the
    * sharded gram layout probes (only the batch's shard families,
    * each its own [[liveDirs]] tree). */
  def rowCountDirs(spark: SparkSession, dirs: Seq[String]): Long = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    dirs.iterator.flatMap { d =>
      val p = new HPath(d)
      val fs = FileSystem.get(p.toUri, conf)
      fs.listStatus(p).iterator
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map { s =>
          scala.util.Using.resource(
            ParquetFileReader.open(HadoopInputFile.fromStatus(s, conf))) {
            r => r.getRecordCount
          }
        }
    }.sum
  }

  /** Fold every live partition EXCEPT `excludeName` (the in-flight
    * batch's own dir, which may exist from a crashed attempt and is
    * about to be overwritten) into `compact=<name>`, publish the
    * manifest, then garbage-collect the folded dirs. Skips straight
    * to the GC retry when the manifest already exists (replay). */
  def compact(spark: SparkSession, rootDir: String, name: String,
      excludeName: String, fold: DataFrame => DataFrame): Unit = {
    val root = Paths.get(rootDir)
    val manifest = root.resolve(s"_folded-$name")
    if (!Files.exists(manifest)) {
      val inputs = liveDirs(rootDir)
        .filter(d => Paths.get(d).getFileName.toString != excludeName)
      if (inputs.size >= 2) {
        fold(spark.read.parquet(inputs: _*))
          .write.mode("overwrite").parquet(s"$rootDir/compact=$name")
        val tmp = root.resolve(s"_folded-$name.tmp")
        Files.write(tmp, inputs.map(d =>
          Paths.get(d).getFileName.toString).mkString("\n").getBytes("UTF-8"))
        Files.move(tmp, manifest,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    }
    gc(root)
  }

  /** Physically delete logically-dead dirs (idempotent, best-effort). */
  private def gc(root: Path): Unit = {
    val dead = deadNames(root)
    list(root).filter(Files.isDirectory(_))
      .filter(d => dead(d.getFileName.toString))
      .foreach { d =>
        scala.util.Using.resource(Files.walk(d)) { s =>
          s.iterator().asScala.toSeq.reverse
            .foreach(p => Files.deleteIfExists(p))
        }
      }
  }

  /** One-lineage-per-stateDir guard (markers order first-occurrence
    * structs by raw batchId, which is only monotone within a single
    * lineage — two lineages sharing a stateDir would compare batch
    * ids across restarts meaninglessly and defeat the replay
    * markers). Throws on the first foreign marker. */
  def requireLineage(stateDir: String, lineage: String): Unit = {
    val root = Paths.get(stateDir)
    val foreign = list(root)
      .map(_.getFileName.toString)
      .filter(_.startsWith("_batch-"))
      .map(_.stripPrefix("_batch-").replaceAll("-\\d+(\\.tmp)?$", ""))
      .find(_ != lineage)
    foreign.foreach { l =>
      throw new IllegalStateException(
        s"stateDir $stateDir already carries lineage '$l'; refusing to " +
          s"mix in '$lineage' — batch-id-ordered state is per-lineage")
    }
  }
}
