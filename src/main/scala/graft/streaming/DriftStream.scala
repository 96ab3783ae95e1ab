package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Validate
import graft.sources.VersionedTable

/** Streaming profile-drift monitoring — the v8 schema-erosion guard
  * run incrementally: each micro-batch's column profile is compared
  * against the PREVIOUS batch's stored profile, the drift report
  * lands under `drift/batch=<id>`, and the stored profile advances
  * behind the versioned alias. An upstream feed that silently nulls
  * a field or collapses its value domain is flagged one batch after
  * it happens, not at the next full-corpus audit.
  *
  * Since round 7 the monitor optionally carries a SECOND profile
  * family: per-column QUANTILE fingerprints (`quantileCols` →
  * [[Validate.quantileProfile]], the KLL sketch), compared per batch
  * into `qdrift/batch=<id>` — the shape change min/max/null-rate
  * cannot see (v12's batch form, run incrementally). Both families
  * ride the same batch scan; state is O(|cols|·|pcts|).
  *
  * Scale shape: per batch, ONE aggregation pass over the batch per
  * family plus |cols|-row joins against the stored profiles —
  * history is never rescanned.
  *
  * Replay protocol: reports BEFORE profiles, per family — report
  * writes are deterministic per-batch overwrites, and each profile
  * write carries the `(lineage, batchId)` tag, so recovery from any
  * crash point recomputes the identical report against the
  * still-previous profile for exactly the families whose tagged
  * write is missing, then finishes any pending swap. The batchId
  * marker then closes the batch as in the other maintainers.
  *
  * Bounded history (the maintain() cadence contract the sibling
  * maintainers carry): after each batch, all but the newest
  * `keepVersions` profile versions (never the serving one) and all
  * but the newest `keepReports` drift/qdrift report dirs are
  * deleted — a year of micro-batches holds O(keep) state. */
object DriftStream {

  def maintainDrift(docs: DataFrame, stateDir: String, cols: Seq[String],
      lineage: String = "run0",
      quantileCols: Seq[String] = Seq.empty,
      pcts: Seq[Int] = Seq(25, 50, 75, 90),
      capacity: Int = 32768,
      keepVersions: Int = 3,
      keepReports: Int = 20): StreamingQuery = {
    // pruneVersions guards keepVersions >= 1 itself; the report prune
    // below has no such floor, and keepReports = 0 would delete every
    // drift/qdrift report INCLUDING the one this batch just wrote
    require(keepReports >= 1, s"keepReports must be >= 1, got $keepReports")
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import java.nio.file.{Files, Paths}
        val marker = Paths.get(stateDir, s"_batch-$lineage-$batchId")
        if (!Files.exists(marker)) {
          if (!batch.isEmpty) {
            val spark = batch.sparkSession
            val profDir = s"$stateDir/profile"
            val qprofDir = s"$stateDir/qprofile"
            val tag = s"$lineage-$batchId"
            // one (needProf/needQ) pass per family: recompute + write
            // only the families whose tagged version is missing (a
            // crash between the two writes replays just the second)
            val needProf = VersionedTable.taggedVersion(profDir, tag).isEmpty
            val needQ = quantileCols.nonEmpty &&
              VersionedTable.taggedVersion(qprofDir, tag).isEmpty
            // profiles feed the reports AND their own writes — eager
            // checkpoint per the crosses-executions rule
            val curProf =
              if (needProf) Some(Validate.profile(batch, cols).localCheckpoint(true))
              else None
            val curQ =
              if (needQ) Some(Validate.quantileProfile(batch, quantileCols,
                pcts, capacity).localCheckpoint(true))
              else None
            // reports first (idempotent overwrites), then the tagged
            // profile commits, per family
            curProf.foreach { p =>
              if (VersionedTable.latestVersion(profDir).isDefined) {
                Validate.profileDriftFromProfiles(
                    VersionedTable.readLatest(spark, profDir), p)
                  .write.mode("overwrite")
                  .parquet(s"$stateDir/drift/batch=$batchId")
              }
              VersionedTable.write(p, profDir, Some(tag)); ()
            }
            curQ.foreach { q =>
              if (VersionedTable.latestVersion(qprofDir).isDefined) {
                Validate.quantileDriftFromProfiles(
                    VersionedTable.readLatest(spark, qprofDir), q)
                  .write.mode("overwrite")
                  .parquet(s"$stateDir/qdrift/batch=$batchId")
              }
              VersionedTable.write(q, qprofDir, Some(tag)); ()
            }
            // crashed after a tagged commit but before its swap:
            // finish pointing the alias at the committed version
            Seq(profDir, qprofDir).foreach { d =>
              VersionedTable.taggedVersion(d, tag).foreach { v =>
                if (VersionedTable.latestVersion(d).forall(_ < v))
                  VersionedTable.swapTo(d, v)
              }
            }
            // bounded history: prune old profile versions + reports
            Seq(profDir, qprofDir)
              .filter(d => VersionedTable.listVersions(d).nonEmpty)
              .foreach(VersionedTable.pruneVersions(_, keepVersions))
            Seq(s"$stateDir/drift", s"$stateDir/qdrift").foreach { d =>
              val f = new java.io.File(d)
              if (f.exists()) {
                f.listFiles().toSeq
                  .filter(x => x.isDirectory && x.getName.startsWith("batch="))
                  .sortBy(_.getName.stripPrefix("batch=").toLong)
                  .dropRight(keepReports)
                  .foreach(x => VersionedTable.deleteRecursively(x.toPath))
              }
            }
          }
          Files.createDirectories(Paths.get(stateDir))
          val tmp = Paths.get(stateDir, s"_batch-$lineage-$batchId.tmp")
          Files.writeString(tmp, "done")
          Files.move(tmp, marker,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
        ()
      }
      .start()
  }

  /** All drift reports so far, with their batch ids. */
  def driftReports(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/drift")
      .withColumn("batch", col("batch").cast("long"))

  /** All quantile-drift reports so far, with their batch ids. */
  def quantileDriftReports(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/qdrift")
      .withColumn("batch", col("batch").cast("long"))
}
