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
  * Scale shape: per batch, ONE profile aggregation over the batch
  * (the scan it needed anyway) plus a |cols|-row join against the
  * stored profile — history is never rescanned; monitor state is the
  * O(|cols|) previous profile.
  *
  * Replay protocol: report BEFORE profile, both idempotent — the
  * report write is a deterministic per-batch overwrite, and the
  * profile write carries the `(lineage, batchId)` tag, so recovery
  * from any crash point either recomputes the identical report
  * against the still-previous profile or (tagged profile present —
  * meaning the report already landed, by the ordering) skips
  * straight to finishing the swap. The batchId marker then closes
  * the batch as in the other maintainers. */
object DriftStream {

  def maintainDrift(docs: DataFrame, stateDir: String, cols: Seq[String],
      lineage: String = "run0"): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import java.nio.file.{Files, Paths}
        val marker = Paths.get(stateDir, s"_batch-$lineage-$batchId")
        if (!Files.exists(marker)) {
          if (!batch.isEmpty) {
            val spark = batch.sparkSession
            val profDir = s"$stateDir/profile"
            val tag = s"$lineage-$batchId"
            VersionedTable.taggedVersion(profDir, tag) match {
              case Some(v) =>
                // crashed after the profile commit: the report is
                // already on disk (ordering) — just finish the swap
                if (VersionedTable.latestVersion(profDir).forall(_ < v))
                  VersionedTable.swapTo(profDir, v)
              case None =>
                // profile feeds the report AND its own write — eager
                // checkpoint per the crosses-executions rule
                val curProf = Validate.profile(batch, cols)
                  .localCheckpoint(true)
                if (VersionedTable.latestVersion(profDir).isDefined) {
                  val report = Validate.profileDriftFromProfiles(
                    VersionedTable.readLatest(spark, profDir), curProf)
                  report.write.mode("overwrite")
                    .parquet(s"$stateDir/drift/batch=$batchId")
                }
                VersionedTable.write(curProf, profDir, Some(tag))
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

  /** All drift reports so far, with their batch ids. */
  def driftReports(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/drift")
      .withColumn("batch", col("batch").cast("long"))
}
