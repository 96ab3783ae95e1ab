package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Indexing, Validate}
import graft.sources.VersionedTable

/** The reference's WHOLE DAG — harvest → transform → validate →
  * index (harvest.py feeding transform.py feeding validate.py
  * feeding the Solr collection) — as ONE incremental foreachBatch
  * lifecycle, composing the operators that are each already oracled
  * or spec'd on their own:
  *
  *  1. h1 status split: records flagged deleted become the batch's
  *     delete set; the rest are upsert candidates.
  *  2. h8 content-hash diff vs the persisted snapshot: only ADDED or
  *     CHANGED candidates flow on — the pass that lets the expensive
  *     transform/validate stages touch only what moved (a pure
  *     re-send publishes NOTHING: no new index version, no
  *     re-validation, no duplicate quarantine rows).
  *  3. t1 crosswalk transform of the moved rows only.
  *  4. v1/v2 validate split: passing rows MERGE into the serving
  *     index (SCD-1 `Indexing.applyChanges` + atomic alias swap —
  *     the collection-build-then-alias-swap lifecycle); failing rows
  *     land in a per-batch quarantine report. An invalid doc's hash
  *     still enters the snapshot, so an unchanged re-send of a bad
  *     record is not re-validated or re-quarantined — it must CHANGE
  *     to get another hearing, exactly the reference's re-harvest
  *     behavior.
  *
  * Crash-safety: the index merge and the snapshot merge are
  * tagged-version writes (replay skips a committed merge); the
  * quarantine subdir is a deterministic per-(lineage,batchId)
  * overwrite, written BEFORE the snapshot commit and skipped on
  * replay once the snapshot tag exists (after that commit the diff
  * recomputes empty, so rewriting quarantine would erase it); the
  * `(lineage, batchId)` marker lands last. Every crash point replays
  * to the same served state.
  *
  * At 100 TB every stage is id-keyed or map-only: the diff is one
  * (id, 16-byte-hash) join — payloads never shuffle — the merge is
  * the anti-join MERGE shape, and transform/validate are map-only
  * over the moved rows only. */
object EtlStream {

  def indexDir(stateDir: String): String = s"$stateDir/index"
  def snapshotDir(stateDir: String): String = s"$stateDir/snapshot"
  def quarantineRoot(stateDir: String): String = s"$stateDir/quarantine"

  def servingIndex(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    VersionedTable.readLatest(spark, indexDir(stateDir))

  def quarantine(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    spark.read.parquet(quarantineRoot(stateDir))

  /** `records` must carry `idCol`, `statusCol`, and whatever columns
    * `contentCols`/`transform` read. Per-batch ids must be unique
    * (the reference's per-file record streams are; apply
    * h7 latestPerIdentifier upstream if yours are not). */
  def maintainEtl(records: DataFrame, stateDir: String,
      idCol: String, statusCol: String, deletedValue: String,
      contentCols: Seq[String],
      transform: DataFrame => DataFrame,
      rules: Seq[Validate.Rule],
      lineage: String = "run0"): StreamingQuery =
    records.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        import java.nio.file.{Files, Paths}
        Files.createDirectories(Paths.get(stateDir))
        val marker = Paths.get(stateDir, s"_batch-$lineage-$batchId")
        if (!Files.exists(marker) && !batch.isEmpty) {
          val spark = batch.sparkSession
          val tag = s"$lineage-$batchId"
          val dels = batch.toDF()
            .filter(col(statusCol) === deletedValue)
            .select(idCol).localCheckpoint()
          val cand = batch.toDF()
            .filter(col(statusCol) =!= deletedValue)
            .withColumn("__h",
              md5(concat_ws("", contentCols.map(col): _*)))
          val sDir = snapshotDir(stateDir)
          val snap = VersionedTable.latestVersion(sDir)
            .map(_ => VersionedTable.readLatest(spark, sDir))
            .getOrElse(cand.select(col(idCol), col("__h")).limit(0))
          // h8 diff: keep added (no snapshot row) + changed (hash
          // differs). EAGER: feeds transform AND the snapshot merge,
          // and the snapshot dir mutates below (the CLAUDE.md
          // cross-plan checkpoint rule).
          val moved = cand
            .join(snap.select(col(idCol), col("__h").as("__prev")),
              Seq(idCol), "left")
            .filter(col("__prev").isNull || col("__prev") =!= col("__h"))
            .drop("__prev")
            .localCheckpoint()
          val snapCommitted =
            VersionedTable.taggedVersion(sDir, tag).isDefined
          val tr = transform(moved.drop("__h")).localCheckpoint()
          // a batch that MOVED nothing and deleted nothing publishes
          // NOTHING — no index version, no snapshot version, no
          // quarantine dir. That's the h8 promise: a pure re-send
          // costs one (id, hash) join and leaves no trace.
          val anyWork = !moved.isEmpty || !dels.isEmpty
          // index merge (tagged): valid rows upsert, deleted ids drop
          val iDir = indexDir(stateDir)
          if (anyWork && VersionedTable.taggedVersion(iDir, tag).isEmpty) {
            val valid = Validate.filterValid(tr, rules)
            val base = VersionedTable.latestVersion(iDir)
              .map(_ => VersionedTable.readLatest(spark, iDir))
              .getOrElse(valid.limit(0))
            val next = Indexing.applyChanges(base, valid, dels, idCol)
            VersionedTable.write(next, iDir, Some(tag))
          }
          // quarantine report — before the snapshot commit; after it
          // the diff recomputes empty and a rewrite would erase it
          if (anyWork && !snapCommitted) {
            val bad = tr.withColumn("__failures", Validate.failures(rules))
              .filter(size(col("__failures")) > 0)
              .select(col(idCol),
                concat_ws("\n", col("__failures")).as("report"))
              .withColumn("batch_id", lit(batchId))
              .localCheckpoint()
            if (!bad.isEmpty)
              bad.write.mode("overwrite")
                .parquet(s"${quarantineRoot(stateDir)}/batch=$tag")
          }
          // snapshot merge LAST (tagged) — this is the diff's commit
          if (anyWork && !snapCommitted) {
            val snapNext = Indexing.applyChanges(
              snap, moved.select(col(idCol), col("__h")), dels, idCol)
            VersionedTable.write(snapNext, sDir, Some(tag))
          }
        }
        if (!Files.exists(marker)) {
          val tmp = Paths.get(stateDir, s"_batch-$lineage-$batchId.tmp")
          Files.writeString(tmp, "done")
          Files.move(tmp, marker,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
        ()
      }
      .start()
}
