package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the persisted IVF×PQ index: each
  * micro-batch of vectors is coarse-assigned against the FROZEN
  * centroids and PQ-encoded against the FROZEN codebook
  * (similarity/Ivfpq.appendToIndex — FAISS's add-after-train
  * contract run incrementally), landing as a per-list-partitioned
  * code segment + refine-sidecar rows under the same
  * (lineage, batchId) marker protocol as the other index-maintenance
  * streams; the tagged manifest version makes the append itself
  * idempotent across the crash window between the manifest flip and
  * the batch marker. Codebook/centroid drift from accumulated
  * appends is repaired by a periodic offline re-train
  * (Ivfpq.buildIndex), exactly the IVF maintainer's rhythm. */
object PqStream {

  def maintainIvfpq(vecs: DataFrame, indexDir: String,
      lineage: String = "run0"): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import java.nio.file.{Files, Paths}
        val marker = Paths.get(indexDir, s"_batch-$lineage-$batchId")
        if (!Files.exists(marker)) {
          if (!batch.isEmpty) {
            graft.similarity.Ivfpq.appendToIndex(batch.sparkSession,
              indexDir, batch.toDF(), tag = Some(s"$lineage-$batchId"))
            // compaction cadence: manifest + probe unions stay
            // O(maxSegments) for any number of micro-batches
            graft.similarity.Ivfpq.maintain(batch.sparkSession, indexDir)
          }
          Files.createDirectories(Paths.get(indexDir))
          val tmp = Paths.get(indexDir, s"_batch-$lineage-$batchId.tmp")
          Files.writeString(tmp, "done")
          Files.move(tmp, marker,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
        ()
      }
      .start()
}
