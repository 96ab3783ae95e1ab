package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the suggester/spellcheck vocabulary
  * index (operators/VocabIndex.scala): each micro-batch of documents
  * merges its token counts into the serving dictionary and repairs
  * the touched prefixes' completions, under the same
  * `(lineage, batchId)` replay-marker protocol as the other index
  * maintainers (see EventsStream.maintainIndex for why batchId alone
  * is unsafe). This closes the last index family without an
  * incremental twin: BM25 (Bm25Stream), IVF (IvfStream), and now the
  * suggest/spellcheck dictionary all stay serveable while a stream
  * feeds them — the reference's commit-then-rebuild suggester cycle
  * run as a structured stream. */
object VocabStream {

  def maintainVocab(docs: DataFrame, indexDir: String, textCol: String,
      prefixLen: Int, k: Int, lineage: String = "run0",
      keepVersions: Int = 3): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import java.nio.file.{Files, Paths}
        val marker = Paths.get(indexDir, s"_batch-$lineage-$batchId")
        if (!Files.exists(marker)) {
          if (!batch.isEmpty) {
            // the tag makes the non-idempotent count merge exactly-
            // once even when a crash lands BETWEEN the merge commit
            // and this marker (the window batchId markers can't cover)
            graft.operators.VocabIndex.append(
              batch, textCol, indexDir, prefixLen, k,
              tag = Some(s"$lineage-$batchId"))
            // cadence: bound the version history for any number of
            // micro-batches (VocabIndex.maintain never deletes the
            // serving version).
            graft.operators.VocabIndex.maintain(indexDir, keepVersions)
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
