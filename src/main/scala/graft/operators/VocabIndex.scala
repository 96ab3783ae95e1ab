package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{FingerprintCache, VersionedTable}

/** Persisted, incrementally-maintained vocabulary index — the
  * serving artifact behind the suggester (x16) and spellcheck (x17)
  * components (the data-plane form of Solr's suggester/spellcheck
  * dictionaries, which the reference's collections rebuild on
  * commit; reference: solr_api_utils.py's collection serving
  * surface). Layout under `dir`:
  *
  *   - `vocab/v=N`   (tok, freq) via [[VersionedTable]] — atomic swap,
  *                   readers never see a half-merged dictionary.
  *   - `suggest/v=N` (prefix, rank, tok, freq) — the top-k-per-prefix
  *                   completion table [[Indexing.suggestFromVocab]]
  *                   emits.
  *
  * Scale shape: the ONLY corpus-sized stage is tokenizing the new
  * batch ([[Indexing.tokenCounts]], map-side partial aggregation).
  * The merge unions that delta with the previous vocab version —
  * both vocabulary-sized, tiny relative to the corpus that produced
  * them — and the suggestion rebuild is PREFIX-PRUNED: only prefixes
  * the delta actually touched get their top-k window recomputed;
  * untouched prefixes are copied forward with a broadcast anti-join.
  * Per-batch cost is O(|batch| + |vocab|), never O(corpus).
  */
object VocabIndex {

  private def vocabDir(dir: String) = s"$dir/vocab"
  private def suggestDir(dir: String) = s"$dir/suggest"

  /** Full build from a document frame: version 1 of both tables. */
  def build(docs: DataFrame, textCol: String, dir: String,
      prefixLen: Int, k: Int, tag: Option[String] = None): Unit = {
    // vocab feeds two executions (its own write, then the suggestion
    // write) — eager checkpoint per the crosses-executions rule.
    val vocab = Indexing.tokenCounts(docs, col(textCol))
      .localCheckpoint(true)
    VersionedTable.write(vocab, vocabDir(dir), tag)
    VersionedTable.write(
      Indexing.suggestFromVocab(vocab, prefixLen, k), suggestDir(dir), tag)
    ()
  }

  /** Merge one batch of new documents into the serving vocabulary
    * and incrementally repair the suggestion table. No-op on an
    * empty batch. `prefixLen`/`k` must match the build (caller
    * contract, same as SegmentedBm25's n_buckets).
    *
    * The count merge is NOT idempotent (re-applying a delta double
    * counts), so replayed callers MUST pass a per-batch `tag`:
    * if a tagged vocab version already exists, the merge committed
    * in a prior (possibly crashed) attempt and is not re-applied —
    * recovery then only finishes what's missing (pointer swap and/or
    * the suggestion table, rebuilt full from the committed vocab:
    * the touched-prefix set is no longer known, and the full rebuild
    * is vocabulary-sized — a rare-path cost, never corpus-sized). */
  def append(batch: DataFrame, textCol: String, dir: String,
      prefixLen: Int, k: Int, tag: Option[String] = None): Unit = {
    if (VersionedTable.latestVersion(vocabDir(dir)).isEmpty) {
      build(batch, textCol, dir, prefixLen, k, tag); return
    }
    val spark = batch.sparkSession
    tag.flatMap(t => VersionedTable.taggedVersion(vocabDir(dir), t)) match {
      case Some(committed) =>
        // crash recovery: vocab delta already merged — never remerge.
        if (VersionedTable.latestVersion(vocabDir(dir)).forall(_ < committed))
          VersionedTable.swapTo(vocabDir(dir), committed)
        if (tag.flatMap(t =>
            VersionedTable.taggedVersion(suggestDir(dir), t)).isEmpty) {
          val vocab = spark.read.parquet(s"${vocabDir(dir)}/v=$committed")
          VersionedTable.write(
            Indexing.suggestFromVocab(vocab, prefixLen, k),
            suggestDir(dir), tag)
        } else tag.foreach { t =>
          val sv = VersionedTable.taggedVersion(suggestDir(dir), t).get
          if (VersionedTable.latestVersion(suggestDir(dir)).forall(_ < sv))
            VersionedTable.swapTo(suggestDir(dir), sv)
        }
      case None =>
        // delta crosses three executions (vocab write, prefix set,
        // suggestion write) — eager checkpoint.
        val delta = Indexing.tokenCounts(batch, col(textCol))
          .localCheckpoint(true)
        if (delta.isEmpty) return

        val oldVocab = VersionedTable.readLatest(spark, vocabDir(dir))
        val merged = oldVocab.unionByName(delta)
          .groupBy("tok").agg(sum("freq").as("freq"))
        VersionedTable.write(merged, vocabDir(dir), tag)

        // Prefix-pruned suggestion repair: recompute top-k only where
        // a delta token lands; copy every other prefix forward
        // untouched. touched is bounded by the batch's distinct
        // prefixes — small — so both join sides broadcast.
        val touched = delta.filter(length(col("tok")) >= prefixLen)
          .select(substring(col("tok"), 1, prefixLen).as("prefix"))
          .distinct()
          .localCheckpoint(true)
        val newVocab = VersionedTable.readLatest(spark, vocabDir(dir))
        val repaired = Indexing.suggestFromVocab(
          newVocab.join(
            broadcast(touched.select(col("prefix").as("__p"))),
            substring(col("tok"), 1, prefixLen) === col("__p"), "left_semi"),
          prefixLen, k)
        val carried = VersionedTable.readLatest(spark, suggestDir(dir))
          .join(broadcast(touched), Seq("prefix"), "left_anti")
        VersionedTable.write(carried.unionByName(repaired),
          suggestDir(dir), tag)
    }
    ()
  }

  /** Build-if-absent convenience mirroring Retrieval.ensureIndex:
    * the index lands under the JVM temp dir keyed by a fingerprint
    * of the data directory's `documents.parquet` (full recursive
    * file listing) plus the build parameters, so a regenerated
    * dataset — or different prefixLen/k — gets a fresh build and an
    * unchanged one reuses it across sessions. Returns the index
    * dir. */
  def ensureVocabIndex(docs: DataFrame, textCol: String, dataDir: String,
      prefixLen: Int, k: Int): String = synchronized {
    val f = new java.io.File(s"$dataDir/documents.parquet")
    val live = ":vocab:v1"
    val key =
      Retrieval.corpusFingerprintKey(f) + s":p$prefixLen:k$k$live"
    val idxDir = FingerprintCache.prepare("graft_vocab", key, live)
    if (VersionedTable.latestVersion(vocabDir(idxDir)).isEmpty ||
        VersionedTable.latestVersion(suggestDir(idxDir)).isEmpty)
      build(docs, textCol, idxDir, prefixLen, k)
    idxDir
  }

  /** Serving reads — whatever version the alias points at. */
  def servingVocab(spark: SparkSession, dir: String): DataFrame =
    VersionedTable.readLatest(spark, vocabDir(dir))
  def servingSuggest(spark: SparkSession, dir: String): DataFrame =
    VersionedTable.readLatest(spark, suggestDir(dir))

  /** Spellcheck a query frame against the serving dictionary. */
  def spellcheckServing(spark: SparkSession, dir: String,
      queries: DataFrame, maxDist: Int): DataFrame =
    Indexing.spellcheck(queries, servingVocab(spark, dir), maxDist)

  /** Maintenance cadence twin of SegmentedBm25.maintain: a year of
    * micro-batches must not grow the version history unboundedly.
    * Deletes all but the newest `keep` versions of both tables,
    * never the serving one (the alias swap happened before any
    * reader could still need older versions only for rollback). */
  def maintain(dir: String, keep: Int = 3): Unit =
    Seq(vocabDir(dir), suggestDir(dir))
      .foreach(VersionedTable.pruneVersions(_, keep))
}
