package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming exact-substring dedup — d28's rewrite run at the door:
  * every arriving document is stripped of ≥ `minLen`-token runs
  * whose k-grams were already seen (in an earlier batch, or earlier
  * within its own batch in (doc_id, pos) order — a single-batch
  * drive over a whole corpus reproduces batch d28 EXACTLY,
  * spec-pinned, because the batch-id component of the first-
  * occurrence order is constant). Anchoring, span construction and
  * the token cut are the SAME operators as the batch query
  * ([[Dedup.substringAnchors]], [[Dedup.coveredToSpans]],
  * [[Dedup.stripSpans]]), so stream and batch can never drift on
  * the definition.
  *
  * Batch-vs-stream deviation, stated (the BoilerplateStream door
  * posture): "first occurrence" is ARRIVAL-ordered — min(batch_id,
  * doc_id, pos) — so a gram first seen in batch 1 keeps batch 1's
  * occurrence even when a later batch brings a smaller doc_id, and
  * an already-emitted document is never retroactively re-stripped
  * when its runs become duplicated later; the periodic batch d28
  * sweep is the retroactive complement. Batch-id ordering is only
  * monotone within one lineage, so a stateDir is LOCKED to its
  * first lineage ([[StatePartitions.requireLineage]] throws on a
  * foreign marker).
  *
  * State is the per-gram occurrence table (g, cnt, first) with one
  * deterministic `batch=<lineage>-<batchId>` partition per
  * micro-batch — a replayed batch OVERWRITES its own partition
  * (exactly-once without tagged versions, the BoilerplateStream
  * trick) — COMPACTED every `compactEvery` batches by the
  * crash-safe manifest fold in [[StatePartitions]] (cnt and
  * min(first) are associative), so the live partition count is
  * bounded by the cadence, not the stream lifetime.
  *
  * State size, stated honestly: distinct grams ≈ corpus tokens (most
  * k-grams are unique), so the state is CORPUS-PROPORTIONAL — that is
  * the inherent lower bound of exact cross-history substring dedup
  * (a suffix array carries the same information). It is disk-backed
  * parquet, never driver- or executor-resident. Per-batch COST is
  * O(batch), not O(history), since r15: a Bloom filter built over
  * the batch's distinct grams (the d9 decontaminateBloom pattern)
  * thins the state scan BEFORE the g-keyed sum/min aggregate, so
  * only state rows whose gram (probably) recurs in the batch ever
  * shuffle — and since r16 the filter's fpp scales DOWN with state
  * size ([[BloomFront]]), pinning the false-positive term at
  * ≤ |batch grams| rows instead of fpp·|history|; Bloom false
  * positives die in the subsequent anchor equi-join, and a batch
  * gram's surviving rows always carry its FULL history count, so
  * occ and first are exact. */
object SubstringStream {

  /** Batch anchor fan-out: (doc_id, pos, g) — the shared operator
    * ([[Dedup.substringAnchors]]). */
  private def anchors(docs: DataFrame, k: Int): DataFrame =
    Dedup.substringAnchors(docs, k)

  /** Gram-hash shard id — pmod of the (already-hashed) gram value,
    * the "prefix" of the sharded state layout. */
  private def shardOf(g: org.apache.spark.sql.Column, nShards: Int) =
    pmod(g, lit(nShards.toLong)).cast("int")

  /** The live shard roots of a SHARDED gram tree (`shard=<s>/`
    * under `grams/`), or Nil for the unsharded layout. */
  private[graft] def shardRoots(gramsDir: String): Seq[(Int, String)] = {
    val d = new java.io.File(gramsDir)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      .map(f => f.getName.stripPrefix("shard=").toInt -> f.getPath)
      .sortBy(_._1)
  }

  /** Every live state partition dir, across both layouts. */
  private def allLiveDirs(gramsDir: String): Seq[String] = {
    val sh = shardRoots(gramsDir)
    if (sh.isEmpty) StatePartitions.liveDirs(gramsDir)
    else sh.flatMap { case (_, root) => StatePartitions.liveDirs(root) }
  }

  /** Accumulated per-gram state: (g, occ, first{bid, doc_id, pos}),
    * aggregated over the LIVE partitions (compaction-aware read;
    * layout-agnostic — a sharded tree reads as the union of its
    * shard families). */
  def gramState(spark: SparkSession, stateDir: String): DataFrame = {
    val dirs = allLiveDirs(s"$stateDir/grams")
    require(dirs.nonEmpty, s"no live state partitions under $stateDir/grams")
    spark.read.parquet(dirs: _*)
      .groupBy("g").agg(sum("cnt").as("occ"), min("first").as("first"))
  }

  /** Cleaned output rows (doc_id, n_tokens, n_stripped, clean_text). */
  def cleaned(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/clean").drop("batch")

  /** One layout per stateDir, fixed at first batch: a tree written
    * unsharded cannot be resumed sharded (and vice versa) — the
    * probe/compaction walks would silently miss state. */
  private def requireLayout(stateDir: String, nShards: Int): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val want = s"nshards=${math.max(nShards, 1)}"
    val p = Paths.get(stateDir, "_layout")
    if (Files.exists(p)) {
      val have = Files.readString(p).trim
      if (have != want) throw new IllegalStateException(
        s"stateDir $stateDir carries gram layout '$have'; refusing " +
          s"'$want' — the shard layout is fixed at the first batch")
    } else {
      val tmp = Paths.get(stateDir, "_layout.tmp")
      Files.writeString(tmp, want)
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
      ()
    }
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p))
      scala.util.Using.resource(java.nio.file.Files.walk(p)) { s =>
        s.iterator().asScala.toSeq.reverse
          .foreach(q => java.nio.file.Files.deleteIfExists(q))
      }
  }

  /** `nShards > 1` (r18, SURVEY's documented next step for the
    * corpus-proportional state): the gram tree becomes one
    * INDEPENDENT [[StatePartitions]] family per gram-hash shard —
    * `grams/shard=<s>/batch=…` — so (a) no directory tree's listing
    * ever exceeds one shard's live partitions, (b) each compaction
    * tick folds nShards bounded, independent jobs (each 1/nShards of
    * the state — parallelizable across a cluster) instead of one
    * state-sized fold, and (c) the per-batch probe reads ONLY the
    * shard families the batch's grams hash into — pruning by
    * construction (an explicit dir list), which a routed deployment
    * (per-source streams) turns into probe-one-family-per-batch.
    * The batch's shard split is ONE partitioned write (no per-shard
    * jobs) staged then renamed into the per-shard trees; occurrence
    * semantics, the Bloom front and the strip operators are
    * byte-identical to the unsharded gate (spec-pinned). */
  def substringGate(docs: DataFrame, stateDir: String,
      k: Int = 10, minLen: Int = 20,
      lineage: String = "run0", compactEvery: Int = 8,
      bloomFpp: Double = 0.01, nShards: Int = 1): StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        import java.nio.file.{Files, Paths}
        Files.createDirectories(Paths.get(stateDir))
        StatePartitions.requireLineage(stateDir, lineage)
        requireLayout(stateDir, nShards)
        val sharded = nShards > 1
        val gramsRoot = s"$stateDir/grams"
        val marker = Paths.get(stateDir, s"_batch-$lineage-$batchId")
        if (!Files.exists(marker)) {
          val spark = batch.sparkSession
          val sub = s"batch=$lineage-$batchId"
          // EAGER checkpoint: the fan-out feeds the state write AND
          // the strip join that reads the directory this batch
          // appends to (the CLAUDE.md crosses-executions rule)
          val ex = anchors(batch.toDF(), k).localCheckpoint()
          if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
            val fold: DataFrame => DataFrame =
              st => st.groupBy("g")
                .agg(sum("cnt").as("cnt"), min("first").as("first"))
            if (!sharded)
              StatePartitions.compact(spark, gramsRoot,
                s"$lineage-$batchId", sub, fold)
            else shardRoots(gramsRoot).foreach { case (_, root) =>
              StatePartitions.compact(spark, root,
                s"$lineage-$batchId", sub, fold)
            }
          }
          val gagg = ex.groupBy("g")
            .agg(count(lit(1)).as("cnt"),
              min(struct(lit(batchId).as("bid"), col("doc_id"),
                col("pos"))).as("first"))
          if (!sharded)
            gagg.write.mode("overwrite").parquet(s"$gramsRoot/$sub")
          else {
            // one partitioned write into a staging dir, then a
            // rename per shard into `shard=<s>/batch=…` — replay
            // (marker absent) deletes each target first, keeping
            // the overwrite-own-partition exactly-once contract
            val staging = s"$stateDir/_staging-$lineage-$batchId"
            gagg.withColumn("shard", shardOf(col("g"), nShards))
              .write.mode("overwrite").partitionBy("shard")
              .parquet(staging)
            new java.io.File(staging).listFiles()
              .filter(f => f.isDirectory && f.getName.startsWith("shard="))
              .foreach { sd =>
                val target = Paths.get(gramsRoot, sd.getName, sub)
                Files.createDirectories(target.getParent)
                deleteTree(target)
                Files.move(sd.toPath, target)
                ()
              }
            deleteTree(Paths.get(staging))
          }
          val bg = ex.select("g").distinct()
          val nBg = bg.count()
          val spans =
            if (nBg == 0)
              // every doc shorter than k tokens: nothing can strip
              ex.select(col("doc_id"), col("pos").cast("long")
                .as("span_start"), col("pos").cast("long").as("span_len"))
                .limit(0)
            else {
              // the d9 Bloom front, NATIVE since r16: built with
              // bloom_filter_agg, probed with might_contain over a
              // binary literal (codegen, no ScalaUDF/broadcast), and
              // fpp SCALED with state size so expected false
              // positives stay ≤ |batch grams| — the per-batch
              // shuffle is O(batch) regardless of history, not
              // O(batch + fpp·history) (r15 verdict items 5/7).
              // Exactness survives as before: a bloom-positive gram
              // keeps ALL its state rows (full occ/first) while
              // false positives die in the anchor join below. The
              // state row count reads parquet footers only —
              // driver-side since r17, no Spark job (the r16
              // known-limits item; StatePartitions.rowCount). A
              // sharded tree lists/counts/scans ONLY the batch's
              // shard families (fpp scales against the probed state
              // — the false-positive bound is per probed row).
              val probeDirs =
                if (!sharded) StatePartitions.liveDirs(gramsRoot)
                else {
                  val batchShards = bg
                    .select(shardOf(col("g"), nShards).as("s"))
                    .distinct().collect().map(_.getInt(0)).toSet
                  shardRoots(gramsRoot)
                    .filter { case (s, _) => batchShards(s) }
                    .flatMap { case (_, root) =>
                      StatePartitions.liveDirs(root) }
                }
              val stateRows = StatePartitions.rowCountDirs(spark, probeDirs)
              val fpp = BloomFront.scaledFpp(bloomFpp, nBg, stateRows)
              val bf = BloomFront.build(bg, col("g"), nBg, fpp)
              val st = spark.read.parquet(probeDirs: _*)
                .filter(BloomFront.probe(bf, col("g")))
                .groupBy("g")
                .agg(sum("cnt").as("occ"), min("first").as("first"))
                .filter(col("occ") >= 2)
              val later = ex.join(st, Seq("g"))
                .filter(!(col("first.bid") === batchId
                  && col("first.doc_id") === col("doc_id")
                  && col("first.pos") === col("pos")))
                .select("doc_id", "pos")
              Dedup.coveredToSpans(later, k, minLen)
            }
          Dedup.stripSpans(batch.toDF(), spans)
            .write.mode("overwrite").parquet(s"$stateDir/clean/$sub")
          val tmp = Paths.get(stateDir, s"_batch-$lineage-$batchId.tmp")
          Files.writeString(tmp, "done")
          Files.move(tmp, marker,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
        ()
      }
      .start()
}
