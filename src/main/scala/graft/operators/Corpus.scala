package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-management operators for a training-data pipeline: the
  * steps between "deduplicated documents" and "training shards".
  *
  * Scale posture: `hashSplit` is a pure map (no shuffle, no state,
  * no RNG) — the split decision is a deterministic function of the
  * document id, so it is stable under re-runs, re-partitioning, and
  * incremental appends (a new document never moves an old one
  * between splits, the property `sample(fraction)` does NOT give).
  * `packSequences` is one window aggregation per (partition key):
  * the running-token-total layout every sequence-packing trainer
  * needs, parallel across keys.
  */
object Corpus {

  /** Deterministic train/val/test assignment by id hash.
    * bucket = h32("split:" + id) mod 100; split boundaries are
    * cumulative percentages (e.g. 90/5 → train <90, val <95, test
    * the rest). Engine-portable: the same md5-derived bucket is
    * reproducible in any engine (oracle mirror in queries.PipelineQ).
    */
  def hashSplit(df: DataFrame, idCol: Column,
      pctTrain: Int, pctVal: Int): DataFrame = {
    require(pctTrain + pctVal < 100, "train+val must leave room for test")
    val bucket = pmod(Hashing.h32(7, idCol.cast("string")), lit(100))
    df.withColumn("bucket", bucket.cast("int"))
      .withColumn("split",
        when(col("bucket") < pctTrain, "train")
          .when(col("bucket") < pctTrain + pctVal, "val")
          .otherwise("test"))
  }

  /** Token-budget sequence packing: within each `keyCol` stream,
    * documents (ordered by `orderCol`, which must be unique per key)
    * are laid out contiguously and cut into chunks of ~`budget`
    * tokens: chunk = floor(running_total_before_doc / budget).
    * A document lands in the chunk where its first token falls, so
    * every chunk holds ≥1 document and chunk boundaries never depend
    * on physical partitioning — only on the (key, order) layout.
    *
    * At 100 TB the window partitions by `keyCol`; if one key's stream
    * is unboundedly large, compose a shard column into `keyCol`
    * (hash-bucket of the order key) to bound each window's size —
    * chunk ids then nest as (key, shard, chunk). */
  def packSequences(df: DataFrame, keyCol: Column, orderCol: Column,
      tokensCol: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(tokensCol).over(w))
      .withColumn("chunk_id",
        floor((col("cum_tokens") - tokensCol) / budget).cast("long"))
  }
}
