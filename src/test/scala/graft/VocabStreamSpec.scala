package graft

import graft.operators.{Indexing, VocabIndex}
import graft.sources.VersionedTable
import graft.streaming.VocabStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming suggester/spellcheck dictionary maintenance: micro-batch
  * appends through VocabStream must converge to the from-scratch
  * batch build (vocab AND prefix-repaired suggestion table), survive
  * replay, and keep the version history bounded. */
class VocabStreamSpec extends AnyFunSuite {
  import TestSession._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def stage(df: DataFrame, dir: java.nio.file.Path, name: String,
      mtimeMs: Long): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_vstage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.resolve("w").toString)
    val part = java.nio.file.Files.list(tmp.resolve("w"))
      .filter(p => p.getFileName.toString.startsWith("part-")
        && p.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    val dst = dir.resolve(s"$name.parquet")
    java.nio.file.Files.move(part, dst)
    java.nio.file.Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    ()
  }

  private def assertSameRows(got: DataFrame, want: DataFrame,
      what: String): Unit =
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"$what diverged from the batch twin")

  test("streamed vocab index converges to the from-scratch build and replay is idempotent") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val parts = Seq(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2))
    val src = java.nio.file.Files.createTempDirectory("graft_vsrc")
    val idx = java.nio.file.Files.createTempDirectory("graft_vidx")
      .resolve("vocabindex").toString
    val t0 = System.currentTimeMillis() - 600000
    parts.zipWithIndex.foreach { case (p, i) =>
      stage(p, src, s"b$i", t0 + i * 60000) }

    val stream = spark.readStream.schema(docSchema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(src.toString)
    val q = VocabStream.maintainVocab(stream, idx, "text",
      prefixLen = 3, k = 3, keepVersions = 2)
    q.processAllAvailable(); q.stop()

    // serving vocab == one-shot tokenCounts over the whole corpus
    assertSameRows(VocabIndex.servingVocab(spark, idx),
      Indexing.tokenCounts(docs, col("text")), "serving vocab")
    // prefix-repaired suggestion table == one-shot suggest
    assertSameRows(VocabIndex.servingSuggest(spark, idx),
      Indexing.suggest(docs, col("text"), 3, 3), "serving suggestions")
    // spellcheck through the serving dictionary == direct spellcheck
    val qs = spark.createDataFrame(Seq(
      Tuple1("vektor"), Tuple1("pipelin"), Tuple1("sistem")))
      .toDF("query")
    assertSameRows(
      VocabIndex.spellcheckServing(spark, idx, qs, maxDist = 2),
      Indexing.spellcheck(qs,
        Indexing.tokenCounts(docs, col("text")), maxDist = 2),
      "serving spellcheck")

    // maintain() bounded the history: ≤ keepVersions versions remain
    // and the serving version survived
    Seq("vocab", "suggest").foreach { t =>
      val vs = VersionedTable.listVersions(s"$idx/$t")
      assert(vs.size <= 2, s"$t history unbounded: $vs")
      assert(vs.contains(VersionedTable.latestVersion(s"$idx/$t").get))
    }

    // replay: a second stream over the same lineage re-delivers the
    // same files; markers must make every batch a no-op
    val vBefore = VersionedTable.latestVersion(s"$idx/vocab").get
    val stream2 = spark.readStream.schema(docSchema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(src.toString)
    val q2 = VocabStream.maintainVocab(stream2, idx, "text",
      prefixLen = 3, k = 3, keepVersions = 2)
    q2.processAllAvailable(); q2.stop()
    assert(VersionedTable.latestVersion(s"$idx/vocab").get == vBefore,
      "replayed batches were re-applied despite markers")
  }

  test("tagged append survives crash-replay without double-counting") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val idx = java.nio.file.Files.createTempDirectory("graft_vcrash")
      .resolve("vocabindex").toString
    VocabIndex.build(a, "text", idx, prefixLen = 3, k = 3)

    // completed append replayed with the same tag: must be a no-op
    VocabIndex.append(b, "text", idx, 3, 3, tag = Some("run0-1"))
    val vAfter = VersionedTable.latestVersion(s"$idx/vocab").get
    VocabIndex.append(b, "text", idx, 3, 3, tag = Some("run0-1"))
    assert(VersionedTable.latestVersion(s"$idx/vocab").get == vAfter,
      "replayed tagged append re-applied the delta")
    assertSameRows(VocabIndex.servingVocab(spark, idx),
      Indexing.tokenCounts(docs, col("text")),
      "vocab after tagged replay")

    // crash between the vocab commit and the suggestion write:
    // simulate by committing ONLY the tagged vocab merge, then
    // recover through append — the suggestion table must converge
    // to the full-build result without re-merging the counts
    val docs2 = docs.withColumn("text",
      concat(col("text"), lit(" zzznewtoken")))
    val mergedVocab = VocabIndex.servingVocab(spark, idx)
      .unionByName(Indexing.tokenCounts(docs2, col("text")))
      .groupBy("tok").agg(sum("freq").as("freq"))
      .localCheckpoint(true)
    VersionedTable.write(mergedVocab, s"$idx/vocab", Some("run0-2"))
    VocabIndex.append(docs2, "text", idx, 3, 3, tag = Some("run0-2"))
    assertSameRows(VocabIndex.servingVocab(spark, idx), mergedVocab,
      "vocab after mid-crash recovery")
    assertSameRows(VocabIndex.servingSuggest(spark, idx),
      Indexing.suggestFromVocab(mergedVocab, 3, 3),
      "suggestions after mid-crash recovery")
  }

  test("12 heavy appends under maintain() keep the history bounded and serving exact") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val parts = (0 until 12).map(i => docs.filter(col("doc_id") % 12 === i))
    val idx = java.nio.file.Files.createTempDirectory("graft_vcad")
      .resolve("vocabindex").toString
    VocabIndex.build(parts.head, "text", idx, prefixLen = 3, k = 3,
      tag = Some("t0"))
    parts.tail.zipWithIndex.foreach { case (p, i) =>
      VocabIndex.append(p, "text", idx, 3, 3, tag = Some(s"t${i + 1}"))
      VocabIndex.maintain(idx, keep = 3)
    }
    Seq("vocab", "suggest").foreach { t =>
      val vs = VersionedTable.listVersions(s"$idx/$t")
      assert(vs.size <= 3, s"$t history unbounded after 12 appends: $vs")
      assert(vs.contains(VersionedTable.latestVersion(s"$idx/$t").get))
    }
    assertSameRows(VocabIndex.servingVocab(spark, idx),
      Indexing.tokenCounts(docs, col("text")), "vocab after 12 appends")
    assertSameRows(VocabIndex.servingSuggest(spark, idx),
      Indexing.suggest(docs, col("text"), 3, 3),
      "suggestions after 12 appends")
  }

  test("appending an empty batch leaves the serving tables untouched") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val idx = java.nio.file.Files.createTempDirectory("graft_vempty")
      .resolve("vocabindex").toString
    VocabIndex.build(docs, "text", idx, prefixLen = 3, k = 3)
    val v0 = VersionedTable.latestVersion(s"$idx/vocab").get
    VocabIndex.append(docs.filter(lit(false)), "text", idx,
      prefixLen = 3, k = 3)
    assert(VersionedTable.latestVersion(s"$idx/vocab").get == v0)
  }
}
