package graft

import graft.operators._
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline compositions mirroring the reference's DAG
  * orchestrations — the whole `oai_to_s3` → validate → transform →
  * index flow as one declarative plan per stage, demonstrating that
  * graft operators compose the way tulflow tasks chain.
  */
class PipelineSpec extends AnyFunSuite {
  import TestSession._

  test("oai_to_s3 analog: window → set-filter → split → batch → write → read back") {
    val events = Tables.events(spark, sf)
    // harvest params: from/until + excluded sets (harvest.py:27-60)
    val harvested = Harvest.dateWindow(
      Harvest.excludeSets(events, col("event_type"), Seq("signup")),
      col("ts"),
      Some(java.sql.Timestamp.valueOf("2024-01-05 00:00:00")),
      Some(java.sql.Timestamp.valueOf("2024-01-25 00:00:00")))
    // split + batch + content-addressed write (harvest.py:185-261)
    val batched = Harvest.batchAssign(
      Harvest.flagDeleted(harvested, col("event_type"), "error"),
      Seq(col("is_deleted")), col("event_id"), recordsPerFile = 250)
    val out = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    // stamp run provenance like OaiXml's dag-id/dag-timestamp
    val stamped = Harvest.stampRun(batched, "dag-test", "2024-01-31T00:00:00")
    Sources.writeBatched(stamped, "is_deleted", "file_idx", out)
    // the "updated" side read back, pruned
    val updated = Sources.readStatus(spark, out, "is_deleted", false)
    val expected = harvested.filter(col("event_type") =!= "error").count()
    assert(updated.count() == expected)
    // provenance survives the round trip on every record
    assert(updated.filter(col("run_id") === "dag-test").count() == expected)
    assert(updated.count() > 0)
    // totals reported like oai_to_s3's return dict
    val deleted = Sources.readStatus(spark, out, "is_deleted", true).count()
    assert(updated.count() + deleted == batched.count())
  }

  test("validate → transform → index docs chain on the harvested corpus") {
    import Validate.Rule
    val rules = Seq(
      Rule("min_length", col("n_chars") >= 100, "too short"),
      Rule("known_lang", col("lang").isInCollection(Seq("en", "de", "fr", "es", "zh")), "bad lang"))
    val docs = Tables.documents(spark, sf)
    val valid = Validate.filterValid(docs, rules)
    val invalidReport = Validate.invalidReport(docs, rules, col("doc_id"),
      col("source"), col("text"), col("source"))
    assert(valid.count() + invalidReport.count() == docs.count())
    // crosswalk the valid records and build index docs (transform.py → solr)
    val crosswalked = Transform.crosswalk(valid, Seq(
      "id" -> col("doc_id"),
      "title" -> upper(substring(col("text"), 1, 40)),
      "lang" -> col("lang")))
    val indexed = crosswalked.select(Indexing.solrDoc(Seq(
      "id" -> col("id"), "lang" -> concat(lit("\""), col("lang"), lit("\"")))).as("doc"))
    assert(indexed.count() == valid.count())
    assert(indexed.head.getString(0).startsWith("{\"id\":"))
  }

  test("elevate pins, excludes, and fills per Solr QEC semantics (r12)") {
    import TestSession.spark.implicits._
    // organic ranking for two queries; q 2 has NO elevation config
    val results = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4), (1L, 14L, 5),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3))
      .toDF("q_id", "n_id", "rank")
    // q 1: pin 12 (organically rank 3) and 99 (not surfaced at all)
    val elevation = Seq((1L, 12L, 1), (1L, 99L, 2)).toDF("q_id", "n_id", "pos")
    val got = graft.operators.Indexing.elevate(results, elevation, k = 4)
      .orderBy("q_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getBoolean(3))).toSeq
    assert(got == Seq(
      // q1: pins first in config order (99 was never surfaced —
      // forceElevation), then organic minus the pinned 12
      (1L, 12L, 1, true), (1L, 99L, 2, true),
      (1L, 10L, 3, false), (1L, 11L, 4, false),
      // q2: untouched organic ranking
      (2L, 20L, 1, false), (2L, 21L, 2, false), (2L, 22L, 3, false)))
  }

  test("solrUrl handles the reference's host/scheme/port cases (tasks.py:76-103)") {
    assert(Indexing.solrUrl("solr.example.org", Some(8983), None, "catalog")
      == "http://solr.example.org:8983/solr/catalog")
    assert(Indexing.solrUrl("https://solr.example.org", None, None, "catalog")
      == "https://solr.example.org/solr/catalog")
    assert(Indexing.solrUrl("solr.internal", None, Some("https"), "dpla")
      == "https://solr.internal/solr/dpla")
  }
}
