package graft

import graft.multimodal.Multimodal
import graft.streaming.EventsStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamMultiSpec extends AnyFunSuite {
  import TestSession._

  test("streaming tumbling agg matches the batch e1 result") {
    // the file source wants a directory: stage the single parquet
    // file behind a symlink
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf/events.parquet"))
    val streamed = EventsStream.runTumblingOnce(spark,
      dir.toString, "stream_e1_test")
    val batch = SparkEntry.queries("e1_tumbling")(spark, sf)
    // same (window, type) keys, same counts
    val s = streamed.select(col("window_start"), col("event_type"), col("n"))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    val b = batch.select(col("window_start"), col("event_type"), col("n"))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(s == b, s"stream-batch mismatch: ${(s diff b).take(3)} / ${(b diff s).take(3)}")
  }

  test("streaming windowed quantile sketch matches the batch aggregate exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_qstream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf/events.parquet"))
    val q = EventsStream.quantileAgg(
        EventsStream.readEvents(spark, dir.toString))
      .writeStream.outputMode("complete")
      .format("memory").queryName("qs_stream").start()
    q.processAllAvailable(); q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("window_start", "event_type", "n", "p50", "p99")
      .collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    // batch twin: identical expressions over the batch table —
    // capacity >= window volume makes both sides exact, so the
    // stream's incremental merges must land on the same values
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        graft.plans.QuantileSketch.quantiles(col("value"), 4096, Seq(50, 99)).as("qs"),
        count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"),
        round(element_at(col("qs"), 1), 4).as("p50"),
        round(element_at(col("qs"), 2), 4).as("p99"))
    val s = key(spark.table("qs_stream"))
    val b = key(batch)
    assert(s == b, s"stream-batch quantile mismatch: ${(s diff b).take(3)} / ${(b diff s).take(3)}")
  }

  test("streaming windowed heavy-hitters sketch matches the batch aggregate exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hhstream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf/events.parquet"))
    // k=64 >= the 5-value event_type universe: exact counts per window
    val q = EventsStream.heavyHittersAgg(
        EventsStream.readEvents(spark, dir.toString), "event_type")
      .writeStream.outputMode("complete")
      .format("memory").queryName("hh_stream").start()
    q.processAllAvailable(); q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.get(0).toString, r.getLong(1),
        r.getString(2), r.getLong(3))).toSet
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.plans.FreqSketch.freq(col("event_type"), 64).as("m"),
        count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("n"),
        explode(col("m")).as(Seq("item", "est")))
    val s = key(spark.table("hh_stream").select("window_start", "n", "item", "est"))
    val b = key(batch)
    assert(s == b, s"stream-batch heavy-hitter mismatch: ${(s diff b).take(3)} / ${(b diff s).take(3)}")
  }

  test("streaming dedup keeps one row per identifier under duplicate input") {
    // stage the same events file twice: the stream sees every record
    // duplicated, like a re-harvest
    val dir = java.nio.file.Files.createTempDirectory("graft_dd")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("a.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("b.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    val q = EventsStream.dedupedByIdentifier(
        EventsStream.readEvents(spark, dir.toString), "event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("dd_test").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dd_test")
    val expected = Tables.events(spark, sf).count()
    assert(got.count() == expected,
      s"expected $expected deduped rows, got ${got.count()}")
    assert(got.groupBy("event_id").count().filter(col("count") > 1).count() == 0)
  }

  test("streaming foreachBatch maintains a versioned index with atomic swaps") {
    import graft.sources.VersionedTable
    val src = java.nio.file.Files.createTempDirectory("graft_im_src")
    java.nio.file.Files.createSymbolicLink(
      src.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf/events.parquet"))
    val table = java.nio.file.Files.createTempDirectory("graft_im_tbl").toString + "/idx"
    val q = EventsStream.maintainIndex(
      EventsStream.readEvents(spark, src.toString), table) { batch =>
      batch.groupBy("event_type").count()
    }
    q.processAllAvailable(); q.stop()
    // at least one version landed and the alias serves it
    assert(VersionedTable.listVersions(table).nonEmpty)
    val served = VersionedTable.readLatest(spark, table)
    assert(served.count() == 5) // one row per event type
  }

  test("stream-stream interval join matches the batch interval join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ssj")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf/events.parquet"))
    val q = EventsStream.clickPurchaseJoin(
        EventsStream.readEvents(spark, dir.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_test").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ssj_test")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch twin of the same interval join
    val ev = Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val expected = p.join(c,
        col("c_user") === col("user_id")
          && col("click_ts") <= col("purchase_ts")
          && col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 minutes"))
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture has no click->purchase pairs in horizon")
    assert(got == expected,
      s"stream/batch mismatch: ${(got diff expected).take(3)} / ${(expected diff got).take(3)}")
  }

  test("streaming MERGE sink: upsert + delete per micro-batch behind the alias swap") {
    import graft.sources.VersionedTable
    val src = java.nio.file.Files.createTempDirectory("graft_mm_src")
    // two staged files + maxFilesPerTrigger=1 → two micro-batches
    java.nio.file.Files.createSymbolicLink(
      src.resolve("a.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    java.nio.file.Files.createSymbolicLink(
      src.resolve("b.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    val table = java.nio.file.Files.createTempDirectory("graft_mm_tbl").toString + "/idx"
    // seed a serving version: one row the stream never touches and
    // one it must delete
    import spark.implicits._
    VersionedTable.write(
      Seq(("stale", 99L), ("error", 99L)).toDF("event_type", "count"), table)
    val events = EventsStream.readEvents(spark, src.toString,
      Map("maxFilesPerTrigger" -> "1"))
    val q = EventsStream.maintainMerged(events, table, "event_type") {
      batch => batch.filter(col("event_type") =!= "error")
        .groupBy("event_type").count()
    } { batch => batch.filter(col("event_type") === "error")
        .select("event_type").distinct()
    }
    q.processAllAvailable(); q.stop()
    // seed + one version per micro-batch
    assert(VersionedTable.listVersions(table).size == 3)
    val served = VersionedTable.readLatest(spark, table).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(!served.contains("error"), "deleted key still served")
    assert(served("stale") == 99L, "untouched base row lost")
    // upserted counts equal the batch aggregation (idempotent across
    // the duplicate second batch)
    val expected = Tables.events(spark, sf)
      .filter(col("event_type") =!= "error")
      .groupBy("event_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(served - "stale" == expected)
    // replay: a fresh query (fresh checkpoint → batch ids restart at
    // 0) over the same source + table must be skipped wholesale by
    // the batch markers — no new versions, same served rows
    val events2 = EventsStream.readEvents(spark, src.toString,
      Map("maxFilesPerTrigger" -> "1"))
    val q2 = EventsStream.maintainMerged(events2, table, "event_type") {
      batch => batch.filter(col("event_type") =!= "error")
        .groupBy("event_type").count()
    } { batch => batch.filter(col("event_type") === "error")
        .select("event_type").distinct()
    }
    q2.processAllAvailable(); q2.stop()
    assert(VersionedTable.listVersions(table).size == 3,
      "replayed batches produced duplicate versions")
    // a genuinely NEW run (fresh lineage id) must NOT be skipped by
    // the old run's markers even though its batch ids also start at 0
    val events3 = EventsStream.readEvents(spark, src.toString,
      Map("maxFilesPerTrigger" -> "1"))
    val q3 = EventsStream.maintainMerged(events3, table, "event_type",
      lineage = "run1") {
      batch => batch.filter(col("event_type") =!= "error")
        .groupBy("event_type").count()
    } { batch => batch.filter(col("event_type") === "error")
        .select("event_type").distinct()
    }
    q3.processAllAvailable(); q3.stop()
    assert(VersionedTable.listVersions(table).size == 5,
      "new-lineage run was silently skipped by stale markers")
  }

  test("corrupt records quarantine instead of failing the ingest") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_corrupt")
    java.nio.file.Files.writeString(tmp.resolve("in.csv"),
      "id,n\n1,10\n2,notanumber\n3,30\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType)))
    val (good, quarantined) =
      graft.sources.Sources.quarantineIngest(spark, tmp.toString, schema)
    assert(good.count() == 2)
    assert(good.columns.toSeq == Seq("id", "n"))
    val bad = quarantined.collect()
    assert(bad.length == 1)
    assert(bad.head.getString(0).contains("notanumber"))
    assert(bad.head.getString(1).contains("in.csv"))
  }

  test("quarantine ingest handles JSONL (the training-corpus format)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl")
    java.nio.file.Files.writeString(tmp.resolve("docs.jsonl"),
      """{"id": 1, "text": "good doc one"}
        |{"id": 2, "text": "unterminated
        |{"id": 3, "text": "good doc three"}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val (good, quarantined) = graft.sources.Sources.quarantineIngest(
      spark, tmp.toString, schema, format = "json")
    assert(good.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val bad = quarantined.collect()
    assert(bad.length == 1 && bad.head.getString(0).contains("unterminated"))
    assert(bad.head.getString(1).contains("docs.jsonl"))
  }

  test("stub decoder pipeline: deterministic, payload-local, batch-shaped") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(50)
      .select(col("doc_id").as("id"),
        col("text").cast("binary").as("payload"),
        lit("image").as("kind"))
      .as[Multimodal.BinaryRecord]
    val decoded = Multimodal.decodeBatch(docs, Multimodal.StubDecoder)
    val rows = decoded.collect()
    assert(rows.length == 50)
    assert(rows.forall(r => r.width >= 64 && r.width < 256))
    assert(rows.forall(_.features.length == 8))
    // deterministic: same input → same output
    val again = Multimodal.decodeBatch(docs, Multimodal.StubDecoder).collect()
    assert(rows.map(_.width).toSeq == again.map(_.width).toSeq)
  }

  test("frame sampling multiplies rows map-side") {
    // filter, not limit: a global limit plans its own exchange and
    // would mask the no-shuffle assertion below
    val df = Tables.documents(spark, sf).filter(col("doc_id") < 10)
      .withColumn("n_frames", lit(100))
    val sampled = Multimodal.sampleFrames(df, "n_frames", stride = 10, maxFrames = 5)
    assert(sampled.count() == 50) // 5 frames per record
    val plan = sampled.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "frame sampling must not shuffle")
  }

  test("m1 binary meta runs and hashes match t2-style md5") {
    val df = SparkEntry.queries("m1_binary_meta")(spark, sf)
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.columns.toSeq == Seq("doc_id", "n_bytes", "magic", "content_md5"))
  }
}
