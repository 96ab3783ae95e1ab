package graft

import graft.streaming.{EventsStream, StreamConfig}
import graft.streaming.StreamConfig.{KafkaSourceSpec, TriggerPolicy}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class StreamConfigSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("kafkaOptions maps the spec onto the Kafka source contract") {
    val opts = StreamConfig.kafkaOptions(KafkaSourceSpec(
      brokers = Seq("b1:9092", "b2:9092"), topics = Seq("events", "audit"),
      startingOffsets = "latest", maxOffsetsPerTrigger = Some(500000L),
      failOnDataLoss = false))
    assert(opts("kafka.bootstrap.servers") == "b1:9092,b2:9092")
    assert(opts("subscribe") == "events,audit")
    assert(opts("startingOffsets") == "latest")
    assert(opts("maxOffsetsPerTrigger") == "500000")
    assert(opts("failOnDataLoss") == "false")
    // the governor is omitted, not defaulted, when unset
    val bare = StreamConfig.kafkaOptions(KafkaSourceSpec(Seq("b:9092"), Seq("t")))
    assert(!bare.contains("maxOffsetsPerTrigger"))
    intercept[IllegalArgumentException] {
      StreamConfig.kafkaOptions(KafkaSourceSpec(Nil, Seq("t")))
    }
  }

  test("parseKafkaJson types the wire frame and quarantine-flags bad payloads") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("kind", StringType)))
    val wire = Seq(
      ("k1", """{"event_id": 1, "kind": "click"}""", "events", 0, 100L),
      ("k2", """{"event_id": 2, "kind": "view"}""", "events", 1, 101L),
      ("k3", """not json at all""", "events", 0, 102L))
      .toDF("k", "v", "topic", "partition", "offset")
      .select(col("k").cast("binary").as("key"),
        col("v").cast("binary").as("value"),
        col("topic"), col("partition"), col("offset"),
        current_timestamp().as("timestamp"))
    val parsed = StreamConfig.parseKafkaJson(wire, schema)
    assert(parsed.columns.toSeq == Seq("_key", "event_id", "kind",
      "_corrupt", "_topic", "_partition", "_offset", "_kafka_ts"))
    val good = parsed.filter(!col("_corrupt"))
    assert(good.count() == 2)
    assert(good.select("event_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    val bad = parsed.filter(col("_corrupt"))
    assert(bad.count() == 1 && bad.head.getString(0) == "k3")
    // wire bookkeeping survives for replay accounting
    assert(bad.head.getAs[Long]("_offset") == 102L)
  }

  test("AvailableNow drains the source across rate-limited micro-batches, then stops") {
    val dir = java.nio.file.Files.createTempDirectory("graft_an")
    // two staged files + maxFilesPerTrigger=1 → AvailableNow must run
    // MULTIPLE micro-batches before terminating (what Once couldn't)
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("a.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("b.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    val events = EventsStream.readEvents(spark, dir.toString,
      Map("maxFilesPerTrigger" -> "1"))
    var batches = 0L
    val q = StreamConfig.withTrigger(
      events.writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          if (!b.isEmpty) batches += 1
          ()
        },
      TriggerPolicy.AvailableNow).start()
    // AvailableNow terminates on its own once the backlog is drained
    assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    assert(batches >= 2, s"rate limit should force >=2 micro-batches, saw $batches")
  }
}
