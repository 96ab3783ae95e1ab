package graft

import graft.operators.Harvest
import graft.sources.{Archives, Sources}
import graft.streaming.SessionStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SourcesStreamSpec extends AnyFunSuite {
  import TestSession._

  test("stateful streaming sessionize = batch sessions minus each user's open one") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sess")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf/events.parquet"))
    val streamed = SessionStream.runOnce(spark, dir.toString, "sess_test", 1800)
      .select(col("user_id"), col("session_start_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val batch = SparkEntry.queries("e2_sessionize")(spark, sf)
    // drop each user's last session (still open in stream state)
    val lastPerUser = batch.groupBy("user_id")
      .agg(max("session_id").as("last_sid"))
    val closedBatch = batch.join(lastPerUser, Seq("user_id"))
      .filter(col("session_id") =!= col("last_sid"))
      .select(col("user_id"), unix_micros(col("session_start")).as("s"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == closedBatch,
      s"diff: ${(streamed diff closedBatch).take(3)} / ${(closedBatch diff streamed).take(3)}")
    assert(streamed.nonEmpty)
  }

  test("streaming gap extraction reproduces the batch gap histogram") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gaps")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf/events.parquet"))
    val gaps = graft.streaming.GapStream.runOnce(spark, dir.toString, "gap_test")
    // bucket the streamed gaps with the SAME thresholds and compare
    // to the batch e13 histogram — identical rows means the stateful
    // extraction lost/duplicated no gap
    val bucket = when(col("gap_s") < 60, "a_under_1m")
      .when(col("gap_s") < 300, "b_1m_5m")
      .when(col("gap_s") < 900, "c_5m_15m")
      .when(col("gap_s") < 1800, "d_15m_30m")
      .when(col("gap_s") < 3600, "e_30m_1h")
      .when(col("gap_s") < 21600, "f_1h_6h")
      .otherwise("g_over_6h")
    val streamed = gaps.select(bucket.as("gap_bucket"), col("gap_s"))
      .groupBy("gap_bucket")
      .agg(count(lit(1)).as("n_gaps"), min("gap_s").as("min_gap_s"),
        max("gap_s").as("max_gap_s"))
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("e13_gap_histogram")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"stream histogram diverged: ${streamed diff batch} / ${batch diff streamed}")
    assert(streamed.nonEmpty)
  }

  test("gap state TTL evicts idle users: the post-eviction event re-seeds, no gap") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_gapttl").toString
    def stage(name: String, rows: Seq[(Long, Long, Long)]): Unit = {
      val scratch =
        java.nio.file.Files.createTempDirectory("graft_gapttl_s").toString + "/out"
      rows.toDF("event_id", "ts_us", "user_id")
        .select(col("event_id"),
          timestamp_micros(col("ts_us")).cast("timestamp_ntz").as("ts"),
          col("user_id"), lit("view").as("event_type"),
          lit(0.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(dir, s"$name.parquet"))
    }
    val t0 = 1000000000L
    stage("b1", Seq((1L, t0, 1L), (2L, t0 + 10000000L, 1L)))
    val q = graft.streaming.GapStream
      .gaps(graft.streaming.EventsStream.readEvents(spark, dir), stateTtlMs = 100L)
      .writeStream.outputMode("append").format("memory")
      .queryName("gap_ttl_test").start()
    // processAllAvailable never latches under ProcessingTimeTimeout
    // (shouldRunAnotherBatch is always true, so the engine constructs
    // timeout batches continuously) — poll the sink instead
    def awaitRows(n: Long): Unit = {
      val deadline = System.nanoTime + 60L * 1000000000L
      while (spark.table("gap_ttl_test").count() < n
          && System.nanoTime < deadline) Thread.sleep(100)
      assert(spark.table("gap_ttl_test").count() >= n, s"sink never reached $n rows")
    }
    awaitRows(1)        // batch 1: user 1 emits gap 10 s
    Thread.sleep(3000)  // idle past the 100 ms TTL: the continuous
                        // timeout batches evict user 1's state
    // user 1 re-seeds (no gap if evicted); user 2's in-batch pair
    // emits gap 7 s — the marker that proves the batch processed
    stage("b2", Seq((4L, t0 + 20000000L, 1L),
      (5L, t0 + 30000000L, 2L), (6L, t0 + 37000000L, 2L)))
    awaitRows(2)
    q.stop()
    val got = spark.table("gap_ttl_test")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // without eviction this would also contain (1, 10) again
    // (20 s − 10 s); with the TTL only the pre-idle gap survives
    assert(got == Set((1L, 10L), (2L, 7L)), s"got $got")
  }

  test("batched sink lays out status/file_idx partitions the scanner prunes") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val batched = Harvest.batchAssign(
      Harvest.flagDeleted(Tables.events(spark, sf), col("event_type"), "error"),
      Seq(col("is_deleted")), col("event_id"), recordsPerFile = 200)
    Sources.writeBatched(batched, "is_deleted", "file_idx", out)
    // layout: is_deleted=.../file_idx=.../
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.toSet == Set("is_deleted=true", "is_deleted=false"), dirs.toSeq)
    val deleted = Sources.readStatus(spark, out, "is_deleted", true)
    assert(deleted.count() == Tables.events(spark, sf)
      .filter(col("event_type") === "error").count())
    // pruning: only the deleted partition dirs are scanned
    val scan = deleted.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(is_deleted"), scan.take(1500))
  }

  test("versioned table: write, alias swap, rollback (solr collection lifecycle analog)") {
    import graft.sources.VersionedTable
    val dir = java.nio.file.Files.createTempDirectory("graft_vt").toString
    val v1 = VersionedTable.write(Tables.region(spark, sf), dir)
    assert(v1 == 1 && VersionedTable.latestVersion(dir).contains(1L))
    val v2 = VersionedTable.write(Tables.nation(spark, sf), dir)
    assert(v2 == 2)
    // alias now serves v2
    assert(VersionedTable.readLatest(spark, dir).count() == 25)
    // rollback = swap the alias back; v2 stays on disk
    VersionedTable.swapTo(dir, 1)
    assert(VersionedTable.readLatest(spark, dir).count() == 5)
    assert(VersionedTable.listVersions(dir) == Seq(1L, 2L))
    // swapping to a missing version refuses
    intercept[IllegalArgumentException] { VersionedTable.swapTo(dir, 99) }
  }

  test("schema drift: mergeSchema reads old and new harvest layouts together") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    Tables.region(spark, sf).write.parquet(s"$dir/batch=1")
    Tables.region(spark, sf).withColumn("harvested_at", lit("2026-08-12"))
      .write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.contains("harvested_at"))
    assert(merged.count() == 10)
    // old-layout rows surface the new column as null, not an error
    assert(merged.filter(col("harvested_at").isNull).count() == 5)
  }

  test("streaming restart from checkpoint does not reprocess batches") {
    import graft.sources.VersionedTable
    val src = java.nio.file.Files.createTempDirectory("graft_ckpt_src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val table = java.nio.file.Files.createTempDirectory("graft_ckpt_tbl").toString + "/idx"
    java.nio.file.Files.createSymbolicLink(
      src.resolve("a.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    def start() = graft.streaming.EventsStream.readEvents(spark, src.toString)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) { VersionedTable.write(batch.groupBy("event_type").count(), table); () }
      }.start()
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    val afterFirst = VersionedTable.listVersions(table).size
    assert(afterFirst >= 1)
    // restart against the same checkpoint with one new file
    java.nio.file.Files.createSymbolicLink(
      src.resolve("b.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val afterSecond = VersionedTable.listVersions(table).size
    // exactly the new data became a new version; batch 1 not replayed
    assert(afterSecond == afterFirst + 1,
      s"expected ${afterFirst + 1} versions after restart, got $afterSecond")
  }

  test("csv lookup source feeds the broadcast enrich") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv")
    java.nio.file.Files.writeString(tmp.resolve("lookup.csv"),
      "child_id,parent_xml\n1,<p>one</p>\n2,<p>two</p>\n")
    val schema = StructType(Seq(
      StructField("child_id", LongType), StructField("parent_xml", StringType)))
    val lookup = Sources.csvLookup(spark, tmp.toString, schema)
    assert(lookup.count() == 2)
    val enriched = operators.Records.lookupEnrich(
      Tables.documents(spark, sf).select(col("doc_id")),
      lookup, col("doc_id"), col("child_id"))
    assert(enriched.filter(col("parent_xml").isNotNull).count() == 2)
  }

  test("tar.gz expansion mirrors the reference's single-member guards") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_tar")
    java.nio.file.Files.writeString(tmp.resolve("a.xml"), "<collection><r>1</r></collection>")
    import scala.sys.process._
    Seq("tar", "czf", s"$tmp/one.tar.gz", "-C", tmp.toString, "a.xml").!!
    val bytes = java.nio.file.Files.readAllBytes(tmp.resolve("one.tar.gz"))
    val expanded = Archives.expandTarGz(bytes)
    assert(expanded.isDefined)
    assert(new String(expanded.get, "UTF-8").contains("<collection>"))
    // multi-member → None (unexpected, like the reference)
    java.nio.file.Files.writeString(tmp.resolve("b.xml"), "<r>2</r>")
    Seq("tar", "czf", s"$tmp/two.tar.gz", "-C", tmp.toString, "a.xml", "b.xml").!!
    assert(Archives.expandTarGz(
      java.nio.file.Files.readAllBytes(tmp.resolve("two.tar.gz"))).isEmpty)
    // distributed expansion over a binaryFile scan
    val rows = Archives.expandAll(spark, s"$tmp/*.tar.gz").collect()
    assert(rows.length == 3) // 1 member + 2 members
  }

  test("graft_dot and graft_intersect_count are SQL-callable after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(CAST(array(1.0, 2.0) AS array<double>),
                          CAST(array(3.0, 4.0) AS array<double>)) AS d,
                graft_intersect_count(CAST(array(1, 2, 5) AS array<long>),
                                      CAST(array(2, 5, 9) AS array<long>)) AS i""").head
    assert(r.getDouble(0) == 11.0)
    assert(r.getInt(1) == 2)
    // the HLL aggregate is SQL-callable too
    Tables.lineitem(spark, sf).createOrReplaceTempView("li_sql")
    val h = spark.sql(
      "SELECT graft_hll(l_partkey) AS h, count(DISTINCT l_partkey) AS e FROM li_sql").head
    assert(math.abs(h.getLong(0).toDouble - h.getLong(1)) / h.getLong(1) < 0.05)
  }

  // NOTE: the withExtensions build-time route can't be exercised in
  // this suite — getOrCreate returns the already-active test session,
  // which ignores new extensions, and stopping a fresh session would
  // kill the shared SparkContext. The injection entries themselves
  // are exercised through GraftExtensions.register above (same
  // builders), and a deployment enables the class via
  // spark.sql.extensions=graft.GraftExtensions.
}
