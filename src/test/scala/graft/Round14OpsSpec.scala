package graft

import graft.dedup.Dedup
import graft.operators.Harvest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 contracts: the d25 broadcast-hint removal (the r13
  * verdict's one scale finding — stripAgainstHot must genuinely
  * degrade to a shuffled equi-join when the hot set cannot
  * broadcast, instead of honoring a hint until the driver wall);
  * d26/d27/d28 — exact-substring span detection (the unaligned
  * duplicates d13's grid provably misses), the within-doc
  * repetition rewrite, and the first-occurrence-keeps strip rewrite
  * (incl. periodic-doc self-dedup); the wired GapStream/
  * TransitionStream watermark (late-straggler drop, on/off parity,
  * event-time-TTL session cut); and the harvestWindows→OAI
  * inclusive-bounds conversion (half-open plan slices fed verbatim
  * to OAI double-harvest every boundary day). */
class Round14OpsSpec extends AnyFunSuite {
  import TestSession._

  // ---- d25: un-hinted strip join, both plan postures ----

  /** 3000 docs, 2 width-3 chunks each: chunk "hot<k> p q" is shared
    * by 3 docs (1000 distinct hot chunks — a planted OVERSIZED hot
    * set relative to a 1 KB broadcast threshold), the other chunk is
    * unique and must survive. */
  private def plantedCorpus = {
    import spark.implicits._
    (0 until 3000).map { i =>
      (i.toLong, s"hot${i / 3} p q alpha$i beta$i gamma$i")
    }.toDF("doc_id", "text")
  }

  test("d25 hot-set join broadcasts by AQE stats when tiny (no hint needed)") {
    val df = Dedup.boilerplateStrip(plantedCorpus.limit(30), 3, 3L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"tiny hot set should still broadcast via AQE runtime stats:\n$plan")
  }

  test("d25 oversized hot set degrades to the shuffled equi-join, results intact") {
    val conf = spark.conf
    val oldStatic = conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val oldAqe = // unset by default: get() may throw OR return null
      scala.util.Try(conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold"))
        .toOption.flatMap(Option(_))
    // a 1 KB threshold makes the 1000-chunk hot set "too big to
    // broadcast" — the exact situation a web-scale corpus puts the
    // un-hinted plan in (every common chunk clears an absolute occ
    // cut, so the hot set is corpus-proportional)
    conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "1KB")
    try {
      val df = Dedup.boilerplateStrip(plantedCorpus, 3, 3L)
      val got = df.orderBy("doc_id").collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"hint would force a broadcast past the threshold:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected the shuffled fallback to engage:\n$plan")
      assert(got.length == 3000)
      got.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == 2 && r.getLong(2) == 1,
          "each doc sheds exactly its shared hot chunk")
        assert(r.getString(3) == s"alpha$i beta$i gamma$i",
          "unique content survives the shuffled rewrite byte-identical")
      }
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldStatic)
      oldAqe match {
        case Some(v) =>
          conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  // ---- d26: exact-substring spans ----

  test("d26 finds the planted UNALIGNED 40-token copy that d13's grid misses") {
    import spark.implicits._
    val aTks = (0 until 60).map(i => s"a$i")
    val bTks = Seq("p0", "p1", "p2") ++ aTks.slice(7, 47) // offset 7: off-grid
    // d13's aligned 20-token windows provably share nothing: the
    // copy starts half a window off the grid, so no window of B
    // equals any window of A (the exact miss d26 exists to close)
    val winsA = aTks.grouped(20).map(_.mkString(" ")).toSet
    val winsB = bTks.grouped(20).map(_.mkString(" ")).toSet
    assert(winsA.intersect(winsB).isEmpty,
      "fixture must be invisible to aligned passage dedup")
    val docs = Seq((1L, aTks.mkString(" ")), (2L, bTks.mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.exactSubstringSpans(docs, k = 10, minLen = 20)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 7L, 40L), (2L, 3L, 40L)),
      s"expected the shared run as one maximal span per doc, got ${got.toSeq}")
  }

  test("d26 sub-minLen runs drop; separate runs stay separate islands; within-doc repeats anchor") {
    import spark.implicits._
    def tks(p: String, n: Int) = (0 until n).map(i => s"$p$i")
    val run1 = tks("r", 25); val run2 = tks("s", 30); val short = tks("t", 15)
    val docE = (tks("e", 5) ++ run1 ++ tks("f", 12) ++ run2).mkString(" ")
    val docF = (tks("g", 3) ++ run1).mkString(" ")
    val docG = (run2 ++ tks("h", 4)).mkString(" ")
    // H and I share only a 15-token run (< minLen 20) → no rows
    val docH = (tks("u", 11) ++ short).mkString(" ")
    val docI = (short ++ tks("v", 11)).mkString(" ")
    // J repeats a 22-token block inside ITSELF (the suffix-array
    // posture: within-doc repeats are duplicates too)
    val blk = tks("w", 22)
    val docJ = (blk ++ tks("x", 13) ++ blk).mkString(" ")
    val docs = Seq((1L, docE), (2L, docF), (3L, docG), (4L, docH),
      (5L, docI), (6L, docJ)).toDF("doc_id", "text")
    val got = Dedup.exactSubstringSpans(docs, k = 10, minLen = 20)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 5L, 25L), (1L, 42L, 30L), // two islands, gap preserved
      (2L, 3L, 25L), (3L, 0L, 30L),
      (6L, 0L, 22L), (6L, 35L, 22L)), // within-doc pair, both spans
      s"got ${got.toSeq}")
  }

  test("d26 registered query: every planted twin pair is found at its offsets") {
    val got = SparkEntry.queries("d26_substring_spans")(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_toks")).cache()
    val nPlantable = docs.filter(col("n_toks") >= 47).count()
    assert(nPlantable > 0, "fixture docs must be long enough to plant in")
    // every long-enough planted twin reports a span reaching token 3+40
    val twins = got.filter(col("doc_id") >= 3000000L)
      .filter(col("span_start") <= 3 && col("span_start") + col("span_len") >= 43)
    assert(twins.select(col("doc_id") - 3000000L).distinct().count() == nPlantable,
      "each plantable twin must carry its full copied span")
    // and the originals carry the mirrored span around offset 7
    val origs = got.filter(col("doc_id") < 3000000L && col("doc_id") % 10 === 0)
      .filter(col("span_start") <= 7 && col("span_start") + col("span_len") >= 47)
    assert(origs.select("doc_id").distinct().count() == nPlantable)
    got.unpersist(); docs.unpersist()
    ()
  }

  // ---- d28: exact-substring dedup rewrite ----

  test("d28 strips the copy, keeps the first occurrence, id-breaks ties") {
    import spark.implicits._
    val aTks = (0 until 60).map(i => s"a$i")
    val bTks = Seq("p0", "p1", "p2") ++ aTks.slice(7, 47)
    val blk = (0 until 22).map(i => s"w$i")
    val jTks = blk ++ (0 until 13).map(i => s"x$i") ++ blk
    val yTks = (0 until 24).map(i => s"y$i") // NON-periodic twin pair
    val perTks = ("same doc twice " * 8).trim // periodic: self-dedups
    val docs = Seq(
      (1L, aTks.mkString(" ")),      // first occurrence: untouched
      (2L, bTks.mkString(" ")),      // later copy: run stripped
      (5L, yTks.mkString(" ")),      // identical twin pair: lower id
      (6L, yTks.mkString(" ")),      //   keeps, higher id empties
      (7L, jTks.mkString(" ")),      // within-doc: 2nd block cut
      (8L, perTks))                  // periodic doc: one period survives
      .toDF("doc_id", "text")
    val got = Dedup.stripSubstringDups(docs, k = 10, minLen = 20)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got(0) == ((1L, 60L, 0L, aTks.mkString(" "))),
      "the first occurrence survives byte-identical")
    assert(got(1) == ((2L, 43L, 40L, "p0 p1 p2")),
      "the later copy sheds the whole duplicated run")
    assert(got(2) == ((5L, 24L, 0L, yTks.mkString(" "))),
      "lower id of an identical pair keeps its text")
    assert(got(3)._1 == 6L && got(3)._3 == 24L && got(3)._4 == "",
      "higher id of an identical pair strips to empty")
    assert(got(4) == ((7L, 57L, 22L, (blk ++ (0 until 13).map(i => s"x$i")).mkString(" "))),
      "within-doc repeat keeps the first block only")
    // the suffix-array posture on periodicity: every window past the
    // first period duplicates an earlier one, so a periodic doc
    // self-deduplicates down to its period
    assert(got(5) == ((8L, 24L, 21L, "same doc twice")),
      "a periodic doc collapses to one period")
  }

  test("d28 registered query: stripped twins are FULL cuts; untouched branch live") {
    val got = SparkEntry.queries("d28_substring_strip")(spark, sf).cache()
    val twins = got.filter(col("doc_id") >= 3000000L).cache()
    val cut = twins.filter(col("n_stripped") > 0)
    assert(cut.count() > 0, "planted twins must strip")
    assert(cut.filter(col("n_stripped") =!= col("n_tokens") - 3).count() == 0,
      "a stripped twin keeps exactly its three unique tokens")
    assert(cut.filter(!col("clean_text").rlike("^zq\\d+ zr\\d+ zs\\d+$"))
      .count() == 0, "the surviving text IS the unique prefix")
    assert(got.filter(col("n_stripped") === 0).count() > 0,
      "the untouched branch stays live")
    // conservation: clean token count == n_tokens - n_stripped
    assert(got.filter(
      size(split(col("clean_text"), " ")) =!= col("n_tokens") - col("n_stripped"))
      .filter(col("clean_text") =!= "").count() == 0)
    twins.unpersist(); got.unpersist()
    ()
  }

  // ---- d27: within-doc repetition rewrite ----

  test("d27 hand-built: repeated chunk keeps first occurrence, order preserved") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z x y z a b c"),   // chunk 'x y z' twice
      (2L, "q r s t u v"),          // nothing repeated
      (3L, "m n o m n o m n o m")) // chunk 3x + trailing partial 'm'
      .toDF("doc_id", "text")
    val got = Dedup.stripInternalRepeats(docs, width = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 1L, "x y z a b c"),
      (2L, 2L, 0L, "q r s t u v"),
      (3L, 4L, 2L, "m n o m")), s"got ${got.toSeq}")
  }

  test("d27 registered query: planted prefix repeats removed, clean branch live") {
    val got = SparkEntry.queries("d27_internal_repeats")(spark, sf).cache()
    // every %7 doc had its first two grid chunks duplicated by the
    // prepended prefix → at least 2 removed
    assert(got.filter(col("doc_id") % 7 === 0 && col("n_removed") < 2)
      .count() == 0, "planted docs must shed their duplicated prefix chunks")
    assert(got.filter(col("n_removed") === 0).count() > 0,
      "the nothing-removed branch must stay live")
    // conservation: kept chunks = n_chunks - n_removed ≥ 1 everywhere
    assert(got.filter(col("n_chunks") - col("n_removed") < 1).count() == 0)
    got.unpersist()
    ()
  }

  // ---- GapStream / TransitionStream: wired watermark ----

  private def stageEvents(dir: String, name: String,
      rows: Seq[(Long, Long, Long, String)]): Unit = {
    import spark.implicits._
    val scratch =
      java.nio.file.Files.createTempDirectory("graft_wm_s").toString + "/out"
    rows.toDF("event_id", "ts_us", "user_id", "event_type")
      .select(col("event_id"),
        timestamp_micros(col("ts_us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(dir, s"$name.parquet"))
    ()
  }

  test("GapStream watermark drops late stragglers the unwatermarked stream would count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gap_wm").toString
    val t0 = 1000000000000000L // µs
    val S = 1000000L
    // b1: user 1 gaps at 100 s; user 2's lone event at +3600 s drags
    // max event time (watermark after b1 = 3600 − 600 = +3000 s)
    stageEvents(dir, "b1", Seq((1L, t0, 1L, "view"),
      (2L, t0 + 100 * S, 1L, "view"), (3L, t0 + 3600 * S, 2L, "view")))
    val q = graft.streaming.GapStream
      .gaps(graft.streaming.EventsStream.readEvents(spark, dir),
        stateTtlMs = 0L, watermarkDelay = Some("10 minutes"))
      .writeStream.outputMode("append").format("memory")
      .queryName("gap_wm_test").start()
    q.processAllAvailable()
    // b2: user 1 straggler at +250 s — NEWER than user 1's state
    // (+100 s), so WITHOUT a watermark it emits gap 150; it sits
    // 2750 s behind the watermark, so the late filter must drop it.
    // user 2's +3700 s event proves the batch ran.
    stageEvents(dir, "b2", Seq((4L, t0 + 250 * S, 1L, "view"),
      (5L, t0 + 3700 * S, 2L, "view")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("gap_wm_test")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (2L, 100L)),
      s"late straggler must be dropped, not gapped: $got")
  }

  test("TransitionStream watermark: same drop semantics on the pair stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tr_wm").toString
    val t0 = 2000000000000000L
    val S = 1000000L
    stageEvents(dir, "b1", Seq((1L, t0, 1L, "view"),
      (2L, t0 + 100 * S, 1L, "click"), (3L, t0 + 3600 * S, 2L, "view")))
    val q = graft.streaming.TransitionStream
      .transitions(graft.streaming.EventsStream.readEvents(spark, dir),
        stateTtlMs = 0L, watermarkDelay = Some("10 minutes"))
      .writeStream.outputMode("append").format("memory")
      .queryName("tr_wm_test").start()
    q.processAllAvailable()
    // the late click→purchase transition must NOT appear
    stageEvents(dir, "b2", Seq((4L, t0 + 250 * S, 1L, "purchase"),
      (5L, t0 + 3700 * S, 2L, "signup")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("tr_wm_test")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "view", "click"), (2L, "view", "signup")),
      s"late transition must be dropped: $got")
  }

  test("event-time TTL: idle past the TTL is a session boundary, not a gap") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gap_ettl").toString
    val t0 = 3000000000000000L
    val S = 1000000L
    stageEvents(dir, "b1", Seq((1L, t0, 1L, "view"),
      (2L, t0 + 100 * S, 1L, "view"), (3L, t0 + 3600 * S, 2L, "view")))
    val q = graft.streaming.GapStream
      .gaps(graft.streaming.EventsStream.readEvents(spark, dir),
        stateTtlMs = 3600L * 1000L, watermarkDelay = Some("10 minutes"))
      .writeStream.outputMode("append").format("memory")
      .queryName("gap_ettl_test").start()
    q.processAllAvailable()
    // user 1 comes back 4900 s later — past the 3600 s event-time TTL
    // — IN THE SAME BATCH as the deadline passing: the in-function
    // session cut must drop the gap even though the state row is
    // still present. user 2's 3600 s gap sits exactly AT the TTL
    // (not past it) and must be counted.
    stageEvents(dir, "b2", Seq((4L, t0 + 5000 * S, 1L, "view"),
      (5L, t0 + 7200 * S, 2L, "view")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("gap_ettl_test")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (2L, 3600L)),
      s"idle-past-TTL must cut the session, exact-TTL must count: $got")
  }

  test("watermark is inert on an in-horizon feed: gap parity on vs off") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gap_par")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf/events.parquet"))
    val on = graft.streaming.GapStream.runOnce(spark, dir.toString,
        "gap_par_on", watermarkDelay = Some("2 hours"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val off = graft.streaming.GapStream.runOnce(spark, dir.toString,
        "gap_par_off")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(on == off, "an in-horizon feed must be watermark-invariant")
    assert(on.nonEmpty)
  }

  // ---- h10: OAI inclusive bounds ----

  test("oaiInclusiveBounds: windows tile the span with no boundary double-harvest") {
    import spark.implicits._
    // 16-day span → 7, 7, 2-day slices; plus a zero-span feed
    val state = Seq(("feedA", "2026-01-01", "2026-01-17"),
      ("feedB", "2026-02-01", "2026-02-01")).toDF("key", "l", "h")
      .select(col("key"), to_date(col("l")).as("lo"), to_date(col("h")).as("hi"))
    val w = Harvest.oaiInclusiveBounds(
      Harvest.harvestWindows(state, col("key"), col("lo"), col("hi"), 7))
    val a = w.filter(col("key") === "feedA").orderBy("win_idx")
      .select("from_date", "until_date", "oai_from", "oai_until")
      .collect().map(r => (r.getDate(0).toString, r.getDate(1).toString,
        r.getDate(2).toString, r.getDate(3).toString))
    assert(a.toSeq == Seq(
      ("2026-01-01", "2026-01-08", "2026-01-01", "2026-01-07"),
      ("2026-01-08", "2026-01-15", "2026-01-08", "2026-01-14"),
      ("2026-01-15", "2026-01-17", "2026-01-15", "2026-01-16")),
      "inclusive until = half-open until - 1 day; windows touch, never overlap")
    // coverage law: every day of [lo, hi) requested EXACTLY once
    val days = w.filter(col("key") === "feedA")
      .select(explode(sequence(col("oai_from"), col("oai_until"))).as("d"))
    assert(days.count() == 16 && days.distinct().count() == 16)
    // zero-span feed: one single-day "harvest today" request
    val b = w.filter(col("key") === "feedB").collect()
    assert(b.length == 1)
    val r = w.filter(col("key") === "feedB")
      .select(col("n_days"), col("oai_from") === col("oai_until"),
        col("oai_from") === col("from_date")).head()
    assert(r.getLong(0) == 0L && r.getBoolean(1) && r.getBoolean(2),
      "empty span maps to the inclusive single-day [from, from] request")
  }
}
