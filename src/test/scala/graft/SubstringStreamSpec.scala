package graft

import graft.dedup.Dedup
import graft.streaming.{BoilerplateStream, SubstringStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SubstringStream: d28's exact-substring strip run at the door —
  * single-batch parity with the batch operator, arrival-ordered
  * first-occurrence semantics across batches (a doc already emitted
  * is never retroactively re-stripped), and marker-skipped replay of
  * the per-batch gram state. */
class SubstringStreamSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def stage(dir: String, name: String, df: DataFrame): Unit = {
    val scratch =
      java.nio.file.Files.createTempDirectory("graft_ss_s").toString + "/out"
    df.coalesce(1).write.parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(dir, s"$name.parquet"))
    ()
  }

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  private def drive(inDir: String, stateDir: String,
      lineage: String, compactEvery: Int = 8): Unit = {
    val q = SubstringStream.substringGate(
      BoilerplateStream.readDocs(spark, inDir), stateDir,
      k = 10, minLen = 20, lineage = lineage,
      compactEvery = compactEvery)
    try q.processAllAvailable()
    finally q.stop()
  }

  test("single-batch drive reproduces batch d28 exactly") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_ss1").toString
    val stateDir = java.nio.file.Files.createTempDirectory("graft_ss1s").toString
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "n_chars")
    stage(inDir, "all", docs)
    drive(inDir, stateDir, "ss_one")
    val got = SubstringStream.cleaned(spark, stateDir)
    val want = Dedup.stripSubstringDups(
      docs.select("doc_id", "text"), k = 10, minLen = 20)
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
    assert(want.filter(col("n_stripped") > 0).count() > 0,
      "the parity corpus must carry live strips")
  }

  test("door semantics: arrival order wins, earlier docs never re-strip") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_ss2").toString
    val stateDir = java.nio.file.Files.createTempDirectory("graft_ss2s").toString
    val run = (0 until 30).map(i => s"r$i")
    // batch 1: doc 5 carries the run FIRST (arrival order)
    stage(inDir, "b1", docsDf(Seq(
      (5L, run.mkString(" ")))))
    // batch 2: doc 1 (SMALLER id) brings the same run — arrival
    // order, not id order, decides: doc 1 strips, doc 5 stands;
    // docs 8/9 share a fresh run within batch 2 — (doc_id, pos)
    // order inside the batch keeps 8, strips 9
    val run2 = (0 until 25).map(i => s"q$i")
    stage(inDir, "b2", docsDf(Seq(
      (1L, ("z1 z2 " + run.mkString(" ")).trim),
      (8L, run2.mkString(" ")),
      (9L, run2.mkString(" ")))))
    drive(inDir, stateDir, "ss_door")
    val got = SubstringStream.cleaned(spark, stateDir)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq
    assert(got == Seq(
      (1L, 30L, "z1 z2"),             // later arrival strips despite smaller id
      (5L, 0L, run.mkString(" ")),    // first arrival stands
      (8L, 0L, run2.mkString(" ")),   // in-batch first keeps
      (9L, 25L, "")),                 // in-batch later strips to empty
      s"got $got")
  }

  test("fresh-checkpoint replay is marker-skipped: no double-count") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_ss3").toString
    val stateDir = java.nio.file.Files.createTempDirectory("graft_ss3s").toString
    val run = (0 until 24).map(i => s"m$i")
    stage(inDir, "b1", docsDf(Seq((1L, run.mkString(" "))))) // occ 1 each gram
    drive(inDir, stateDir, "ss_replay")
    val once = SubstringStream.gramState(spark, stateDir)
      .agg(sum("occ")).head.getLong(0)
    drive(inDir, stateDir, "ss_replay") // fresh checkpoint, same lineage
    val twice = SubstringStream.gramState(spark, stateDir)
      .agg(sum("occ")).head.getLong(0)
    assert(once == twice, s"replay double-added gram state: $once -> $twice")
    // a single lone doc never strips against itself
    val got = SubstringStream.cleaned(spark, stateDir).head
    assert(got.getLong(2) == 0L && got.getString(3) == run.mkString(" "))
  }

  test("compaction preserves outputs and state, bounds live partitions") {
    val runA = (0 until 30).map(i => s"ca$i").mkString(" ")
    val runB = (0 until 25).map(i => s"cb$i").mkString(" ")
    val batches = Seq(
      Seq((1L, runA)), Seq((2L, runB)), Seq((3L, runA)),   // 3 strips vs b0
      Seq((4L, runB)), Seq((5L, runA + " " + runB)),
      Seq((6L, "u1 u2 u3 u4 u5")))
    def driveAll(compactEvery: Int): (String, String) = {
      val inDir = java.nio.file.Files
        .createTempDirectory(s"graft_ss4_$compactEvery").toString
      val stateDir = java.nio.file.Files
        .createTempDirectory(s"graft_ss4s_$compactEvery").toString
      batches.zipWithIndex.foreach { case (b, i) =>
        stage(inDir, f"b$i%03d", docsDf(b))
        drive(inDir, stateDir, "ss_cpt", compactEvery)
      }
      (inDir, stateDir)
    }
    val (_, plain) = driveAll(compactEvery = 0)     // compaction off
    val (_, compacted) = driveAll(compactEvery = 2) // compact every 2nd batch
    // outputs and aggregated gram state are bit-identical
    val a = SubstringStream.cleaned(spark, plain)
    val b = SubstringStream.cleaned(spark, compacted)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    val sa = SubstringStream.gramState(spark, plain).orderBy("g")
    val sb = SubstringStream.gramState(spark, compacted).orderBy("g")
    assert(sa.exceptAll(sb).count() == 0 && sb.exceptAll(sa).count() == 0)
    // compaction actually fired and bounded the live partition tree
    val livePlain = graft.streaming.StatePartitions.liveDirs(s"$plain/grams")
    val liveCpt = graft.streaming.StatePartitions.liveDirs(s"$compacted/grams")
    assert(livePlain.size == batches.size)
    assert(liveCpt.exists(_.contains("compact=")), s"no compact dir: $liveCpt")
    assert(liveCpt.size < livePlain.size,
      s"compaction did not shrink live partitions: ${liveCpt.size}")
    // and the parity corpus carried live strips
    assert(a.filter(col("n_stripped") > 0).count() >= 2)
    // r17: the footer-driver row count (no Spark job) equals the job
    // count on BOTH trees — including the compacted one, whose live
    // set crosses a fold (the gate's fpp scaling reads this number)
    Seq(s"$plain/grams", s"$compacted/grams").foreach { r =>
      assert(graft.streaming.StatePartitions.rowCount(spark, r) ==
        graft.streaming.StatePartitions.read(spark, r).count(),
        s"footer row count diverged from job count under $r")
    }
  }

  // --- r18: gram-hash-sharded state layout ------------------------

  private def driveSharded(inDir: String, stateDir: String,
      lineage: String, nShards: Int, compactEvery: Int = 8,
      minLen: Int = 20): Unit = {
    val q = SubstringStream.substringGate(
      BoilerplateStream.readDocs(spark, inDir), stateDir,
      k = 10, minLen = minLen, lineage = lineage,
      compactEvery = compactEvery, nShards = nShards)
    try q.processAllAvailable()
    finally q.stop()
  }

  test("sharded gate is bit-identical to the unsharded gate, per-shard partitions bounded") {
    val runA = (0 until 30).map(i => s"sa$i").mkString(" ")
    val runB = (0 until 25).map(i => s"sb$i").mkString(" ")
    val batches = Seq(
      Seq((1L, runA)), Seq((2L, runB)), Seq((3L, runA)),
      Seq((4L, runB + " " + runA)), Seq((5L, "v1 v2 v3 v4 v5")),
      Seq((6L, runB)))
    def driveAll(nShards: Int): String = {
      val inDir = java.nio.file.Files
        .createTempDirectory(s"graft_ss6_$nShards").toString
      val stateDir = java.nio.file.Files
        .createTempDirectory(s"graft_ss6s_$nShards").toString
      batches.zipWithIndex.foreach { case (b, i) =>
        stage(inDir, f"b$i%03d", docsDf(b))
        if (nShards <= 1) drive(inDir, stateDir, "ss_shard", 2)
        else driveSharded(inDir, stateDir, "ss_shard", nShards, 2)
      }
      stateDir
    }
    val plain = driveAll(1)
    val sharded = driveAll(4)
    // cleaned output and aggregated gram state are BIT-IDENTICAL —
    // occurrence semantics never moved, only the directory layout
    val a = SubstringStream.cleaned(spark, plain)
    val b = SubstringStream.cleaned(spark, sharded)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    val sa = SubstringStream.gramState(spark, plain)
    val sb = SubstringStream.gramState(spark, sharded)
    assert(sa.exceptAll(sb).count() == 0 && sb.exceptAll(sa).count() == 0)
    assert(a.filter(col("n_stripped") > 0).count() >= 1,
      "the sharded-parity corpus must carry live strips")
    // the sharded tree is one StatePartitions family per shard: each
    // family compacted independently, each listing bounded by the
    // cadence (compactEvery=2 → folds fired), none exceeding the
    // UNSHARDED tree's live count
    val roots = SubstringStream.shardRoots(s"$sharded/grams")
    assert(roots.nonEmpty && roots.size <= 4, s"shard roots: $roots")
    val plainLive =
      graft.streaming.StatePartitions.liveDirs(s"$plain/grams").size
    roots.foreach { case (s, root) =>
      val live = graft.streaming.StatePartitions.liveDirs(root)
      assert(live.size <= plainLive,
        s"shard $s live partitions ${live.size} exceed unsharded $plainLive")
      assert(live.exists(_.contains("compact=")),
        s"shard $s never compacted: $live")
    }
    // footer row count over the whole sharded tree == job count
    val allDirs = roots.flatMap { case (_, r) =>
      graft.streaming.StatePartitions.liveDirs(r) }
    assert(graft.streaming.StatePartitions.rowCountDirs(spark, allDirs) ==
      spark.read.parquet(allDirs: _*).count())
  }

  test("sharded probe: a one-gram batch maps to ONE shard family and still strips cross-batch") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_ss7").toString
    val stateDir = java.nio.file.Files.createTempDirectory("graft_ss7s").toString
    val text = (0 until 10).map(i => s"pg$i").mkString(" ") // exactly 1 gram
    stage(inDir, "b1", docsDf(Seq((1L, text))))
    driveSharded(inDir, stateDir, "ss_one_shard", nShards = 8, minLen = 5)
    stage(inDir, "b2", docsDf(Seq((2L, text))))
    driveSharded(inDir, stateDir, "ss_one_shard", nShards = 8, minLen = 5)
    // the batch's single gram hashes into exactly one shard family —
    // the probe's dir list is that family alone (pruning by
    // construction); cross-batch occurrence still resolves: doc 2
    // strips to empty against doc 1's history in that shard
    val shardSet = Dedup.substringAnchors(
        docsDf(Seq((2L, text))).select("doc_id", "text"), 10)
      .select(pmod(col("g"), lit(8L)).cast("int").as("s"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(shardSet.size == 1, s"one gram must map to one shard: $shardSet")
    val roots = SubstringStream.shardRoots(s"$stateDir/grams").map(_._1).toSet
    assert(roots == shardSet, s"state families $roots vs batch shards $shardSet")
    val got = SubstringStream.cleaned(spark, stateDir)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq
    assert(got == Seq((1L, 0L, text), (2L, 10L, "")), s"got $got")
  }

  test("sharded replay is marker-skipped; the layout locks at first batch") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_ss8").toString
    val stateDir = java.nio.file.Files.createTempDirectory("graft_ss8s").toString
    val run = (0 until 24).map(i => s"sr$i")
    stage(inDir, "b1", docsDf(Seq((1L, run.mkString(" ")))))
    driveSharded(inDir, stateDir, "ss_lay", nShards = 4)
    val once = SubstringStream.gramState(spark, stateDir)
      .agg(sum("occ")).head.getLong(0)
    driveSharded(inDir, stateDir, "ss_lay", nShards = 4) // fresh checkpoint
    val twice = SubstringStream.gramState(spark, stateDir)
      .agg(sum("occ")).head.getLong(0)
    assert(once == twice, s"sharded replay double-added state: $once -> $twice")
    // resuming the tree under a DIFFERENT layout refuses loudly
    stage(inDir, "b2", docsDf(Seq((2L, "x1 x2 x3"))))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drive(inDir, stateDir, "ss_lay")
    }
    assert(ex.getMessage.contains("layout")
      || Option(ex.getCause).exists(_.getMessage.contains("layout")))
  }

  test("a stateDir is locked to its first lineage") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_ss5").toString
    val stateDir = java.nio.file.Files.createTempDirectory("graft_ss5s").toString
    stage(inDir, "b1", docsDf(Seq((1L, (0 until 24).map(i => s"l$i").mkString(" ")))))
    drive(inDir, stateDir, "lineageA")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drive(inDir, stateDir, "lineageB")
    }
    assert(ex.getMessage.contains("lineage")
      || Option(ex.getCause).exists(_.getMessage.contains("lineage")))
  }

  test("StatePartitions: unpublished compaction is invisible, manifest flips it") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_sp").toString
    Seq(("batch=t-0", 1L), ("batch=t-1", 2L)).foreach { case (sub, v) =>
      Seq((v, v)).toDF("g", "cnt").write.parquet(s"$root/$sub")
    }
    // a compact dir WITHOUT its manifest = crashed mid-compaction:
    // reads must ignore it and keep the inputs live
    Seq((1L, 1L), (2L, 2L)).toDF("g", "cnt")
      .write.parquet(s"$root/compact=t-9")
    assert(graft.streaming.StatePartitions.liveDirs(root)
      .map(d => Paths.get(d).getFileName.toString).toSet ==
      Set("batch=t-0", "batch=t-1"))
    // publish the manifest: the fold becomes the single truth even
    // before the physical deletes run
    Files.writeString(Paths.get(root, "_folded-t-9"), "batch=t-0\nbatch=t-1")
    assert(graft.streaming.StatePartitions.liveDirs(root)
      .map(d => Paths.get(d).getFileName.toString) == Seq("compact=t-9"))
    val total = graft.streaming.StatePartitions.read(spark, root)
      .agg(sum("cnt")).head.getLong(0)
    assert(total == 3L)
  }
}
