package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 additions: ta16 Gopher rules, x19 MoreLikeThis,
  * p13 cluster-balanced sampling. Each spec verifies the operator
  * against an independent JVM-side recomputation (the oracle gate
  * covers SQL parity; these pin the SEMANTICS). */
class RoundNineSpec extends AnyFunSuite {
  import TestSession._

  test("ta16 rule verdicts equal an independent JVM recount") {
    val stop = Set("the", "a", "of", "and", "in", "to", "is")
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val got = queries.TextEvents.ta16GopherRules(spark, sf).collect()
    assert(got.length == docs.size)
    var passSeen = 0; var failSeen = 0
    got.foreach { r =>
      val toks = docs(r.getLong(0)).trim.split("\\s+").toSeq
      val nt = toks.size.toLong
      val nc = toks.map(_.length.toLong).sum
      val tf = toks.groupBy(identity).map(_._2.size.toLong)
      val nstop = toks.count(stop).toLong
      assert(r.getLong(1) == nt, s"n_tokens doc ${r.getLong(0)}")
      assert(r.getBoolean(2) == (nt >= 20 && nt <= 80), "rule_wc")
      assert(r.getBoolean(3) == (nc >= 4 * nt && nc <= 5 * nt), "rule_mwl")
      assert(r.getBoolean(4) == (nstop >= 2), "rule_stop")
      assert(r.getBoolean(5) == (tf.max * 5 <= nt), "rule_rep")
      assert(r.getBoolean(6) ==
        (r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4) &&
          r.getBoolean(5)), "pass composite")
      if (r.getBoolean(6)) passSeen += 1 else failSeen += 1
    }
    // the thresholds were chosen so BOTH verdicts are data-exercised
    assert(passSeen > 0 && failSeen > 0,
      s"composite not live: pass=$passSeen fail=$failSeen")
  }

  test("x19 MLT ranks shared-rare-shingle counts, top-3 per seed") {
    val rows = queries.Etl.x19Mlt(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent recount: shingle sets per doc, df-capped at
    // [2, p99(df)] — the r10 SELF-TUNING cap, re-derived here from
    // the df multiset by the same ceil(99·n/100) order statistic the
    // KLL sketch computes (exact at capacity ≥ n)
    val sh = graft.dedup.Dedup
      .withHashedShingles(Tables.documents(spark, sf))
      .select("doc_id", "sh").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSet)).toMap
    val df = sh.values.toSeq.flatten.groupBy(identity)
      .map { case (h, occ) => (h, occ.size) }
    val sortedDfs = df.values.toSeq.sorted
    val cap = sortedDfs((((99L * sortedDfs.size + 99L) / 100L) - 1L).toInt)
    val rare: Set[Long] = df.collect {
      case (h, d) if d >= 2 && d <= cap => h
    }.toSet
    def shared(a: Long, b: Long): Int = (sh(a) & sh(b) & rare).size
    val bySeed = rows.groupBy(_.getLong(0))
    bySeed.foreach { case (seed, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length),
        s"ranks not dense for seed $seed")
      sorted.foreach { r =>
        assert(r.getLong(2) == shared(seed, r.getLong(1)).toLong,
          s"n_shared mismatch seed=$seed cand=${r.getLong(1)}")
      }
      // returned top-3 must dominate every unreturned candidate
      val returned = sorted.map(_.getLong(1)).toSet
      val worst = sorted.last
      sh.keys.filter(c => c != seed && !returned(c))
        .map(c => (shared(seed, c), c)).filter(_._1 > 0)
        .foreach { case (s, c) =>
          // fewer than 3 returned ⇒ no positive-score candidate may
          // be missing; at 3, the tail (score desc, id asc) must beat
          // every unreturned candidate
          assert(sorted.length == 3,
            s"candidate $c (shared=$s) missing for underfull seed $seed")
          assert(s < worst.getLong(2) ||
            (s == worst.getLong(2) && c > worst.getLong(1)),
            s"candidate $c (shared=$s) beats returned tail for seed $seed")
        }
    }
  }

  test("streaming quality gate splits corpus/quarantine with batch parity") {
    import graft.streaming.QualityStream
    val src = java.nio.file.Files.createTempDirectory("graft_qg_src")
    // two staged files + maxFilesPerTrigger=1 → the gate must hold
    // its verdicts across multiple micro-batches
    java.nio.file.Files.createSymbolicLink(
      src.resolve("a.parquet"),
      java.nio.file.Paths.get(s"$sf/documents.parquet"))
    java.nio.file.Files.createSymbolicLink(
      src.resolve("b.parquet"),
      java.nio.file.Paths.get(s"$sf/documents.parquet"))
    val out = java.nio.file.Files.createTempDirectory("graft_qg_out").toString
    val q = QualityStream.qualityGate(
      QualityStream.readDocs(spark, src.toString), out)
    q.processAllAvailable(); q.stop()
    val expected = queries.TextEvents.ta16GopherRules(spark, sf)
      .collect().map(r => (r.getLong(0), r.getBoolean(6))).toMap
    val corpusIds = QualityStream.corpus(spark, out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val quarIds = QualityStream.quarantine(spark, out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(corpusIds == expected.filter(_._2).keySet, "corpus != batch pass set")
    assert(quarIds == expected.filterNot(_._2).keySet, "quarantine != batch fail set")
    assert(corpusIds.intersect(quarIds).isEmpty)
    // quarantine keeps per-rule verdicts, and at least one failing
    // rule is false on every quarantined row
    QualityStream.quarantine(spark, out).collect().foreach { r =>
      assert(!(r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6)
        && r.getBoolean(7)), s"quarantined row with all rules true: $r")
    }
    // replay: a fresh query over the same source + sinks must be
    // skipped wholesale by the batch markers (fresh checkpoint →
    // batch ids restart at 0) — no duplicate corpus rows
    val nCorpus = QualityStream.corpus(spark, out).count()
    val q2 = QualityStream.qualityGate(
      QualityStream.readDocs(spark, src.toString), out,
      checkpointDir = Some(java.nio.file.Files
        .createTempDirectory("graft_qg_ckpt2").toString))
    q2.processAllAvailable(); q2.stop()
    assert(QualityStream.corpus(spark, out).count() == nCorpus,
      "replayed batches duplicated corpus rows")
  }

  test("d22 funnel is monotone and each stage equals its direct count") {
    val rows = queries.DedupSim.d22DedupFunnel(spark, sf).collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("total", "exact", "near_dup"))
    val Seq(total, exact, near) = rows.map(_.getLong(2)).toSeq
    assert(total >= exact && exact >= near,
      s"funnel not monotone: $total/$exact/$near")
    assert(near < exact, "near-dup stage dropped nothing — fixture has planted near-dups")
    val docs = graft.dedup.Dedup.augmentedDocs(spark, sf)
    assert(total == docs.count())
    assert(exact == docs.select(md5(col("text"))).distinct().count())
  }

  test("x20 collapse returns the best-scored doc per source with group size") {
    val rows = queries.Etl.x20Collapse(spark, sf).collect()
    // independent recount of the term-query result set
    val terms = Set("table", "hash")
    val hits = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.split("\\s+").count(terms).toLong))
      .filter(_._3 > 0)
    val bySource = hits.groupBy(_._2)
    assert(rows.length == bySource.size, "one head per matching source")
    rows.foreach { r =>
      val grp = bySource(r.getString(0))
      assert(r.getLong(3) == grp.length.toLong, "group hit count")
      val best = grp.minBy { case (id, _, s) => (-s, id) }
      assert(r.getLong(1) == best._1 && r.getLong(2) == best._3,
        s"wrong group head for ${r.getString(0)}")
    }
    assert(rows.exists(_.getLong(3) > 1), "no source with >1 hit — collapse not live")
  }

  test("r9 ops yield empty results on an empty corpus") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String, Long)]
      .toDF("doc_id", "text", "lang", "n_chars")
    assert(graft.text.TextAnalysis.gopherRules(
      empty.select("doc_id", "text")).count() == 0)
    assert(graft.operators.Indexing.moreLikeThis(empty,
      seedPred = col("doc_id") < 5, dfMin = 2, dfMax = 10, k = 3)
      .count() == 0)
  }

  test("m6 modality budget keeps a byte-bounded prefix per modality") {
    val rows = queries.Multi.m6ModalityBudget(spark, sf).collect()
    rows.groupBy(_.getString(1)).foreach { case (mod, items) =>
      val sorted = items.sortBy(_.getLong(0))
      val total = sorted.map(_.getLong(2)).sum
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getLong(2)
        assert(r.getLong(3) == cum, s"cum_bytes wrong at ${r.getLong(0)}")
        assert(r.getBoolean(4) == (cum * 2 <= total), s"kept wrong at ${r.getLong(0)}")
      }
      // the 50% budget must bite: both verdicts live in every modality
      assert(sorted.exists(_.getBoolean(4)) && sorted.exists(!_.getBoolean(4)),
        s"budget not live for $mod")
      // kept rows form a doc_id-prefix (monotone cut, no holes)
      val lastKept = sorted.lastIndexWhere(_.getBoolean(4))
      assert(sorted.take(lastKept + 1).forall(_.getBoolean(4)),
        s"kept set not a prefix for $mod")
    }
  }

  test("g1 integer PageRank equals a JVM fixpoint replay") {
    val rows = queries.DedupSim.g1SourceRank(spark, sf).collect()
    // rebuild the same reprint graph independently
    val pairs = graft.dedup.Dedup.sourceOverlap(
        Tables.documents(spark, sf), col("source"), col("text"),
        width = 20, stride = 20, maxDf = None)
      .select("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val nodes = rows.map(_.getString(0)).toSet
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (u, es) => (u, es.map(_._2).toSeq) }
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map[String, Long]()
        .withDefaultValue(0L)
      adj.foreach { case (u, vs) =>
        val c = r(u) / vs.size
        vs.foreach(v => contrib(v) += c)
      }
      r = nodes.map(n => n -> (150000L + 85L * contrib(n) / 100L)).toMap
    }
    rows.foreach { row =>
      val src = row.getString(0)
      assert(row.getLong(1) == adj.get(src).map(_.size.toLong).getOrElse(0L),
        s"outdeg wrong for $src")
      assert(row.getLong(2) == r(src), s"rank wrong for $src")
    }
    // isolated sources carry exactly the teleport floor at tiny SF;
    // connected sources always exceed it
    rows.filter(_.getLong(1) > 0).foreach(row =>
      assert(row.getLong(2) > 150000L, s"connected ${row.getString(0)} at floor"))
    rows.filter(_.getLong(1) == 0).foreach(row =>
      assert(row.getLong(2) == 150000L, s"isolated ${row.getString(0)} off floor"))
  }

  test("ensureClusterLabels sweeps orphaned caches, keeps current-version ones") {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(sys.props("java.io.tmpdir"), "graft_cclabels")
    Files.createDirectories(root)
    // two orphans: pre-marker era (no key.txt) and an old algo version
    val noMarker = root.resolve("spec-orphan-nomarker")
    Files.createDirectories(noMarker)
    Files.write(noMarker.resolve("junk.txt"), "x".getBytes)
    val oldVer = root.resolve("spec-orphan-oldver")
    Files.createDirectories(oldVer)
    Files.write(oldVer.resolve("key.txt"), "fp:cc-lsh:v0:8:4:0.8".getBytes)
    val dir = graft.dedup.Dedup.ensureClusterLabels(
      graft.dedup.Dedup.augmentedDocs(spark, sf), sf)
    assert(!Files.exists(noMarker), "markerless orphan survived the sweep")
    assert(!Files.exists(oldVer), "old-version orphan survived the sweep")
    val key = new String(Files.readAllBytes(Paths.get(dir, "key.txt")))
    assert(key.contains(":cc-lsh:v"), "live cache missing its marker")
    // a second ensure (fresh sweep pass) must NOT delete the live cache
    val dir2 = graft.dedup.Dedup.ensureClusterLabels(
      graft.dedup.Dedup.augmentedDocs(spark, sf), sf)
    assert(dir2 == dir && Files.exists(Paths.get(dir, "key.txt")),
      "live cache swept by its own version's pass")
  }

  test("p13 keeps exactly floor(sqrt(size)) members per cluster") {
    val rows = queries.DedupSim.p13ClusterBalanced(spark, sf).collect()
    val byCluster = rows.groupBy(_.getLong(1))
    var dropSeen = false
    byCluster.foreach { case (cid, members) =>
      val size = members.head.getLong(3)
      assert(members.length.toLong == size, s"n_members wrong for $cid")
      val kept = members.filter(_.getBoolean(4))
      // r² ≤ size ⇔ r ≤ floor(√size): keep count is exactly isqrt(size)
      val isqrt = math.sqrt(size.toDouble).toLong
      assert(kept.length.toLong == isqrt,
        s"cluster $cid size=$size kept=${kept.length}")
      assert(kept.map(_.getLong(2)).sorted.toSeq ==
        (1L to isqrt), s"kept ranks not the top ranks for $cid")
      if (kept.length < members.length) dropSeen = true
    }
    assert(dropSeen, "no cluster dropped anyone — keep rule not live")
    // singletons always survive
    byCluster.filter(_._2.length == 1).foreach { case (cid, m) =>
      assert(m.head.getBoolean(4), s"singleton $cid dropped")
    }
  }
}
