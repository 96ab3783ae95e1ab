package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 contracts: stripSpans bills `n_stripped` from the
  * ACTUAL cut, never a span_len sum (the r14 advice finding —
  * substringStripSpans islands are only anchor-disjoint, so token
  * extents can overlap and a sum double-bills the overlap); the
  * shared persisted gram index is bit-identical to the
  * self-contained d26/d28 forms on the real corpus; and the
  * SimHashFold codegen expression matches a reference fold. */
class Round15OpsSpec extends AnyFunSuite {
  import TestSession._

  // ---- stripSpans: overlapping spans bill the actual cut ----

  test("stripSpans with token-overlapping spans: n_stripped = actual cut") {
    import spark.implicits._
    // 10 tokens t0..t9; spans [0,6) and [4,10) overlap on tokens 4–5.
    // A span_len sum would claim 12 stripped from a 10-token doc.
    val docs = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val spans = Seq((1L, 0L, 6L), (1L, 4L, 6L))
      .toDF("doc_id", "span_start", "span_len")
    val row = Dedup.stripSpans(docs, spans).collect().head
    assert(row.getAs[Long]("n_tokens") == 10L)
    assert(row.getAs[Long]("n_stripped") == 10L,
      s"overlap must not double-bill: ${row.getAs[Long]("n_stripped")}")
    assert(row.getAs[String]("clean_text") == "")
  }

  test("stripSpans conservation holds under partial overlap") {
    import spark.implicits._
    val docs = Seq((1L, (0 until 12).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    // [2,7) and [5,10): union covers tokens 2..9 = 8 tokens
    val spans = Seq((1L, 2L, 5L), (1L, 5L, 5L))
      .toDF("doc_id", "span_start", "span_len")
    val row = Dedup.stripSpans(docs, spans).collect().head
    assert(row.getAs[Long]("n_stripped") == 8L)
    val kept = row.getAs[String]("clean_text").split(" ").toSeq
    assert(kept == Seq("w0", "w1", "w10", "w11"))
    assert(kept.size == row.getAs[Long]("n_tokens") - row.getAs[Long]("n_stripped"))
  }

  // ---- shared gram index ≡ self-contained substring forms ----

  test("indexed d26/d28 forms are bit-identical to self-contained forms") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(400)
    val k = 10; val minLen = 20
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_gram_spec").toString
    Dedup.writeGramIndex(docs, tmp, k)
    val grams = graft.sources.VersionedTable.readLatest(spark, tmp)
    val spansA = Dedup.exactSubstringSpans(docs, k, minLen)
    val spansB = Dedup.exactSubstringSpansIndexed(docs, grams, k, minLen)
    assert(spansA.exceptAll(spansB).isEmpty && spansB.exceptAll(spansA).isEmpty,
      "d26 indexed/self-contained drift")
    val stripA = Dedup.stripSubstringDups(docs, k, minLen)
    val stripB = Dedup.stripSubstringDupsIndexed(docs, grams, k, minLen)
    assert(stripA.exceptAll(stripB).isEmpty && stripB.exceptAll(stripA).isEmpty,
      "d28 indexed/self-contained drift")
  }

  test("gram index persists only duplicated grams (occ >= 2)") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(200)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_gram_spec2").toString
    Dedup.writeGramIndex(docs, tmp, 10)
    val grams = graft.sources.VersionedTable.readLatest(spark, tmp)
    assert(grams.filter(col("occ") < 2).count() == 0)
    // r18: the table lays out gram-hash-sharded (shard=pmod(g,16)
    // partition dirs — bounded listings, prunable subset probes);
    // the data columns are unchanged and the shard key round-trips
    assert(grams.columns.toSet == Set("g", "occ", "first", "shard"))
    assert(grams.filter(
      col("shard") =!= pmod(col("g"), lit(16L)).cast("int")).count() == 0)
  }

  // ---- d29: cross-corpus exact-substring decontamination ----

  test("d29 strips the long planted leak to its unique tokens, keeps the short one") {
    val out = SparkEntry.queries("d29_decontam_strip")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // eval docs (0..9) are NOT part of the corpus output
    assert(!out.keys.exists(_ < 10L), "eval docs must not be stripped rows")
    val longTwins = out.keys.filter(id => id >= 4000000L && id < 4100000L)
    assert(longTwins.nonEmpty)
    longTwins.foreach { id =>
      val (n, s, t) = out(id)
      val evId = id - 4000000L
      // a long-enough eval doc leaks 40 tokens; the twin keeps only
      // its three vocab-disjoint tokens (shorter eval docs leak
      // sub-minLen runs and strip nothing — both exact)
      if (n >= 23L) {
        assert(t == s"ztq$evId ztr$evId zts$evId", s"twin $id kept: $t")
        assert(s == n - 3)
      } else assert(s == 0L, s"short-leak twin $id must not strip")
    }
    val shortTwins = out.keys.filter(_ >= 4100000L)
    assert(shortTwins.nonEmpty)
    shortTwins.foreach { id =>
      val (n, s, t) = out(id)
      assert(s == 0L, s"sub-minLen covered island must survive: twin $id")
      assert(t.startsWith(s"zuq${id - 4100000L} "))
    }
    // the no-contamination branch is live: most corpus docs untouched
    val natural = out.filter { case (id, _) => id >= 10L && id < 4000000L }
    assert(natural.count { case (_, (_, s, _)) => s == 0L } > natural.size / 2)
  }

  test("d29 rides the shared span machinery: covered rule is eval-occurrence") {
    import spark.implicits._
    // corpus doc copies eval tokens 5..34 at offset 2 (unaligned);
    // exactly that 30-token run must strip
    val evalDoc = (0 until 40).map(i => s"e$i").mkString(" ")
    val corpusText = "x0 x1 " + (5 until 35).map(i => s"e$i").mkString(" ") + " x2"
    val eval = Seq((1L, evalDoc)).toDF("doc_id", "text")
    val corpus = Seq((100L, corpusText)).toDF("doc_id", "text")
    val row = Dedup.stripEvalSubstrings(corpus, eval, k = 10, minLen = 20)
      .collect().head
    assert(row.getAs[Long]("n_tokens") == 33L)
    assert(row.getAs[Long]("n_stripped") == 30L)
    assert(row.getAs[String]("clean_text") == "x0 x1 x2")
  }

  // ---- SimHashFold codegen vs reference fold ----

  test("SimHashFold matches a reference per-bit majority fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map(i =>
      (i.toLong, Seq.fill(rnd.nextInt(30) + 1)(rnd.nextLong() & 0xffffffffL)))
    def refFold(hs: Seq[Long]): Long = {
      val votes = new Array[Int](64)
      hs.foreach { h0 =>
        val h = graft.plans.SimHashFold.mix64(h0)
        (0 until 64).foreach(j =>
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1))
      }
      (0 until 64).foldLeft(0L)((acc, j) =>
        if (votes(j) > 0) acc | (1L << j) else acc)
    }
    val got = rows.toDF("id", "hs")
      .select(col("id"), graft.plans.SimHashFold.simhashFold(col("hs")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    rows.foreach { case (id, hs) =>
      assert(got(id) == refFold(hs), s"fold drift on id $id")
    }
  }
}
