package graft

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 additions beyond the opening batch: boilerplate-chunk
  * removal (d25), audio activity segmentation (m8), the Solr expand
  * component (x26) and filtered IVF search (s14) — the contracts the
  * oracle hash can't express. */
class Round13OpsSpec extends AnyFunSuite {
  import TestSession._

  // ---- d25 boilerplateStrip ----

  test("d25 hand-built corpus: hot chunks struck, order preserved") {
    import spark.implicits._
    // 'hdr top line' is planted in every doc (occ 8 >= 3); each
    // informative chunk is unique (occ 1) and survives.
    val docs = (0 until 8).map { i =>
      (i.toLong, s"hdr top line alpha$i beta$i gamma$i")
    }.toDF("doc_id", "text")
    val got = Dedup.boilerplateStrip(docs, width = 3, minOcc = 3L)
      .orderBy("doc_id").collect()
    assert(got.length == 8)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) == 2, "6 tokens = 2 width-3 chunks") // n_chunks
      assert(r.getLong(2) == 1, "exactly the planted chunk removed")
      assert(r.getString(3) == s"alpha$i beta$i gamma$i",
        "kept chunks reassemble in token order")
    }
  }

  test("d25 all-removed and nothing-removed edges; trailing short chunk") {
    import spark.implicits._
    // 'x y z' occurs 3 times (all in doc 0) — exactly at the cut →
    // doc 0 rewrites to the empty string. The other docs' chunks are
    // unique, including doc 3's trailing 1-token chunk.
    val docs = Seq(
      (0L, "x y z x y z x y z"),
      (1L, "za zb zc"), (2L, "zd ze zf"), (3L, "zg zh zi zj"))
      .toDF("doc_id", "text")
    val got = Dedup.boilerplateStrip(docs, width = 3, minOcc = 3L)
      .orderBy("doc_id").collect()
    assert(got(0).getLong(2) == 3 && got(0).getString(3) == "",
      "a fully-boilerplate doc rewrites to the empty string")
    (1 to 3).foreach { i =>
      assert(got(i).getLong(2) == 0)
    }
    assert(got(3).getLong(1) == 2 && got(3).getString(3) == "zg zh zi zj",
      "the trailing short chunk is its own chunk and reassembles")
  }

  test("d25 conservation + live cut on the registered query") {
    val docs = Tables.documents(spark, sf)
    val got = SparkEntry.queries("d25_boilerplate")(spark, sf).cache()
    // headers add 6 tokens; chunks = ceil((n_toks + 6) / 3)
    val joined = got.join(
      docs.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_toks")), "doc_id")
    assert(joined.filter(col("n_chunks") =!= expr("(n_toks + 8) div 3"))
      .count() == 0)
    // both header chunks are hot for every doc, and content survives
    assert(got.filter(col("n_removed") < 2).count() == 0,
      "every doc sheds at least its two header chunks")
    assert(got.agg(sum(col("n_chunks") - col("n_removed"))).head.getLong(0) > 0,
      "some content kept")
    got.unpersist()
    ()
  }

  // ---- m8 audioSegments ----

  test("m8 hand-built payload: islands merge, silence splits") {
    import spark.implicits._
    // 50-byte windows of 'z' (energy 50*122 = 6100) and ' ' (1600):
    // speech, speech, silence, speech → two segments (2, 1 windows)
    val loud = "z" * 50; val quiet = " " * 50
    val docs = Seq((1L, loud + loud + quiet + loud))
      .toDF("doc_id", "payload")
    val got = Multimodal.audioSegments(docs, "doc_id", "payload",
        windowBytes = 50, threshold = 4720L)
      .orderBy("seg_idx").collect()
    assert(got.map(r => (r.getInt(1), r.getLong(2), r.getLong(3),
      r.getLong(4))).toSeq ==
      Seq((1, 0L, 2L, 12200L), (2, 3L, 1L, 6100L)))
  }

  test("m8 sub-window payloads drop; trailing partial window ignored") {
    import spark.implicits._
    val docs = Seq((1L, "z" * 49), (2L, "z" * 60)).toDF("doc_id", "payload")
    val got = Multimodal.audioSegments(docs, "doc_id", "payload",
        windowBytes = 50, threshold = 4720L).collect()
    assert(got.length == 1 && got(0).getLong(0) == 2L
      && got(0).getLong(3) == 1L, "only doc 2's single complete window")
  }

  test("m8 threshold is live on the real corpus: both verdicts carry mass") {
    val wins = Tables.documents(spark, sf)
      .select(col("doc_id"), trim(col("text")).as("pl"))
      .filter(length(col("pl")) >= 50)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, CAST(length(pl) DIV 50 AS INT) - 1)," +
          " w -> substring(pl, w * 50 + 1, 50))")).as(Seq("w", "win")))
      .select(expr("aggregate(split(win, ''), 0, (a, c) -> a + ascii(c))")
        .as("energy"))
    val n = wins.count()
    val speech = wins.filter(col("energy") >= 4720).count()
    assert(speech > 0 && speech < n,
      s"threshold must split the corpus ($speech of $n windows speech)")
  }

  // ---- x26 expand ----

  test("x26 expand rows never include the head and rank from 1 contiguously") {
    val got = SparkEntry.queries("x26_expand")(spark, sf).cache()
    assert(got.filter(col("doc_id") === col("head_id")).count() == 0)
    assert(got.filter(!col("expand_rank").between(1, 3)).count() == 0)
    // per source the expand ranks are 1..n with no gaps
    val bad = got.groupBy("source")
      .agg(count(lit(1)).as("n"), max("expand_rank").as("mx"),
        min("expand_rank").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(bad.count() == 0)
    got.unpersist()
    ()
  }

  test("x26 heads agree with the collapse window's rank-1 docs") {
    val terms = Seq("scan", "merge")
    val hits = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "source").agg(count(lit(1)).as("score"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(col("score").desc, col("doc_id").asc)
    val heads = hits.withColumn("r", row_number().over(w))
      .filter(col("r") === 1).select(col("source"), col("doc_id").as("h"))
    val got = SparkEntry.queries("x26_expand")(spark, sf)
      .select("source", "head_id").distinct()
    assert(got.join(heads, "source").filter(col("head_id") =!= col("h"))
      .count() == 0)
  }

  // ---- h10 harvest window plan ----

  test("h10 windows tile each feed's span: contiguous, 7-day, clipped last") {
    val got = SparkEntry.queries("h10_harvest_windows")(spark, sf).cache()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy("win_idx")
    val chk = got.withColumn("prev_until", lag("until_date", 1).over(w))
    assert(chk.filter(col("prev_until").isNotNull &&
      col("from_date") =!= col("prev_until")).count() == 0,
      "a window does not start where its predecessor ended")
    // every window is exactly 7 days except a shorter clipped last
    val lastIdx = got.groupBy("key").agg(max("win_idx").as("last"))
    val j = got.join(lastIdx, "key")
    assert(j.filter(col("win_idx") < col("last") && col("n_days") =!= 7)
      .count() == 0)
    assert(j.filter(col("n_days") <= 0 || col("n_days") > 7).count() == 0)
    // the clip branch is live: some feed's final window is short
    assert(j.filter(col("win_idx") === col("last") && col("n_days") < 7)
      .count() > 0)
    got.unpersist()
    ()
  }

  test("h10 zero-span state still plans one zero-length window") {
    import spark.implicits._
    val state = Seq(("feedA", "2024-01-01", "2024-01-01"))
      .toDF("key", "lo", "hi")
      .select(col("key"), to_date(col("lo")).as("lo"), to_date(col("hi")).as("hi"))
    val got = graft.operators.Harvest.harvestWindows(
      state, col("key"), col("lo"), col("hi"), widthDays = 7).collect()
    assert(got.length == 1 && got(0).getLong(4) == 0L,
      "an empty resume span must plan exactly one zero-length run")
  }

  // ---- p16 pack-span manifest ----

  test("p16 spans tile each pack exactly: gapless, ordered, summing to pack_tokens") {
    val got = SparkEntry.queries("p16_pack_spans")(spark, sf).cache()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "chunk_id").orderBy("seq_idx")
    val chk = got.withColumn("prev_end",
      lag(col("span_start") + col("span_len"), 1, 0L).over(w))
    assert(chk.filter(col("span_start") =!= col("prev_end")).count() == 0,
      "a span does not start where its predecessor ends")
    val last = got.groupBy("lang", "chunk_id", "pack_tokens")
      .agg(max(col("span_start") + col("span_len")).as("end"))
    assert(last.filter(col("end") =!= col("pack_tokens")).count() == 0,
      "spans do not sum to the pack's token count")
    // and the manifest agrees with p2's packing row-for-row
    val p2 = SparkEntry.queries("p2_pack")(spark, sf)
      .select(col("doc_id"), col("chunk_id").as("p2_chunk"))
    assert(got.join(p2, "doc_id")
      .filter(col("chunk_id") =!= col("p2_chunk")).count() == 0)
    got.unpersist()
    ()
  }

  // ---- x27 result grouping ----

  test("x27 groups page by best-doc score; docs page within groups") {
    val got = SparkEntry.queries("x27_grouping")(spark, sf).cache()
    // at most 3 groups, at most 2 docs each, ranks gapless
    assert(got.select("source").distinct().count() <= 3)
    assert(got.groupBy("source").count().filter(col("count") > 2).count() == 0)
    assert(got.filter(!col("doc_rank").between(1, 2)).count() == 0)
    // group order follows the best doc: group_rank 1's best score is
    // the global max among surfaced groups
    val rows = got.orderBy("group_rank", "doc_rank").collect()
    val bestByGroup = rows.groupBy(_.getInt(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(3)).max }
    bestByGroup.toSeq.sortBy(_._1).sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(a >= b, s"group order violated: $a < $b")
      case _ => ()
    }
    got.unpersist()
    ()
  }

  // ---- g3 HITS ----

  test("g3 hand-built star: the hub/authority asymmetry lands as designed") {
    import spark.implicits._
    // b, c, d each point at a (pairs are (earlier, later): a < b),
    // so a is the sole authority and b/c/d are equal hubs.
    val nodes = Seq("a", "b", "c", "d").toDF("source")
    val pairs = Seq(("a", "b", 1L), ("a", "c", 1L), ("a", "d", 1L))
      .toDF("source_a", "source_b", "w")
    val got = graft.operators.Graph.hits(nodes, pairs, iters = 2)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // auth: all mass on a (rescaled to exactly 1e6); hubs: b/c/d
    // split 1e6 by integer division, a holds 0
    assert(got.toSeq == Seq(
      ("a", 0L, 1000000L),
      ("b", 333333L, 0L), ("c", 333333L, 0L), ("d", 333333L, 0L)))
  }

  test("g3 scores are conserved and live on the real graph") {
    val got = SparkEntry.queries("g3_hits")(spark, sf).cache()
    // each rescaled phase sums to <= 1e6 (integer floor) and > 1e6/2
    val sums = got.agg(sum("hub"), sum("auth")).head
    Seq(sums.getLong(0), sums.getLong(1)).foreach { s =>
      assert(s <= 1000000L && s > 500000L, s"degenerate phase total $s")
    }
    // the direction convention bites: hub and auth genuinely differ
    assert(got.filter(col("hub") =!= col("auth")).count() > 0)
    got.unpersist()
    ()
  }

  // ---- s14 filtered IVF ----

  test("s14 an always-true filter reproduces the unfiltered IVF search") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("label"),
        graft.functions.Vectors.toDouble(col("embedding")).as("v"))
    val corpus = e.filter(col("id") >= 10)
      .withColumn("keep", lit(true))
    val filtered = graft.similarity.Ivf.searchFiltered(
      e.filter(col("id") < 10).select("id", "v"), corpus,
      listKey = "label", keepCol = "keep", k = 5, nProbe = 2,
      centroidScale = 1000000L)
    val plain = graft.similarity.Ivf.search(
      e.filter(col("id") < 10).select("id", "v"),
      e.filter(col("id") >= 10).select("id", "v", "label"),
      listKey = "label", k = 5, nProbe = 2, centroidScale = 1000000L)
    assert(filtered.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(filtered).count() == 0)
  }

  test("s14 every result satisfies the predicate; the filter BINDS") {
    val got = SparkEntry.queries("s14_filtered_ivf")(spark, sf).cache()
    val en = Tables.documents(spark, sf)
      .filter(col("lang") === "en").select(col("doc_id").as("n_id"))
    assert(got.join(en, Seq("n_id"), "left_anti").count() == 0,
      "a non-en neighbor leaked through the filter")
    // and it changes the answer vs the unfiltered s4 surface
    val s4 = SparkEntry.queries("s4_knn_ivf")(spark, sf)
    assert(got.exceptAll(s4).count() > 0, "the filter never bit")
    got.unpersist()
    ()
  }
}
