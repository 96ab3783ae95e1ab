package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the lambda-free rewrites of the text primitives (r5 VERDICT
  * #3): the regexp_count token matcher and the posexplode chunker
  * must agree exactly with the split-based HOF definitions they
  * replaced, on every boundary case the \s+ tokenization produces.
  */
class TextAnalysisSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def ratioOf(s: String): Option[Double] = {
    val r = Seq(s).toDF("text")
      .select(TextAnalysis.stopwordRatio(col("text")).as("r")).head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("stopwordRatio counts whole tokens only, with multiplicity") {
    // "a" appears twice (multiplicity), "and" must not match marker
    // "a" as a prefix, "the" inside "theme" must not match
    assert(ratioOf("a cat and a theme") == Some(0.6)) // a, and, a of 5
    assert(ratioOf("band land sand") == Some(0.0))    // no suffix match
    assert(ratioOf("the the the") == Some(1.0))
    // consecutive whitespace: split(\s+) yields the same 3 tokens
    assert(ratioOf("the  of\tis") == Some(1.0))
    // leading/trailing whitespace trimmed before both count passes
    assert(ratioOf("  the end  ") == Some(0.5))
  }

  test("langScore equals an independent JVM count on real documents") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val markers = TextAnalysis.LangMarkers.flatMap(_._2)
    val got = docs.select(col("doc_id"),
      TextAnalysis.langScore(col("text"), markers).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val set = markers.toSet
    val want = docs.collect().map { r =>
      r.getLong(0) -> r.getString(1).trim.split("\\s+").count(set)
    }.toMap
    assert(got == want)
  }

  test("explodeChunks matches slice-by-hand windows incl. short tail") {
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.explodeChunks(df, col("text"), width = 4,
        stride = 3)
      .select("chunk_idx", "chunk_text").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq.sorted
    assert(got == Seq(
      0 -> "t1 t2 t3 t4", 1 -> "t4 t5 t6 t7", 2 -> "t7 t8 t9 t10",
      3 -> "t10"))
    // empty-ish text: one empty chunk (split(trim("")) = [""]), the
    // contract the oracle SQL mirrors
    val e = TextAnalysis.explodeChunks(Seq((2L, " ")).toDF("doc_id", "text"),
      col("text"), 4, 3).select("chunk_idx", "chunk_text").collect()
    assert(e.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq(0 -> ""))
  }

  test("CharClassCounts equals the replace-length identity on real documents") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val t = lower(col("text"))
    val native = docs.select(col("doc_id"),
      graft.plans.TextExpr.charClassCounts(t).as("cc")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val alpha = ('a' to 'z').map(_.toString) :+ " "
    val declarative = docs.select(col("doc_id") +:
        alpha.map(c => (length(t) - length(replace(t, lit(c), lit("")))).as(c)): _*)
      .collect().map(r => r.getLong(0) -> (1 to 27).map(r.getInt)).toMap
    assert(native.keySet == declarative.keySet)
    native.foreach { case (id, cc) =>
      assert(cc == declarative(id), s"count mismatch for doc $id")
    }
    // boundary cases: empty, all-other, mixed
    val edge = Seq((1L, ""), (2L, "###"), (3L, "ab z")).toDF("id", "t")
    val got = edge.select(col("id"),
      graft.plans.TextExpr.charClassCounts(col("t")).as("cc")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L).sum == 0 && got(2L).sum == 0)
    assert(got(3L)(0) == 1 && got(3L)(1) == 1 && got(3L)(25) == 1 && got(3L)(26) == 1)
  }

  test("charEntropyQ evaluates the counts expression once per row") {
    val df = TextAnalysis.charEntropyQ(
      Tables.documents(spark, sf).select("doc_id", "text"), col("text"))
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    val hits = "charclasscounts".r.findAllIn(plan).length
    assert(hits == 1,
      s"CharClassCounts should appear exactly once in the plan, found $hits")
  }

  test("explodeChunks plan is lambda-free and generator-based") {
    val df = Tables.documents(spark, sf).select("doc_id", "text")
    val plan = TextAnalysis.explodeChunks(df, col("text"), 40, 30)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), "posexplode should plan a Generate")
    assert(!plan.contains("lambdafunction"),
      "no interpreted HOF lambda in the chunk path")
  }

  test("ngramRepetition counts gram character mass exactly on known docs") {
    import spark.implicits._
    val docs = Seq(
      // tokens [x,y,x,y,x,y,x]: "x y" 3× (mass 3·3=9) = "y x" 3×;
      // 3-grams "x y x" 3× (3·5=15) + "y x y" 2× (2·5=10) → dup3 25
      (1L, "x y x y x y x"),
      (2L, "all distinct words here"), // no repeated grams
      (3L, "solo"),                    // 1 token: no 2-grams at all
      (4L, null.asInstanceOf[String]), // null → '' → verdict row kept
      (5L, "  a   b  a b  ")           // whitespace noise normalizes
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramRepetition(docs)
      .orderBy("doc_id").collect()
    def row(i: Int) = got(i)
    assert(got.length == 5)
    assert(row(0).getAs[Long]("top2_chars") == 9L)
    assert(row(0).getAs[Long]("dup3_chars") == 25L)
    assert(row(0).getAs[Long]("n_chars") == 13L)
    assert(!row(0).getAs[Boolean]("rule_top2")) // 9*14 > 13
    assert(!row(0).getAs[Boolean]("rule_dup3")) // 25*10 > 13
    // no repeats: dup3 exactly 0; top2 = longest singleton gram (14)
    assert(row(1).getAs[Long]("top2_chars") == 14L)
    assert(row(1).getAs[Long]("dup3_chars") == 0L)
    assert(row(1).getAs[Boolean]("rule_dup3"))
    assert(!row(1).getAs[Boolean]("rule_top2")) // short doc: 14*14 > 23
    assert(row(2).getAs[Long]("top2_chars") == 0L)
    assert(row(2).getAs[Long]("dup3_chars") == 0L)
    assert(row(3).getAs[Long]("n_chars") == 0L
      && row(3).getAs[Boolean]("pass")) // '' : 0*k <= 0
    // norm "a b a b": top 2-gram "a b" 2× → 6; both 3-grams unique
    assert(row(4).getAs[Long]("top2_chars") == 6L)
    assert(row(4).getAs[Long]("dup3_chars") == 0L)
  }
}
