package graft

import graft.dedup.Dedup
import graft.functions.Hashing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ShingleHash native-expression contract: the r14 switch from the
  * legacy Scala UDFs to a Catalyst expression must be BIT-IDENTICAL
  * — every dedup oracle hash in CORRECTNESS depends on it — and must
  * actually stay inside codegen (the point of the switch). The
  * references below replay the legacy UDF logic verbatim
  * (shingleStrings IS the legacy tokenizer, kept as the sequential
  * reference). */
class ShingleHashSpec extends AnyFunSuite {
  import TestSession._

  private def refHashed(text: String): Seq[Long] =
    Dedup.shingleStrings(text).map(Hashing.h32jvm(0, _)).distinct.sorted.toSeq

  private val ws = java.util.regex.Pattern.compile("\\s+")

  private def refPositional(text: String): Seq[Long] = {
    val tks = ws.split(ws.matcher(text.toLowerCase).replaceAll(" ").trim)
    val n = math.max(tks.length - 2, 1)
    (0 until n).map { i =>
      val sb = new StringBuilder(tks(i))
      if (i + 1 < tks.length) sb.append(' ').append(tks(i + 1))
      if (i + 2 < tks.length) sb.append(' ').append(tks(i + 2))
      Hashing.h32jvm(0, sb.toString)
    }
  }

  private def refKgrams(text: String, k: Int): Seq[Long] = {
    val tks = ws.split(ws.matcher(text.toLowerCase).replaceAll(" ").trim)
    val n = tks.length - k + 1
    if (n <= 0) Seq.empty
    else (0 until n).map(i => Hashing.h32jvm(0, tks.slice(i, i + k).mkString(" ")))
  }

  private val edges = Seq(
    "", " ", "a", "a b", "a b c", "a b c d",
    "a  b\tc\nd", "  lead and trail  ",
    "UPPER Case MiXeD", "dup dup dup dup dup",
    "Jiří “devo” • résumé 東京都", "x " * 40)

  test("all three modes are bit-identical to the legacy UDF logic on the real corpus") {
    import spark.implicits._
    val texts = Dedup.augmentedDocs(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))) ++
      edges.zipWithIndex.map { case (t, i) => (9000000L + i, t) }
    val df = texts.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"),
        Dedup.hashedShingles(col("text")).as("h"),
        Dedup.positionalHashedShingles(col("text")).as("p"),
        Dedup.positionalHashedKgrams(col("text"), 10).as("g"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](1), r.getSeq[Long](2), r.getSeq[Long](3))).toMap
    texts.foreach { case (id, t) =>
      val (h, p, g) = df(id)
      assert(h == refHashed(t), s"hashedShingles diverged on doc $id: '$t'")
      assert(p == refPositional(t), s"positional diverged on doc $id: '$t'")
      assert(g == refKgrams(t, 10), s"kgrams diverged on doc $id: '$t'")
    }
  }

  test("the expression stays inside whole-stage codegen (no UDF fence)") {
    val df = Tables.documents(spark, sf)
      .select(size(Dedup.hashedShingles(col("text"))).as("n"))
      .filter(col("n") > 0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"legacy UDF still in the plan:\n$plan")
    // the "*(n)" node prefix IS the WholeStageCodegen span marker in
    // the executed-plan string; the shinglehash projection must sit
    // inside one (a ScalaUDF would have fenced it out)
    assert(plan.contains("*(1) Project") && plan.contains("shinglehash"),
      s"expected the shingle projection inside a codegen span:\n$plan")
  }
}
