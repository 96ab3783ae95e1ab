package graft

import graft.functions.Hashing
import graft.text.LangModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r14 verdict's tokenization-unification item: string k-grams
  * (TokenGrams) and hashed k-grams (ShingleHash) now share ONE
  * tokenizer, and LangModel.bigrams rides the codegen expression
  * instead of its own ScalaUDF. The legacy `bigramStrings` stays as
  * the sequential reference these parity pins replay. */
class TokenGramsSpec extends AnyFunSuite {
  import TestSession._

  test("TokenGrams k=2 is bit-identical to the legacy bigram UDF on the corpus") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(400)
    val got = docs.select(col("doc_id"),
        graft.plans.TokenGrams.tokenGrams(col("text"), 2).as("bg"))
      .as[(Long, Seq[String])].collect().toMap
    docs.as[(Long, String)].collect().foreach { case (id, text) =>
      assert(got(id) == LangModel.bigramStrings(text).toSeq,
        s"bigram drift on doc $id")
    }
  }

  test("edge inputs match the legacy logic (whitespace zoo, multi-byte, tiny docs)") {
    import spark.implicits._
    val edges = Seq(
      "", " ", "\t\n ", "one", "a b", "a  b\tc", " lead and trail \n",
      "héllo Wörld Ωmega", "x ␠ y",
      "UPPER lower MiXeD case", "a\nb\nc\nd")
    val df = edges.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(col("id"),
        graft.plans.TokenGrams.tokenGrams(col("text"), 2).as("bg"))
      .as[(Long, Seq[String])].collect().toMap
    edges.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == LangModel.bigramStrings(t).toSeq,
        s"edge drift on '$t'")
    }
    // null text → null grams (the expression is null-safe)
    val nullRow = Seq((0L, Option.empty[String])).toDF("id", "text")
      .select(graft.plans.TokenGrams.tokenGrams(col("text"), 2).as("bg"))
      .collect().head
    assert(nullRow.isNullAt(0))
  }

  test("one tokenization codepath: hashed string grams == ShingleHash grams") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(200)
    val rows = docs.select(col("doc_id"),
        graft.plans.TokenGrams.tokenGrams(col("text"), 3).as("sg"),
        graft.plans.ShingleHash.positionalKgrams(col("text"), 3).as("hg"))
      .as[(Long, Seq[String], Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, sg, hg) =>
      assert(sg.map(Hashing.h32jvm(0, _)) == hg,
        s"string grams and hashed grams diverge on doc $id")
    }
  }

  test("ta11's bigram front is a codegen expression, not a ScalaUDF") {
    val docs = Tables.documents(spark, sf).limit(10)
    val plan = docs.select(LangModel.bigrams(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("tokengrams"), s"expected TokenGrams in plan:\n$plan")
    assert(!plan.contains("UDF"), s"ScalaUDF leaked back into the bigram front:\n$plan")
  }
}
