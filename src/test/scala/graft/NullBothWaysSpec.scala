package graft

import graft.plans.{ShingleHash, SimHashFold, SimplifyBothWaysNullChecks}
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.dsl.plans._
import org.apache.spark.sql.catalyst.expressions.{And, IsNotNull, IsNull, Or}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r15 inferred-filter fix: Catalyst's InferFiltersFromConstraints
  * turns join keys derived from native expressions into
  * isnotnull(<whole hash chain>) filters (constraints skip ScalaUDFs,
  * so the legacy UDFs never paid this) — Filter and Project are
  * separate codegen consumers, so the chain evaluated twice per row.
  * SimplifyBothWaysNullChecks rewrites the checks down to attribute
  * form, licensed by the both-ways null property of the marked
  * expressions. */
class NullBothWaysSpec extends AnyFunSuite {
  import TestSession._

  test("rule unit: nested IsNotNull/IsNull collapse to attribute checks") {
    val text = Symbol("text").string
    val rel = org.apache.spark.sql.catalyst.plans.logical.LocalRelation(text)
    val chain = SimHashFold(ShingleHash(text, 3, positional = false, fullOnly = false))
    val got = SimplifyBothWaysNullChecks(rel.where(IsNotNull(chain)).analyze)
    val conds = got.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }
    assert(conds == Seq(IsNotNull(text)), s"got $conds")
    val gotNull = SimplifyBothWaysNullChecks(rel.where(IsNull(chain)).analyze)
    val condsNull = gotNull.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }
    assert(condsNull == Seq(IsNull(text)), s"got $condsNull")
  }

  test("XPathSlots is NOT rewritten (empty-string XML maps non-null to null)") {
    val xml = Symbol("xml").string
    val rel = org.apache.spark.sql.catalyst.plans.logical.LocalRelation(xml)
    val slots = new graft.plans.XmlSlots(Array("//a"), Array(0: Byte))
    val pred = IsNotNull(graft.plans.XPathSlots(xml, slots))
    val got = SimplifyBothWaysNullChecks(rel.where(pred).analyze)
    val conds = got.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }
    assert(conds.head.isInstanceOf[IsNotNull]
      && conds.head.asInstanceOf[IsNotNull].child.isInstanceOf[graft.plans.XPathSlots],
      s"XPathSlots null check must survive: $conds")
  }

  test("d4's plan no longer re-evaluates the hash chain inside a filter") {
    val docs = dedup.Dedup.augmentedDocs(spark, sf)
    val plan = dedup.SimHash.nearDupPairs(docs, maxHamming = 6)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("isnotnull(simhashfold"),
      s"inferred filter still carries the chain:\n${plan.take(2000)}")
    assert(!plan.contains("isnotnull(shinglehash"),
      s"inferred filter still carries shinglehash:\n${plan.take(2000)}")
  }

  test("null text rows drop identically with the rewrite (semantics unchanged)") {
    import spark.implicits._
    val docs = Seq(
      (1L, Option("alpha beta gamma delta epsilon zeta")),
      (2L, Option("alpha beta gamma delta epsilon zeta")),
      (3L, Option.empty[String]),
      (4L, Option("totally different words here now ok")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(
        org.apache.spark.sql.functions.coalesce(col("text"), lit(""))))
    val pairs = dedup.SimHash.nearDupPairs(docs, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "null-text doc must not appear in any pair")
  }
}
