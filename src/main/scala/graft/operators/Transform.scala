package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative per-record transformation (reference: transform.py).
  *
  * The reference shells out to Saxon to run an XSLT crosswalk over
  * every record of every file, carrying `airflow-record-id` through
  * (transform.py:20-76). An XSLT crosswalk *declares* output fields
  * as expressions over input fields — in Spark that is a `select` of
  * named Columns: fully codegen'd, map-only, no per-record process
  * spawn (the reference forks a JVM per record — the single biggest
  * scale win of the re-expression).
  */
object Transform {

  /** Apply a crosswalk: ordered (outputName -> expression) pairs.
    * The record id should be one of the mappings, mirroring how the
    * reference stamps `airflow-record-id` on every result. */
  def crosswalk(df: DataFrame, mapping: Seq[(String, Column)]): DataFrame =
    df.select(mapping.map { case (name, expr) => expr.as(name) }: _*)

  /** Text normalization used before hashing/dedup: lowercase,
    * collapse whitespace, trim. Matches the oracle formula
    * `trim(regexp_replace(lower(x),'\s+',' ','g'))`. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Structural crosswalk rules — the stylesheet-shaped transform
    * depth beyond flat field mapping (reference: transform.py:20-76
    * runs arbitrary XSLT via Saxon; an XSLT template tree whose
    * matches produce nested output trees maps onto a rule tree whose
    * nodes produce nested struct columns).
    *
    *  - [[XLeaf]]  — `xsl:value-of`: first matching node's text
    *    (absent → "" so the JSON shape is stable; `to_json` drops
    *    null fields).
    *  - [[XAll]]   — `xsl:for-each` emitting one text per match:
    *    every matching node's text as array<string>.
    *  - [[XZip]]   — `xsl:for-each` emitting an element per match
    *    with several fields: N xpaths over the SAME repeated node,
    *    zipped positionally into array<struct> (the standard Spark
    *    XML-shredding idiom; xpath preserves document order so
    *    position i of each array refers to the same node).
    *  - [[XNode]]  — a literal result element with children: nested
    *    struct.
    *
    * Everything compiles to one codegen'd projection over the XML
    * column — map-only, no shuffle, no per-record process spawn — so
    * it scales as a plain scan at 100 TB. */
  sealed trait XRule
  final case class XLeaf(name: String, path: String) extends XRule
  final case class XAll(name: String, path: String) extends XRule
  final case class XZip(name: String, fields: Seq[(String, String)]) extends XRule
  final case class XNode(name: String, children: Seq[XRule]) extends XRule

  private def compileRule(xml: Column, r: XRule): Column = r match {
    case XLeaf(n, p) => coalesce(xpath_string(xml, lit(p)), lit("")).as(n)
    case XAll(n, p) => xpath(xml, lit(p)).as(n)
    case XZip(n, fields) =>
      val arrs = fields.map { case (_, p) => xpath(xml, lit(p)) }
      // transform-with-index over the first array; element_at is
      // 1-based. Interpreted HOF — fine here: this is a transform
      // surface, not a dedup hot path, and stays linear map-only.
      transform(arrs.head, (_, i) => struct(
        fields.map(_._1).zip(arrs).map { case (fn, a) =>
          element_at(a, i + 1).as(fn) }: _*)).as(n)
    case XNode(n, cs) => struct(cs.map(compileRule(xml, _)): _*).as(n)
  }

  /** Compile a rule tree over a serialized-XML column into one nested
    * struct Column (serialize with `to_json` for a stable wire/oracle
    * form). */
  def structuralCrosswalk(xml: Column, rules: Seq[XRule]): Column =
    struct(rules.map(compileRule(xml, _)): _*)
}
