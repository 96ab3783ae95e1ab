package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-level field extraction and enrichment
  * (reference: process.py + harvest.py `perform_xml_lookup`).
  *
  * The reference works on per-record MARC21/XML; graft treats a
  * record as a row whose payload columns hold semi-structured text
  * (JSON props / serialized fields) and extracts typed fields with
  * codegen'd regexp/JSON expressions — never per-record Python.
  */
object Records {

  /** Extract a typed field from a semi-structured payload column
    * (reference: process.py:66-81 `get_record_001` pulls the 001
    * control field; missing → error row, not a crash). Returns null
    * for missing, like the reference returns None. */
  def extractField(payload: Column, pattern: String): Column =
    nullif(regexp_extract(payload, pattern, 1), lit("")).cast("long")

  /** Record-id quality classification (reference: process.py:70-79:
    * a record with no 001 or multiple 001s is logged as an error).
    * Per-id record counts joined back: 'ok' when exactly one record
    * carries the id, 'duplicate' otherwise, 'missing' for null ids.
    * One shuffle on the id; the count side is tiny and broadcast. */
  def idQuality(df: DataFrame, idCol: Column): DataFrame = {
    val counts = df.groupBy(idCol.as("record_id"))
      .agg(count(lit(1)).as("n_records"))
    counts.withColumn("status",
      when(col("record_id").isNull, "missing")
        .when(col("n_records") > 1, "duplicate")
        .otherwise("ok"))
  }

  /** All text values of a MARC21-style control field, parsed from a
    * serialized XML record column with Spark's native xpath (codegen
    * boundary only at the expression — no per-record Python, unlike
    * the reference's lxml loop). */
  def controlFieldValues(xml: Column, tag: String): Column =
    xpath(xml, lit(s"/record/controlfield[@tag='$tag']/text()"))

  /** The 001 record identifier with the reference's exact semantics
    * (process.py:66-81 `get_record_001`): present exactly once →
    * its text; missing OR multiple → null (the reference returns
    * None and logs in both cases). */
  def record001(xml: Column): Column = {
    val ids = controlFieldValues(xml, "001")
    when(size(ids) === 1, element_at(ids, 1))
  }

  /** Why a record's 001 was rejected — the classification the
    * reference logs (process.py:70-79). */
  def record001Status(xml: Column): Column = {
    val n = size(controlFieldValues(xml, "001"))
    when(n === 0, "missing").when(n > 1, "multiple").otherwise("ok")
  }

  /** MARC21 default namespace URI (reference: process.py:12-15 NS map). */
  val Marc21Ns = "http://www.loc.gov/MARC21/slim"

  // the first element start tag: `<` then a name char — skips the
  // XML decl (<?), comments/DOCTYPE (<!), so group 0 is the root's
  // start tag, group 1 its (possibly prefixed) name, group 2 the
  // attribute text verbatim
  private val RootTag = "<([A-Za-z_][^\\s/>!?]*)([^>]*)>"

  /** Inject a default namespace into the root element when the root
    * is not already in it (reference: process.py:37-45
    * `add_marc21xml_root_ns` — Alma SFTP collection dumps arrive
    * with unprefixed, namespace-less roots and the MARC21 tooling
    * downstream needs the namespace present). Already-in-namespace
    * documents pass through BYTE-UNCHANGED (the reference's dup test
    * pins idempotence): a root carrying any default `xmlns=` decl or
    * whose prefix is bound to `ns` on the root itself is left alone.
    * Map-only string surgery on the root start tag — no DOM parse,
    * no reserialization, the rest of the document byte-identical
    * (the reference round-trips through lxml, whose only other
    * observable effect is blank-text removal — [[stripBlankText]],
    * kept separate so callers opt in). Pair with [[wellFormedXml]]
    * for the reference's encoding-error canary. */
  def ensureRootNs(xml: Column, ns: String = Marc21Ns): Column = {
    val rootTag = regexp_extract(xml, RootTag, 0)
    val rootName = regexp_extract(xml, RootTag, 1)
    val rootAttrs = regexp_extract(xml, RootTag, 2)
    val prefix = when(rootName.contains(":"),
      substring_index(rootName, ":", 1))
    val hasDefaultNs = rootAttrs.rlike("""(^|\s)xmlns\s*=""")
    val prefixBoundToNs = prefix.isNotNull &&
      rootAttrs.contains(concat(lit("xmlns:"), prefix, lit("=\"" + ns + "\"")))
    // first literal occurrence of the matched tag IS the regex match
    // (the tag text itself matches the pattern, so nothing earlier can)
    val pos = call_function("instr", xml, rootTag)
    when(xml.isNull || rootTag === "", xml)
      .when(hasDefaultNs || prefixBoundToNs, xml)
      .otherwise(concat(
        xml.substr(lit(1), pos - 1),
        lit("<"), rootName, lit(" xmlns=\"" + ns + "\""), rootAttrs, lit(">"),
        xml.substr(pos + length(rootTag), length(xml))))
  }

  /** lxml `remove_blank_text=True` analog: drop whitespace-only text
    * between tags (indentation) and outer whitespace. Matches lxml on
    * data-oriented XML — whitespace-only LEAF text collapses too,
    * exactly as lxml's parser drops it; text with any non-space
    * character (MARC's padded `w    ` subfields) never touches the
    * `>\s+<` pattern and survives verbatim. Byte-parity with the
    * reference's serialized fixture is spec-pinned. */
  def stripBlankText(xml: Column): Column =
    // regexp, not trim: Spark trim strips SPACES only — the trailing
    // newline every real file carries would survive it
    regexp_replace(regexp_replace(xml, ">\\s+<", "><"), "^\\s+|\\s+$", "")

  /** TRUE iff the payload parses as XML ([[graft.plans.XmlExpr]]'s
    * native probe — same parser configuration as the xpath family,
    * but a flag instead of a task-failing throw). The reference's
    * early encoding-error canary (process.py:43-44), expressed as
    * the column the quarantine split branches on. */
  def wellFormedXml(xml: Column): Column =
    graft.plans.XmlExpr.xmlWellFormed(xml)

  /** Boundwith parent datafield (reference: process.py:83-92
    * `generate_bw_parent_field`): the ADF/a datafield inserted into
    * child records, serialized exactly as lxml would emit it. */
  def bwParentField(parentId: Column): Column =
    concat(
      lit("<datafield xmlns=\"http://www.loc.gov/MARC21/slim\" ind1=\" \" ind2=\" \" tag=\"ADF\"><subfield code=\"a\">"),
      parentId,
      lit("</subfield></datafield>"))

  /** Boundwith parent enrichment (reference: harvest.py:203-236
    * `perform_xml_lookup_with_cache`: a CSV of child_id → parent_xml
    * is fetched once, cached, and each child record gets its parent
    * appended). The cache-once-join-many pattern IS a broadcast hash
    * join: the lookup side ships to every executor once; the child
    * stream never shuffles. */
  def lookupEnrich(children: DataFrame, lookup: DataFrame,
      childKey: Column, lookupKey: Column): DataFrame =
    children.join(broadcast(lookup), childKey === lookupKey, "left")

  /** Apply a looked-up `parent_xml` to the child record — the second
    * half of `perform_xml_lookup_with_cache` (harvest.py:216-233):
    * the lookup value is one-or-more serialized datafields joined by
    * `||`, each appended to the child's record element in order.
    * Appending every field in sequence is concatenation, so the
    * separator simply drops out; the fields land before the record's
    * closing tag. NULL/empty lookup (no parent) leaves the record
    * untouched, as does a record that does not end with `closeTag`
    * (a malformed row can't be half-rewritten). Map-only, composes
    * with [[lookupEnrich]]'s broadcast join. */
  def appendParentFields(xml: Column, parentXml: Column,
      closeTag: String = "</record>"): Column = {
    // regexp: Spark's rtrim strips SPACES only — a trailing newline
    // (every real file has one) would defeat the closing-tag check
    val trimmed = regexp_replace(xml, "\\s+$", "")
    when(parentXml.isNull || parentXml === "" ||
        !trimmed.endsWith(closeTag), xml)
      .otherwise(concat(
        trimmed.substr(lit(1), length(trimmed) - lit(closeTag.length)),
        regexp_replace(parentXml, "\\|\\|", ""),
        lit(closeTag)))
  }
}
