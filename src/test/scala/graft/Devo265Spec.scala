package graft

import graft.operators.{Records, Transform, Validate}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real-data regression over the XML record surface: the reference
  * repo's devo-265 fixture (tests/fixtures/devo-265-failing-record
  * .xml + test_devo-256_lxml_bug.py) is 181 REAL Alma MARC21 records
  * whose unicode content (curly quotes, bullets, accented names)
  * broke the reference's per-record serialize round-trip. graft runs
  * its whole record surface over the vendored file: 001 extraction,
  * Schematron-style validation, the compiled-stylesheet crosswalk —
  * every value compared against an independent namespace-aware DOM
  * walk, so any unicode or namespace mangling in the xpath path
  * hash-fails here. */
class Devo265Spec extends AnyFunSuite {
  import TestSession._

  private val OaiNs = "http://www.openarchives.org/OAI/2.0/"
  private val MarcNs = "http://www.loc.gov/MARC21/slim"

  private def childElems(n: org.w3c.dom.Node): Seq[org.w3c.dom.Element] = {
    val nl = n.getChildNodes
    (0 until nl.getLength).map(nl.item)
      .collect { case e: org.w3c.dom.Element => e }
  }

  /** (oai identifier, serialized inner MARC record, DOM-expected
    * (001, 245$a)) per ListRecords record. */
  private lazy val records: Seq[(String, String, (String, String))] = {
    val in = getClass.getResourceAsStream("/devo265.xml")
    require(in != null)
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    val doc = try dbf.newDocumentBuilder().parse(in) finally in.close()
    val tf = javax.xml.transform.TransformerFactory.newInstance().newTransformer()
    tf.setOutputProperty(javax.xml.transform.OutputKeys.OMIT_XML_DECLARATION, "yes")
    val listRecords = childElems(doc.getDocumentElement)
      .find(e => e.getLocalName == "ListRecords").get
    childElems(listRecords).filter(_.getLocalName == "record").map { rec =>
      val header = childElems(rec).find(_.getLocalName == "header").get
      val oaiId = childElems(header).find(_.getLocalName == "identifier")
        .get.getTextContent
      val marc = childElems(childElems(rec)
        .find(_.getLocalName == "metadata").get)
        .find(e => e.getNamespaceURI == MarcNs && e.getLocalName == "record").get
      val sw = new java.io.StringWriter()
      tf.transform(new javax.xml.transform.dom.DOMSource(marc),
        new javax.xml.transform.stream.StreamResult(sw))
      val cfs = childElems(marc).filter(_.getLocalName == "controlfield")
      val f001 = cfs.find(_.getAttribute("tag") == "001")
        .map(_.getTextContent).getOrElse("")
      val t245a = childElems(marc)
        .filter(e => e.getLocalName == "datafield"
          && e.getAttribute("tag") == "245")
        .flatMap(childElems(_))
        .find(s => s.getLocalName == "subfield"
          && s.getAttribute("code") == "a")
        .map(_.getTextContent).getOrElse("")
      (oaiId, sw.toString, (f001, t245a))
    }
  }

  test("181 real Alma records: 001 extraction + validation agree with the DOM walk") {
    import spark.implicits._
    assert(records.size == 181)
    val df = records.map { case (id, xml, _) => (id, xml) }.toDF("oai_id", "xml")
    val got = df.select(col("oai_id"),
        Records.record001(col("xml")).as("id1"),
        Records.record001Status(col("xml")).as("st"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    records.foreach { case (oaiId, _, (f001, _)) =>
      assert(got(oaiId) == (f001, "ok"),
        s"$oaiId: got ${got(oaiId)}, want ($f001, ok)")
    }
    // Schematron-style gate: every real record carries exactly one 001
    val rules = Seq(Validate.Rule("one_001",
      size(Records.controlFieldValues(col("xml"), "001")) === 1, "one 001"))
    val report = Validate.reportAll(df, rules, col("oai_id"))
    assert(report.filter(col("n_failed") > 0).count() == 0)
  }

  test("the reference's 001 fixture quartet reproduces its get_record_001 verdicts") {
    // tests/fixtures/record_001{,_dup,_empty,_missing}.xml with the
    // reference's own expectations (test_process.py:72-118): one 001
    // → its value; duplicated → None/multiple; MISSING and — the
    // interesting case — an EMPTY <controlfield tag="001"/> both →
    // None/missing (an empty element has no text node, so the
    // text()-counting status agrees with the reference's truthiness
    // check without special-casing)
    import spark.implicits._
    def res(name: String): String = {
      val in = getClass.getResourceAsStream(s"/$name.xml")
      require(in != null)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val df = Seq("record_001", "record_001_dup", "record_001_empty",
        "record_001_missing").map(n => (n, res(n))).toDF("name", "xml")
    val got = df.select(col("name"),
        Records.record001(col("xml")).as("v"),
        Records.record001Status(col("xml")).as("st"))
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), r.getString(2))).toMap
    assert(got("record_001") == ((Some("991022063789703811"), "ok")))
    assert(got("record_001_dup") == ((None, "multiple")))
    assert(got("record_001_empty") == ((None, "missing")))
    assert(got("record_001_missing") == ((None, "missing")))
  }

  test("boundwith lookup enrichment appends ||-separated parent fields to a real record") {
    // the second half of perform_xml_lookup_with_cache
    // (test_harvest.py:192-498): the lookup's parent_xml carries
    // MULTIPLE serialized datafields joined by '||', each appended to
    // the child record — replayed here on the real record_001.xml
    // through the broadcast join + appendParentFields compose
    import spark.implicits._
    def res(name: String): String = {
      val in = getClass.getResourceAsStream(s"/$name.xml")
      require(in != null)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val children = Seq(res("record_001"), res("record_001_missing"))
      .toDF("xml")
      .withColumn("cid", Records.record001(col("xml")))
    val lookup = Seq(("991022063789703811",
      "<datafield>test</datafield>||<datafield>9910367273103811</datafield>"))
      .toDF("parent_key", "parent_xml")
    val enriched = Records.lookupEnrich(children, lookup,
        col("cid"), col("parent_key"))
      .select(col("cid"),
        Records.appendParentFields(col("xml"), col("parent_xml")).as("xml"))
      .collect().map(r => Option(r.getString(0)) -> r.getString(1)).toMap
    val hit = enriched(Some("991022063789703811"))
    assert(hit.contains("<datafield>test</datafield>"))
    assert(hit.contains("<datafield>9910367273103811</datafield>"))
    assert(hit.endsWith("</record>"))
    // the record stays well-formed XML and keeps its original fields
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    val doc = dbf.newDocumentBuilder().parse(new org.xml.sax.InputSource(
      new java.io.StringReader(hit)))
    assert(doc.getDocumentElement.getTagName == "record")
    // unmatched child (no 001 → no lookup row) passes through untouched
    assert(enriched(None) == res("record_001_missing"))
  }

  test("compiled-stylesheet crosswalk round-trips unicode content exactly") {
    import spark.implicits._
    val sheet =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
        |  <xsl:template match="/record">
        |    <doc>
        |      <id><xsl:value-of select="controlfield[@tag='001']"/></id>
        |      <title><xsl:value-of select="datafield[@tag='245']/subfield[@code='a']"/></title>
        |    </doc>
        |  </xsl:template>
        |</xsl:stylesheet>""".stripMargin
    val rules = Transform.compileXslt(sheet)
    val df = records.map { case (id, xml, _) => (id, xml) }.toDF("oai_id", "xml")
    val out = df.select(col("oai_id"),
        Transform.structuralCrosswalk(col("xml"), rules).as("rec"))
      .select(col("oai_id"), col("rec.id"), col("rec.title"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    records.foreach { case (oaiId, _, want) =>
      assert(out(oaiId) == want, s"$oaiId: got ${out(oaiId)}, want $want")
    }
    // the titles genuinely exercise unicode (the lxml bug's trigger)
    assert(records.exists(_._3._2.exists(_ > 127.toChar)),
      "fixture lost its non-ASCII content")
  }
}
