package graft

import graft.operators.Transform
import graft.operators.Transform._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-11 XSLT widening: multi-template `xsl:apply-templates`
  * stylesheets ([[Transform.compileXsltSheet]]) — the constructs the
  * reference's REAL fixture stylesheets use
  * (tests/fixtures/xsl-sample-simple.xsl:22-45), proven end-to-end on
  * the VENDORED fixture itself (src/test/resources/xsl_sample_simple
  * .xsl driven over xsl_sample.xml's three records). */
class XsltSheetSpec extends AnyFunSuite {
  import TestSession._

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/$name")
    require(in != null, s"missing test resource $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** Split the fixture collection into per-record serialized rows the
    * way graft models OAI feeds (one record per row). */
  private def recordRows(collectionXml: String): Seq[String] = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    val doc = dbf.newDocumentBuilder().parse(new org.xml.sax.InputSource(
      new java.io.StringReader(collectionXml)))
    val nl = doc.getDocumentElement.getChildNodes
    val tf = javax.xml.transform.TransformerFactory.newInstance().newTransformer()
    tf.setOutputProperty(javax.xml.transform.OutputKeys.OMIT_XML_DECLARATION, "yes")
    (0 until nl.getLength).map(nl.item)
      .collect { case e: org.w3c.dom.Element => e }
      .map { e =>
        val sw = new java.io.StringWriter()
        tf.transform(new javax.xml.transform.dom.DOMSource(e),
          new javax.xml.transform.stream.StreamResult(sw))
        sw.toString
      }
  }

  test("compileXsltSheet compiles the vendored reference stylesheet into the expected rule tree") {
    val sheet = compileXsltSheet(resource("xsl_sample_simple.xsl"))
    // base match: predicate kept, QName steps rewritten prefix-agnostic
    assert(sheet.contextPath.startsWith("//*[substring-after(name(),':')='dc']"))
    assert(sheet.contextPath.contains("'pdcp_noharvest'"))
    // one exclusion: the deleted-record drop template (text()|@* is a no-op)
    assert(sheet.exclusionPaths.size == 1)
    assert(sheet.exclusionPaths.head.contains("@status='deleted'"))
    // dc:title -> dcterms:title; dc:type -> dcterms:type (7 regex whens)
    // + dcterms:format (the otherwise)
    val dispatches = sheet.rules.collect { case d: XDispatch => d }
    assert(dispatches.map(_.name) ==
      Seq("dcterms:title", "dcterms:type", "dcterms:format"))
    val title = dispatches.head
    assert(title.cases == Seq((Seq(ANonEmpty), VNormText)))
    val typ = dispatches(1)
    assert(typ.cases.size == 7 && typ.cases.forall(_._2.isInstanceOf[VConst]))
    // first-match-wins: branch k negates branches 1..k-1
    assert(typ.cases.last._1.count(_.isInstanceOf[ANot]) == 6)
    val fmt = dispatches(2)
    assert(fmt.cases.size == 1 && fmt.cases.head._2 == VText
      && fmt.cases.head._1.count(_.isInstanceOf[ANot]) == 7)
  }

  test("the vendored fixture records map end-to-end to the reference's expected output") {
    import spark.implicits._
    val rows = recordRows(resource("xsl_sample.xml"))
    assert(rows.size == 3)
    val df = rows.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("rec_id", "xml")
    val out = Transform.xsltSheetTransform(
      resource("xsl_sample_simple.xsl"), "xml", Seq("rec_id"))(df)
      .orderBy("rec_id").collect()
    // expected per tests/fixtures/xsl-sample-simple-output-record{1,2,3}.xml:
    // normalized dcterms:title + dcterms:type Text for every record
    val titles = Seq(
      "Beadle's monthly, January, 1866.",
      "Beadle's monthly, v. 1, volume title, plates and index.",
      "Beadle's monthly, February, 1866.")
    assert(out.length == 3)
    out.zip(titles).foreach { case (row, t) =>
      assert(row.getString(1) ==
        s"""{"dcterms:title":["$t"],"dcterms:type":["Text"]}""")
    }
  }

  test("drop templates kill deleted records; the base predicate kills remediated ones") {
    import spark.implicits._
    val rows = recordRows(resource("xsl_sample.xml"))
    val deleted = rows.head.replace("<ns0:header>",
      """<ns0:header status="deleted">""")
    val remediated = rows(1).replace("</oai_dc:dc>",
      "<dc:relation>pdcp_noharvest</dc:relation></oai_dc:dc>")
    val df = Seq(0L -> deleted, 1L -> remediated, 2L -> rows(2))
      .toDF("rec_id", "xml")
    val out = Transform.xsltSheetTransform(
      resource("xsl_sample_simple.xsl"), "xml", Seq("rec_id"))(df)
      .collect()
    assert(out.length == 1 && out.head.getLong(0) == 2L)
  }

  test("per-node dispatch: arrays in document order, blank nodes dropped, matches() on raw text") {
    import spark.implicits._
    val sheet =
      """<?xml version="1.0"?>
        |<xsl:stylesheet version="2.0"
        |    xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
        |    xmlns:dcterms="http://purl.org/dc/terms/">
        |  <xsl:template match="text() | @*"/>
        |  <xsl:template match="//dc">
        |    <out><xsl:apply-templates/></out>
        |  </xsl:template>
        |  <xsl:template match="title">
        |    <xsl:if test="normalize-space(.)!=''">
        |      <xsl:element name="dcterms:title">
        |        <xsl:value-of select="normalize-space(.)"/>
        |      </xsl:element>
        |    </xsl:if>
        |  </xsl:template>
        |  <xsl:template match="type">
        |    <xsl:choose>
        |      <xsl:when test="matches(., '(^text.*$)', 'i')"><t>Text</t></xsl:when>
        |      <xsl:otherwise><f><xsl:value-of select="."/></f></xsl:otherwise>
        |    </xsl:choose>
        |  </xsl:template>
        |</xsl:stylesheet>""".stripMargin
    val xml = "<dc><title>  a   b </title><title>   </title><title>c</title>" +
      "<type> text leading-space goes to otherwise</type></dc>"
    val out = Transform.xsltSheetTransform(sheet, "xml", Seq())(
      Seq(xml).toDF("xml")).collect().head.getString(0)
    // two non-blank titles normalized in document order; the type's
    // leading space defeats the ANCHORED ^text regex on RAW text
    assert(out ==
      """{"dcterms:title":["a b","c"],"f":[" text leading-space goes to otherwise"]}""")
  }

  test("out-of-subset constructs are refused, not mis-run") {
    def sheetWith(body: String): String =
      s"""<?xml version="1.0"?>
         |<xsl:stylesheet version="2.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
         |  <xsl:template match="//dc"><out><xsl:apply-templates/></out></xsl:template>
         |  <xsl:template match="title">$body</xsl:template>
         |</xsl:stylesheet>""".stripMargin
    // call-template / variable / computational test / non-dot select
    intercept[IllegalArgumentException](compileXsltSheet(
      sheetWith("""<xsl:call-template name="x"/>""")))
    intercept[IllegalArgumentException](compileXsltSheet(
      sheetWith("""<t><xsl:value-of select="sub/path"/></t>""")))
    intercept[IllegalArgumentException](compileXsltSheet(
      sheetWith("""<xsl:if test="position()=1"><t><xsl:value-of select="."/></t></xsl:if>""")))
    // two base templates
    intercept[IllegalArgumentException](compileXsltSheet(
      """<?xml version="1.0"?>
        |<xsl:stylesheet version="2.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
        |  <xsl:template match="//a"><o><xsl:apply-templates/></o></xsl:template>
        |  <xsl:template match="//b"><o><xsl:apply-templates/></o></xsl:template>
        |</xsl:stylesheet>""".stripMargin))
    // colon inside a string literal defeats the token-level QName rewrite
    intercept[IllegalArgumentException](
      Transform.rewriteQNames("//a[text()='urn:x']"))
  }
}
