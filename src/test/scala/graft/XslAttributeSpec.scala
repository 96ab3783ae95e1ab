package graft

import graft.operators.Transform
import graft.operators.Transform._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r13 `xsl:attribute` widening ([[Transform.VAttributed]]):
  * literal-named attributes on emitting elements — the most common
  * shape the subset previously refused (aggregator_mdx-style
  * identifier/language crosswalks; the reference runs them through
  * Saxon, transform.py:56-76). Covers the struct/JSON model
  * (`{"@name":…,"#text":…}`), both wire forms (declaration-order and
  * document-order `outputXml`), attribute escaping, and the refusal
  * fence for everything still out of subset. */
class XslAttributeSpec extends AnyFunSuite {
  import TestSession._

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/$name")
    require(in != null, s"missing test resource $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  private val recA =
    """<oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
      |    xmlns:dc="http://purl.org/dc/elements/1.1/">
      |  <dc:identifier>http://x.org/1?a=1&amp;b="q"</dc:identifier>
      |  <dc:title>  A   Tale </dc:title>
      |  <dc:language> en </dc:language>
      |  <dc:subject>maps</dc:subject>
      |  <dc:identifier>   </dc:identifier>
      |</oai_dc:dc>""".stripMargin

  private def frame(xmls: String*) = {
    import spark.implicits._
    xmls.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("id", "xml")
  }

  test("attributed emissions land in the struct model as @attr/#text") {
    val sheet = compileXsltSheet(resource("xsl_sample_attr.xsl"))
    val out = frame(recA).filter(sheet.keep(col("xml")))
      .select(to_json(sheet.output(col("xml"))).as("rec"))
      .head.getString(0)
    // constant attribute + raw text content (entities unescaped by xpath)
    assert(out.contains(
      """"identifier":[{"@type":"url","#text":"http://x.org/1?a=1&b=\"q\""}]"""),
      s"identifier emission wrong in $out")
    // blank identifier dropped by the guard → exactly one array element
    assert(!out.contains("\"#text\":\"   \""))
    // attribute FROM the node, constant content
    assert(out.contains(""""language":[{"@code":"en","#text":"mapped"}]"""))
    // attributed xsl:element: two attributes, normalized content
    assert(out.contains(
      """"dcterms:title":[{"@lang":"en","@raw":"  A   Tale ","#text":"A Tale"}]"""),
      s"title emission wrong in $out")
    // un-attributed template still renders as a bare string array
    assert(out.contains(""""subject":["maps"]"""))
  }

  test("wire form renders attributes with escaping, both output orders") {
    val sheet = compileXsltSheet(resource("xsl_sample_attr.xsl"))
    for (docOrder <- Seq(false, true)) {
      val out = frame(recA).filter(sheet.keep(col("xml")))
        .select(sheet.outputXml(col("xml"), documentOrder = docOrder).as("rec"))
        .head.getString(0)
      assert(out.contains(
        """<identifier type="url">http://x.org/1?a=1&amp;b="q"</identifier>"""),
        s"docOrder=$docOrder: $out")
      // attribute VALUES escape quotes (they sit inside "..."), text doesn't
      assert(out.contains(
        """<dcterms:title lang="en" raw="  A   Tale ">A Tale</dcterms:title>"""))
      assert(out.contains("""<language code="en">mapped</language>"""))
      assert(out.contains("<subject>maps</subject>"))
      assert(out.startsWith("<record>") && out.endsWith("</record>"))
    }
  }

  test("attribute values containing quotes and angle brackets escape on the wire") {
    val rec =
      """<oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
        |    xmlns:dc="http://purl.org/dc/elements/1.1/">
        |  <dc:title>a "b" &lt;c&gt; &amp; d</dc:title>
        |</oai_dc:dc>""".stripMargin
    val sheet = compileXsltSheet(resource("xsl_sample_attr.xsl"))
    val out = frame(rec).filter(sheet.keep(col("xml")))
      .select(sheet.outputXml(col("xml")).as("rec")).head.getString(0)
    assert(out.contains(
      """raw="a &quot;b&quot; &lt;c&gt; &amp; d""""),
      s"attribute escaping wrong: $out")
    assert(out.contains(""">a "b" &lt;c&gt; &amp; d</dcterms:title>"""),
      "text content keeps plain quotes but escapes markup")
  }

  test("round-trip: the wire form re-parses and xpath reads the attributes back") {
    val sheet = compileXsltSheet(resource("xsl_sample_attr.xsl"))
    val wire = frame(recA).filter(sheet.keep(col("xml")))
      .select(sheet.outputXml(col("xml")).as("rec"))
    val read = wire.select(
      xpath_string(col("rec"), lit("/record/identifier/@type")).as("t"),
      xpath_string(col("rec"), lit("/record/identifier/text()")).as("v"),
      xpath_string(col("rec"), lit("/record/language/@code")).as("c"))
      .head
    assert(read.getString(0) == "url")
    assert(read.getString(1) == "http://x.org/1?a=1&b=\"q\"")
    assert(read.getString(2) == "en")
  }

  test("STATIC attributes on literal result elements copy to the output") {
    // XSLT copies a literal result element's own attributes verbatim;
    // dropping them silently would be a misrun (refuse-not-misrun)
    def sheetWith(identifierEl: String): String =
      s"""<?xml version="1.0"?>
         |<xsl:stylesheet xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
         |    xmlns:dc="http://purl.org/dc/elements/1.1/"
         |    xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
         |    version="2.0">
         |  <xsl:template match="text() | @*"/>
         |  <xsl:template match="//oai_dc:dc"><record><xsl:apply-templates /></record></xsl:template>
         |  <xsl:template match="dc:identifier">$identifierEl</xsl:template>
         |</xsl:stylesheet>""".stripMargin
    def wire(sheetSrc: String): String = {
      val sheet = compileXsltSheet(sheetSrc)
      frame(recA).filter(sheet.keep(col("xml")))
        .select(sheet.outputXml(col("xml")).as("rec")).head.getString(0)
    }
    // plain static attribute
    val w1 = wire(sheetWith(
      """<identifier type="local"><xsl:value-of select="normalize-space(.)"/></identifier>"""))
    assert(w1.contains("""<identifier type="local">http://x.org/1?a=1&amp;b="q"</identifier>"""),
      s"static attribute dropped: $w1")
    // xsl:attribute OVERRIDES a same-name static (XSLT 1.0 §7.1.3)
    val w2 = wire(sheetWith(
      """<identifier type="local"><xsl:attribute name="type">dyn</xsl:attribute><xsl:value-of select="normalize-space(.)"/></identifier>"""))
    assert(w2.contains("""type="dyn"""") && !w2.contains("""type="local""""),
      s"dynamic attribute did not override the static: $w2")
    // distinct names coexist, statics first
    val w3 = wire(sheetWith(
      """<identifier type="local"><xsl:attribute name="kind">url</xsl:attribute><xsl:value-of select="normalize-space(.)"/></identifier>"""))
    assert(w3.contains("""<identifier type="local" kind="url">"""),
      s"static + dynamic attributes did not merge: $w3")
    // AVT values stay refused
    intercept[IllegalArgumentException](compileXsltSheet(sheetWith(
      """<identifier type="{.}"><xsl:value-of select="."/></identifier>""")))
  }

  test("the JSON-field compiler REFUSES static attributes (no silent drop)") {
    val ns = "xmlns:xsl=\"http://www.w3.org/1999/XSL/Transform\""
    val ex = intercept[IllegalArgumentException](Transform.compileXslt(
      s"""<xsl:stylesheet $ns><xsl:template match="/record"><o>
          <id type="local"><xsl:value-of select="controlfield"/></id>
          </o></xsl:template></xsl:stylesheet>"""))
    assert(ex.getMessage.contains("static attribute"), ex.getMessage)
  }

  test("MIXED content: literal text, xsl:text and value-ofs interleave in order") {
    def sheetWith(titleEl: String): String =
      s"""<?xml version="1.0"?>
         |<xsl:stylesheet xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
         |    xmlns:dc="http://purl.org/dc/elements/1.1/"
         |    xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
         |    version="2.0">
         |  <xsl:template match="text() | @*"/>
         |  <xsl:template match="//oai_dc:dc"><record><xsl:apply-templates /></record></xsl:template>
         |  <xsl:template match="dc:title">$titleEl</xsl:template>
         |</xsl:stylesheet>""".stripMargin
    def wire(src: String): String = {
      val sheet = compileXsltSheet(src)
      frame(recA).filter(sheet.keep(col("xml")))
        .select(sheet.outputXml(col("xml")).as("rec")).head.getString(0)
    }
    // prefix text + normalized value + xsl:text suffix (whose leading
    // space only xsl:text can carry through stylesheet stripping)
    val w1 = wire(sheetWith(
      """<t>Title: <xsl:value-of select="normalize-space(.)"/><xsl:text> [eng]</xsl:text></t>"""))
    assert(w1.contains("<t>Title: A Tale [eng]</t>"), s"mixed parts wrong: $w1")
    // two value-ofs of the same node around a literal separator,
    // under a static attribute
    val w2 = wire(sheetWith(
      """<t kind="genre"><xsl:value-of select="."/><xsl:text> / </xsl:text><xsl:value-of select="normalize-space(.)"/></t>"""))
    assert(w2.contains("""<t kind="genre">  A   Tale  / A Tale</t>"""),
      s"raw+norm mix wrong: $w2")
    // a pure-whitespace bare text node still drops; xsl:text keeps it
    val w3 = wire(sheetWith(
      """<t><xsl:value-of select="normalize-space(.)"/> <xsl:value-of select="normalize-space(.)"/></t>"""))
    assert(w3.contains("<t>A TaleA Tale</t>"),
      s"bare whitespace between value-ofs must strip: $w3")
    val w4 = wire(sheetWith(
      """<t><xsl:value-of select="normalize-space(.)"/><xsl:text> </xsl:text><xsl:value-of select="normalize-space(.)"/></t>"""))
    assert(w4.contains("<t>A Tale A Tale</t>"),
      s"xsl:text whitespace must survive: $w4")
    // nested literal elements inside an emission still refuse
    intercept[IllegalArgumentException](compileXsltSheet(sheetWith(
      """<t>Title: <b><xsl:value-of select="."/></b></t>""")))
  }

  test("still refused: dynamic names, misplaced/nested attributes, merged-output attrs") {
    def sheetWith(body: String, extra: String = ""): String =
      s"""<?xml version="1.0"?>
         |<xsl:stylesheet version="2.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
         |  <xsl:template match="//dc"><out><xsl:apply-templates/></out></xsl:template>
         |  <xsl:template match="title">$body</xsl:template>$extra
         |</xsl:stylesheet>""".stripMargin
    // dynamic attribute name
    intercept[IllegalArgumentException](compileXsltSheet(sheetWith(
      """<t><xsl:attribute name="{local-name()}">x</xsl:attribute></t>""")))
    // attribute AFTER content
    intercept[IllegalArgumentException](compileXsltSheet(sheetWith(
      """<t><xsl:value-of select="."/><xsl:attribute name="a">x</xsl:attribute></t>""")))
    // out-of-subset attribute value
    intercept[IllegalArgumentException](compileXsltSheet(sheetWith(
      """<t><xsl:attribute name="a"><xsl:value-of select="sub/path"/></xsl:attribute></t>""")))
    // attributes on an output name merged from several templates
    intercept[IllegalArgumentException](compileXsltSheet(sheetWith(
      """<t><xsl:attribute name="a">x</xsl:attribute><xsl:value-of select="."/></t>""",
      extra = """<xsl:template match="alt"><t><xsl:value-of select="."/></t></xsl:template>""")))
  }
}
