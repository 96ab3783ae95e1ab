package graft

import graft.operators.Transform
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 hardening (the r17 ADVICE nits):
  *
  *  - [[Transform]]'s `ANonEmpty` guard compiles with XPath
  *    normalize-space semantics — tab/newline-only text counts as
  *    EMPTY (Spark `trim` strips spaces only, so the old
  *    `length(trim(x)) > 0` passed text Saxon/lxml fail);
  *  - an `xsl:variable` defined inside an element BEFORE its
  *    `xsl:attribute` is visible to the attribute's content (XSLT
  *    document-order scoping — previously refused as undefined);
  *  - a namespace-aware sheet whose XPath cannot compile under the
  *    declared prefix context throws AT SHEET-COMPILE TIME instead of
  *    silently filtering every row through a null slot.
  */
class Round18OpsSpec extends AnyFunSuite {
  import TestSession._

  // a minimal sheet with the normalize-space guard on dc:title
  private val guardSheet =
    """<xsl:stylesheet version="1.0"
      |  xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
      |  xmlns:dc="http://purl.org/dc/elements/1.1/">
      |  <xsl:template match="text() | @*"/>
      |  <xsl:template match="//dc">
      |    <record><xsl:apply-templates/></record>
      |  </xsl:template>
      |  <xsl:template match="dc:title">
      |    <xsl:if test="normalize-space(.)!=''">
      |      <out><xsl:value-of select="normalize-space(.)"/></out>
      |    </xsl:if>
      |  </xsl:template>
      |</xsl:stylesheet>""".stripMargin

  test("ANonEmpty treats tab/newline-only text as empty (XPath normalize-space)") {
    import spark.implicits._
    val sheet = Transform.compileXsltSheet(guardSheet)
    val rows = Seq(
      ("tabs", "<dc><dc:title>\t\n\t</dc:title></dc>"),
      ("spaces", "<dc><dc:title>   </dc:title></dc>"),
      ("real", "<dc><dc:title>\n\tA Title </dc:title></dc>"))
    val out = rows.toDF("k", "xml")
      .select(col("k"), to_json(sheet.output(col("xml"))).as("rec"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // both whitespace classes fail the guard → to_json omits the field
    assert(out("tabs") == "{}",
      s"tab/newline-only title must fail the normalize-space guard, got ${out("tabs")}")
    assert(out("spaces") == "{}", out("spaces"))
    // and a real title still passes, whitespace-collapsed
    assert(out("real") == """{"out":["A Title"]}""", out("real"))
  }

  test("xsl:variable before xsl:attribute is visible to the attribute content") {
    import spark.implicits._
    val sheet = Transform.compileXsltSheet(
      """<xsl:stylesheet version="1.0"
        |  xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
        |  xmlns:dc="http://purl.org/dc/elements/1.1/">
        |  <xsl:template match="text() | @*"/>
        |  <xsl:template match="//dc">
        |    <record><xsl:apply-templates/></record>
        |  </xsl:template>
        |  <xsl:template match="dc:title">
        |    <out>
        |      <xsl:variable name="norm" select="normalize-space(.)"/>
        |      <xsl:attribute name="n"><xsl:value-of select="$norm"/></xsl:attribute>
        |      <xsl:value-of select="."/>
        |    </out>
        |  </xsl:template>
        |</xsl:stylesheet>""".stripMargin)
    val out = Seq("<dc><dc:title> A  B </dc:title></dc>").toDF("xml")
      .select(to_json(sheet.output(col("xml"))).as("rec")).head.getString(0)
    assert(out == """{"out":[{"@n":"A B","#text":" A  B "}]}""", out)
  }

  test("nsAware sheet with an uncompilable pattern fails at COMPILE time") {
    // the c: prefix is never declared — under the aware context its
    // pattern cannot compile; pre-r18 every row silently filtered out
    val bad =
      """<xsl:stylesheet version="1.0"
        |  xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
        |  xmlns:a="urn:ns-a">
        |  <xsl:template match="text() | @*"/>
        |  <xsl:template match="//c:rec">
        |    <record><xsl:apply-templates/></record>
        |  </xsl:template>
        |  <xsl:template match="a:title">
        |    <xsl:element name="a_title"><xsl:value-of select="."/></xsl:element>
        |  </xsl:template>
        |</xsl:stylesheet>""".stripMargin
    val e = intercept[IllegalArgumentException] {
      Transform.compileXsltSheet(bad, nsAware = true)
    }
    assert(e.getMessage.contains("does not compile"), e.getMessage)
    // ...and the same sheet with the prefix declared still compiles
    val good = bad.replace("xmlns:a=\"urn:ns-a\"",
      "xmlns:a=\"urn:ns-a\" xmlns:c=\"urn:ns-c\"")
    val sheet = Transform.compileXsltSheet(good, nsAware = true)
    assert(sheet.ns.get("c").contains("urn:ns-c"))
  }

  test("nsAware rule-path typo also fails at compile time, not as vanished fields") {
    // the FIELD template's prefix is undeclared: its slot paths are
    // the uncompilable ones (the keep expr is fine) — the fail-fast
    // must cover rule slots too, or the field silently vanishes
    val bad =
      """<xsl:stylesheet version="1.0"
        |  xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
        |  xmlns:a="urn:ns-a">
        |  <xsl:template match="text() | @*"/>
        |  <xsl:template match="//a:rec">
        |    <record><xsl:apply-templates/></record>
        |  </xsl:template>
        |  <xsl:template match="zz:title">
        |    <xsl:element name="t"><xsl:value-of select="."/></xsl:element>
        |  </xsl:template>
        |</xsl:stylesheet>""".stripMargin
    val e = intercept[IllegalArgumentException] {
      Transform.compileXsltSheet(bad, nsAware = true)
    }
    assert(e.getMessage.contains("does not compile"), e.getMessage)
  }
}
