package graft

import graft.operators.Transform
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `xsl:variable` widening (r17 — the r16 verdict's "what's missing"
  * item 1, first slice): string-valued variables bound with a
  * `select` from the in-subset expression grammar (`.`, `$var`,
  * literals, normalize-space / lower-case / upper-case / string /
  * substring-before / substring-after / translate / concat),
  * referenced in value-ofs, mixed content, AND guard tests
  * (contains / starts-with / matches / != '' over a variable).
  * Variables inline at reference (XSLT single-assignment), so the
  * compiled rule tree is environment-free and the pre-r17 stylesheet
  * corpus compiles to the IDENTICAL tree ('.' / normalize-space(.)
  * normalize to the original XVals). The shapes here are the ones
  * real crosswalks carry — temple.xsl's own (commented-out)
  * `$objID`/`$baseURL`/`$langterm` templates are the models. */
class XsltVariableSpec extends AnyFunSuite {
  import TestSession._

  private val sheetSrc =
    """<xsl:stylesheet version="1.0"
      |  xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      |  <xsl:template match="text() | @*"/>
      |  <xsl:template match="//rec">
      |    <record><xsl:apply-templates/></record>
      |  </xsl:template>
      |  <xsl:template match="identifier">
      |    <xsl:variable name="objID" select="substring-after(., '/cdm/ref/')"/>
      |    <xsl:variable name="baseURL" select="substring-before(., '/cdm/ref/')"/>
      |    <xsl:if test="contains($baseURL, 'example.org')">
      |      <xsl:element name="obj"><xsl:value-of select="$objID"/></xsl:element>
      |    </xsl:if>
      |  </xsl:template>
      |  <xsl:template match="lang">
      |    <xsl:variable name="langterm" select="normalize-space(lower-case(.))"/>
      |    <xsl:choose>
      |      <xsl:when test="starts-with($langterm, 'en')">
      |        <xsl:element name="language"><xsl:value-of select="concat('eng:', $langterm)"/></xsl:element>
      |      </xsl:when>
      |      <xsl:otherwise>
      |        <xsl:element name="language"><xsl:value-of select="$langterm"/></xsl:element>
      |      </xsl:otherwise>
      |    </xsl:choose>
      |  </xsl:template>
      |  <xsl:template match="title">
      |    <xsl:variable name="t" select="translate(normalize-space(.), 'abc', 'xyz')"/>
      |    <xsl:if test="$t != ''">
      |      <xsl:element name="title"><xsl:value-of select="upper-case($t)"/></xsl:element>
      |    </xsl:if>
      |  </xsl:template>
      |  <xsl:template match="note">
      |    <xsl:variable name="raw" select="."/>
      |    <xsl:if test="$raw != ''">
      |      <xsl:element name="note"><xsl:value-of select="normalize-space($raw)"/></xsl:element>
      |    </xsl:if>
      |  </xsl:template>
      |</xsl:stylesheet>""".stripMargin

  private def run(recs: String*): Seq[String] = {
    import spark.implicits._
    val sheet = Transform.compileXsltSheet(sheetSrc)
    recs.toDF("xml").filter(sheet.keep(col("xml")))
      .select(to_json(sheet.output(col("xml"))).as("rec"))
      .collect().map(_.getString(0)).toSeq
  }

  test("the temple $objID/$baseURL idiom: substring vars + contains guard") {
    val Seq(out) = run("<rec><identifier>" +
      "https://example.org/cdm/ref/12345</identifier></rec>")
    assert(out.contains(""""obj":["12345"]"""), out)
    // absent needle: substring-before/-after are '' (the XPath
    // contract) and the contains guard kills the emission
    val Seq(miss) = run("<rec><identifier>http://other/x</identifier></rec>")
    assert(!miss.contains("obj"), miss)
  }

  test("the temple $langterm idiom: chained functions + variable choose tests") {
    val Seq(en) = run("<rec><lang> English </lang></rec>")
    assert(en.contains(""""language":["eng:english"]"""), en)
    val Seq(de) = run("<rec><lang>Deutsch</lang></rec>")
    assert(de.contains(""""language":["deutsch"]"""), de)
  }

  test("variable-of-variable chain: translate over normalize-space, upper-case ref") {
    val Seq(out) = run("<rec><title>abacus</title></rec>")
    assert(out.contains(""""title":["XYXZUS"]"""), out)
  }

  test("$v != '' is RAW string inequality — whitespace-only text passes") {
    // normalize-space(.)!='' would kill this row; the raw variable
    // form must keep it (XPath string inequality, no collapse)
    val Seq(out) = run("<rec><note>  </note></rec>")
    assert(out.contains(""""note":[""]"""), out)
    val Seq(empty) = run("<rec><note></note></rec>")
    assert(!empty.contains("note"), empty)
  }

  test("refusals stay loud: forward refs, redefinition, content-bodied vars") {
    def sheetWith(tpl: String): String =
      s"""<xsl:stylesheet version="1.0"
         |  xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
         |  <xsl:template match="//rec"><r><xsl:apply-templates/></r></xsl:template>
         |  $tpl
         |</xsl:stylesheet>""".stripMargin
    // forward reference
    intercept[IllegalArgumentException] {
      Transform.compileXsltSheet(sheetWith(
        """<xsl:template match="a">
          |  <xsl:element name="o"><xsl:value-of select="$later"/></xsl:element>
          |  <xsl:variable name="later" select="."/>
          |</xsl:template>""".stripMargin))
    }
    // redefinition in one body
    intercept[IllegalArgumentException] {
      Transform.compileXsltSheet(sheetWith(
        """<xsl:template match="a">
          |  <xsl:variable name="v" select="."/>
          |  <xsl:variable name="v" select="normalize-space(.)"/>
          |  <xsl:element name="o"><xsl:value-of select="$v"/></xsl:element>
          |</xsl:template>""".stripMargin))
    }
    // content-bodied variable (no select)
    intercept[IllegalArgumentException] {
      Transform.compileXsltSheet(sheetWith(
        """<xsl:template match="a">
          |  <xsl:variable name="v">text</xsl:variable>
          |  <xsl:element name="o"><xsl:value-of select="$v"/></xsl:element>
          |</xsl:template>""".stripMargin))
    }
    // out-of-grammar function
    intercept[IllegalArgumentException] {
      Transform.compileXsltSheet(sheetWith(
        """<xsl:template match="a">
          |  <xsl:variable name="v" select="document('x')"/>
          |  <xsl:element name="o"><xsl:value-of select="$v"/></xsl:element>
          |</xsl:template>""".stripMargin))
    }
  }

  // --- r18: NODE-SET variables (the structural compiler) ----------

  private def runStructural(xslt: String, xml: String): String = {
    import spark.implicits._
    import org.apache.spark.sql.functions.to_json
    val rules = Transform.compileXslt(xslt)
    Seq(xml).toDF("xml")
      .select(to_json(Transform.structuralCrosswalk(col("xml"), rules)).as("r"))
      .head.getString(0)
  }

  private val nodesetXslt =
    """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      |  <xsl:template match="/r">
      |    <doc>
      |      <xsl:variable name="items" select="item[@kind='a']"/>
      |      <xsl:variable name="first" select="$items"/>
      |      <xsl:if test="$items">
      |        <head><xsl:value-of select="$first"/></head>
      |      </xsl:if>
      |      <kinds>
      |        <xsl:for-each select="$items">
      |          <xsl:value-of select="@n"/>
      |        </xsl:for-each>
      |      </kinds>
      |      <xsl:for-each select="$items">
      |        <it>
      |          <n><xsl:value-of select="@n"/></n>
      |          <v><xsl:value-of select="."/></v>
      |        </it>
      |      </xsl:for-each>
      |    </doc>
      |  </xsl:template>
      |</xsl:stylesheet>""".stripMargin

  test("node-set variables: if/value-of/for-each references inline the bound path") {
    val out = runStructural(nodesetXslt,
      """<r><item kind="a" n="1">one</item><item kind="b" n="2">two</item>""" +
        """<item kind="a" n="3">three</item></r>""")
    // $items = item[@kind='a'] only; $first string-values the FIRST
    // match; the bare for-each zips @n; the full for-each zips pairs
    assert(out ==
      """{"head":"one","kinds":["1","3"],""" +
        """"it":[{"n":"1","v":"one"},{"n":"3","v":"three"}]}""", out)
    // guard arm: no kind='a' items → head omitted, arrays empty
    val none = runStructural(nodesetXslt,
      """<r><item kind="b" n="9">nine</item></r>""")
    assert(none == """{"kinds":[],"it":[]}""", none)
  }

  test("node-set variable with trailing steps: $v/@attr and $v/child") {
    val xslt =
      """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
        |  <xsl:template match="/r">
        |    <doc>
        |      <xsl:variable name="df" select="df"/>
        |      <tag><xsl:value-of select="$df/@tag"/></tag>
        |      <sub><xsl:value-of select="$df/sf"/></sub>
        |    </doc>
        |  </xsl:template>
        |</xsl:stylesheet>""".stripMargin
    val out = runStructural(xslt,
      """<r><df tag="041"><sf>en</sf></df></r>""")
    assert(out == """{"tag":"041","sub":"en"}""", out)
  }

  test("node-set refusals: undefined ref, redefinition, computational select") {
    def x(body: String) =
      s"""<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
         |  <xsl:template match="/r"><doc>$body</doc></xsl:template>
         |</xsl:stylesheet>""".stripMargin
    intercept[IllegalArgumentException] {
      Transform.compileXslt(x("""<a><xsl:value-of select="$nope"/></a>"""))
    }
    intercept[IllegalArgumentException] {
      Transform.compileXslt(x(
        """<xsl:variable name="v" select="a"/>""" +
          """<xsl:variable name="v" select="b"/><a><xsl:value-of select="$v"/></a>"""))
    }
    intercept[IllegalArgumentException] {
      Transform.compileXslt(x(
        """<xsl:variable name="v" select="normalize-space(.)"/>""" +
          """<a><xsl:value-of select="$v"/></a>"""))
    }
  }

  test("variables ride the XML wire form too") {
    import spark.implicits._
    val sheet = Transform.compileXsltSheet(sheetSrc)
    val wire = Seq("<rec><lang>EN</lang></rec>").toDF("xml")
      .select(sheet.outputXml(col("xml")).as("w")).head.getString(0)
    assert(wire == "<record><language>eng:en</language></record>", wire)
  }
}
