package graft

import graft.plans.{XmlExpr, XmlSlots}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Namespace-aware XPath opt-in (r16 verdict item 5).
  *
  * graft's default XPath surface deliberately matches Spark's
  * Hive-derived namespace-UNAWARE xpath family and rewrites QNames to
  * local-name probes — the right call for OAI feeds where one
  * namespace arrives under per-record prefixes. The documented gap: a
  * corpus with COLLIDING local names across namespaces mis-matches,
  * where the reference's lxml is namespace-aware (validate.py:33-35,
  * transform.py:20-76 pass explicit prefix→URI maps). This spec pins
  * the opt-in that closes it:
  *
  *  - with a namespace map, a prefixed step resolves by NAMESPACE
  *    (colliding local names stay distinct), exactly lxml semantics;
  *  - without the map, behavior is UNCHANGED (local-name matching,
  *    the Spark-parity mode) — the 184 oracled queries never see the
  *    new code path;
  *  - the MARC21 default-namespace fixture (the reference's own
  *    alma_bibs__new_1_ns.xml twin) resolves through a bound prefix,
  *    and an unprefixed aware step matches nothing — the documented
  *    lxml default-namespace trap, reproduced bit-for-bit.
  */
class XmlNamespaceSpec extends AnyFunSuite {
  import TestSession._

  private def resourceText(name: String): String = {
    val in = getClass.getResourceAsStream(s"/$name")
    require(in != null, s"missing $name")
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  private def evalSlots(xml: String, slots: XmlSlots): Seq[Seq[String]] = {
    import spark.implicits._
    val r = Seq(xml).toDF("xml")
      .select(XmlExpr.xpathSlots(col("xml"), slots).as("r"))
      .head.getSeq[scala.collection.Seq[String]](0)
    r.map(inner => if (inner == null) null else inner.toSeq).toSeq
  }

  // two namespaces, same local name — the case the local-name
  // approximation cannot tell apart
  private val colliding =
    """<rec xmlns:a="urn:ns-a" xmlns:b="urn:ns-b">""" +
      "<a:title>alpha</a:title><b:title>beta</b:title></rec>"

  test("colliding local names resolve by namespace WITH the map") {
    val aware = XmlSlots.withNamespaces(
      Array("//t:title/text()", "//u:title/text()"),
      Array(XmlSlots.KindNodes, XmlSlots.KindNodes),
      Map("t" -> "urn:ns-a", "u" -> "urn:ns-b"))
    val out = evalSlots(colliding, aware)
    assert(out(0) == Seq("alpha"),
      s"t: (urn:ns-a) must match ONLY the ns-a title, got ${out(0)}")
    assert(out(1) == Seq("beta"),
      s"u: (urn:ns-b) must match ONLY the ns-b title, got ${out(1)}")
  }

  test("WITHOUT the map the local-name probe matches both (unchanged default)") {
    // the production QName rewrite: p:title -> local-name probe
    val probe = graft.operators.Transform.rewriteQNames("//t:title") + "/text()"
    val unaware = new XmlSlots(Array(probe), Array(XmlSlots.KindNodes))
    assert(evalSlots(colliding, unaware).head == Seq("alpha", "beta"),
      "the namespace-unaware default must keep matching by local name")
  }

  test("MARC21 default namespace: bound prefix resolves, unprefixed step does not (lxml semantics)") {
    val xml = resourceText("alma_bibs_new1_ns.xml").strip()
    val marc = "http://www.loc.gov/MARC21/slim"
    val aware = XmlSlots.withNamespaces(
      Array("/m:collection/m:record/m:controlfield[@tag='001']/text()",
        "//controlfield[@tag='001']/text()"),
      Array(XmlSlots.KindNodes, XmlSlots.KindNodes),
      Map("m" -> marc))
    val out = evalSlots(xml, aware)
    // lxml with {'m': MARC21} sees both records' 001 in document order
    assert(out(0) == Seq("991022063789703811", "991024063209703811"),
      s"bound-prefix MARC21 probe, got ${out(0)}")
    // the lxml default-namespace trap: an unprefixed step matches only
    // NO-namespace nodes, and every element here is in MARC21
    assert(out(1) == Seq.empty,
      s"unprefixed step must match nothing under a default namespace, got ${out(1)}")
    // ...while the namespace-unaware default keeps working on the same
    // bytes (prefixless default-ns elements match by literal name)
    val unaware = new XmlSlots(
      Array("//controlfield[@tag='001']/text()"), Array(XmlSlots.KindNodes))
    assert(evalSlots(xml, unaware).head ==
      Seq("991022063789703811", "991024063209703811"))
  }

  test("unbound prefix in an aware table yields an empty slot, not a crash") {
    val aware = XmlSlots.withNamespaces(
      Array("//nope:title/text()"), Array(XmlSlots.KindNodes),
      Map("t" -> "urn:ns-a"))
    // javax.xml resolves the unbound prefix to NULL_NS_URI at
    // evaluate time; the slot must surface empty/null, never throw
    val out = evalSlots(colliding, aware)
    assert(out.head == null || out.head.isEmpty)
  }

  // --- the sheet-level wiring (r17 follow-on): nsAware compile -----

  // two vocabularies share the local name `title`; the stylesheet
  // binds BOTH prefixes on its root (the namespace context Saxon/lxml
  // resolve stylesheet XPath prefixes against) and dispatches each
  // into its own output field
  private val nsSheet =
    """<xsl:stylesheet version="1.0"
      |  xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
      |  xmlns:a="urn:ns-a" xmlns:b="urn:ns-b">
      |  <xsl:template match="text() | @*"/>
      |  <xsl:template match="//a:rec">
      |    <record><xsl:apply-templates/></record>
      |  </xsl:template>
      |  <xsl:template match="a:title">
      |    <xsl:element name="a_title"><xsl:value-of select="."/></xsl:element>
      |  </xsl:template>
      |  <xsl:template match="b:title">
      |    <xsl:element name="b_title"><xsl:value-of select="."/></xsl:element>
      |  </xsl:template>
      |</xsl:stylesheet>""".stripMargin

  private val nsRecord =
    """<x:rec xmlns:x="urn:ns-a" xmlns:y="urn:ns-b">""" +
      "<x:title>alpha</x:title><y:title>beta</y:title></x:rec>"

  test("nsAware sheet dispatches colliding local names by namespace") {
    import spark.implicits._
    import graft.operators.Transform
    val sheet = Transform.compileXsltSheet(nsSheet, nsAware = true)
    assert(sheet.ns == Map("a" -> "urn:ns-a", "b" -> "urn:ns-b"))
    val df = Seq(nsRecord).toDF("xml")
    // keep: the aware context path resolves through the record's own
    // x: prefix — by NAMESPACE, not prefix spelling
    assert(df.filter(sheet.keep(col("xml"))).count() == 1)
    val out = df.filter(sheet.keep(col("xml")))
      .select(to_json(sheet.output(col("xml"))).as("rec"))
      .head.getString(0)
    assert(out.contains(""""a_title":["alpha"]"""),
      s"a:title must capture ONLY the urn:ns-a title, got $out")
    assert(out.contains(""""b_title":["beta"]"""),
      s"b:title must capture ONLY the urn:ns-b title, got $out")
    assert(!out.contains(""""a_title":["alpha","beta"]"""))
    // the XML wire form rides the same aware slot table
    val wire = df.select(sheet.outputXml(col("xml")).as("w")).head.getString(0)
    assert(wire == "<record><a_title>alpha</a_title>" +
      "<b_title>beta</b_title></record>", wire)
  }

  test("the DEFAULT (unaware) compile of the same sheet merges by local name") {
    import spark.implicits._
    import graft.operators.Transform
    val sheet = Transform.compileXsltSheet(nsSheet)
    assert(sheet.ns.isEmpty)
    val df = Seq(nsRecord).toDF("xml")
    val out = df.filter(sheet.keep(col("xml")))
      .select(to_json(sheet.output(col("xml"))).as("rec"))
      .head.getString(0)
    // local-name matching cannot tell the namespaces apart: BOTH
    // titles land in BOTH fields — the documented approximation the
    // aware mode exists to close (and the reason the default stays:
    // per-record prefix drift in OAI feeds needs exactly this)
    assert(out.contains(""""a_title":["alpha","beta"]"""), out)
    assert(out.contains(""""b_title":["alpha","beta"]"""), out)
  }

  test("nsAware=false compiles the reference fixture identically to before") {
    import graft.operators.Transform
    def resource(name: String): String = resourceText(name)
    val src = resource("xsl_sample_simple.xsl")
    val a = Transform.compileXsltSheet(src)
    val b = Transform.compileXsltSheet(src, nsAware = false)
    assert(a == b, "default compile must be unaffected by the nsAware plumb")
    assert(a.ns.isEmpty)
  }

  test("nsAware module compile + include-decl merging") {
    import spark.implicits._
    import graft.operators.Transform
    // the module declares only b:; its caller-supplied context must
    // use a prefix the module's own root binds (the Saxon rule —
    // prefixes resolve against the declaring stylesheet)
    val module =
      """<xsl:stylesheet version="1.0"
        |  xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
        |  xmlns:b="urn:ns-b">
        |  <xsl:template match="b:title">
        |    <xsl:element name="b_title"><xsl:value-of select="."/></xsl:element>
        |  </xsl:template>
        |</xsl:stylesheet>""".stripMargin
    val sheet = Transform.compileXsltModule(module, "//b:rec", nsAware = true)
    assert(sheet.ns == Map("b" -> "urn:ns-b"))
    // record-side prefix spelling is free: r: resolves to urn:ns-b
    val rec = """<r:rec xmlns:r="urn:ns-b"><r:title>tee</r:title></r:rec>"""
    val out = Seq(rec).toDF("xml").filter(sheet.keep(col("xml")))
      .select(to_json(sheet.output(col("xml"))).as("rec"))
      .head.getString(0)
    assert(out.contains(""""b_title":["tee"]"""), out)
    // an include's root declarations merge into the sheet's map (the
    // main sheet wins a prefix conflict by first-bind order)
    val main2 =
      """<xsl:stylesheet version="1.0"
        |  xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
        |  xmlns:a="urn:ns-a">
        |  <xsl:include href="m.xsl"/>
        |  <xsl:template match="text() | @*"/>
        |  <xsl:template match="//a:rec">
        |    <record><xsl:apply-templates/></record>
        |  </xsl:template>
        |  <xsl:template match="a:title">
        |    <xsl:element name="a_title"><xsl:value-of select="."/></xsl:element>
        |  </xsl:template>
        |</xsl:stylesheet>""".stripMargin
    val merged = Transform.compileXsltSheet(main2,
      includes = Map("m.xsl" -> module), nsAware = true)
    assert(merged.ns == Map("a" -> "urn:ns-a", "b" -> "urn:ns-b"))
    val both = """<rec xmlns="urn:none" />""" // not in a: — keep drops it
    val rec2 = """<x:rec xmlns:x="urn:ns-a" xmlns:y="urn:ns-b">""" +
      "<x:title>alpha</x:title><y:title>beta</y:title></x:rec>"
    val rows = Seq(rec2, both).toDF("xml").filter(merged.keep(col("xml")))
      .select(to_json(merged.output(col("xml"))).as("rec"))
      .collect().map(_.getString(0))
    assert(rows.length == 1)
    assert(rows.head.contains(""""a_title":["alpha"]""")
      && rows.head.contains(""""b_title":["beta"]"""), rows.head)
  }

  // --- the Schematron door (r18): nsAware compileSchematron --------

  // colliding local name `title` across two vocabularies; prefixes
  // bound by <sch:ns> — ISO Schematron's mechanism, the one
  // lxml.isoschematron resolves against (validate.py:33-35)
  private val collidingSch =
    """<?xml version="1.0"?>
      |<schema xmlns="http://purl.oclc.org/dsdl/schematron">
      |  <ns prefix="a" uri="urn:ns-a"/>
      |  <ns prefix="b" uri="urn:ns-b"/>
      |  <pattern id="p">
      |    <rule context="a:rec">
      |      <assert test="a:title" id="A">ns-a title required</assert>
      |      <report test="b:title" id="B">carries a ns-b title</report>
      |    </rule>
      |  </pattern>
      |</schema>""".stripMargin

  // only a ns-B title: the aware assert must FAIL (no a:title) and
  // the aware report must FIRE; only a ns-A title: assert passes,
  // report silent. The local-name rewrite gets one side of each wrong.
  private val onlyB = """<x:rec xmlns:x="urn:ns-a" xmlns:y="urn:ns-b">""" +
    "<y:title>beta</y:title></x:rec>"
  private val onlyA = """<x:rec xmlns:x="urn:ns-a">""" +
    "<x:title>alpha</x:title></x:rec>"

  private def schVerdicts(nsAware: Boolean): Map[String, (Int, Int)] = {
    import spark.implicits._
    import graft.operators.Validate
    val df = Seq(("onlyB", onlyB), ("onlyA", onlyA)).toDF("k", "xml")
    val rules = Validate.compileSchematron(collidingSch, col("xml"),
      nsAware = nsAware)
    Validate.schematronReport(df, rules, Seq.empty, "#ALL", col("k"))
      .collect().map(r => r.getString(0) ->
        (r.getInt(1) -> r.getInt(2))).toMap
  }

  test("nsAware Schematron: colliding local names judged by NAMESPACE") {
    val v = schVerdicts(nsAware = true)
    // onlyB: the a:title assert fails, the b:title report fires
    assert(v("onlyB") == (1 -> 1), s"onlyB verdicts: ${v("onlyB")}")
    // onlyA: assert passes, report silent
    assert(v("onlyA") == (0 -> 0), s"onlyA verdicts: ${v("onlyA")}")
  }

  test("default Schematron compile keeps the local-name approximation (both wrong sides shown)") {
    val v = schVerdicts(nsAware = false)
    // onlyB: local-name `title` exists → assert WRONGLY passes
    assert(v("onlyB")._1 == 0,
      "the unaware rewrite cannot see the namespace difference — " +
        "if this starts failing the default path changed")
    // onlyA: local-name `title` exists → report WRONGLY fires
    assert(v("onlyA")._2 == 1)
  }

  test("nsAware Schematron with an undeclared prefix fails at compile time") {
    import graft.operators.Validate
    val bad = collidingSch.replace("a:title", "zz:title")
    val e = intercept[IllegalArgumentException] {
      Validate.compileSchematron(bad, col("xml"), nsAware = true)
    }
    assert(e.getMessage.contains("does not compile"), e.getMessage)
  }

  test("sch:ns wins a prefix conflict with a root xmlns declaration") {
    import spark.implicits._
    import graft.operators.Validate
    // root binds a: to ns-b, sch:ns rebinds it to ns-a — lxml honors
    // the sch:ns binding, so the assert must see the ns-a title
    val conflicted =
      """<?xml version="1.0"?>
        |<schema xmlns="http://purl.oclc.org/dsdl/schematron"
        |    xmlns:a="urn:ns-b">
        |  <ns prefix="a" uri="urn:ns-a"/>
        |  <pattern id="p">
        |    <rule context="a:rec">
        |      <assert test="a:title" id="A">ns-a title required</assert>
        |    </rule>
        |  </pattern>
        |</schema>""".stripMargin
    val rules = Validate.compileSchematron(conflicted, col("xml"),
      nsAware = true)
    val df = Seq(("onlyA", onlyA)).toDF("k", "xml")
    val out = Validate.schematronReport(df, rules, Seq.empty, "#ALL",
      col("k")).head
    assert(out.getInt(1) == 0,
      "sch:ns must rebind a: to urn:ns-a (assert passes on onlyA)")
  }

  test("aware and unaware tables over the same paths never canonicalize equal") {
    val p = Array("//t:title/text()")
    val k = Array(XmlSlots.KindNodes)
    val aware = XmlSlots.withNamespaces(p, k, Map("t" -> "urn:ns-a"))
    val unaware = new XmlSlots(p, k)
    assert(aware != unaware,
      "codegen subexpression elimination would unify them and flip semantics")
    assert(aware == XmlSlots.withNamespaces(p, k, Map("t" -> "urn:ns-a")),
      "same map must canonicalize equal (sorted bindings)")
  }
}
