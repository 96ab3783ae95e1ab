package graft

import graft.operators.Transform
import graft.operators.Transform._
import graft.plans.{XmlExpr, XmlSlots}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-12 one-parse XSLT evaluation contract
  * ([[graft.plans.XPathSlots]]):
  *
  *  1. each slot kind is BIT-IDENTICAL to the Spark `xpath_*` call it
  *     replaces (differential test against the engine's own xpath
  *     family on namespaced, attributed, entity-carrying records);
  *  2. a compiled rule tree costs exactly ONE DOM parse per row —
  *     the parse-counter assertion that pins codegen subexpression
  *     elimination doing its job (the point of the rewrite: temple.xsl
  *     paid ~20 parses/row through per-rule xpath_* before);
  *  3. the null/empty/malformed edges behave like the xpath family.
  */
class XsltOneParseSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private val recs = Seq(
    ("""<rec><oai_dc:dc lang="en"><dc:title>  A  title </dc:title><dc:title></dc:title><dc:type>Text</dc:type><dc:rights>http://creativecommons.org/x</dc:rights></oai_dc:dc></rec>""", 1L),
    ("""<rec><oai_dc:dc lang="de"><dc:title>B &amp; C &lt;tag&gt;</dc:title><dc:type>image/jpeg</dc:type><dc:subject>a;b; c </dc:subject></oai_dc:dc></rec>""", 2L),
    ("""<rec><oai_dc:dc><dc:type></dc:type></oai_dc:dc></rec>""", 3L))

  test("every slot kind matches the xpath_* call it replaces") {
    val titleTxt = Transform.rewriteQNames("//oai_dc:dc/dc:title/text()")
    val nodesPaths = Seq(
      titleTxt,
      Transform.rewriteQNames("/rec/oai_dc:dc/@lang"),
      "//*[substring-after(name(),':')='type']/text()",
      "/rec/missing/text()")
    val strPaths = Seq(titleTxt, "/rec/missing/text()")
    val boolPaths = Seq(
      s"($titleTxt) and not((//missing))",
      "//missing")
    val slots = new XmlSlots(
      (nodesPaths ++ strPaths ++ boolPaths).toArray,
      (nodesPaths.map(_ => XmlSlots.KindNodes) ++
        strPaths.map(_ => XmlSlots.KindString) ++
        boolPaths.map(_ => XmlSlots.KindBool)).toArray)
    val df = recs.toDF("xml", "id")
    val sc = XmlExpr.xpathSlots(col("xml"), slots)
    nodesPaths.zipWithIndex.foreach { case (p, i) =>
      val rows = df.select(
        element_at(sc, i + 1).as("slot"),
        xpath(col("xml"), lit(p)).as("ref")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"nodeset slot mismatch for $p")
      }
    }
    strPaths.zipWithIndex.foreach { case (p, i) =>
      val rows = df.select(
        element_at(element_at(sc, nodesPaths.size + i + 1), 1).as("slot"),
        xpath_string(col("xml"), lit(p)).as("ref")).collect()
      rows.foreach { r =>
        assert(r.getString(0) == r.getString(1),
          s"string slot mismatch for $p")
      }
    }
    boolPaths.zipWithIndex.foreach { case (p, i) =>
      val rows = df.select(
        (element_at(element_at(sc,
          nodesPaths.size + strPaths.size + i + 1), 1) === "true").as("slot"),
        xpath_boolean(col("xml"), lit(p)).as("ref")).collect()
      rows.foreach { r =>
        assert(r.getBoolean(0) == r.getBoolean(1),
          s"boolean slot mismatch for $p")
      }
    }
  }

  test("structuralCrosswalk parses each record exactly once per row") {
    val rules = Seq(
      XLeaf("t", "/rec/a/text()"),
      XAll("all", "/rec/b/text()"),
      XZip("z", Seq("x" -> "/rec/c/@k", "y" -> "/rec/c/text()")),
      XWhen("/rec/a", XLeaf("w", "/rec/a/text()")),
      XChoose(Seq("/rec/b" -> XLeaf("c1", "/rec/b/text()")),
        Some(XLeaf("c2", "/rec/a/text()"))),
      XDispatch("d", "/rec/c/text()", Seq((Seq(ANonEmpty), VNormText))),
      XStamp("s", "v"))
    val data = (1 to 37).map(i =>
      (s"<rec><a>a$i</a><b>b$i</b><c k='k$i'>c$i</c><c k='q$i'>d$i</c></rec>",
        i.toLong))
    val d = data.toDF("xml", "id")
    val before = XmlSlots.parses.get()
    val out = d.select(
      to_json(Transform.structuralCrosswalk(col("xml"), rules)).as("rec"))
      .collect()
    val delta = XmlSlots.parses.get() - before
    assert(out.length == 37)
    assert(delta == 37L, s"expected one parse per row, got $delta for 37 rows")
    // the decoded values themselves, on one deterministic row
    val r1 = d.filter(col("id") === 1)
      .select(to_json(Transform.structuralCrosswalk(col("xml"), rules)))
      .head().getString(0)
    assert(r1 == """{"t":"a1","all":["b1"],"z":[{"x":"k1","y":"c1"},""" +
      """{"x":"q1","y":"d1"}],"w":"a1","c1":"b1","d":["c1","d1"],"s":["v"]}""")
  }

  test("outputXml parses each record exactly once per row") {
    val sheet = XsltSheet("/rec", Seq.empty, Seq(
      XDispatch("a", "/rec/a/text()", Seq((Seq(ANonEmpty), VNormText))),
      XDispatch("b", "/rec/b/text()", Seq((Seq(ANonEmpty), VText)))))
    val data = (1 to 23).map(i =>
      (s"<rec><a> a $i </a><b>b&amp;$i</b></rec>", i.toLong))
    val d = data.toDF("xml", "id")
    val before = XmlSlots.parses.get()
    val out = d.select(sheet.outputXml(col("xml")).as("rec")).collect()
    val delta = XmlSlots.parses.get() - before
    assert(out.length == 23)
    assert(delta == 23L, s"expected one parse per row, got $delta for 23 rows")
    val r1 = d.filter(col("id") === 1)
      .select(sheet.outputXml(col("xml"))).head().getString(0)
    assert(r1 == "<record><a>a 1</a><b>b&amp;1</b></record>")
  }

  test("compiled Schematron report parses each record exactly once per row") {
    val sch =
      """<?xml version="1.0"?>
        |<schema xmlns="http://purl.oclc.org/dsdl/schematron">
        |  <pattern id="req">
        |    <rule context="rec">
        |      <assert test="a" id="R1">must have a</assert>
        |      <assert test="b" id="R2">must have b</assert>
        |      <report test="c" id="A1">carries c</report>
        |    </rule>
        |  </pattern>
        |</schema>""".stripMargin
    import spark.implicits._
    val d = (1 to 29).map(i =>
      (s"<rec><a>x$i</a>${if (i % 3 == 0) "<c>y</c>" else ""}</rec>", i.toLong))
      .toDF("xml", "id")
    val rules = graft.operators.Validate.compileSchematron(sch, col("xml"))
    val before = XmlSlots.parses.get()
    val out = graft.operators.Validate.schematronReport(
      d, rules, phases = Seq.empty, phase = "#ALL", idCol = col("id")).collect()
    val delta = XmlSlots.parses.get() - before
    assert(out.length == 29)
    assert(delta == 29L, s"expected one parse per row, got $delta for 29 rows")
    // verdicts themselves: every record misses b (1 failed assert);
    // every third carries c (report fires)
    out.foreach { r =>
      assert(r.getAs[Int]("n_failed") == 1)
      assert(r.getAs[Int]("n_reported") == (if (r.getAs[Long]("id") % 3 == 0) 1 else 0))
    }
  }

  test("empty XML is null through slots, like the xpath family") {
    val d = Seq(("", 1L), ("<rec><a>x</a></rec>", 2L)).toDF("xml", "id")
    val rows = d.select(col("id"),
      Transform.structuralCrosswalk(col("xml"),
        Seq(XLeaf("t", "/rec/a/text()"))).as("s"),
      xpath_string(col("xml"), lit("/rec/a/text()")).as("ref"))
      .orderBy("id").collect()
    // empty xml: xpath_string → null; slot row → null → coalesce("")
    assert(rows(0).isNullAt(2))
    assert(rows(0).getStruct(1).getString(0) == "")
    assert(rows(1).getStruct(1).getString(0) == "x")
    assert(rows(1).getString(2) == "x")
  }

  test("malformed XML throws, like the xpath family") {
    val d = Seq(("<rec><unclosed>", 1L)).toDF("xml", "id")
    intercept[Exception] {
      d.select(Transform.structuralCrosswalk(col("xml"),
        Seq(XLeaf("t", "/rec/a/text()")))).collect()
    }
    intercept[Exception] {
      d.select(xpath_string(col("xml"), lit("/rec/a/text()"))).collect()
    }
  }
}
