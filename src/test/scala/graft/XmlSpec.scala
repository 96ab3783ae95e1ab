package graft

import graft.operators.Records
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class XmlSpec extends AnyFunSuite {
  import TestSession._

  private def oneCol(xml: String) = {
    import spark.implicits._
    Seq(xml).toDF("xml")
  }

  test("record001 returns the text of exactly one 001, null for missing/multiple") {
    val ok = oneCol("""<record><controlfield tag="001">99123</controlfield></record>""")
      .select(Records.record001(col("xml")), Records.record001Status(col("xml")))
      .collect().head
    assert(ok.getString(0) == "99123" && ok.getString(1) == "ok")

    val missing = oneCol("""<record><controlfield tag="008">x</controlfield></record>""")
      .select(Records.record001(col("xml")), Records.record001Status(col("xml")))
      .collect().head
    assert(missing.isNullAt(0) && missing.getString(1) == "missing")

    val multiple = oneCol(
      """<record><controlfield tag="001">1</controlfield><controlfield tag="001">2</controlfield></record>""")
      .select(Records.record001(col("xml")), Records.record001Status(col("xml")))
      .collect().head
    assert(multiple.isNullAt(0) && multiple.getString(1) == "multiple")
  }

  test("bwParentField round-trips through xpath (ADF/a subfield)") {
    import spark.implicits._
    val got = Seq("991234").toDF("pid")
      .select(Records.bwParentField(col("pid")).as("f"))
      .select(
        xpath_string(col("f"), lit("/datafield/subfield[@code='a']/text()")),
        xpath_string(col("f"), lit("/datafield/@tag")))
      .collect().head
    assert(got.getString(0) == "991234")
    assert(got.getString(1) == "ADF")
  }

  test("r4 xml query exercises all three 001 branches") {
    val df = SparkEntry.queries("r4_xml_001")(spark, sf).cache()
    val n = Tables.documents(spark, sf).count()
    assert(df.count() == n)
    assert(df.filter(col("xml_status") === "missing")
      .filter(col("doc_id") % 7 =!= 3).count() == 0)
    assert(df.filter(col("xml_status") === "multiple")
      .filter(col("doc_id") % 7 =!= 5).count() == 0)
    // ok rows carry their doc_id as the 001
    assert(df.filter(col("xml_status") === "ok")
      .filter(col("record_001") =!= col("doc_id").cast("string")).count() == 0)
    df.unpersist()
  }

  test("v6 fails exactly the records without exactly one 001") {
    val df = SparkEntry.queries("v6_xml_validate")(spark, sf).cache()
    assert(df.filter(!col("passed_one_001"))
      .filter(col("id") % 7 =!= 3 && col("id") % 7 =!= 5).count() == 0)
    assert(df.filter(col("n_failed") > 0).count() ==
      df.filter(!col("passed_one_001")).count(), "only the 001 rule should fail")
    df.unpersist()
  }

  test("structural crosswalk builds nested trees from a multi-level template") {
    import graft.operators.Transform._
    // a three-level template over a hand-built record: leaf value,
    // nested element, and a repeated-node for-each with two fields —
    // the XSLT structural-recursion shape beyond flat field mapping
    val xml = """<book><title>Dune</title><pub><year>1965</year><place>NY</place></pub>""" +
      """<author role="main"><name>Herbert</name></author>""" +
      """<author role="ed"><name>Hart</name></author></book>"""
    val df = spark.range(1).select(lit(xml).as("x"))
    val rules = Seq(
      XLeaf("title", "/book/title/text()"),
      XNode("published", Seq(
        XLeaf("year", "/book/pub/year/text()"),
        XLeaf("place", "/book/pub/place/text()"))),
      XZip("authors", Seq(
        "role" -> "/book/author/@role",
        "name" -> "/book/author/name/text()")),
      XAll("names", "/book/author/name/text()"))
    val row = df.select(structuralCrosswalk(col("x"), rules).as("r")).head()
    val r = row.getStruct(0)
    assert(r.getString(0) == "Dune")
    assert(r.getStruct(1).getString(0) == "1965")
    assert(r.getStruct(1).getString(1) == "NY")
    val authors = r.getSeq[org.apache.spark.sql.Row](2)
    assert(authors.map(a => (a.getString(0), a.getString(1))) ==
      Seq(("main", "Herbert"), ("ed", "Hart")))
    assert(r.getSeq[String](3) == Seq("Herbert", "Hart"))
    // absent leaf collapses to "" (stable JSON shape), absent
    // repeated node to []
    val empty = spark.range(1).select(lit("<book/>").as("x"))
      .select(structuralCrosswalk(col("x"), rules).as("r")).head().getStruct(0)
    assert(empty.getString(0) == "")
    assert(empty.getSeq[org.apache.spark.sql.Row](2).isEmpty)
  }

  test("schematron phases mask inactive patterns; report polarity is inverted") {
    val df = SparkEntry.queries("v9_schematron")(spark, sf).cache()
    val s = df.filter(col("phase") === "structural")
    val f = df.filter(col("phase") === "full")
    assert(s.count() == f.count())
    // structural phase never evaluates content rules: no zh report hits
    assert(s.filter(col("findings").contains("chinese")).count() == 0)
    assert(f.filter(col("findings").contains("chinese")).count() > 0)
    // report polarity: multi-001 records FIRE the report and FAIL the
    // assert simultaneously
    val multi = f.filter(col("id") % 7 === 5)
    assert(multi.filter(col("n_failed") === 0 || col("n_reported") === 0).count() == 0)
    df.unpersist()
  }

  test("CSV report sink round-trips the v2 invalid report") {
    val report = SparkEntry.queries("v2_invalid_report")(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft_csvrep").toString + "/report"
    graft.sources.Sources.writeCsvReport(report, out)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 1, "reference parity: one CSV artifact")
    val back = spark.read.option("header", "true").option("escape", "\"")
      .schema(report.schema).csv(out)
    assert(back.count() == report.count())
    // multi-line report fields (embedded \n between failed asserts)
    // must survive the quote/escape round trip
    val a = report.orderBy("id").collect().map(r => (r.get(0), r.getString(1)))
    val b = back.orderBy("id").collect().map(r => (r.get(0), r.getString(1)))
    assert(a.toSeq == b.toSeq)
  }
}
