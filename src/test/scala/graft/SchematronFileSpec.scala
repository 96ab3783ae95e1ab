package graft

import graft.operators.Validate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The REAL Schematron front door on the reference's own fixtures:
  * `Validate.compileSchematron` compiles the vendored sch-sample.sch
  * (the required-fields schema validate.py feeds lxml.isoschematron)
  * and the verdicts over the vendored sch-oai-mix.xml must reproduce
  * the reference's own outcome — 3 valid records pass, 5 invalid
  * records filter (`test_filter_s3_schematron_mix` expects
  * `{"filtered": 5}`), each with the specific failed assert. */
class SchematronFileSpec extends AnyFunSuite {
  import TestSession._

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/$name")
    require(in != null, s"missing $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

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

  test("sch-sample.sch over sch-oai-mix.xml reproduces the reference's 3-pass/5-filter outcome") {
    import spark.implicits._
    val rules = Validate.compileSchematron(resource("sch_sample.sch"), col("xml"))
    // 6 patterns, 10 asserts in declaration order, ids carried
    assert(rules.size == 10 && rules.forall(!_.isReport))
    assert(rules.take(4).map(_.name) ==
      Seq("Required1", "Required2", "Required3", "Required4"))
    assert(rules.map(_.pattern).distinct.size == 6)

    val rows = recordRows(resource("sch_oai_mix.xml"))
    assert(rows.size == 8)
    val df = rows.toDF("xml")
      .withColumn("rid", xpath_string(col("xml"), lit("/*/@airflow-record-id")))
    val report = Validate.schematronReport(df, rules,
        phases = Seq.empty, phase = "#ALL", idCol = col("rid"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getString(3))).toMap

    Seq("valid", "valid2", "valid3").foreach { id =>
      assert(report(id) == ((0, "")), s"$id: ${report(id)}")
    }
    val expectFindings = Map(
      "invalid-missingtitle" -> "There must be a title",
      "invalid-missingrights" -> "There must be a rights statement",
      "invalid-missingitemurl" -> "There must be a trackback URL",
      "invalid-missingprovider" -> "There must be a contributing institution",
      "invalid-malformeditemurl" -> "edm:isShownAt must contain a URL")
    expectFindings.foreach { case (id, msg) =>
      val (n, findings) = report(id)
      assert(n >= 1 && findings.contains(msg), s"$id: ($n, $findings)")
    }
    // the reference's {"filtered": 5}
    assert(report.count(_._2._1 > 0) == 5)
  }
}
