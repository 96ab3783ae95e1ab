package graft

import graft.operators.Records
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `add_marc21xml_root_ns` parity on the reference's own fixtures
  * (reference: process.py:37-45, tests/test_process.py:50-70):
  * the namespace-less Alma SFTP collection dump gains
  * `xmlns="http://www.loc.gov/MARC21/slim"` on its root, an
  * already-namespaced document passes through unchanged, and the
  * reference's serialized expected output (remove_blank_text lxml
  * form) is reproduced BYTE-EXACTLY by ensureRootNs ∘ stripBlankText
  * — both vendored fixtures are byte-identical copies of
  * tests/fixtures/alma_bibs__new_1{,_ns}.xml. The encoding-error
  * canary (process.py:43-44's reparse) is the wellFormedXml flag. */
class RootNsSpec extends AnyFunSuite {
  import TestSession._

  private def resourceText(name: String): String = {
    val in = getClass.getResourceAsStream(s"/$name")
    require(in != null, s"missing $name")
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  private def run(c: org.apache.spark.sql.Column, input: String): String = {
    import spark.implicits._
    Seq(input).toDF("xml").select(c.as("out")).head.getString(0)
  }

  test("reference fixture parity: raw dump -> serialized _ns fixture, byte-exact") {
    val raw = resourceText("alma_bibs_new1.xml")
    val expected = resourceText("alma_bibs_new1_ns.xml").strip()
    val got = run(Records.stripBlankText(
      Records.ensureRootNs(col("xml"))), raw)
    assert(got == expected, "ensureRootNs + stripBlankText diverged from lxml's output")
  }

  test("idempotence on the already-namespaced fixture (the reference's dup test)") {
    val ns = resourceText("alma_bibs_new1_ns.xml")
    assert(run(Records.ensureRootNs(col("xml")), ns) == ns,
      "a root already carrying xmlns must pass through byte-unchanged")
  }

  test("root start-tag surgery: attrs kept, decl/comment skipped, body untouched") {
    val doc = "<?xml version=\"1.0\"?>\n<!-- c -->\n<collection foo=\"1\">" +
      "<record><leader>x</leader></record></collection>\n"
    val got = run(Records.ensureRootNs(col("xml")), doc)
    assert(got == "<?xml version=\"1.0\"?>\n<!-- c -->\n" +
      "<collection xmlns=\"http://www.loc.gov/MARC21/slim\" foo=\"1\">" +
      "<record><leader>x</leader></record></collection>\n",
      "only the root START tag changes; prolog and body stay byte-identical")
    // a prefixed root whose prefix is bound to MARC21 on the root: already in ns
    val prefixed = "<m:collection xmlns:m=\"http://www.loc.gov/MARC21/slim\"><m:record/></m:collection>"
    assert(run(Records.ensureRootNs(col("xml")), prefixed) == prefixed)
  }

  test("wellFormedXml: the encoding-error canary flags, never throws") {
    import spark.implicits._
    val rows = Seq(
      ("ok", "<collection><record/></collection>"),
      ("truncated", "<collection><record>"),
      ("bad-entity", "<collection>&nope;</collection>"),
      ("empty", ""),
      ("null", null))
      .toDF("name", "xml")
      .select(col("name"), Records.wellFormedXml(col("xml")).as("ok"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else java.lang.Boolean.valueOf(r.getBoolean(1)))).toMap
    assert(rows("ok") == java.lang.Boolean.TRUE)
    assert(rows("truncated") == java.lang.Boolean.FALSE)
    assert(rows("bad-entity") == java.lang.Boolean.FALSE)
    assert(rows("empty") == java.lang.Boolean.FALSE)
    assert(rows("null") == null, "null input stays null, like the xpath family")
  }

  test("quarantine composition: the canary splits good from bad without task failure") {
    import spark.implicits._
    val df = Seq(
      (1L, "<collection><record><controlfield tag=\"001\">A1</controlfield></record></collection>"),
      (2L, "<collection><record>"),
      (3L, "<collection/>"))
      .toDF("id", "xml")
      .withColumn("xml", Records.ensureRootNs(col("xml")))
      .withColumn("ok", Records.wellFormedXml(col("xml")))
    assert(df.filter(col("ok")).count() == 2)
    val bad = df.filter(!col("ok")).select("id").as[Long].collect().toSeq
    assert(bad == Seq(2L), "exactly the malformed row routes to quarantine")
    // the namespace injection happened on every row, including the bad one
    assert(df.filter(col("xml").contains("xmlns=\"http://www.loc.gov/MARC21/slim\""))
      .count() == 3)
  }
}
