package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Transform, Validate}
import graft.sources.VersionedTable
import graft.streaming.EtlStream

/** End-to-end streaming ETL lifecycle (the whole reference DAG in
  * one foreachBatch): status split → content-hash diff → crosswalk
  * transform → validate split → MERGE index + quarantine. Proves the
  * h8 gating (a pure re-send publishes nothing; an unchanged invalid
  * record is not re-quarantined), SCD-1 + delete semantics against a
  * batch-computed expectation, and replay idempotence. */
class EtlStreamSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private val recSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def stage(df: DataFrame, dir: java.nio.file.Path, name: String,
      mtimeMs: Long): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_estage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.resolve("w").toString)
    val part = java.nio.file.Files.list(tmp.resolve("w"))
      .filter(p => p.getFileName.toString.startsWith("part-")
        && p.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    java.nio.file.Files.move(part, dir.resolve(s"$name.parquet"))
    java.nio.file.Files.setLastModifiedTime(dir.resolve(s"$name.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    ()
  }

  private val xform: DataFrame => DataFrame = df =>
    Transform.crosswalk(df, Seq(
      "doc_id" -> col("doc_id"),
      "norm" -> Transform.normalizeText(col("text")),
      "lang" -> col("lang"),
      "n_chars_t" -> length(col("text")).cast("long")))

  private val rules = Seq(
    Validate.Rule("known_lang",
      col("lang").isInCollection(Seq("en", "de", "fr", "es", "zh")),
      "unknown language"),
    Validate.Rule("nonempty", length(trim(col("norm"))) > 0,
      "empty record"))

  private def run(src: java.nio.file.Path, state: String): Unit = {
    val stream = spark.readStream.schema(recSchema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(src.toString)
    val q = EtlStream.maintainEtl(stream, state, "doc_id", "status",
      deletedValue = "deleted", contentCols = Seq("text", "lang"),
      transform = xform, rules = rules)
    q.processAllAvailable(); q.stop()
  }

  test("harvest→transform→validate→index lifecycle: diff gating, " +
      "SCD-1 + deletes, quarantine, pure-resend no-op, replay") {
    def rec(id: Long, st: String, tx: String, lg: String) = (id, st, tx, lg)
    val b0 = Seq(
      rec(0, "active", "alpha beta gamma", "en"),
      rec(1, "active", "delta epsilon", "de"),
      rec(2, "active", "zeta eta", "fr"),
      rec(3, "active", "theta iota", "en"),
      rec(7, "active", "kappa lambda", "xx"), // invalid: unknown lang
      rec(8, "active", "   ", "en")           // invalid: empty after trim
    ).toDF("doc_id", "status", "text", "lang")
    val b1 = Seq(
      rec(0, "active", "alpha beta gamma", "en"),  // identical re-send → gated
      rec(1, "active", "delta epsilon PATCHED", "de"), // changed → replaces
      rec(2, "deleted", "", "fr"),                 // delete
      rec(7, "active", "kappa lambda", "xx"),      // unchanged invalid → NOT re-quarantined
      rec(8, "active", "now nonempty", "en"),      // fixed → enters index
      rec(10, "active", "mu nu xi", "zh")          // new
    ).toDF("doc_id", "status", "text", "lang")
    // pure re-send of b1's upserts (no deletes): must publish NOTHING
    val b2 = b1.filter(col("status") =!= "deleted")

    val src = java.nio.file.Files.createTempDirectory("graft_esrc")
    val state = java.nio.file.Files.createTempDirectory("graft_estate")
      .resolve("etl").toString
    val t0 = System.currentTimeMillis() - 600000
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      stage(b, src, s"b$i", t0 + i * 60000) }
    run(src, state)

    // served index == transform of the live, valid, latest records
    val expectedRaw = Seq(
      rec(0, "active", "alpha beta gamma", "en"),
      rec(1, "active", "delta epsilon PATCHED", "de"),
      rec(3, "active", "theta iota", "en"),
      rec(8, "active", "now nonempty", "en"),
      rec(10, "active", "mu nu xi", "zh")
    ).toDF("doc_id", "status", "text", "lang")
    val want = xform(expectedRaw)
    val got = EtlStream.servingIndex(spark, state)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "served index diverges from the batch-computed expectation")

    // quarantine: ONLY batch 0's two invalid rows — the unchanged
    // invalid re-send in batch 1 was gated by the diff
    val qr = EtlStream.quarantine(spark, state)
      .select("doc_id", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(qr == Set((7L, 0L), (8L, 0L)), s"unexpected quarantine: $qr")

    // pure re-send (batch 2) published nothing: its tag exists on
    // NO table and the index version count stayed at 2
    val iDir = EtlStream.indexDir(state)
    assert(VersionedTable.listVersions(iDir).size == 2,
      "pure re-send batch published an index version")
    assert(VersionedTable.taggedVersion(iDir, "run0-2").isEmpty
      && VersionedTable.taggedVersion(
        EtlStream.snapshotDir(state), "run0-2").isEmpty,
      "pure re-send batch committed a merge")

    // replay the whole lineage: markers no-op every batch
    val vBefore = VersionedTable.latestVersion(iDir).get
    run(src, state)
    assert(VersionedTable.latestVersion(iDir).get == vBefore
      && VersionedTable.listVersions(iDir).size == 2,
      "replay re-applied batches despite markers")
  }

  test("the transform seam runs a COMPILED stylesheet end-to-end " +
      "(user-authored .xsl drives the streaming DAG)") {
    val ns = "xmlns:xsl=\"http://www.w3.org/1999/XSL/Transform\""
    val sheet =
      s"""<xsl:stylesheet $ns><xsl:template match="/record"><doc>
          <xsl:if test="controlfield[@tag='001']">
            <id><xsl:value-of select="controlfield[@tag='001']"/></id>
          </xsl:if>
          <lang><xsl:value-of select="datafield[@tag='041']/subfield"/></lang>
          </doc></xsl:template></xsl:stylesheet>"""
    def xml(id: Long, lang: String, with001: Boolean) = {
      val cf = if (with001)
        "<controlfield tag=\"001\">" + id + "</controlfield>" else ""
      "<record>" + cf + "<datafield tag=\"041\"><subfield code=\"a\">" +
        lang + "</subfield></datafield></record>"
    }
    val b0 = Seq(
      (0L, "active", xml(0, "en", true)),
      (1L, "active", xml(1, "xx", true)),   // invalid lang → quarantine
      (2L, "active", xml(2, "de", false))   // no 001 → id-absent JSON, still valid
    ).toDF("doc_id", "status", "xml")
    val xf = Transform.xsltTransform(sheet, "xml", carry = Seq("doc_id"))
    val xmlRules = Seq(Validate.Rule("known_lang",
      get_json_object(col("rec"), "$.lang")
        .isInCollection(Seq("en", "de", "fr", "es", "zh")),
      "unknown language"))
    val src = java.nio.file.Files.createTempDirectory("graft_exslt")
    val state = java.nio.file.Files.createTempDirectory("graft_exsltstate")
      .resolve("etl").toString
    stage(b0, src, "b0", System.currentTimeMillis() - 600000)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("status", StringType), StructField("xml", StringType))))
      .format("parquet").option("maxFilesPerTrigger", 1).load(src.toString)
    val q = EtlStream.maintainEtl(stream, state, "doc_id", "status",
      deletedValue = "deleted", contentCols = Seq("xml"),
      transform = xf, rules = xmlRules)
    q.processAllAvailable(); q.stop()

    val got = EtlStream.servingIndex(spark, state)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.keySet == Set(0L, 2L), s"unexpected index ids: ${got.keySet}")
    assert(got(0L) == """{"id":"0","lang":"en"}""", got(0L))
    assert(got(2L) == """{"lang":"de"}""",
      s"xsl:if must drop the id field for the 001-less record: ${got(2L)}")
    val qr = EtlStream.quarantine(spark, state).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(qr == Set(1L), s"unexpected quarantine: $qr")
  }

  test("the transform seam runs a MULTI-TEMPLATE apply-templates stylesheet " +
      "(keep-filter remediation + per-node dispatch through the streaming DAG)") {
    // the r11 widened compiler driving the streaming ETL end-to-end:
    // the stylesheet's base-match PREDICATE (the remediation filter)
    // silently drops records — they reach neither index nor
    // quarantine, exactly the reference's remediation posture —
    // while per-node dispatch normalizes the survivors' fields
    val sheet =
      """<?xml version="1.0"?>
        |<xsl:stylesheet version="2.0"
        |    xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
        |    xmlns:dcterms="http://purl.org/dc/terms/">
        |  <xsl:template match="text() | @*"/>
        |  <xsl:template match="//dc[not(relation[string()= 'pdcp_noharvest'])]">
        |    <out><xsl:apply-templates/></out>
        |  </xsl:template>
        |  <xsl:template match="title">
        |    <xsl:if test="normalize-space(.)!=''">
        |      <xsl:element name="dcterms:title">
        |        <xsl:value-of select="normalize-space(.)"/>
        |      </xsl:element>
        |    </xsl:if>
        |  </xsl:template>
        |  <xsl:template match="lang">
        |    <l><xsl:value-of select="."/></l>
        |  </xsl:template>
        |</xsl:stylesheet>""".stripMargin
    def xml(title: String, lang: String, remediated: Boolean) =
      "<rec><dc><title>" + title + "</title><lang>" + lang + "</lang>" +
        (if (remediated) "<relation>pdcp_noharvest</relation>" else "") +
        "</dc></rec>"
    val b0 = Seq(
      (0L, "active", xml(" A  title ", "en", false)),
      (1L, "active", xml("Gone", "en", true)),      // remediated → dropped
      (2L, "active", xml("Bad lang", "xx", false))  // invalid → quarantine
    ).toDF("doc_id", "status", "xml")
    val xf = Transform.xsltSheetTransform(sheet, "xml", carry = Seq("doc_id"))
    val rules = Seq(Validate.Rule("known_lang",
      get_json_object(col("rec"), "$.l[0]")
        .isInCollection(Seq("en", "de", "fr", "es", "zh")),
      "unknown language"))
    val src = java.nio.file.Files.createTempDirectory("graft_esheet")
    val state = java.nio.file.Files.createTempDirectory("graft_esheetstate")
      .resolve("etl").toString
    stage(b0, src, "b0", System.currentTimeMillis() - 600000)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("status", StringType), StructField("xml", StringType))))
      .format("parquet").option("maxFilesPerTrigger", 1).load(src.toString)
    val q = EtlStream.maintainEtl(stream, state, "doc_id", "status",
      deletedValue = "deleted", contentCols = Seq("xml"),
      transform = xf, rules = rules)
    q.processAllAvailable(); q.stop()

    val got = EtlStream.servingIndex(spark, state)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.keySet == Set(0L), s"unexpected index ids: ${got.keySet}")
    assert(got(0L) == """{"dcterms:title":["A title"],"l":["en"]}""", got(0L))
    val qr = EtlStream.quarantine(spark, state).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(qr == Set(2L),
      s"remediated rows must vanish, invalid rows quarantine: $qr")
  }

  test("the whole reference DAG runs from two compiled artifacts: " +
      ".xsl transform + .sch validation through the streaming lifecycle") {
    // harvest → transform (a compiled apply-templates stylesheet,
    // XML wire form out) → validate (a compiled Schematron schema
    // gating on that XML) → index/quarantine: the reference's DAG
    // with BOTH its file-shaped artifacts compiled, running
    // incrementally. Routing semantics: deleted status → delete
    // path; stylesheet remediation predicate → silently dropped
    // (neither sink); Schematron assert failure → quarantine;
    // clean → index.
    val xsl =
      """<?xml version="1.0"?>
        |<xsl:stylesheet version="2.0"
        |    xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
        |    xmlns:dcterms="http://purl.org/dc/terms/"
        |    xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/">
        |  <xsl:template match="text() | @*"/>
        |  <xsl:template match="//dc[not(relation[string()= 'pdcp_noharvest'])]">
        |    <oai_dc:dc><xsl:apply-templates/></oai_dc:dc>
        |  </xsl:template>
        |  <xsl:template match="title">
        |    <xsl:if test="normalize-space(.)!=''">
        |      <xsl:element name="dcterms:title">
        |        <xsl:value-of select="normalize-space(.)"/>
        |      </xsl:element>
        |    </xsl:if>
        |  </xsl:template>
        |  <xsl:template match="type">
        |    <dcterms:type><xsl:value-of select="normalize-space(.)"/></dcterms:type>
        |  </xsl:template>
        |</xsl:stylesheet>""".stripMargin
    val sch =
      """<?xml version="1.0"?>
        |<schema xmlns="http://purl.oclc.org/dsdl/schematron"
        |    xmlns:dcterms="http://purl.org/dc/terms/"
        |    xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/">
        |  <pattern id="required">
        |    <rule context="oai_dc:dc">
        |      <assert test="dcterms:title" id="R1">There must be a title</assert>
        |    </rule>
        |  </pattern>
        |</schema>""".stripMargin
    def rec(title: String, typ: String, remediated: Boolean) =
      "<rec><dc><title>" + title + "</title><type>" + typ + "</type>" +
        (if (remediated) "<relation>pdcp_noharvest</relation>" else "") +
        "</dc></rec>"
    val b0 = Seq(
      (0L, "active", rec(" A  good  record ", "Text", false)),
      (1L, "deleted", rec("Deleted", "Text", false)),
      (2L, "active", rec("Remediated", "Text", true)),   // silently dropped
      (3L, "active", rec("   ", "Image", false)),        // blank title → no
                                                         // dcterms:title → R1
      (4L, "active", rec("Another", "Sound", false))
    ).toDF("doc_id", "status", "xml")
    val xf = Transform.xsltSheetTransformXml(xsl, "xml", carry = Seq("doc_id"))
    val rules = Validate.schAsRules(
      Validate.compileSchematron(sch, col("rec")))
    val src = java.nio.file.Files.createTempDirectory("graft_edag")
    val state = java.nio.file.Files.createTempDirectory("graft_edagstate")
      .resolve("etl").toString
    stage(b0, src, "b0", System.currentTimeMillis() - 600000)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("status", StringType), StructField("xml", StringType))))
      .format("parquet").option("maxFilesPerTrigger", 1).load(src.toString)
    val q = EtlStream.maintainEtl(stream, state, "doc_id", "status",
      deletedValue = "deleted", contentCols = Seq("xml"),
      transform = xf, rules = rules)
    q.processAllAvailable(); q.stop()

    val got = EtlStream.servingIndex(spark, state)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.keySet == Set(0L, 4L), s"unexpected index ids: ${got.keySet}")
    assert(got(0L) == "<oai_dc:dc><dcterms:title>A good record</dcterms:title>" +
      "<dcterms:type>Text</dcterms:type></oai_dc:dc>", got(0L))
    assert(got(4L).contains("<dcterms:type>Sound</dcterms:type>"))
    val qr = EtlStream.quarantine(spark, state).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(qr == Set(3L), s"blank-title row must quarantine via R1: $qr")
  }

  test("crash-window replay (marker lost after commits) changes nothing") {
    def rec(id: Long, st: String, tx: String, lg: String) = (id, st, tx, lg)
    val b0 = Seq(rec(0, "active", "one two", "en"),
      rec(1, "active", "bad", "xx")).toDF("doc_id", "status", "text", "lang")
    val src = java.nio.file.Files.createTempDirectory("graft_ecrash")
    val state = java.nio.file.Files.createTempDirectory("graft_ecstate")
      .resolve("etl").toString
    stage(b0, src, "b0", System.currentTimeMillis() - 600000)
    run(src, state)
    val marker = java.nio.file.Paths.get(state, "_batch-run0-0")
    assert(java.nio.file.Files.deleteIfExists(marker))
    val got0 = EtlStream.servingIndex(spark, state).collect().toSet
    val q0 = EtlStream.quarantine(spark, state).collect().toSet
    run(src, state) // markerless replay: tags + committed snapshot gate it
    assert(EtlStream.servingIndex(spark, state).collect().toSet == got0,
      "markerless replay changed the served index")
    assert(EtlStream.quarantine(spark, state).collect().toSet == q0,
      "markerless replay changed the quarantine")
  }
}
