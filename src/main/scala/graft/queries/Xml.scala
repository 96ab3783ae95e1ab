package graft.queries

import graft.Tables
import graft.operators.{Records, Transform, Validate}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Native XML record surface (SURVEY.md §2 r4/r5/v6).
  *
  * The reference's records ARE MARC21/XML (process.py:66-92 works on
  * lxml elements; validate.py runs Schematron over them). graft
  * parses serialized XML with Spark's native xpath expressions —
  * map-only, no per-record Python — and validates with the same
  * Validate.Rule machinery as the field-level rules.
  *
  * The testdata has no XML column, so each query synthesizes a
  * MARC21-style record deterministically from `documents` columns;
  * the oracle builds the identical string and extracts with regexp,
  * which keeps the extraction itself (xpath vs regexp) independently
  * implemented on the two engines.
  */
object Xml {

  /** doc_id % 7 == 3 → no 001 (missing); == 5 → two 001s
    * (multiple); else exactly one — exercising every branch of
    * get_record_001 (process.py:66-81). */
  private def cf001: Column = {
    def cf(v: Column) = concat(lit("<controlfield tag=\"001\">"),
      v.cast("string"), lit("</controlfield>"))
    when(col("doc_id") % 7 === 3, lit(""))
      .when(col("doc_id") % 7 === 5, concat(cf(col("doc_id")), cf(col("doc_id") + 1)))
      .otherwise(cf(col("doc_id")))
  }

  private def df(tag: String, code: String, v: Column): Column =
    concat(lit(s"""<datafield tag="$tag" ind1=" " ind2=" "><subfield code="$code">"""),
      v, lit("</subfield></datafield>"))

  /** documents → (doc_id, xml): a synthesized MARC21-style record. */
  def marcXml(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), concat(
      lit("<record><leader>00000nam a2200000 a 4500</leader>"),
      cf001,
      df("041", "a", col("lang")),
      df("856", "u", col("source")),
      lit("</record>")).as("xml"))

  /** The same record string in DuckDB (lang/source carried through
    * for oracles that also need the base columns). */
  private val marcXmlSql =
    """SELECT doc_id, lang, source, concat(
         '<record><leader>00000nam a2200000 a 4500</leader>',
         CASE WHEN doc_id % 7 = 3 THEN ''
              WHEN doc_id % 7 = 5 THEN concat(
                '<controlfield tag="001">', CAST(doc_id AS VARCHAR), '</controlfield>',
                '<controlfield tag="001">', CAST(doc_id + 1 AS VARCHAR), '</controlfield>')
              ELSE concat('<controlfield tag="001">', CAST(doc_id AS VARCHAR), '</controlfield>')
         END,
         '<datafield tag="041" ind1=" " ind2=" "><subfield code="a">', lang, '</subfield></datafield>',
         '<datafield tag="856" ind1=" " ind2=" "><subfield code="u">', source, '</subfield></datafield>',
         '</record>') AS xml
       FROM documents"""

  private val idsSql =
    """regexp_extract_all(xml, '<controlfield tag="001">([^<]*)</controlfield>', 1)"""

  /** r4: 001 extraction with missing/multiple semantics. */
  def r4Xml001(spark: SparkSession, dir: String): DataFrame =
    marcXml(Tables.documents(spark, dir))
      .select(col("doc_id"),
        Records.record001(col("xml")).as("record_001"),
        Records.record001Status(col("xml")).as("xml_status"))
      .orderBy("doc_id")

  /** r6: MARC21 root-namespace normalization + encoding canary
    * (process.py:37-45 `add_marc21xml_root_ns`): each document is
    * wrapped as one of five Alma-dump shapes — bare root (inject),
    * already-default-ns (byte-unchanged), MARC21-bound prefixed root
    * (byte-unchanged), prolog + indentation (inject + blank-text
    * strip, the lxml round-trip effect), and a truncated document
    * (the canary flags it FALSE instead of failing the task, the
    * reference's early encoding-error catch; injection still lands —
    * the reference fails only at the reparse). The oracle states the
    * expected strings per branch directly, so the Spark-side string
    * surgery and parse are checked against independently-constructed
    * ground truth. Map-only: regexp surgery + one DOM try-parse per
    * row, no shuffle before the final ORDER BY. */
  def r6RootNs(spark: SparkSession, dir: String): DataFrame = {
    val ns = Records.Marc21Ns
    val body = col("xml")
    val m = col("doc_id") % 5
    val raw =
      when(m === 0, concat(lit("<collection>"), body, lit("</collection>")))
      .when(m === 1, concat(lit(s"""<collection xmlns="$ns">"""), body, lit("</collection>")))
      .when(m === 2, concat(lit(s"""<m:collection xmlns:m="$ns">"""), body, lit("</m:collection>")))
      .when(m === 3, concat(lit("<?xml version=\"1.0\"?>\n<collection>\n  "), body, lit("\n</collection>\n")))
      .otherwise(concat(lit("<collection>"), body))
    val fixed = Records.stripBlankText(Records.ensureRootNs(raw))
    marcXml(Tables.documents(spark, dir))
      .select(col("doc_id"), fixed.as("xml_doc"),
        Records.wellFormedXml(fixed).as("well_formed"))
      .orderBy("doc_id")
  }

  /** r5: boundwith parent field generation (process.py:83-92),
    * parent id derived from the document's id. */
  def r5BwParent(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        Records.bwParentField(concat(lit("prt-"), col("doc_id").cast("string")))
          .as("bw_field"))
      .orderBy("doc_id")

  /** v6: Schematron-style rules over the PARSED record (xpath on the
    * Spark side; the oracle re-derives the same facts with regexp). */
  def v6XmlValidate(spark: SparkSession, dir: String): DataFrame = {
    val rules = Seq(
      Validate.Rule("one_001",
        size(Records.controlFieldValues(col("xml"), "001")) === 1,
        "record must carry exactly one 001"),
      Validate.Rule("xml_lang",
        xpath_string(col("xml"), lit("/record/datafield[@tag='041']/subfield/text()"))
          .isInCollection(Seq("en", "de", "fr", "es", "zh")),
        "unknown language"),
      Validate.Rule("xml_url",
        length(xpath_string(col("xml"), lit("/record/datafield[@tag='856']/subfield/text()"))) > 0,
        "missing source url"))
    Validate.reportAll(marcXml(Tables.documents(spark, dir)), rules, col("doc_id"))
      .orderBy("id")
  }

  /** t3: structural crosswalk — a rule TREE producing nested output
    * (leaf values, a nested element, and two repeated-node for-each
    * sections whose length varies per record), the stylesheet shape
    * transform.py:20-76 runs through Saxon. Serialized with to_json
    * for a stable oracle form; the oracle rebuilds the identical JSON
    * text from its own regexp extraction. */
  def t3Structural(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Transform._
    val rules = Seq(
      XLeaf("id", "/record/controlfield[@tag='001']/text()"),
      XNode("meta", Seq(
        XLeaf("lang", "/record/datafield[@tag='041']/subfield[@code='a']/text()"),
        XLeaf("url", "/record/datafield[@tag='856']/subfield[@code='u']/text()"))),
      XZip("cf", Seq(
        "tag" -> "/record/controlfield/@tag",
        "val" -> "/record/controlfield/text()")),
      XZip("df", Seq(
        "tag" -> "/record/datafield/@tag",
        "val" -> "/record/datafield/subfield/text()")))
    marcXml(Tables.documents(spark, dir))
      .select(col("doc_id"),
        to_json(structuralCrosswalk(col("xml"), rules)).as("rec"))
      .orderBy("doc_id")
  }

  /** v9: full Schematron semantics — assert AND report polarity,
    * patterns, phase selection (lxml.isoschematron's surface,
    * validate.py:33-35). Runs the same rule set under two phases and
    * unions the verdicts, so the oracle checks that phase selection
    * actually masks the content-pattern rules. */
  def v9Schematron(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Validate._
    val ids = Records.controlFieldValues(col("xml"), "001")
    val xlang = xpath_string(col("xml"),
      lit("/record/datafield[@tag='041']/subfield/text()"))
    val rules = Seq(
      SchRule("one_001", size(ids) === 1,
        "record must carry exactly one 001", isReport = false, pattern = "structure"),
      SchRule("multi_001", size(ids) > 1,
        "duplicate 001 control fields", isReport = true, pattern = "structure"),
      SchRule("known_lang", xlang.isInCollection(Seq("en", "de", "fr", "es", "zh")),
        "unknown language", isReport = false, pattern = "content"),
      SchRule("zh_record", xlang === "zh",
        "record is chinese-language", isReport = true, pattern = "content"))
    val phases = Seq(
      SchPhase("structural", Seq("structure")),
      SchPhase("full", Seq("structure", "content")))
    val marc = marcXml(Tables.documents(spark, dir))
    val s = schematronReport(marc, rules, phases, "structural", col("doc_id"))
      .withColumn("phase", lit("structural"))
    val f = schematronReport(marc, rules, phases, "full", col("doc_id"))
      .withColumn("phase", lit("full"))
    s.unionByName(f).orderBy("phase", "id")
  }

  /** The t5 stylesheet — a COMPILED crosswalk: unlike t3's hand-built
    * rule tree, this query's rules come out of
    * [[graft.operators.Transform.compileXslt]], exercising the
    * XSLT-subset front door (the reference's transform.py:20-76
    * workflow: a user-authored `.xsl` file drives the transform).
    * Embedded as a constant so Verify/Bench are self-contained; the
    * spec additionally compiles a fixture FILE
    * (src/test/resources/t3_crosswalk.xsl) and proves tree + output
    * equality with the hand-built t3. */
  private val t5Stylesheet =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      |  <xsl:template match="/record">
      |    <doc>
      |      <id><xsl:value-of select="controlfield[@tag='001']"/></id>
      |      <origin>
      |        <lang><xsl:value-of select="datafield[@tag='041']/subfield[@code='a']"/></lang>
      |        <leader><xsl:value-of select="leader"/></leader>
      |      </origin>
      |      <xsl:for-each select="datafield">
      |        <field>
      |          <tag><xsl:value-of select="@tag"/></tag>
      |          <code><xsl:value-of select="subfield/@code"/></code>
      |          <val><xsl:value-of select="subfield"/></val>
      |        </field>
      |      </xsl:for-each>
      |    </doc>
      |  </xsl:template>
      |</xsl:stylesheet>""".stripMargin

  /** The t6 stylesheet: `xsl:if` in BOTH subset shapes — wrapping a
    * literal element (id emitted only when an 001 exists) and inside
    * one (alt guarded on any controlfield) — over records where the
    * %7==3 branch makes both guards FALSE, so the element-absent
    * output is data-exercised at every SF. */
  private val t6Stylesheet =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      |  <xsl:template match="/record">
      |    <doc>
      |      <xsl:if test="controlfield[@tag='001']">
      |        <id><xsl:value-of select="controlfield[@tag='001']"/></id>
      |      </xsl:if>
      |      <alt><xsl:if test="controlfield"><xsl:value-of select="controlfield/@tag"/></xsl:if></alt>
      |      <lang><xsl:value-of select="datafield[@tag='041']/subfield[@code='a']"/></lang>
      |    </doc>
      |  </xsl:template>
      |</xsl:stylesheet>""".stripMargin

  /** t6: the `xsl:if` guard through the compiled path — CASE WHEN
    * columns whose NULL branch makes to_json omit the field, exactly
    * the stylesheet's element-absent output; the oracle rebuilds the
    * conditional JSON segments with its own CASE. */
  def t6XsltIf(spark: SparkSession, dir: String): DataFrame = {
    val rules = Transform.compileXslt(t6Stylesheet)
    marcXml(Tables.documents(spark, dir))
      .select(col("doc_id"),
        to_json(Transform.structuralCrosswalk(col("xml"), rules)).as("rec"))
      .orderBy("doc_id")
  }

  private val t7Stylesheet =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      |  <xsl:template match="/record">
      |    <doc>
      |      <pref>
      |        <xsl:choose>
      |          <xsl:when test="controlfield[@tag='001'][2]"><xsl:value-of select="controlfield[@tag='001'][2]"/></xsl:when>
      |          <xsl:when test="controlfield[@tag='001']"><xsl:value-of select="controlfield[@tag='001']"/></xsl:when>
      |          <xsl:otherwise><xsl:value-of select="datafield[@tag='041']/subfield[@code='a']"/></xsl:otherwise>
      |        </xsl:choose>
      |      </pref>
      |      <src><xsl:value-of select="datafield[@tag='856']/subfield[@code='u']"/></src>
      |    </doc>
      |  </xsl:template>
      |</xsl:stylesheet>""".stripMargin

  /** t7: `xsl:choose` through the compiled path — a chained CASE
    * WHEN with FIRST-MATCH-WINS semantics, and the fixture corpus
    * exercises every branch at every SF: doc_id%7==5 records carry
    * TWO 001 fields (first when: the positional [2] test → second
    * id), most records one (second when → first id), doc_id%7==3
    * none (otherwise → language). The oracle replays the same
    * three-way CASE over its regexp extraction. */
  def t7XsltChoose(spark: SparkSession, dir: String): DataFrame = {
    val rules = Transform.compileXslt(t7Stylesheet)
    marcXml(Tables.documents(spark, dir))
      .select(col("doc_id"),
        to_json(Transform.structuralCrosswalk(col("xml"), rules)).as("rec"))
      .orderBy("doc_id")
  }

  /** t5: crosswalk COMPILED from a stylesheet (the Saxon-replacing
    * path) — same map-only one-projection plan as t3, but the rule
    * tree is parsed from XSLT instead of hand-built. The oracle
    * rebuilds the identical JSON from its regexp extraction, so a
    * compiler bug that mis-translates a path or field order
    * hash-fails, not just type-checks. */
  def t5Xslt(spark: SparkSession, dir: String): DataFrame = {
    val rules = Transform.compileXslt(t5Stylesheet)
    marcXml(Tables.documents(spark, dir))
      .select(col("doc_id"),
        to_json(Transform.structuralCrosswalk(col("xml"), rules)).as("rec"))
      .orderBy("doc_id")
  }

  /** The t8 stylesheet — the reference's REAL stylesheet shape
    * (tests/fixtures/xsl-sample-simple.xsl:22-45): drop templates
    * (`text() | @*` + the deleted-record filter), a predicated base
    * template whose body is a wrapper with `xsl:apply-templates`,
    * and per-field templates using `xsl:element`, `xsl:if
    * normalize-space` guards and an `xsl:choose` over `matches()`
    * regex tests whose otherwise emits a DIFFERENT element
    * (`dcterms:format`). Compiled by
    * [[graft.operators.Transform.compileXsltSheet]]. */
  /** The t10 stylesheet — the aggregator_mdx attributed-element shape
    * (xsl:attribute with literal names, the r13 subset widening):
    * a node-text attribute next to normalized content, an attributed
    * CONSTANT emission, a mixed attributed/plain dispatch (the image
    * branch carries no attribute — its `@conf` must drop from the
    * JSON), and an attributed otherwise-branch under a different
    * output name. */
  private val t10Stylesheet =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<xsl:stylesheet version="2.0"
      |    xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
      |    xmlns:dc="http://purl.org/dc/elements/1.1/"
      |    xmlns:dcterms="http://purl.org/dc/terms/"
      |    xmlns:oai="http://www.openarchives.org/OAI/2.0/"
      |    xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/">
      |  <xsl:output method="xml" encoding="UTF-8"/>
      |  <xsl:template match="text() | @*"/>
      |  <xsl:template match="//oai:record[oai:header[@status='deleted']]/*"/>
      |  <xsl:template match="//oai_dc:dc">
      |    <record><xsl:apply-templates/></record>
      |  </xsl:template>
      |  <xsl:template match="dc:title">
      |    <xsl:if test="normalize-space(.)!=''">
      |      <dcterms:title><xsl:attribute name="raw"><xsl:value-of select="."/></xsl:attribute><xsl:value-of select="normalize-space(.)"/></dcterms:title>
      |    </xsl:if>
      |  </xsl:template>
      |  <xsl:template match="dc:type">
      |    <xsl:if test="normalize-space(.)!=''">
      |      <xsl:choose>
      |        <xsl:when test="matches(., '(^text.*$)', 'i')">
      |          <dcterms:type><xsl:attribute name="conf">high</xsl:attribute>Text</dcterms:type>
      |        </xsl:when>
      |        <xsl:when test="matches(., '(^image.*$)', 'i')">
      |          <dcterms:type>Image</dcterms:type>
      |        </xsl:when>
      |        <xsl:otherwise>
      |          <dcterms:format><xsl:attribute name="src">dc:type</xsl:attribute><xsl:value-of select="."/></dcterms:format>
      |        </xsl:otherwise>
      |      </xsl:choose>
      |    </xsl:if>
      |  </xsl:template>
      |</xsl:stylesheet>""".stripMargin

  /** t10: the attributed-element crosswalk end-to-end under the
    * oracle — dc:title carries its RAW text as an attribute beside
    * the normalized content (`{"@raw":…,"#text":…}` in the struct
    * model), the type dispatch mixes an attributed branch, a PLAIN
    * branch (whose `@conf` must vanish from the JSON — to_json's
    * null-field drop), and an attributed otherwise under a second
    * output name. Deleted records row-killed; same one-filter +
    * one-projection plan as t8. */
  def t10XsltAttr(spark: SparkSession, dir: String): DataFrame = {
    val withXml = Tables.documents(spark, dir)
      .select(col("doc_id"), oaiXml.as("xml"))
    Transform.xsltSheetTransform(t10Stylesheet, "xml", Seq("doc_id"))(withXml)
      .orderBy("doc_id")
  }

  private val t11Stylesheet =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<xsl:stylesheet version="2.0"
      |    xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
      |    xmlns:dc="http://purl.org/dc/elements/1.1/"
      |    xmlns:dcterms="http://purl.org/dc/terms/"
      |    xmlns:oai="http://www.openarchives.org/OAI/2.0/"
      |    xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/">
      |  <xsl:output method="xml" encoding="UTF-8"/>
      |  <xsl:template match="text() | @*"/>
      |  <xsl:template match="//oai:record[oai:header[@status='deleted']]/*"/>
      |  <xsl:template match="//oai_dc:dc">
      |    <record><xsl:apply-templates/></record>
      |  </xsl:template>
      |  <xsl:template match="dc:title">
      |    <xsl:if test="normalize-space(.)!=''">
      |      <dcterms:title>Title: <xsl:value-of select="normalize-space(.)"/><xsl:text> [eng]</xsl:text></dcterms:title>
      |    </xsl:if>
      |  </xsl:template>
      |  <xsl:template match="dc:type">
      |    <xsl:if test="normalize-space(.)!=''">
      |      <dcterms:medium kind="genre"><xsl:value-of select="."/><xsl:text> / </xsl:text><xsl:value-of select="normalize-space(.)"/></dcterms:medium>
      |    </xsl:if>
      |  </xsl:template>
      |</xsl:stylesheet>""".stripMargin

  /** t11: MIXED CONTENT through the compiled path (the r13 VParts
    * widening, end-to-end under the driver oracle): literal prefix
    * text, an xsl:text suffix whose leading space only xsl:text can
    * carry, and TWO value-ofs of the same node (raw `.` beside
    * `normalize-space(.)`) interleaved with a literal separator —
    * all inside one emission, one of them attributed with a static
    * attribute. The oracle rebuilds every concat from the base
    * columns, so the in-order part assembly is independently
    * checked. Same plan as t10: one keep-filter + one codegen'd
    * projection. */
  def t11XsltMixed(spark: SparkSession, dir: String): DataFrame = {
    val withXml = Tables.documents(spark, dir)
      .select(col("doc_id"), oaiXml.as("xml"))
    Transform.xsltSheetTransform(t11Stylesheet, "xml", Seq("doc_id"))(withXml)
      .orderBy("doc_id")
  }

  private val t8Stylesheet =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<xsl:stylesheet version="2.0"
      |    xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
      |    xmlns:dc="http://purl.org/dc/elements/1.1/"
      |    xmlns:dcterms="http://purl.org/dc/terms/"
      |    xmlns:oai="http://www.openarchives.org/OAI/2.0/"
      |    xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/">
      |  <xsl:output method="xml" encoding="UTF-8"/>
      |  <xsl:template match="text() | @*"/>
      |  <xsl:template match="//oai:record[oai:header[@status='deleted']]/*"/>
      |  <xsl:template match="//oai_dc:dc[not(dc:relation[string()= 'pdcp_noharvest'])]">
      |    <oai_dc:dc>
      |      <xsl:apply-templates/>
      |    </oai_dc:dc>
      |  </xsl:template>
      |  <xsl:template match="dc:title">
      |    <xsl:if test="normalize-space(.)!=''">
      |      <xsl:element name="dcterms:title">
      |        <xsl:value-of select="normalize-space(.)"/>
      |      </xsl:element>
      |    </xsl:if>
      |  </xsl:template>
      |  <xsl:template match="dc:type">
      |    <xsl:if test="normalize-space(.)!=''">
      |      <xsl:choose>
      |        <xsl:when test="matches(., '(^text.*$)', 'i')"><dcterms:type>Text</dcterms:type></xsl:when>
      |        <xsl:when test="matches(., '(^image.*$)', 'i')"><dcterms:type>Image</dcterms:type></xsl:when>
      |        <xsl:when test="matches(., '^(movingimage.*$|moving\simage.*$)', 'i')"><dcterms:type>Moving Image</dcterms:type></xsl:when>
      |        <xsl:when test="matches(., '^(sound.*$)', 'i')"><dcterms:type>Sound</dcterms:type></xsl:when>
      |        <xsl:otherwise><dcterms:format><xsl:value-of select="."/></dcterms:format></xsl:otherwise>
      |      </xsl:choose>
      |    </xsl:if>
      |  </xsl:template>
      |</xsl:stylesheet>""".stripMargin

  /** documents → a synthesized OAI-DC record exercising every t8
    * branch at every SF: %13 → deleted header (drop-template row
    * kill), %17 → pdcp_noharvest relation (base-match predicate row
    * kill), %11 → whitespace-only title (normalize-space guard), %5
    * → a SECOND title (per-node array emission), %6 cycles the type
    * text through every choose branch incl. the leading-space value
    * that falls to the otherwise (matches() runs on RAW text) and an
    * empty value that emits nothing. */
  private def oaiXml: Column = {
    val id = col("doc_id")
    val status = when(id % 13 === 0, lit("deleted")).otherwise(lit("active"))
    val title1 = when(id % 11 === 0, lit("   "))
      .otherwise(concat(lit("The  "), col("source"), lit(" record ")))
    val title2 = when(id % 5 === 0,
      concat(lit("<dc:title>Vol. "), (id % 9).cast("string"),
        lit("  of  "), col("source"), lit("</dc:title>"))).otherwise(lit(""))
    val typeTxt = when(id % 6 === 0, lit("Text"))
      .when(id % 6 === 1, lit("image/jpeg"))
      .when(id % 6 === 2, lit("Sound recording"))
      .when(id % 6 === 3, lit("moving image"))
      .when(id % 6 === 4, lit(" Text with leading space"))
      .otherwise(lit(""))
    val relation = when(id % 17 === 0,
      lit("<dc:relation>pdcp_noharvest</dc:relation>")).otherwise(lit(""))
    concat(
      lit("<oai:record><oai:header status=\""), status,
      lit("\"><oai:identifier>rec"), id.cast("string"),
      lit("</oai:identifier></oai:header><oai:metadata><oai_dc:dc><dc:title>"),
      title1, lit("</dc:title>"), title2,
      lit("<dc:type>"), typeTxt, lit("</dc:type>"), relation,
      lit("</oai_dc:dc></oai:metadata></oai:record>"))
  }

  /** t8: multi-template `xsl:apply-templates` dispatch through the
    * compiled path — drop-template row kills, base-match predicate
    * filtering, per-node array emission, xsl:element naming, and the
    * choose-over-matches() crosswalk, all as ONE keep-filter plus one
    * codegen'd projection. The oracle rebuilds the JSON from the base
    * columns (titles/types are pure functions of doc_id/source), so
    * the engine's xpath extraction is independently checked. */
  def t8ApplyTemplates(spark: SparkSession, dir: String): DataFrame = {
    val withXml = Tables.documents(spark, dir)
      .select(col("doc_id"), oaiXml.as("xml"))
    Transform.xsltSheetTransform(t8Stylesheet, "xml", Seq("doc_id"))(withXml)
      .orderBy("doc_id")
  }

  /** The t9 stylesheet — a temple.xsl-shaped shared-template MODULE
    * (tests/fixtures/temple.xsl:309-403: named recursive
    * delimiter-split templates, starts-with rights routing, no base
    * template — the including collection stylesheet supplies the
    * context), compiled by
    * [[graft.operators.Transform.compileXsltModule]]. */
  private val t9Module =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<xsl:stylesheet version="2.0"
      |    xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
      |    xmlns:dc="http://purl.org/dc/elements/1.1/"
      |    xmlns:dcterms="http://purl.org/dc/terms/"
      |    xmlns:edm="http://www.europeana.eu/schemas/edm/">
      |  <xsl:template match="dc:title">
      |    <xsl:if test="normalize-space(.)!=''">
      |      <xsl:element name="dcterms:title">
      |        <xsl:value-of select="normalize-space(.)"/>
      |      </xsl:element>
      |    </xsl:if>
      |  </xsl:template>
      |  <xsl:template match="dc:subject">
      |    <xsl:call-template name="subj_template">
      |      <xsl:with-param name="stringz" select="."/>
      |      <xsl:with-param name="delimiter" select="';'"/>
      |    </xsl:call-template>
      |  </xsl:template>
      |  <xsl:template match="dc:rights">
      |    <xsl:choose>
      |      <xsl:when test="starts-with(., 'http://rightsstatements.org/vocab/') or starts-with(., 'http://creativecommons.org/') or starts-with(., 'https://creativecommons.org/')">
      |        <xsl:if test="normalize-space(.)!=''">
      |          <xsl:element name="edm:rights">
      |            <xsl:value-of select="normalize-space(.)"/>
      |          </xsl:element>
      |        </xsl:if>
      |      </xsl:when>
      |      <xsl:otherwise>
      |        <xsl:if test="normalize-space(.)!=''">
      |          <xsl:element name="dcterms:rights">
      |            <xsl:value-of select="normalize-space(.)"/>
      |          </xsl:element>
      |        </xsl:if>
      |      </xsl:otherwise>
      |    </xsl:choose>
      |  </xsl:template>
      |  <xsl:template name="subj_template">
      |    <xsl:param name="stringz"/>
      |    <xsl:param name="delimiter"/>
      |    <xsl:choose>
      |      <xsl:when test="contains($stringz, $delimiter)">
      |        <xsl:variable name="newstem" select="substring-after($stringz, $delimiter)"/>
      |        <dcterms:subject>
      |          <xsl:value-of select="substring-before($stringz, $delimiter)"/>
      |        </dcterms:subject>
      |        <xsl:call-template name="subj_template">
      |          <xsl:with-param name="stringz" select="$newstem"/>
      |          <xsl:with-param name="delimiter" select="';'"/>
      |        </xsl:call-template>
      |      </xsl:when>
      |      <xsl:otherwise>
      |        <dcterms:subject>
      |          <xsl:value-of select="normalize-space($stringz)"/>
      |        </dcterms:subject>
      |      </xsl:otherwise>
      |    </xsl:choose>
      |  </xsl:template>
      |</xsl:stylesheet>""".stripMargin

  /** documents → an OAI-DC record for t9: %4 cycles the subject
    * through multi-valued (raw-intermediate/normalized-last
    * splitting, incl. an empty middle segment), single-valued,
    * absent, and plain shapes; %3 cycles rights through the
    * rightsstatements URI, a creativecommons URI, and free text. */
  private def t9Xml: Column = {
    val id = col("doc_id")
    val subject = when(id % 4 === 0,
        concat(lit("<dc:subject>Art ;; History;  Local  "), col("lang"),
          lit(" </dc:subject>")))
      .when(id % 4 === 1, lit("<dc:subject>Single Subject</dc:subject>"))
      .when(id % 4 === 2, lit(""))
      .otherwise(concat(lit("<dc:subject>a;b;"), col("lang"),
        lit("</dc:subject>")))
    val rights = when(id % 3 === 0,
        lit("<dc:rights>http://rightsstatements.org/vocab/InC/1.0/</dc:rights>"))
      .when(id % 3 === 1,
        lit("<dc:rights>https://creativecommons.org/publicdomain/zero/1.0/</dc:rights>"))
      .otherwise(lit("<dc:rights>All rights reserved.</dc:rights>"))
    concat(lit("<rec><oai_dc:dc><dc:title>The  "), col("source"),
      lit(" record </dc:title>"), subject, rights,
      lit("</oai_dc:dc></rec>"))
  }

  /** t9: the shared-template MODULE through the compiled path — the
    * caller-supplied context plays the including stylesheet's base
    * template (temple.xsl's deployment shape), the dc:subject
    * call-template compiles to the recursive delimiter-split
    * emission trace (intermediate segments RAW, last
    * normalize-space'd, empty segments kept), and dc:rights routes
    * URI vs text via the starts-with or-disjunction with the
    * nonempty guard nested inside each branch. The oracle replays
    * the split trace with list slicing and the routing with CASE. */
  def t9XsltModule(spark: SparkSession, dir: String): DataFrame = {
    val sheet = Transform.compileXsltModule(t9Module, "//oai_dc:dc")
    Tables.documents(spark, dir)
      .select(col("doc_id"), t9Xml.as("xml"))
      .filter(sheet.keep(col("xml")))
      .select(col("doc_id"), to_json(sheet.output(col("xml"))).as("rec"))
      .orderBy("doc_id")
  }

  /** The v13 schema — a graft-authored `.sch` echoing the shapes of
    * the reference's real sch-sample.sch (required-element asserts,
    * content asserts on nested contexts, a report-polarity advisory),
    * compiled by [[graft.operators.Validate.compileSchematron]] —
    * the front door validate.py feeds lxml.isoschematron; the
    * VENDORED real schema itself runs in SchematronFileSpec. */
  private val v13Schema =
    """<?xml version="1.0"?>
      |<schema xmlns="http://purl.oclc.org/dsdl/schematron"
      |    xmlns:dc="http://purl.org/dc/elements/1.1/"
      |    xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/">
      |  <ns prefix="dc" uri="http://purl.org/dc/elements/1.1/"/>
      |  <ns prefix="oai_dc" uri="http://www.openarchives.org/OAI/2.0/oai_dc/"/>
      |  <pattern id="required">
      |    <rule context="oai_dc:dc">
      |      <assert test="dc:title" id="R1" role="error">There must be a title</assert>
      |      <assert test="dc:type" id="R2" role="error">There must be a type</assert>
      |    </rule>
      |  </pattern>
      |  <pattern id="content">
      |    <rule context="oai_dc:dc/dc:title">
      |      <assert test="normalize-space(.)" id="T1" role="error">The title element must contain text</assert>
      |    </rule>
      |    <rule context="oai_dc:dc/dc:type">
      |      <assert test="normalize-space(.)" id="T2" role="error">The type element must contain text</assert>
      |    </rule>
      |  </pattern>
      |  <pattern id="advisory">
      |    <rule context="oai_dc:dc">
      |      <report test="dc:relation" id="A1" role="info">Record carries a relation</report>
      |    </rule>
      |  </pattern>
      |</schema>""".stripMargin

  /** v13: Schematron-FILE validation through the compiled path — the
    * `.sch` front door run over the t8 OAI records as a PRE-FILTER
    * report (no keep filter: validation sees every record). The
    * existence-probe compilation makes vacuous passes (R1/R2: the
    * elements always exist) and per-node content asserts (T1 fails
    * on the %11 whitespace-only first title even when a %5 second
    * title is fine; T2 on the %6==5 empty type) and report polarity
    * (A1 fires on the %17 relation) all data-live at every SF. */
  def v13SchFile(spark: SparkSession, dir: String): DataFrame = {
    val rules = Validate.compileSchematron(v13Schema, col("xml"))
    Validate.schematronReport(
        Tables.documents(spark, dir).select(col("doc_id"), oaiXml.as("xml")),
        rules, phases = Seq.empty, phase = "#ALL", idCol = col("doc_id"))
      .orderBy("id")
  }

  /** documents → a COLLIDING-NAMESPACE record (local name `title` in
    * both urn:ns-a and urn:ns-b), prefix spelling varying per arm so
    * namespace-matching (not prefix-matching) is what the queries
    * prove. %4 arms: 0 = both titles; 1 = only the ns-a title under a
    * DIFFERENT prefix, with collapsible whitespace; 2 = only the
    * ns-b title (the arm a local-name engine cannot tell apart);
    * 3 = tab/newline-only ns-a title (the normalize-space guard's
    * whitespace classes beyond space) + a ns-b title. */
  private def nsXml: Column = {
    val m = col("doc_id") % 4
    when(m === 0, concat(
        lit("""<r:rec xmlns:r="urn:ns-a" xmlns:s="urn:ns-b"><r:title>A """),
        col("source"), lit("</r:title><s:title>B "), col("lang"),
        lit("</s:title></r:rec>")))
      .when(m === 1, concat(
        lit("""<q:rec xmlns:q="urn:ns-a"><q:title>  A  """),
        col("source"), lit(" </q:title></q:rec>")))
      .when(m === 2, concat(
        lit("""<x:rec xmlns:x="urn:ns-a" xmlns:z="urn:ns-b"><z:title>B """),
        col("lang"), lit("</z:title></x:rec>")))
      .otherwise(concat(
        lit("""<x:rec xmlns:x="urn:ns-a" xmlns:z="urn:ns-b"><x:title>"""),
        lit("\t  \n"), lit("</x:title><z:title>B "), col("lang"),
        lit("</z:title></x:rec>")))
  }

  /** The t12 stylesheet: namespace-aware dispatch of the colliding
    * local name — `a:title` and `b:title` land in DIFFERENT output
    * fields, which only a namespace-aware engine can do (the
    * local-name approximation routes both titles into both fields —
    * the arm-2 records make that divergence data-live at every SF). */
  private val t12Stylesheet =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<xsl:stylesheet version="1.0"
      |    xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
      |    xmlns:a="urn:ns-a" xmlns:b="urn:ns-b">
      |  <xsl:template match="text() | @*"/>
      |  <xsl:template match="//a:rec">
      |    <record><xsl:apply-templates/></record>
      |  </xsl:template>
      |  <xsl:template match="a:title">
      |    <xsl:if test="normalize-space(.)!=''">
      |      <ta><xsl:value-of select="normalize-space(.)"/></ta>
      |    </xsl:if>
      |  </xsl:template>
      |  <xsl:template match="b:title">
      |    <tb><xsl:value-of select="."/></tb>
      |  </xsl:template>
      |</xsl:stylesheet>""".stripMargin

  /** t12: namespace-AWARE XSLT through the compiled sheet under the
    * driver oracle (the r17 verdict's d30 playbook — the spec-only
    * nsAware surface gets a CORRECTNESS entry): stylesheet prefixes
    * resolve through the sheet's own xmlns declarations, record-side
    * prefix spelling is free (arm 1), colliding local names stay
    * distinct (arm 2 — the oracle states the namespace-true output,
    * so a regression to local-name matching hash-fails), and the
    * normalize-space guard drops a tab/newline-only title (arm 3 —
    * the r18 ANonEmpty whitespace-class fix made live). Same plan
    * shape as t8: one keep-filter + one codegen'd projection, one
    * DOM parse per row. */
  def t12XsltNsAware(spark: SparkSession, dir: String): DataFrame = {
    val sheet = Transform.compileXsltSheet(t12Stylesheet, nsAware = true)
    Tables.documents(spark, dir)
      .select(col("doc_id"), nsXml.as("xml"))
      .filter(sheet.keep(col("xml")))
      .select(col("doc_id"), to_json(sheet.output(col("xml"))).as("rec"))
      .orderBy("doc_id")
  }

  /** The t13 stylesheet — NODE-SET `xsl:variable` (the r18 subset
    * slice): variables bind node paths at the template body's top
    * level and are referenced in an `xsl:if` existence test, a
    * value-of, a value-of with trailing steps, and a for-each — the
    * aggregator idiom of factoring a repeated select into one
    * variable. Inlining makes this compile to EXACTLY the t5/t6
    * plan shape: one projection, one DOM parse per row. */
  private val t13Stylesheet =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      |  <xsl:template match="/record">
      |    <doc>
      |      <xsl:variable name="cf" select="controlfield[@tag='001']"/>
      |      <xsl:variable name="dfs" select="datafield"/>
      |      <xsl:if test="$cf">
      |        <id><xsl:value-of select="$cf"/></id>
      |      </xsl:if>
      |      <xsl:for-each select="$dfs">
      |        <field>
      |          <tag><xsl:value-of select="@tag"/></tag>
      |          <val><xsl:value-of select="subfield"/></val>
      |        </field>
      |      </xsl:for-each>
      |    </doc>
      |  </xsl:template>
      |</xsl:stylesheet>""".stripMargin

  /** t13: node-set variables end-to-end under the driver oracle —
    * `$cf` guards and emits the 001 (absent on the %7==3 records:
    * the guard's element-absent output is data-live at every SF,
    * first-of-two on the %7==5 records), `$dfs` drives the repeated
    * field emission. The oracle rebuilds the JSON from its own
    * regexp extraction, so the inlined paths are independently
    * checked. */
  def t13XsltNodeset(spark: SparkSession, dir: String): DataFrame = {
    val rules = Transform.compileXslt(t13Stylesheet)
    marcXml(Tables.documents(spark, dir))
      .select(col("doc_id"),
        to_json(Transform.structuralCrosswalk(col("xml"), rules)).as("rec"))
      .orderBy("doc_id")
  }

  /** The v14 schema: prefixes bound by `<sch:ns>` — ISO Schematron's
    * binding mechanism, the one lxml.isoschematron honors. */
  private val v14Schema =
    """<?xml version="1.0"?>
      |<schema xmlns="http://purl.oclc.org/dsdl/schematron">
      |  <ns prefix="a" uri="urn:ns-a"/>
      |  <ns prefix="b" uri="urn:ns-b"/>
      |  <pattern id="titles">
      |    <rule context="a:rec">
      |      <assert test="a:title[normalize-space(.) != '']" id="R1" role="error">record needs a nonblank ns-a title</assert>
      |      <report test="b:title" id="A1" role="info">record carries a ns-b title</report>
      |    </rule>
      |  </pattern>
      |</schema>""".stripMargin

  /** v14: namespace-AWARE Schematron through the compiled `.sch`
    * under the driver oracle — context/test prefixes resolve through
    * the schema's own `<sch:ns>` declarations (validate.py:33-35's
    * lxml.isoschematron semantics). Every verdict arm is data-live
    * at every SF: arm 0 report-only, arm 1 all-quiet, arm 2 BOTH
    * (the assert can only fail here under namespace matching — a
    * local-name engine sees the ns-b title and wrongly passes, so
    * the oracle pins aware semantics), arm 3 both via the engine's
    * own XPath normalize-space over tab/newline-only text. */
  def v14SchNsAware(spark: SparkSession, dir: String): DataFrame = {
    val rules = Validate.compileSchematron(v14Schema, col("xml"),
      nsAware = true)
    Validate.schematronReport(
        Tables.documents(spark, dir).select(col("doc_id"), nsXml.as("xml")),
        rules, phases = Seq.empty, phase = "#ALL", idCol = col("doc_id"))
      .orderBy("id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r4_xml_001" -> (r4Xml001 _),
    "r5_bw_parent" -> (r5BwParent _),
    "r6_root_ns" -> (r6RootNs _),
    "v6_xml_validate" -> (v6XmlValidate _),
    "t3_structural" -> (t3Structural _),
    "t5_xslt" -> (t5Xslt _),
    "t6_xslt_if" -> (t6XsltIf _),
    "t7_xslt_choose" -> (t7XsltChoose _),
    "t8_apply_templates" -> (t8ApplyTemplates _),
    "t10_xslt_attr" -> (t10XsltAttr _),
    "t11_xslt_mixed" -> (t11XsltMixed _),
    "t9_xslt_module" -> (t9XsltModule _),
    "v9_schematron" -> (v9Schematron _),
    "v13_sch_file" -> (v13SchFile _),
    "t12_xslt_nsaware" -> (t12XsltNsAware _),
    "v14_sch_nsaware" -> (v14SchNsAware _),
    "t13_xslt_nodeset" -> (t13XsltNodeset _),
  )

  val oracleSql: Map[String, String] = Map(
    // t12: the oracle states the NAMESPACE-TRUE output per arm as
    // independent ground truth (a local-name engine would also route
    // the arm-0/2 ns-b titles into ta → hash-fail); arm 1's
    // whitespace collapses, arm 3's guard kills ta
    "t12_xslt_nsaware" ->
      """SELECT doc_id,
           CASE CAST(doc_id % 4 AS INTEGER)
             WHEN 0 THEN '{"ta":["A ' || source || '"],"tb":["B ' || lang || '"]}'
             WHEN 1 THEN '{"ta":["A ' || source || '"]}'
             WHEN 2 THEN '{"tb":["B ' || lang || '"]}'
             ELSE '{"tb":["B ' || lang || '"]}'
           END AS rec
         FROM documents ORDER BY doc_id""",
    // t13: the guarded id segment (omitted when no 001 — the %7==3
    // arm), then the unconditional field array from the two
    // datafields, rebuilt from the oracle's own regexp extraction
    "t13_xslt_nodeset" ->
      s"""WITH marc AS ($marcXmlSql),
         ex AS (SELECT doc_id, lang, source, $idsSql AS ids FROM marc)
         SELECT doc_id, concat('{',
           CASE WHEN len(ids) > 0
                THEN concat('"id":"', ids[1], '",') ELSE '' END,
           '"field":[{"tag":"041","val":"', lang,
           '"},{"tag":"856","val":"', source, '"}]}') AS rec
         FROM ex ORDER BY doc_id""",
    // v14: verdicts per arm as independent ground truth — the assert
    // fails exactly when no NONBLANK ns-a title exists (arms 2 and
    // 3), the report fires exactly when a ns-b title exists (arms
    // 0, 2, 3); findings follow rule declaration order
    "v14_sch_nsaware" ->
      """SELECT doc_id AS id,
           CASE WHEN doc_id % 4 IN (2, 3) THEN 1 ELSE 0 END AS n_failed,
           CASE WHEN doc_id % 4 IN (0, 2, 3) THEN 1 ELSE 0 END AS n_reported,
           concat_ws(chr(10),
             CASE WHEN doc_id % 4 IN (2, 3) THEN 'record needs a nonblank ns-a title' END,
             CASE WHEN doc_id % 4 IN (0, 2, 3) THEN 'record carries a ns-b title' END) AS findings
         FROM documents ORDER BY id""",
    "r4_xml_001" ->
      s"""WITH marc AS ($marcXmlSql),
         ex AS (SELECT doc_id, $idsSql AS ids FROM marc)
         SELECT doc_id,
           CASE WHEN len(ids) = 1 THEN ids[1] END AS record_001,
           CASE WHEN len(ids) = 0 THEN 'missing'
                WHEN len(ids) > 1 THEN 'multiple'
                ELSE 'ok' END AS xml_status
         FROM ex ORDER BY doc_id""",
    // r6: the oracle does NOT re-implement the surgery — it states
    // the expected output string for each of the five input shapes
    // (what add_marc21xml_root_ns + lxml's blank-text removal
    // produce), and the well-formedness verdict per shape
    "r6_root_ns" ->
      s"""WITH marc AS ($marcXmlSql)
         SELECT doc_id,
           CASE doc_id % 5
             WHEN 0 THEN concat('<collection xmlns="http://www.loc.gov/MARC21/slim">', xml, '</collection>')
             WHEN 1 THEN concat('<collection xmlns="http://www.loc.gov/MARC21/slim">', xml, '</collection>')
             WHEN 2 THEN concat('<m:collection xmlns:m="http://www.loc.gov/MARC21/slim">', xml, '</m:collection>')
             WHEN 3 THEN concat('<?xml version="1.0"?><collection xmlns="http://www.loc.gov/MARC21/slim">', xml, '</collection>')
             ELSE concat('<collection xmlns="http://www.loc.gov/MARC21/slim">', xml)
           END AS xml_doc,
           doc_id % 5 != 4 AS well_formed
         FROM marc ORDER BY doc_id""",
    "r5_bw_parent" ->
      """SELECT doc_id,
           concat('<datafield xmlns="http://www.loc.gov/MARC21/slim" ind1=" " ind2=" " tag="ADF"><subfield code="a">prt-',
             CAST(doc_id AS VARCHAR), '</subfield></datafield>') AS bw_field
         FROM documents ORDER BY doc_id""",
    "v6_xml_validate" ->
      s"""WITH marc AS ($marcXmlSql),
         ex AS (SELECT doc_id, $idsSql AS ids,
             regexp_extract(xml, '<datafield tag="041" ind1=" " ind2=" "><subfield code="a">([^<]*)</subfield>', 1) AS xlang,
             regexp_extract(xml, '<datafield tag="856" ind1=" " ind2=" "><subfield code="u">([^<]*)</subfield>', 1) AS xurl
           FROM marc)
         SELECT doc_id AS id,
           coalesce(len(ids) = 1, FALSE) AS passed_one_001,
           coalesce(xlang IN ('en','de','fr','es','zh'), FALSE) AS passed_xml_lang,
           coalesce(length(xurl) > 0, FALSE) AS passed_xml_url,
           (CASE WHEN NOT coalesce(len(ids) = 1, FALSE) THEN 1 ELSE 0 END
            + CASE WHEN NOT coalesce(xlang IN ('en','de','fr','es','zh'), FALSE) THEN 1 ELSE 0 END
            + CASE WHEN NOT coalesce(length(xurl) > 0, FALSE) THEN 1 ELSE 0 END) AS n_failed
         FROM ex ORDER BY id""",
    "t3_structural" ->
      s"""WITH marc AS ($marcXmlSql),
         ex AS (SELECT doc_id, lang, source, $idsSql AS ids FROM marc)
         SELECT doc_id, concat(
           '{"id":"', CASE WHEN len(ids) = 0 THEN '' ELSE ids[1] END,
           '","meta":{"lang":"', lang, '","url":"', source,
           '"},"cf":[',
           array_to_string(list_transform(ids,
             x -> concat('{"tag":"001","val":"', x, '"}')), ','),
           '],"df":[{"tag":"041","val":"', lang,
           '"},{"tag":"856","val":"', source, '"}]}') AS rec
         FROM ex ORDER BY doc_id""",
    // t5: identical JSON rebuilt from regexp extraction — the leader
    // is a constant of the synthesized record; field rows mirror the
    // two datafields in document order
    "t5_xslt" ->
      s"""WITH marc AS ($marcXmlSql),
         ex AS (SELECT doc_id, lang, source, $idsSql AS ids FROM marc)
         SELECT doc_id, concat(
           '{"id":"', CASE WHEN len(ids) = 0 THEN '' ELSE ids[1] END,
           '","origin":{"lang":"', lang,
           '","leader":"00000nam a2200000 a 4500"},',
           '"field":[{"tag":"041","code":"a","val":"', lang,
           '"},{"tag":"856","code":"u","val":"', source, '"}]}') AS rec
         FROM ex ORDER BY doc_id""",
    // t6: the guarded JSON segments rebuilt with CASE — '' when the
    // guard node is absent (both guards key off the 001 branch, so
    // %7==3 records drop both fields), the trailing lang field
    // unconditional so comma placement is static
    "t6_xslt_if" ->
      s"""WITH marc AS ($marcXmlSql),
         ex AS (SELECT doc_id, lang, $idsSql AS ids FROM marc)
         SELECT doc_id, concat('{',
           CASE WHEN len(ids) > 0
                THEN concat('"id":"', ids[1], '","alt":"001",')
                ELSE '' END,
           '"lang":"', lang, '"}') AS rec
         FROM ex ORDER BY doc_id""",
    "t7_xslt_choose" ->
      s"""WITH marc AS ($marcXmlSql),
         ex AS (SELECT doc_id, lang, source, $idsSql AS ids FROM marc)
         SELECT doc_id, concat('{"pref":"',
           CASE WHEN len(ids) >= 2 THEN ids[2]
                WHEN len(ids) >= 1 THEN ids[1]
                ELSE lang END,
           '","src":"', source, '"}') AS rec
         FROM ex ORDER BY doc_id""",
    // t8: the oracle rebuilds the JSON from the BASE columns (every
    // title/type is a pure function of doc_id/source), so the
    // engine's xpath extraction + dispatch compilation is checked
    // independently; keep filter = the two row-kill branches
    // t10: the oracle rebuilds the attributed JSON objects from the
    // base columns directly — including the PLAIN image branch whose
    // null @conf must be ABSENT from the rendered object (to_json's
    // null-field drop is part of the contract under test)
    "t10_xslt_attr" ->
      """WITH base AS (
           SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN NULL
                  ELSE '{"@raw":"The  '||source||' record ","#text":"The '||source||' record"}'
             END AS t1j,
             CASE WHEN doc_id % 5 = 0 THEN
               '{"@raw":"Vol. '||CAST(doc_id % 9 AS VARCHAR)||'  of  '||source
                 ||'","#text":"Vol. '||CAST(doc_id % 9 AS VARCHAR)||' of '||source||'"}'
             END AS t2j,
             CASE CAST(doc_id % 6 AS INTEGER)
               WHEN 0 THEN 'Text' WHEN 1 THEN 'image/jpeg'
               WHEN 2 THEN 'Sound recording' WHEN 3 THEN 'moving image'
               WHEN 4 THEN ' Text with leading space' ELSE '' END AS ty
           FROM documents WHERE doc_id % 13 != 0),
         parts AS (
           SELECT doc_id, ty,
             list_filter([t1j, t2j], x -> x IS NOT NULL) AS tl
           FROM base)
         SELECT doc_id, '{' || concat_ws(',',
           CASE WHEN len(tl) = 0 THEN NULL
                ELSE '"dcterms:title":[' || array_to_string(tl, ',') || ']' END,
           CASE WHEN ty = '' THEN NULL
                WHEN regexp_matches(ty, '(^text.*$)', 'i') THEN '"dcterms:type":[{"@conf":"high","#text":"Text"}]'
                WHEN regexp_matches(ty, '(^image.*$)', 'i') THEN '"dcterms:type":[{"#text":"Image"}]'
                ELSE '"dcterms:format":[{"@src":"dc:type","#text":"' || ty || '"}]' END
           ) || '}' AS rec
         FROM parts ORDER BY doc_id""",
    // t11: every mixed-content concat rebuilt from the base columns
    // (prefix text + normalized node + xsl:text suffix; raw '.' +
    // literal separator + normalize-space(.) under a static attr)
    "t11_xslt_mixed" ->
      """WITH base AS (
           SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN NULL
                  ELSE 'Title: The '||source||' record [eng]' END AS t1,
             CASE WHEN doc_id % 5 = 0 THEN
               'Title: Vol. '||CAST(doc_id % 9 AS VARCHAR)||' of '||source||' [eng]'
             END AS t2,
             CASE CAST(doc_id % 6 AS INTEGER)
               WHEN 0 THEN 'Text' WHEN 1 THEN 'image/jpeg'
               WHEN 2 THEN 'Sound recording' WHEN 3 THEN 'moving image'
               WHEN 4 THEN ' Text with leading space' ELSE '' END AS ty
           FROM documents WHERE doc_id % 13 != 0),
         parts AS (
           SELECT doc_id, ty,
             list_filter([t1, t2], x -> x IS NOT NULL) AS tl
           FROM base)
         SELECT doc_id, '{' || concat_ws(',',
           CASE WHEN len(tl) = 0 THEN NULL
                ELSE '"dcterms:title":["' || array_to_string(tl, '","') || '"]' END,
           CASE WHEN ty = '' THEN NULL
                ELSE '"dcterms:medium":[{"@kind":"genre","#text":"'
                  || ty || ' / ' || trim(regexp_replace(ty, '\s+', ' ', 'g'))
                  || '"}]' END
           ) || '}' AS rec
         FROM parts ORDER BY doc_id""",
    "t8_apply_templates" ->
      """WITH base AS (
           SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN '' ELSE 'The '||source||' record' END AS t1n,
             CASE WHEN doc_id % 5 = 0 THEN 'Vol. '||CAST(doc_id % 9 AS VARCHAR)||' of '||source END AS t2n,
             CASE CAST(doc_id % 6 AS INTEGER)
               WHEN 0 THEN 'Text' WHEN 1 THEN 'image/jpeg'
               WHEN 2 THEN 'Sound recording' WHEN 3 THEN 'moving image'
               WHEN 4 THEN ' Text with leading space' ELSE '' END AS ty
           FROM documents
           WHERE doc_id % 13 != 0 AND doc_id % 17 != 0),
         parts AS (
           SELECT doc_id, ty,
             list_filter([t1n, t2n], x -> x IS NOT NULL AND x != '') AS tl
           FROM base)
         SELECT doc_id, '{' || concat_ws(',',
           CASE WHEN len(tl) = 0 THEN NULL
                ELSE '"dcterms:title":["' || array_to_string(tl, '","') || '"]' END,
           CASE WHEN ty = '' THEN NULL
                WHEN regexp_matches(ty, '(^text.*$)', 'i') THEN '"dcterms:type":["Text"]'
                WHEN regexp_matches(ty, '(^image.*$)', 'i') THEN '"dcterms:type":["Image"]'
                WHEN regexp_matches(ty, '^(movingimage.*$|moving\simage.*$)', 'i') THEN '"dcterms:type":["Moving Image"]'
                WHEN regexp_matches(ty, '^(sound.*$)', 'i') THEN '"dcterms:type":["Sound"]'
                ELSE '"dcterms:format":["' || ty || '"]' END) || '}' AS rec
         FROM parts ORDER BY doc_id""",
    // t9: the oracle replays the recursive-split emission trace with
    // list slicing (intermediate segments RAW, last normalized,
    // empties kept) and the starts-with routing with LIKE prefixes
    "t9_xslt_module" ->
      """WITH base AS (
           SELECT doc_id, source, lang,
             CASE CAST(doc_id % 4 AS INTEGER)
               WHEN 0 THEN 'Art ;; History;  Local  '||lang||' '
               WHEN 1 THEN 'Single Subject'
               WHEN 2 THEN NULL
               ELSE 'a;b;'||lang END AS subj,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 'http://rightsstatements.org/vocab/InC/1.0/'
               WHEN 1 THEN 'https://creativecommons.org/publicdomain/zero/1.0/'
               ELSE 'All rights reserved.' END AS rts
           FROM documents),
         emitted AS (
           SELECT doc_id, source, rts,
             CASE WHEN subj IS NULL THEN NULL
               ELSE list_concat(
                 (str_split(subj, ';'))[1:len(str_split(subj, ';'))-1],
                 [trim(regexp_replace(str_split(subj, ';')[-1], '\s+', ' ', 'g'))])
               END AS segs
           FROM base)
         SELECT doc_id, '{' || concat_ws(',',
             '"dcterms:title":["The '||source||' record"]',
             CASE WHEN segs IS NULL THEN NULL
                  ELSE '"dcterms:subject":["' || array_to_string(segs, '","') || '"]' END,
             CASE WHEN rts LIKE 'http://rightsstatements.org/vocab/%'
                       OR rts LIKE 'http://creativecommons.org/%'
                       OR rts LIKE 'https://creativecommons.org/%'
                  THEN '"edm:rights":["' || rts || '"]'
                  ELSE '"dcterms:rights":["' || rts || '"]' END) || '}' AS rec
         FROM emitted ORDER BY doc_id""",
    // v13: verdicts re-derived from the BASE columns (every assert
    // outcome is a pure function of doc_id); findings follow rule
    // declaration order (R1,R2 never fire; T1, T2, then A1)
    "v13_sch_file" ->
      """SELECT doc_id AS id,
           (CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END
            + CASE WHEN doc_id % 6 = 5 THEN 1 ELSE 0 END) AS n_failed,
           CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END AS n_reported,
           concat_ws(chr(10),
             CASE WHEN doc_id % 11 = 0 THEN 'The title element must contain text' END,
             CASE WHEN doc_id % 6 = 5 THEN 'The type element must contain text' END,
             CASE WHEN doc_id % 17 = 0 THEN 'Record carries a relation' END) AS findings
         FROM documents ORDER BY id""",
    "v9_schematron" ->
      s"""WITH marc AS ($marcXmlSql),
         ex AS (SELECT doc_id, lang, len($idsSql) AS n1 FROM marc),
         s AS (SELECT doc_id AS id,
             CASE WHEN n1 != 1 THEN 1 ELSE 0 END AS n_failed,
             CASE WHEN n1 > 1 THEN 1 ELSE 0 END AS n_reported,
             concat_ws(chr(10),
               CASE WHEN n1 != 1 THEN 'record must carry exactly one 001' END,
               CASE WHEN n1 > 1 THEN 'duplicate 001 control fields' END) AS findings,
             'structural' AS phase
           FROM ex),
         f AS (SELECT doc_id AS id,
             (CASE WHEN n1 != 1 THEN 1 ELSE 0 END
              + CASE WHEN lang NOT IN ('en','de','fr','es','zh') THEN 1 ELSE 0 END) AS n_failed,
             (CASE WHEN n1 > 1 THEN 1 ELSE 0 END
              + CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS n_reported,
             concat_ws(chr(10),
               CASE WHEN n1 != 1 THEN 'record must carry exactly one 001' END,
               CASE WHEN n1 > 1 THEN 'duplicate 001 control fields' END,
               CASE WHEN lang NOT IN ('en','de','fr','es','zh') THEN 'unknown language' END,
               CASE WHEN lang = 'zh' THEN 'record is chinese-language' END) AS findings,
             'full' AS phase
           FROM ex)
         SELECT * FROM (SELECT * FROM s UNION ALL SELECT * FROM f)
         ORDER BY phase, id""",
  )
}
