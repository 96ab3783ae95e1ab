package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative per-record transformation (reference: transform.py).
  *
  * The reference shells out to Saxon to run an XSLT crosswalk over
  * every record of every file, carrying `airflow-record-id` through
  * (transform.py:20-76). An XSLT crosswalk *declares* output fields
  * as expressions over input fields — in Spark that is a `select` of
  * named Columns: fully codegen'd, map-only, no per-record process
  * spawn (the reference forks a JVM per record — the single biggest
  * scale win of the re-expression).
  */
object Transform {

  /** Apply a crosswalk: ordered (outputName -> expression) pairs.
    * The record id should be one of the mappings, mirroring how the
    * reference stamps `airflow-record-id` on every result. */
  def crosswalk(df: DataFrame, mapping: Seq[(String, Column)]): DataFrame =
    df.select(mapping.map { case (name, expr) => expr.as(name) }: _*)

  /** Text normalization used before hashing/dedup: lowercase,
    * collapse whitespace, trim. Matches the oracle formula
    * `trim(regexp_replace(lower(x),'\s+',' ','g'))`. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Structural crosswalk rules — the stylesheet-shaped transform
    * depth beyond flat field mapping (reference: transform.py:20-76
    * runs arbitrary XSLT via Saxon; an XSLT template tree whose
    * matches produce nested output trees maps onto a rule tree whose
    * nodes produce nested struct columns).
    *
    *  - [[XLeaf]]  — `xsl:value-of`: first matching node's text
    *    (absent → "" so the JSON shape is stable; `to_json` drops
    *    null fields).
    *  - [[XAll]]   — `xsl:for-each` emitting one text per match:
    *    every matching node's text as array<string>.
    *  - [[XZip]]   — `xsl:for-each` emitting an element per match
    *    with several fields: N xpaths over the SAME repeated node,
    *    zipped positionally into array<struct> (the standard Spark
    *    XML-shredding idiom; xpath preserves document order so
    *    position i of each array refers to the same node).
    *  - [[XNode]]  — a literal result element with children: nested
    *    struct.
    *  - [[XWhen]]  — `xsl:if` with an existence test: the guarded
    *    rule's value when the test xpath matches a node, SQL NULL
    *    otherwise — and `to_json` DROPS null fields, which is exactly
    *    xsl:if's element-absent output semantics (a CASE WHEN guard
    *    column; `xpath_boolean` evaluates the test).
    *
    * Everything compiles to one codegen'd projection over the XML
    * column — map-only, no shuffle, no per-record process spawn — so
    * it scales as a plain scan at 100 TB. */
  sealed trait XRule
  final case class XLeaf(name: String, path: String) extends XRule
  final case class XAll(name: String, path: String) extends XRule
  final case class XZip(name: String, fields: Seq[(String, String)]) extends XRule
  final case class XNode(name: String, children: Seq[XRule]) extends XRule
  final case class XWhen(test: String, inner: XRule) extends XRule

  /** `xsl:choose`: first matching `xsl:when` branch wins (exactly
    * CASE WHEN's first-match semantics), optional `xsl:otherwise`;
    * no match and no otherwise → NULL → to_json drops the field,
    * which is choose emitting nothing. All branches carry the SAME
    * field name (the containing literal element's). */
  final case class XChoose(branches: Seq[(String, XRule)],
      otherwise: Option[XRule]) extends XRule

  private def ruleName(r: XRule): String = r match {
    case XLeaf(n, _) => n
    case XAll(n, _) => n
    case XZip(n, _) => n
    case XNode(n, _) => n
    case XWhen(_, inner) => ruleName(inner)
    case XChoose(bs, _) => ruleName(bs.head._2)
  }

  private def ruleExpr(xml: Column, r: XRule): Column = r match {
    case XLeaf(_, p) => coalesce(xpath_string(xml, lit(p)), lit(""))
    case XAll(_, p) => xpath(xml, lit(p))
    case XZip(_, fields) =>
      val arrs = fields.map { case (_, p) => xpath(xml, lit(p)) }
      // transform-with-index over the first array; element_at is
      // 1-based. Interpreted HOF — fine here: this is a transform
      // surface, not a dedup hot path, and stays linear map-only.
      transform(arrs.head, (_, i) => struct(
        fields.map(_._1).zip(arrs).map { case (fn, a) =>
          element_at(a, i + 1).as(fn) }: _*))
    case XNode(_, cs) => struct(cs.map(compileRule(xml, _)): _*)
    case XWhen(t, inner) =>
      // no otherwise(...) → NULL when the test fails; to_json then
      // omits the field, mirroring xsl:if emitting nothing
      when(xpath_boolean(xml, lit(t)), ruleExpr(xml, inner))
    case XChoose(branches, ow) =>
      val chained = branches.tail.foldLeft(
        when(xpath_boolean(xml, lit(branches.head._1)),
          ruleExpr(xml, branches.head._2))) { case (c, (t, r)) =>
        c.when(xpath_boolean(xml, lit(t)), ruleExpr(xml, r))
      }
      ow.fold(chained)(r => chained.otherwise(ruleExpr(xml, r)))
  }

  private def compileRule(xml: Column, r: XRule): Column =
    ruleExpr(xml, r).as(ruleName(r))

  /** Compile a rule tree over a serialized-XML column into one nested
    * struct Column (serialize with `to_json` for a stable wire/oracle
    * form). */
  def structuralCrosswalk(xml: Column, rules: Seq[XRule]): Column =
    struct(rules.map(compileRule(xml, _)): _*)

  /** A stylesheet as a whole-frame transform — the shape
    * [[graft.streaming.EtlStream.maintainEtl]]'s `transform` seam
    * takes, so a user-authored `.xsl` drives the streaming ETL DAG
    * end-to-end (the reference's transform_s3_xsl task wired into its
    * harvest loop, transform.py:20-76). Compiles ONCE at construction
    * (a bad stylesheet fails fast, not per batch); each batch then
    * pays one codegen'd projection: the carried columns plus the
    * crosswalk output serialized to `outCol`. */
  def xsltTransform(xslt: String, xmlCol: String, carry: Seq[String],
      outCol: String = "rec"): DataFrame => DataFrame = {
    val rules = compileXslt(xslt)
    df => df.select(carry.map(col) :+
      to_json(structuralCrosswalk(col(xmlCol), rules)).as(outCol): _*)
  }

  /** XSLT-subset → [[XRule]] compiler: the in-scope answer to the
    * reference's Saxon dependency (transform.py:20-76 shells to an
    * arbitrary `.xsl`; prepare_saxon_engine at transform.py:81
    * DOWNLOADS Saxon — out of reach in a zero-egress engine). A user
    * holding real stylesheet files feeds them here; the subset
    * covers the shapes the reference's crosswalk DAGs actually use,
    * and each compiles to the rule tree that [[structuralCrosswalk]]
    * turns into ONE codegen'd map-only projection:
    *
    *  - one `xsl:template match="/abs/path"` establishing the
    *    context node,
    *  - whose body is one literal result element; its children
    *    compile to the rule list:
    *    - literal element containing exactly one `xsl:value-of` →
    *      [[XLeaf]] (select `.`→ context text, `@attr` → attribute,
    *      relative path → descendant text),
    *    - literal element containing exactly one `xsl:for-each`
    *      whose body is ONE bare `xsl:value-of` → [[XAll]]: every
    *      matching node's text as array<string> (the repeated-text
    *      shape; a for-each emitting an element per match is the
    *      XZip case below),
    *    - literal element containing only literal elements →
    *      [[XNode]] of its compiled children,
    *    - `xsl:for-each select="rel"` containing one literal
    *      element whose children each hold one `xsl:value-of` →
    *      [[XZip]]: the per-match fields zip positionally, exactly
    *      how the for-each visits nodes in document order.
    *
    *    - `xsl:if test="rel-path"` with an existence test, either
    *      WRAPPING one literal element or as the sole child of one
    *      holding a single `xsl:value-of` → [[XWhen]]: the field is
    *      emitted only when the tested node exists (the CASE WHEN
    *      guard; to_json's null-dropping is the element-absent
    *      output).
    *    - literal element holding one `xsl:choose` whose `xsl:when`
    *      branches (existence tests) each hold one `xsl:value-of`,
    *      plus at most one `xsl:otherwise` → [[XChoose]]: a chained
    *      CASE WHEN with first-match-wins semantics; no match and no
    *      otherwise emits nothing (the null-dropped field).
    *
    * Anything outside the subset (apply-templates, call-template,
    * nested for-each, non-path tests, literal text in when branches)
    * throws — a compiler that silently mis-runs a stylesheet is
    * worse than one that refuses it. Parsing is JDK DOM; no
    * execution engine is involved. */
  def compileXslt(xslt: String): Seq[XRule] = {
    import org.w3c.dom.Element
    val XslNs = "http://www.w3.org/1999/XSL/Transform"
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    val doc = dbf.newDocumentBuilder().parse(new org.xml.sax.InputSource(
      new java.io.StringReader(xslt)))
    def elems(n: org.w3c.dom.Node): Seq[Element] = {
      val nl = n.getChildNodes
      (0 until nl.getLength).map(nl.item).collect { case e: Element => e }
    }
    def isXsl(e: Element, local: String): Boolean =
      XslNs == e.getNamespaceURI && e.getLocalName == local
    def name(e: Element): String =
      Option(e.getLocalName).getOrElse(e.getTagName)
    def valuePath(base: String, sel: String): String = {
      require(!sel.contains("//") && !sel.startsWith("/"),
        s"unsupported value-of select '$sel' (absolute and // paths " +
          "are outside the subset)")
      if (sel == ".") s"$base/text()"
      // an attribute FINAL step ("@tag", "subfield/@code") selects the
      // attribute value itself — appending /text() to it would always
      // be empty (and misalign a zip's arrays)
      else if (sel.split("/").last.startsWith("@")) s"$base/$sel"
      else s"$base/$sel/text()"
    }
    // an xsl:if test is an EXISTENCE predicate over a context-relative
    // node path (the shape the reference's crosswalks use); anything
    // computational (=, functions, and/or) is out of subset
    def testPath(base: String, test: String): String = {
      // operators are checked OUTSIDE [...] predicates: a step filter
      // like [@tag='001'] is still a node-existence path
      val stripped = test.replaceAll("\\[[^\\]]*\\]", "")
      require(test.nonEmpty && !test.startsWith("/") && !test.contains("//")
          && !stripped.exists(c => "=<>!|&()".contains(c)),
        s"unsupported xsl:if test '$test' (only context-relative " +
          "node-existence paths are in the subset)")
      s"$base/$test"
    }
    def compileLeafOrNode(e: Element, base: String): XRule = {
      require(e.getNamespaceURI == null,
        s"unsupported xsl:${name(e)} here — only value-of/for-each/" +
          "if/literal elements are in the subset")
      elems(e) match {
        case Seq(vo) if isXsl(vo, "value-of") =>
          XLeaf(name(e), valuePath(base, vo.getAttribute("select")))
        case Seq(xif) if isXsl(xif, "if") =>
          val vo = elems(xif) match {
            case Seq(v) if isXsl(v, "value-of") => v
            case _ => throw new IllegalArgumentException(
              s"xsl:if inside <${name(e)}> must hold exactly one value-of")
          }
          XWhen(testPath(base, xif.getAttribute("test")),
            XLeaf(name(e), valuePath(base, vo.getAttribute("select"))))
        case Seq(ch) if isXsl(ch, "choose") =>
          def voOf(x: Element, what: String): Element = elems(x) match {
            case Seq(v) if isXsl(v, "value-of") => v
            case _ => throw new IllegalArgumentException(
              s"$what inside <${name(e)}> must hold exactly one value-of")
          }
          val kids = elems(ch)
          val whens = kids.filter(isXsl(_, "when"))
          val others = kids.filter(isXsl(_, "otherwise"))
          require(whens.nonEmpty
              && kids.size == whens.size + others.size && others.size <= 1,
            s"xsl:choose inside <${name(e)}> must hold xsl:when branches " +
              "and at most one xsl:otherwise")
          XChoose(
            whens.map(wn => testPath(base, wn.getAttribute("test")) ->
              XLeaf(name(e),
                valuePath(base, voOf(wn, "xsl:when").getAttribute("select")))),
            others.headOption.map(o => XLeaf(name(e),
              valuePath(base, voOf(o, "xsl:otherwise").getAttribute("select")))))
        case Seq(fe) if isXsl(fe, "for-each")
            && elems(fe).forall(isXsl(_, "value-of")) =>
          val sel = fe.getAttribute("select")
          require(sel.nonEmpty && !sel.startsWith("/"),
            s"for-each select must be context-relative, got '$sel'")
          val vo = elems(fe) match {
            case Seq(v) => v
            case other => throw new IllegalArgumentException(
              s"bare for-each under <${name(e)}> must hold exactly one " +
                s"value-of, got ${other.size}")
          }
          XAll(name(e), valuePath(s"$base/$sel", vo.getAttribute("select")))
        case kids if kids.nonEmpty =>
          XNode(name(e), kids.map(compileTop(_, base)))
        case _ => throw new IllegalArgumentException(
          s"empty literal element <${name(e)}> — nothing to compile")
      }
    }
    def compileTop(e: Element, base: String): XRule =
      if (isXsl(e, "if")) {
        val inner = elems(e) match {
          case Seq(one) if one.getNamespaceURI == null => one
          case other => throw new IllegalArgumentException(
            "xsl:if body must be one literal element, got " +
              other.map(name).mkString(","))
        }
        XWhen(testPath(base, e.getAttribute("test")),
          compileTop(inner, base))
      } else if (isXsl(e, "for-each")) {
        val sel = e.getAttribute("select")
        require(sel.nonEmpty && !sel.startsWith("/"),
          s"for-each select must be context-relative, got '$sel'")
        val inner = elems(e) match {
          case Seq(one) if one.getNamespaceURI == null => one
          case other => throw new IllegalArgumentException(
            "for-each body must be one literal element, got " +
              other.map(name).mkString(","))
        }
        val fBase = s"$base/$sel"
        val fields = elems(inner).map { f =>
          val vo = elems(f) match {
            case Seq(v) if isXsl(v, "value-of") => v
            case _ => throw new IllegalArgumentException(
              s"for-each field <${name(f)}> must hold exactly one value-of")
          }
          name(f) -> valuePath(fBase, vo.getAttribute("select"))
        }
        XZip(name(inner), fields)
      } else compileLeafOrNode(e, base)
    val template = elems(doc.getDocumentElement)
      .find(isXsl(_, "template")).getOrElse(throw
        new IllegalArgumentException("stylesheet has no xsl:template"))
    val ctx = template.getAttribute("match")
    require(ctx.startsWith("/") && !ctx.contains("//"),
      s"template match must be an absolute path, got '$ctx'")
    val wrapper = elems(template) match {
      case Seq(w) if w.getNamespaceURI == null => w
      case other => throw new IllegalArgumentException(
        "template body must be one literal result element, got " +
          other.map(name).mkString(","))
    }
    elems(wrapper).map(compileTop(_, ctx))
  }
}
