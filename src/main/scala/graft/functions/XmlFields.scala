package graft.functions

import java.io.StringReader

import javax.xml.XMLConstants
import javax.xml.parsers.{DocumentBuilder, DocumentBuilderFactory}
import javax.xml.xpath.{XPathConstants, XPathExpression, XPathFactory}

import scala.util.control.NonFatal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.w3c.dom.NodeList
import org.xml.sax.InputSource

/** Evaluate N xpath expressions against ONE parse of an XML document.
  *
  * Spark's builtin `xpath()` family parses the source string once PER
  * CALL, so a projection extracting k fields from the same markup column
  * pays k DOM parses per row — the dominant execution cost of the
  * config-driven detail-parse stage (the reference parses each fetched
  * page once with lxml and runs every selector against that tree,
  * src/scrapers/detail_parser.py:24-77; this expression restores that
  * 1-parse shape on Spark). At 100 TB the stage stays map-only either
  * way; this cuts its constant factor by ~k.
  *
  * Semantics per path mirror the builtin `xpath(xml, path)` exactly: the
  * result field is the array of `getNodeValue` strings of the matched
  * node set (text/attribute nodes yield their value; element nodes yield
  * NULL elements), so downstream refine/filter logic is identical for
  * either producer and one DuckDB oracle covers both. Output is a struct
  * with one `p<i>` field per path. Parsing is hardened like Spark's
  * UDFXPathUtil: DTDs are disallowed and secure processing is on, so
  * entity-expansion/XXE payloads fail the row rather than the process.
  */
case class XmlFields(xml: Expression, paths: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def child: Expression = xml

  override def checkInputDataTypes(): TypeCheckResult =
    if (xml.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_xml_fields expects a string column, got ${xml.dataType.sql}")

  override def dataType: DataType = StructType(paths.indices.map(i =>
    StructField(s"p$i", ArrayType(StringType, containsNull = true))))

  override def nullable: Boolean = true

  override def prettyName: String = "graft_xml_fields"

  /** javax XPath evaluation costs ~50µs per call (XObject wrapping,
    * context setup) — 10× the DOM walk it performs for the config
    * vocabulary's actual paths. Simple paths (absolute or leading-`//`
    * child chains of names/`*`, terminated by `text()`, `@attr`, or an
    * element step) compile to a direct preorder DOM walk; anything with
    * predicates, functions, mid-path `//`, or namespaces falls back to
    * the real XPath engine. Both run against the same DOM, so node-set
    * contents and document order are identical by construction. */
  @transient private lazy val compiled: Seq[Either[XPathExpression, XmlFields.SimplePath]] = {
    lazy val xp = XPathFactory.newInstance().newXPath()
    paths.map(p => XmlFields.compileSimple(p).toRight(xp.compile(p)))
  }

  @transient private lazy val builder: DocumentBuilder = {
    val f = DocumentBuilderFactory.newInstance()
    f.setFeature(XMLConstants.FEATURE_SECURE_PROCESSING, true)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newDocumentBuilder()
  }

  override def nullSafeEval(input: Any): Any = {
    val doc =
      try {
        builder.reset()
        builder.parse(new InputSource(new StringReader(input.toString)))
      } catch {
        case NonFatal(e) =>
          // the builtin xpath() surfaces malformed XML as a runtime error
          // (not NULL); keep that contract so the two producers agree
          throw new RuntimeException(
            s"graft_xml_fields: invalid XML document: ${e.getMessage}")
      }
    InternalRow.fromSeq(compiled.map {
      case Right(simple) => XmlFields.evalSimple(doc, simple)
      case Left(expr) =>
        val nodes = expr.evaluate(doc, XPathConstants.NODESET).asInstanceOf[NodeList]
        new GenericArrayData(Array.tabulate[Any](nodes.getLength) { i =>
          val v = nodes.item(i).getNodeValue
          if (v == null) null else UTF8String.fromString(v)
        })
    })
  }

  override protected def withNewChildInternal(newChild: Expression): XmlFields =
    copy(xml = newChild)
}

object XmlFields {
  private[graft] sealed trait Term
  private[graft] case object TText extends Term
  private[graft] final case class TAttr(name: String) extends Term
  private[graft] case object TElem extends Term

  /** An absolute (or leading-`//`) chain of child steps (`name` or `*`)
    * with a terminal of `text()`, `@attr`, or the last element itself. */
  private[graft] final case class SimplePath(
      anyDepth: Boolean, steps: List[String], term: Term)

  private val NamePat = "[A-Za-z_][A-Za-z0-9_.-]*"

  /** Some(simple walk) when the path is in the fast subset, None →
    * caller uses the javax XPath engine. */
  private[graft] def compileSimple(path: String): Option[SimplePath] = {
    val (anyDepth, rest) =
      if (path.startsWith("//")) (true, path.substring(2))
      else if (path.startsWith("/")) (false, path.substring(1))
      else return None
    val parts = rest.split("/", -1).toList
    if (parts.isEmpty || parts.exists(_.isEmpty)) return None // mid-path //
    val (stepParts, term) = parts.last match {
      case "text()" => (parts.init, TText)
      case a if a.startsWith("@") && a.substring(1).matches(NamePat) =>
        (parts.init, TAttr(a.substring(1)))
      case _ => (parts, TElem)
    }
    if (stepParts.isEmpty) return None
    if (stepParts.forall(s => s == "*" || s.matches(NamePat)))
      Some(SimplePath(anyDepth, stepParts, term))
    else None
  }

  import org.w3c.dom.{Document, Element, Node}

  /** Single preorder traversal emitting matches in GLOBAL document order
    * — what the XPath engine returns. Each element carries the set of
    * step positions it occupies (a boolean per step: position i holds
    * when the name matches step i and the parent held i-1; position 0
    * additionally needs the element to be the document element for
    * absolute paths, or may restart anywhere for leading-`//`). Emission
    * happens in traversal order: a matched element's attribute/self
    * before its content, text runs interleaved with nested element
    * matches exactly as they appear in the document.
    *
    * Text runs: XPath-1.0 merges ADJACENT text/CDATA DOM nodes into one
    * logical text node, and Xalan reports that node's value as the
    * run's FIRST DOM chunk — mirrored here (one value per run, first
    * chunk). */
  private[graft] def evalSimple(doc: Document, sp: SimplePath): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    val steps = sp.steps.toArray
    val n = steps.length
    def stepMatches(name: String, i: Int): Boolean =
      steps(i) == "*" || steps(i) == name
    def visit(el: Element, m: Array[Boolean]): Unit = {
      val full = m(n - 1)
      if (full) sp.term match {
        case TAttr(a) =>
          val attr = el.getAttributeNode(a)
          if (attr != null) out += UTF8String.fromString(attr.getValue)
        case TElem =>
          out += null // element nodes have null getNodeValue, like builtin
        case TText => () // text children emitted in the loop below
      }
      var inRun = false
      var c = el.getFirstChild
      while (c != null) {
        c.getNodeType match {
          case Node.TEXT_NODE | Node.CDATA_SECTION_NODE =>
            if (full && sp.term == TText && !inRun)
              out += UTF8String.fromString(c.getNodeValue)
            inRun = true
          case Node.ELEMENT_NODE =>
            inRun = false
            val child = c.asInstanceOf[Element]
            val name = child.getNodeName
            val cm = new Array[Boolean](n)
            cm(0) = sp.anyDepth && stepMatches(name, 0)
            var i = 1
            while (i < n) {
              cm(i) = m(i - 1) && stepMatches(name, i)
              i += 1
            }
            // absolute paths can prune dead subtrees; `//` can restart
            // at any depth, so it must always descend
            if (sp.anyDepth || cm.exists(identity)) visit(child, cm)
          case _ =>
            inRun = false
        }
        c = c.getNextSibling
      }
    }
    val root = doc.getDocumentElement
    if (root != null) {
      val m0 = new Array[Boolean](n)
      m0(0) = stepMatches(root.getNodeName, 0)
      visit(root, m0)
    }
    new GenericArrayData(out.toArray)
  }
}

/** The reference's labeled-link extraction (detail_parser.py:24-62,
  * configs/colombia.yml:64-68 `label_attr`) as one DOM pass: evaluate
  * `nodePath` (full XPath — colombia's predicates included), then per
  * matched ELEMENT in document order emit {label, url} where
  * url = @`attr` (trimmed; empty → node skipped; keep-FIRST dedup — the
  * reference's `seen` set) and label = text content for
  * `labelAttr = "text"`, else that attribute's non-empty value, else the
  * url itself (the reference's `lbl = raw` fallback). Deviations,
  * documented: absolutization is downstream's job (C7 — the reference
  * urljoins against the portal domain here), and non-element matches are
  * skipped (the reference appends bare strings into a mixed-type list a
  * typed engine cannot carry).
  *
  * This cannot be composed from `xpath()` calls: a zip of `path/@attr`
  * with `path` needs the element STRING-VALUE, but the builtin yields
  * `getNodeValue` — NULL for elements — and attr-less matches shift the
  * zip. One DOM walk reads both off each node, like the reference. */
case class XmlLabeledLinks(xml: Expression, nodePath: String,
                           attr: String, labelAttr: String)
    extends UnaryExpression with CodegenFallback {

  override def child: Expression = xml

  override def checkInputDataTypes(): TypeCheckResult =
    if (xml.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_xml_labeled_links expects a string column, got ${xml.dataType.sql}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("label", StringType),
      StructField("url", StringType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_xml_labeled_links"

  @transient private lazy val expr: XPathExpression =
    XPathFactory.newInstance().newXPath().compile(nodePath)

  @transient private lazy val builder: DocumentBuilder = {
    val f = DocumentBuilderFactory.newInstance()
    f.setFeature(XMLConstants.FEATURE_SECURE_PROCESSING, true)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newDocumentBuilder()
  }

  override def nullSafeEval(input: Any): Any = {
    import org.w3c.dom.{Element, Node}
    val doc =
      try {
        builder.reset()
        builder.parse(new InputSource(new StringReader(input.toString)))
      } catch {
        case NonFatal(e) => throw new RuntimeException(
          s"graft_xml_labeled_links: invalid XML document: ${e.getMessage}")
      }
    val nodes = expr.evaluate(doc, XPathConstants.NODESET).asInstanceOf[NodeList]
    val seen = scala.collection.mutable.HashSet[String]()
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    while (i < nodes.getLength) {
      nodes.item(i) match {
        case el: Element if el.getNodeType == Node.ELEMENT_NODE =>
          val url = Option(el.getAttributeNode(attr))
            .map(_.getValue.trim).getOrElse("")
          if (url.nonEmpty && seen.add(url)) {
            val label =
              if (labelAttr == "text") el.getTextContent.trim
              else Option(el.getAttributeNode(labelAttr))
                .map(_.getValue.trim).filter(_.nonEmpty).getOrElse(url)
            out += InternalRow(UTF8String.fromString(label),
              UTF8String.fromString(url))
          }
        case _ => () // non-element match: the reference's mixed-list case
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): XmlLabeledLinks =
    copy(xml = newChild)
}

/** Column-level entry point. */
object XmlFunctions {
  /** Struct of `p0..p<n-1>` array&lt;string&gt; fields, one per path, from
    * a single parse of `xml`. */
  def xmlFields(xml: Column, paths: Seq[String]): Column =
    ColumnBridge.column(XmlFields(ColumnBridge.expression(xml), paths))

  /** array&lt;struct&lt;label,url&gt;&gt; of deduplicated labeled links —
    * the reference's `label_attr` extraction (one DOM pass per row). */
  def xmlLabeledLinks(xml: Column, nodePath: String, attr: String,
                      labelAttr: String): Column =
    ColumnBridge.column(
      XmlLabeledLinks(ColumnBridge.expression(xml), nodePath, attr, labelAttr))
}
