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

  @transient private lazy val compiled: Seq[XPathExpression] = {
    val xp = XPathFactory.newInstance().newXPath()
    paths.map(xp.compile)
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
    InternalRow.fromSeq(compiled.map { expr =>
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

/** Column-level entry point. */
object XmlFunctions {
  /** Struct of `p0..p<n-1>` array&lt;string&gt; fields, one per path, from
    * a single parse of `xml`. */
  def xmlFields(xml: Column, paths: Seq[String]): Column =
    ColumnBridge.column(XmlFields(ColumnBridge.expression(xml), paths))
}
