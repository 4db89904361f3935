package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.XmlFunctions

/** Parity of the single-parse [[graft.functions.XmlFields]] against the
  * builtin parse-per-call `xpath()` — every path's node set must be
  * byte-identical so the two producers are interchangeable under one
  * oracle. */
class XmlFieldsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val paths = Seq("/doc/title/text()", "/doc/@href", "/doc/*/text()")

  private val docs = Seq(
    "<doc href=\"/a.pdf\"><title>T1</title><tag>x</tag><tag>x</tag></doc>",
    "<doc><title></title><tag>y</tag></doc>",
    "<doc href=\"/c.pdf\"></doc>",
    "<doc href=\"/d\"><title> spaced </title><n>42</n><tag/></doc>",
    "<doc><inner><title>nested</title></inner></doc>"
  ).toDF("xml")

  test("each path's node set equals the builtin xpath() result") {
    val s = XmlFunctions.xmlFields(col("xml"), paths)
    val got = docs.select(
      paths.indices.map(i => s.getField(s"p$i").as(s"s$i")) ++
        paths.zipWithIndex.map { case (p, i) => xpath(col("xml"), lit(p)).as(s"b$i") }: _*)
    got.collect().foreach { r =>
      paths.indices.foreach { i =>
        assert(r.getSeq[String](r.fieldIndex(s"s$i")).toList ==
          r.getSeq[String](r.fieldIndex(s"b$i")).toList,
          s"path ${paths(i)} diverged on row $r")
      }
    }
  }

  test("fast-path grammar matches the builtin across //, attrs, element terminals") {
    // exercises the hand-compiled walk (simple paths) AND the javax
    // fallback (predicate path) against the same documents
    val paths2 = Seq(
      "//tag/text()",          // descendant text
      "//a/@href",             // descendant attr
      "/doc/title",            // element terminal (null values)
      "//inner/title/text()",  // multi-step under //
      "/doc/*/tag/text()",     // * mid-chain
      "//doc//tag/text()",     // mid-path // → javax fallback
      "/doc/tag[1]/text()")    // predicate → javax fallback
    val docs2 = Seq(
      "<doc><title>t</title><tag>x</tag><tag/></doc>",
      "<doc><inner><title>n1</title><a href=\"/h1\"/></inner><inner><tag>d</tag></inner></doc>",
      "<doc><g><tag>deep</tag></g><tag>top</tag></doc>",
      "<doc><tag>a<![CDATA[b]]>c</tag></doc>",          // split text nodes
      "<doc><tag>x&amp;y</tag><a href=\"\"/></doc>"     // entity + empty attr
    ).toDF("xml")
    val s = XmlFunctions.xmlFields(col("xml"), paths2)
    val got = docs2.select(
      paths2.indices.map(i => s.getField(s"p$i").as(s"s$i")) ++
        paths2.zipWithIndex.map { case (p, i) => xpath(col("xml"), lit(p)).as(s"b$i") }: _*)
    got.collect().foreach { r =>
      paths2.indices.foreach { i =>
        assert(r.getSeq[String](r.fieldIndex(s"s$i")).toList ==
          r.getSeq[String](r.fieldIndex(s"b$i")).toList,
          s"path ${paths2(i)} diverged on row $r")
      }
    }
  }

  test("compileSimple accepts exactly the fast subset") {
    import graft.functions.XmlFields.compileSimple
    assert(compileSimple("/doc/title/text()").isDefined)
    assert(compileSimple("//a/@href").isDefined)
    assert(compileSimple("/doc/*/text()").isDefined)
    assert(compileSimple("/doc").isDefined)
    assert(compileSimple("//h1/text()").isDefined)
    assert(compileSimple("/doc//tag/text()").isEmpty)    // mid-path //
    assert(compileSimple("/doc/tag[1]/text()").isEmpty)  // predicate
    assert(compileSimple("//a[contains(@href,'.pdf')]").isEmpty)
    assert(compileSimple("doc/title").isEmpty)           // relative
    assert(compileSimple("/ns:doc/title").isEmpty)       // namespace
  }

  test("NULL xml yields NULL struct, like the builtin yields NULL arrays") {
    val df = Seq[Option[String]](None).toDF("xml")
    val r = df.select(
      XmlFunctions.xmlFields(col("xml"), paths).as("s"),
      xpath(col("xml"), lit(paths.head)).as("b")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("malformed XML errors on both producers (not silent NULL)") {
    val df = Seq("<doc><unclosed></doc>").toDF("xml")
    val builtin = intercept[Exception] {
      df.select(xpath(col("xml"), lit(paths.head))).collect()
    }
    val ours = intercept[Exception] {
      df.select(XmlFunctions.xmlFields(col("xml"), paths)).collect()
    }
    assert(builtin != null && ours != null)
  }

  test("doctype payloads are rejected (XXE hardening, like UDFXPathUtil)") {
    val df = Seq("<!DOCTYPE doc [<!ENTITY x \"y\">]><doc>&x;</doc>").toDF("xml")
    intercept[Exception] {
      df.select(XmlFunctions.xmlFields(col("xml"), paths)).collect()
    }
  }

  test("pipeline projection via shared parse matches per-field xpath output") {
    import graft.config.{DatasetConfig, FieldSpec}
    val cfg = DatasetConfig(
      name = "x", lookupKey = "id", hashFields = Seq("id"),
      fields = Seq(
        FieldSpec("id", from = "id"),
        FieldSpec("t", from = "markup", kind = "xpath", xpath = "/doc/title/text()"),
        FieldSpec("href", from = "markup", kind = "xpath", xpath = "/doc", attr = "href"),
        FieldSpec("tags", from = "markup", kind = "xpath",
          xpath = "/doc/*/text()", multiple = true)))
    val raw = Seq(
      ("d1", "<doc href=\"/a.pdf\"><title>T1</title><tag>x</tag></doc>"),
      ("d2", "<doc><title></title><tag>y</tag></doc>")
    ).toDF("id", "markup")
    // the three xpath specs share `markup` → project() takes the shared-
    // parse path; a single-spec config takes the builtin path. Both must
    // agree field-by-field.
    val sharedOut = Pipeline.project(raw, cfg).orderBy("id").collect().toSeq
    val soloOut = cfg.fields.tail.map { spec =>
      Pipeline.project(raw, cfg.copy(fields = Seq(cfg.fields.head, spec)))
        .orderBy("id").collect().toSeq
    }
    cfg.fields.tail.zipWithIndex.foreach { case (spec, i) =>
      val fromShared = sharedOut.map(r => r.get(r.fieldIndex(spec.name)))
      val fromSolo = soloOut(i).map(r => r.get(r.fieldIndex(spec.name)))
      assert(fromShared == fromSolo, s"field ${spec.name} diverged")
    }
    // and the shared plan carries exactly one XmlFields producer
    val analyzed = Pipeline.project(raw, cfg).queryExecution.analyzed
    var parses = 0
    analyzed.foreach(_.expressions.foreach(_.foreach {
      case _: graft.functions.XmlFields => parses += 1
      case _ => ()
    }))
    assert(parses == 1, s"expected one shared parse, found $parses")
  }
}
