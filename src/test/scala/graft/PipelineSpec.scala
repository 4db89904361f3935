package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config._
import graft.operators.Classify.Rule

/** End-to-end config-driven pipeline test — the reference's whole DAG
  * (scrape→delta→clean→classify→store, SURVEY §3) on an in-memory frame. */
class PipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = DatasetConfig(
    name = "testland",
    lookupKey = "numero",
    hashFields = Seq("numero", "titulo", "detail_url"),
    fields = Seq(
      FieldSpec("numero", from = "c1"),
      FieldSpec("titulo", from = "c2", kind = "regex",
        pattern = "t:(\\w+)", group = 1, fallbacks = Seq("c1")),
      FieldSpec("fecha", from = "c3", kind = "findall",
        pattern = "(\\d{4}-\\d{2}-\\d{2})", index = 1),
      FieldSpec("detalle", from = "c2", kind = "block_after",
        anchor = "d:", pattern = "(\\w+)"),
      FieldSpec("detail_url", from = "c4")),
    dates = Seq(DateSpec("fecha", Seq("yyyy-MM-dd", "dd/MM/yyyy"))),
    classifier = Some(ClassifierConfig(
      rules = Seq(Rule("salud", "salud"), Rule("software", "tecnología")),
      categories = Seq("salud", "tecnología", "otros"),
      titleCol = "titulo", detailCol = "detalle")))

  private val raw = Seq(
    //  c1        c2                                  c3                        c4
    ("p1", "t:salud d: hospital", "2001-01-01 x 2002-02-02", "http://a"), // changed vs state
    ("p2", "t:software d: apps",  "2003-03-03 y 2004-04-04", "http://b"), // new
    ("p3", "t:misc d: unmatched", "2005-05-05 z 2006-06-06", "http://c"), // unchanged → bypass
    ("  ", "t:blankkey",          "",                        "http://d")  // dropped by C1
  ).toDF("c1", "c2", "c3", "c4")

  // state: p3's fingerprint matches what the pipeline computes; p1's differs
  private def stateFor(keys: Seq[String]) = {
    val staged = Pipeline.fingerprint(
      Pipeline.clean(Pipeline.project(raw, cfg), cfg), cfg)
    staged.filter(col("numero").isin(keys: _*))
      .select(col("numero"), when(col("numero") === "p1", lit("stale-hash"))
        .otherwise(col("row_hash")).as("row_hash"))
  }

  test("projection interprets cell/regex/findall/block_after specs") {
    val got = Pipeline.project(raw, cfg).filter(col("numero") === "p1").head()
    assert(got.getAs[String]("titulo") == "salud")
    assert(got.getAs[String]("fecha") == "2002-02-02") // index 1 = second match
    assert(got.getAs[String]("detalle") == "hospital")
  }

  test("run: delta routes changed+new to detail with classification; bypass untouched") {
    val out = Pipeline.run(raw, stateFor(Seq("p1", "p3")), cfg)
    val rows = out.select("numero", "route", "sector").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getAs[String]("sector"))))
      .toSet
    assert(rows == Set(
      ("p1", "detail", Some("salud")),
      ("p2", "detail", Some("tecnología")),
      ("p3", "bypass", None)))
  }

  test("run: blank lookup keys are dropped before the delta (C1)") {
    val out = Pipeline.run(raw, stateFor(Nil), cfg)
    assert(!out.select("numero").as[String].collect().exists(_.trim.isEmpty))
  }

  test("run: empty delta short-circuits to bypass-only (J2)") {
    val out = Pipeline.run(raw.filter(col("c1") === "p3"), stateFor(Seq("p3")), cfg)
    assert(out.select("route").as[String].collect().toSet == Set("bypass"))
    assert(!out.columns.contains("sector")) // classify stage never ran
  }

  test("date stage parses configured formats to DateType (C6)") {
    val staged = Pipeline.clean(Pipeline.project(raw, cfg), cfg)
    assert(staged.schema("fecha").dataType.typeName == "date")
    val d = staged.filter(col("numero") === "p2").select("fecha").head().getDate(0)
    assert(d.toString == "2004-04-04")
  }

  test("fingerprint uses '' for configured-but-missing fields") {
    val cfg2 = cfg.copy(hashFields = Seq("numero", "missing_field"))
    val staged = Pipeline.fingerprint(
      Pipeline.clean(Pipeline.project(raw, cfg2), cfg2), cfg2)
    val expected = Seq(("p1", "x")).toDF("numero", "ignore")
      .select(graft.operators.Fingerprint.rowHash(Seq(col("numero"), lit(""))))
      .as[String].head()
    assert(staged.filter(col("numero") === "p1")
      .select("row_hash").as[String].head() == expected)
  }

  // --- P6 xpath kinds (reference detail_parser.py:24-77) ---------------

  private val xmlRaw = Seq(
    ("d1", "<doc href=\"/a.pdf\"><title> T1 </title><tag>x</tag><tag>x</tag><tag></tag></doc>"),
    ("d2", "<doc><title></title><tag>y</tag></doc>"), // no href, blank title
    ("d3", "<doc href=\"/c.pdf\"></doc>")             // no children at all
  ).toDF("id", "markup")

  private def xCfg(spec: FieldSpec) = DatasetConfig(
    name = "x", lookupKey = "id", hashFields = Seq("id"),
    fields = Seq(FieldSpec("id", from = "id"), spec))

  test("xpath single kind: first node text, trimmed; absent/blank node → NULL (C4)") {
    val spec = FieldSpec("t", from = "markup", kind = "xpath",
      xpath = "/doc/title/text()")
    val got = Pipeline.clean(Pipeline.project(xmlRaw, xCfg(spec)), xCfg(spec))
      .select("id", "t").as[(String, Option[String])].collect().toMap
    assert(got == Map("d1" -> Some("T1"), "d2" -> None, "d3" -> None))
  }

  test("xpath attr kind: attribute value; missing attribute → NULL (C4)") {
    val spec = FieldSpec("href", from = "markup", kind = "xpath",
      xpath = "/doc", attr = "href")
    val got = Pipeline.clean(Pipeline.project(xmlRaw, xCfg(spec)), xCfg(spec))
      .select("id", "href").as[(String, Option[String])].collect().toMap
    assert(got == Map("d1" -> Some("/a.pdf"), "d2" -> None, "d3" -> Some("/c.pdf")))
  }

  test("xpath multiple kind: deduplicated non-empty values; none → []") {
    val spec = FieldSpec("tags", from = "markup", kind = "xpath",
      xpath = "/doc/tag/text()", multiple = true)
    val got = Pipeline.clean(Pipeline.project(xmlRaw, xCfg(spec)), xCfg(spec))
      .select("id", "tags").as[(String, Seq[String])].collect().toMap
    // d1: duplicate 'x' collapsed (the reference's seen-set), blank dropped;
    // d3: no tag nodes at all → empty array, not NULL
    assert(got == Map("d1" -> Seq("x"), "d2" -> Seq("y"), "d3" -> Seq.empty))
  }

  test("xpath multiple kind: pattern refines each value") {
    val spec = FieldSpec("nums", from = "markup", kind = "xpath",
      xpath = "/doc/tag/text()", pattern = "([0-9]+)", multiple = true)
    val raw2 = Seq(("d9", "<doc><tag>a12</tag><tag>b34</tag><tag>zz</tag></doc>"))
      .toDF("id", "markup")
    val got = Pipeline.project(raw2, xCfg(spec)).select("nums")
      .as[Seq[String]].head()
    assert(got == Seq("12", "34")) // zz's failed capture '' is filtered
  }

  // --- P7 labeled-link form (reference detail_parser.py:40-62) ---------

  private val linkXml = Seq(
    ("d1", "<doc>" +
      "<a href=\"/a.pdf\"> Ver documento </a>" +
      "<a href=\"/b.pdf\">Anexo</a>" +
      "<a href=\"/a.pdf\">duplicate target</a>" + // same url, later label
      "<a>no href at all</a>" +                   // dropped, can't shift the zip
      "</doc>"),
    ("d2", "<doc><a>only unlinked</a></doc>")     // no url-bearing matches → []
  ).toDF("id", "markup")

  test("xpath label_attr kind: {label, url} structs, keep-first url dedup") {
    val spec = FieldSpec("documentos", from = "markup", kind = "xpath",
      xpath = "//a", attr = "href", labelAttr = "text", multiple = true)
    val got = Pipeline.project(linkXml, xCfg(spec))
      .select(col("id"), to_json(col("documentos")).as("j"))
      .as[(String, String)].collect().toMap
    // labels trimmed; duplicate /a.pdf keeps the FIRST label (doc order);
    // the href-less anchor is dropped without misaligning later pairs
    assert(got("d1") ==
      """[{"label":"Ver documento","url":"/a.pdf"},{"label":"Anexo","url":"/b.pdf"}]""")
    assert(got("d2") == "[]")
  }

  test("labeled spec coexists with plain xpath fields on the same source") {
    // plain xpath fields still share one XmlFields parse; the labeled
    // spec evaluates through its own one-pass expression alongside them
    val labeledSpec = FieldSpec("documentos", from = "markup", kind = "xpath",
      xpath = "//a", attr = "href", labelAttr = "text", multiple = true)
    val t1 = FieldSpec("first_label", from = "markup", kind = "xpath",
      xpath = "//a/text()")
    val t2 = FieldSpec("hrefs", from = "markup", kind = "xpath",
      xpath = "//a/@href", multiple = true)
    val cfg = DatasetConfig(name = "x", lookupKey = "id",
      hashFields = Seq("id"),
      fields = Seq(FieldSpec("id", from = "id"), labeledSpec, t1, t2))
    val got = Pipeline.project(linkXml, cfg)
      .select(col("id"), to_json(col("documentos")).as("j"), col("first_label"))
      .as[(String, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap.apply("d1")
    assert(got._1 ==
      """[{"label":"Ver documento","url":"/a.pdf"},{"label":"Anexo","url":"/b.pdf"}]""")
    assert(got._2 == "Ver documento")
  }

  test("colombia's real predicate selector works; non-text label_attr falls back to url") {
    val raw = Seq(("d1",
      "<doc><a href=\"/x.pdf\" title=\"Doc A\">ver documento</a>" +
        "<a href=\"/y.pdf\">otro</a><a href=\"/z.txt\">plain</a></doc>"))
      .toDF("id", "markup")
    // the reference's contains(@href,'.pdf') predicate arm (colombia.yml:65)
    val spec = FieldSpec("links", from = "markup", kind = "xpath",
      xpath = "//a[contains(@href,'.pdf')]", attr = "href",
      labelAttr = "title", multiple = true)
    val got = Pipeline.project(raw, xCfg(spec))
      .select(to_json(col("links"))).as[String].head()
    // /x.pdf has @title; /y.pdf lacks it → label falls back to the raw
    // url (the reference's `lbl = raw` branch); /z.txt fails the predicate
    assert(got ==
      """[{"label":"Doc A","url":"/x.pdf"},{"label":"/y.pdf","url":"/y.pdf"}]""")
  }

  // --- S3 fallback-source stage (reference detail_parser.py:97-119) ----

  test("run: fallback stage fills empty collections on the detail branch only") {
    val fbCfg = DatasetConfig(
      name = "fb", lookupKey = "id", hashFields = Seq("id"),
      fields = Seq(
        FieldSpec("id", from = "id"),
        FieldSpec("docs", from = "markup", kind = "xpath",
          xpath = "/doc/a/text()", multiple = true),
        FieldSpec("exp_url", from = "exp", kind = "cell")),
      fallback = Some(FallbackSpec(
        collection = "docs", key = "exp_url", domain = "https://ex.org")))
    val raw2 = Seq(
      ("n1", "<doc><a>x.pdf</a></doc>", "/e/1"),  // nonempty → passthrough
      ("n2", "<doc></doc>", "/e/2"),              // empty + key → filled
      ("n3", "<doc></doc>", "http://ex.org/e/3"), // force-https then filled
      ("n4", "<doc></doc>", " "),                 // empty, blank key → []
      ("n5", "<doc></doc>", "/e/missing")         // empty, no match → []
    ).toDF("id", "markup", "exp")
    val secondary = Seq(
      ("https://ex.org/e/2", Seq("s2.pdf")),
      ("https://ex.org/e/3", Seq("s3.pdf"))
    ).toDF("url", "links")
    val empty = Seq.empty[(String, String)].toDF("id", "row_hash")
    val out = Pipeline.run(raw2, empty, fbCfg, secondary = Some(secondary))
    val got = out.select("id", "docs").as[(String, Seq[String])].collect().toMap
    assert(got == Map(
      "n1" -> Seq("x.pdf"), "n2" -> Seq("s2.pdf"), "n3" -> Seq("s3.pdf"),
      "n4" -> Seq.empty, "n5" -> Seq.empty))
  }

  test("run: no fallback config or no secondary frame → unchanged plan") {
    val out = Pipeline.run(raw, stateFor(Nil), cfg, secondary = None)
    assert(out.columns.toSeq == Pipeline.run(raw, stateFor(Nil), cfg).columns.toSeq)
  }

  test("upsertPrep prunes to storage columns and dedups by hash keep-first") {
    val cfg2 = cfg.copy(storageColumns = Seq("numero", "row_hash"))
    val staged = Pipeline.fingerprint(
      Pipeline.clean(Pipeline.project(raw, cfg2), cfg2), cfg2)
    val doubled = staged.union(staged)
    val got = Pipeline.upsertPrep(doubled, cfg2, Seq(col("numero").asc_nulls_first))
    assert(got.columns.toSeq == Seq("numero", "row_hash"))
    assert(got.count() == staged.count())
  }
}
