package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config._
import graft.operators.Classify.Rule
import graft.queries.CorePack

/** YAML config loader (reference src/scrapers/config_loader.py:10-21 and
  * the dict-tree vocabulary of configs/colombia.yml + classifier.yml). */
class ConfigLoaderSpec extends AnyFunSuite {

  test("Yaml parser: nested maps, lists of maps, quotes, comments, flow lists") {
    val tree = Yaml.parse(
      """# top comment
        |portal:
        |  domain: "https://example.org"   # trailing comment
        |  base_url: 'it''s here'
        |pipeline:
        |  - name: list
        |    concurrency: 5
        |  - name: detail
        |    selectors:
        |      - "td:nth-child(1)"
        |      - td
        |flags: [a, "b, c", d]
        |empty_key:
        |""".stripMargin).asMap.toMap

    val portal = tree("portal").asMap.toMap
    assert(portal("domain").asString == "https://example.org")
    assert(portal("base_url").asString == "it's here")
    val stages = tree("pipeline").asList
    assert(stages.map(_.asMap.toMap.apply("name").asString) == Vector("list", "detail"))
    assert(stages(0).asMap.toMap.apply("concurrency").asString == "5")
    assert(stages(1).asMap.toMap.apply("selectors").asList.map(_.asString)
      == Vector("td:nth-child(1)", "td"))
    assert(tree("flags").asList.map(_.asString) == Vector("a", "b, c", "d"))
    assert(tree("empty_key").asString == "")
  }

  test("Yaml parser: order preserved and errors are loud") {
    val m = Yaml.parse("b: 1\na: 2\nc: 3\n") match {
      case mm: Yaml.MapNode => mm
      case other            => fail(s"expected map, got $other")
    }
    assert(m.entries.map(_._1) == Vector("b", "a", "c"))
    assertThrows[RuntimeException](Yaml.parse("a: 1\nnot a mapping line\n"))
    assertThrows[RuntimeException](m("missing"))
  }

  test("Yaml parser: bare '-' items neither crash at EOF nor swallow siblings") {
    // bare '-' at EOF → empty item, not IndexOutOfBounds
    val eof = Yaml.parse("items:\n  - a\n  -").asMap.toMap
    assert(eof("items").asList.map(_.asString) == Vector("a", ""))
    // bare '-' followed by a SAME-indent sibling → two items, the second
    // is not misparsed as the first one's nested block
    val sib = Yaml.parse("items:\n  -\n  - a").asMap.toMap
    assert(sib("items").asList.map(_.asString) == Vector("", "a"))
  }

  test("Yaml parser: apostrophe inside an unquoted scalar doesn't eat the comment") {
    val m = Yaml.parse("titulo: o'brien  # surname\n").asMap.toMap
    assert(m("titulo").asString == "o'brien")
  }

  test("Yaml parser: quote ESCAPES survive comment stripping and colon finding") {
    // '' inside single quotes stays inside the scalar — the # is content
    val s = Yaml.parse("name: 'it''s # ok'\n").asMap.toMap
    assert(s("name").asString == "it's # ok")
    // \" inside double quotes likewise
    val d = Yaml.parse("say: \"he said \\\"hi\\\" # loud\"\n").asMap.toMap
    assert(d("say").asString == "he said \"hi\" # loud")
    // a colon inside a quoted list-item scalar is not a map entry
    val li = Yaml.parse("xs:\n  - 'a: b'\n").asMap.toMap
    assert(li("xs").asList.map(_.asString) == Vector("a: b"))
  }

  test("Yaml parser: escape decoding is a single left-to-right scan") {
    // \\n (escaped backslash + letter n) is the two chars \ n — chained
    // replaces collapsed it to a newline
    val m = Yaml.parse("a: \"x\\\\ny\"\n").asMap.toMap
    assert(m("a").asString == "x\\ny")
    // \\" is a literal backslash followed by a closing-quote escape
    val q = Yaml.parse("b: \"x\\\\\\\"y\"\n").asMap.toMap
    assert(q("b").asString == "x\\\"y")
    // plain escapes still decode
    val p = Yaml.parse("c: \"l1\\nl2\\tend\"\n").asMap.toMap
    assert(p("c").asString == "l1\nl2\tend")
  }

  test("Yaml parser: flow lists use the same quote model (apostrophes are text)") {
    val m = Yaml.parse("markers: [o'brien, smith, 'x, y']\n").asMap.toMap
    assert(m("markers").asList.map(_.asString) ==
      Vector("o'brien", "smith", "x, y"))
  }

  test("booleans accept the YAML-1.1 vocabulary and reject garbage loudly") {
    def cfg(b: String) = ConfigLoader.fromYaml(
      s"""name: t
         |lookup_key: k
         |fields:
         |  - name: d
         |    from: xml
         |    xpath: "//a"
         |    multiple: $b
         |""".stripMargin)
    for (t <- Seq("true", "True", "TRUE", "yes", "on", "1"))
      assert(cfg(t).fields.head.multiple, s"'$t' should parse true")
    for (f <- Seq("false", "False", "no", "off", "0"))
      assert(!cfg(f).fields.head.multiple, s"'$f' should parse false")
    assertThrows[RuntimeException](cfg("ture"))
  }

  test("fieldSpec kind inference follows the reference's key dispatch") {
    val cfg = ConfigLoader.fromYaml(
      """name: t
        |lookup_key: k
        |fields:
        |  - name: a
        |    from: c1
        |  - name: b
        |    from: c2
        |    regex: "x(.)"
        |  - name: c
        |    from: c3
        |    find_all: true
        |    regex: "(\\d+)"
        |    index: 2
        |  - name: d
        |    from: xml
        |    xpath: "//a"
        |    attr: href
        |    multiple: true
        |""".stripMargin)
    assert(cfg.fields.map(_.kind) == Seq("cell", "regex", "findall", "xpath"))
    assert(cfg.fields(1).pattern == "x(.)")
    assert(cfg.fields(2).index == 2)
    assert(cfg.fields(3).attr == "href" && cfg.fields(3).multiple)
    assert(cfg.hashFields.isEmpty && cfg.hashCol == "row_hash")
  }

  test("label_attr binds in both field-spec shapes (colombia.yml:64-68)") {
    val cfg = ConfigLoader.fromYaml(
      """name: t
        |lookup_key: k
        |fields:
        |  - name: documentos
        |    from: xml
        |    xpath: "//a[contains(@href,'.pdf')]"
        |    attr: href
        |    label_attr: text
        |    multiple: true
        |""".stripMargin)
    val f = cfg.fields.head
    assert(f.kind == "xpath" && f.attr == "href" && f.labelAttr == "text"
      && f.multiple)
    // nested selectors.detail.fields shape (the reference's real layout)
    val nested = ConfigLoader.fromYaml(
      """selectors:
        |  detail:
        |    fields:
        |      documentos:
        |        xpath: "//a"
        |        attr: href
        |        label_attr: text
        |        multiple: true
        |storage:
        |  final:
        |    table: t
        |    lookup_key: k
        |    columns:
        |      k: TEXT
        |""".stripMargin)
    val nf = nested.fields.find(_.name == "documentos").get
    assert(nf.labelAttr == "text" && nf.attr == "href" && nf.multiple)
  }

  test("label_attr without attr+multiple fails at load, not silently degrades") {
    // a labeled spec missing `multiple` (or `attr`) used to fall through
    // to the plain-xpath path and drop the labels (ADVICE r7)
    def load(body: String) = ConfigLoader.fromYaml(
      s"""name: t
         |lookup_key: k
         |fields:
         |  - name: documentos
         |    from: xml
         |$body
         |""".stripMargin)
    val noMultiple =
      "    xpath: \"//a\"\n    attr: href\n    label_attr: text"
    val noAttr =
      "    xpath: \"//a\"\n    label_attr: text\n    multiple: true"
    val noXpath =
      "    regex: \"x(.)\"\n    label_attr: text\n    multiple: true"
    for (bad <- Seq(noMultiple, noAttr, noXpath)) {
      val e = intercept[IllegalArgumentException](load(bad))
      assert(e.getMessage.contains("label_attr"), e.getMessage)
    }
    // the complete spec still loads (guard is not over-eager)
    load("    xpath: \"//a\"\n    attr: href\n    label_attr: text\n    multiple: true")
  }

  test("storage columns accept the reference's name->TYPE map shape") {
    val cfg = ConfigLoader.fromYaml(
      """name: t
        |lookup_key: k
        |fields:
        |  - name: a
        |    from: c1
        |storage:
        |  table: proyectos
        |  columns:
        |    no_camara: TEXT
        |    row_hash: "TEXT NOT NULL"
        |    fecha: DATE
        |""".stripMargin)
    assert(cfg.storageColumns == Seq("no_camara", "row_hash", "fecha"))
  }

  test("dates and renames bind") {
    val cfg = ConfigLoader.fromYaml(
      """name: t
        |lookup_key: k
        |fields:
        |  - name: fecha
        |    from: c1
        |dates:
        |  - name: fecha
        |    formats: [yyyy-MM-dd, dd/MM/yyyy]
        |renames:
        |  old_name: new_name
        |""".stripMargin)
    assert(cfg.dates == Seq(DateSpec("fecha", Seq("yyyy-MM-dd", "dd/MM/yyyy"))))
    assert(cfg.renames == Map("old_name" -> "new_name"))
  }

  test("configs/docs_e2e.yml loads EQUAL to the hand-built e2eConfig") {
    val loaded = ConfigLoader.load("configs/docs_e2e.yml")
    assert(loaded == CorePack.e2eConfig)
  }

  test("classifier block binds rules in order") {
    val loaded = ConfigLoader.load("configs/docs_e2e.yml")
    val c = loaded.classifier.get
    assert(c.rules.head == Rule("miner[ií]a|oro|gas|petr[oó]leo", "minero-energético"))
    assert(c.rules.size == 16 && c.categories.size == 14)
    assert(c.titleCol == "titulo" && c.detailCol == "detalle" && c.outputCol == "sector")
  }

  test("fallback block binds with reference-shaped defaults") {
    val cfg = ConfigLoader.fromYaml(
      """name: t
        |lookup_key: k
        |fields:
        |  - name: a
        |    from: c1
        |fallback:
        |  collection: documentos
        |  key: expediente_url
        |  domain: "https://www.example.org"
        |""".stripMargin)
    assert(cfg.fallback.contains(
      FallbackSpec("documentos", "expediente_url", "https://www.example.org")))
  }

  // --- Reference-vocabulary round-trip (configs/colombia.yml shape) ----

  /** What configs/colombia_like.yml must bind to, hand-built. */
  private val colombiaLike = DatasetConfig(
    name = "proyectos",
    lookupKey = "no_camara",
    hashFields = Seq("no_camara", "no_senado", "proyecto", "detail_url"),
    fields = Seq(
      FieldSpec("no_camara", from = "cells", kind = "cell_at", index = 1),
      FieldSpec("no_senado", from = "cells", kind = "cell_at", index = 2),
      FieldSpec("proyecto", from = "cells", kind = "cell_at", index = 3),
      FieldSpec("estado", from = "cells", kind = "cell_at", index = 4),
      FieldSpec("detail_url", from = "hrefs", kind = "cell_at", index = 3),
      FieldSpec("documentos", from = "html", kind = "xpath",
        xpath = "//a[contains(translate(text(),'VER DOCUMENTO','ver documento')" +
          ",'ver documento') or contains(@href,'.pdf')]",
        attr = "href", multiple = true, labelAttr = "text"),
      FieldSpec("titulo_detalle", from = "html", kind = "xpath",
        xpath = "//h1/text()"),
      FieldSpec("fecha_camara", from = "text", kind = "findall",
        pattern = "([0-9]{4}-[0-9]{2}-[0-9]{2})", index = 0),
      FieldSpec("fecha_senado", from = "text", kind = "findall",
        pattern = "([0-9]{4}-[0-9]{2}-[0-9]{2})", index = 1),
      FieldSpec("fecha_presentacion_detalle", from = "html", kind = "xpath",
        xpath = "//span/text()", pattern = "([0-9]{2}/[0-9]{2}/[0-9]{4})"),
      FieldSpec("objeto", from = "text", kind = "regex",
        pattern = "Objeto:\\s*([a-z ]+)")),
    classifier = Some(ClassifierConfig(Nil, Nil, "titulo_detalle", "objeto")),
    storageColumns = Seq("no_camara", "no_senado", "proyecto", "estado",
      "titulo_detalle", "fecha_camara", "objeto", "documentos", "sector",
      "row_hash"),
    hashCol = "row_hash")

  test("reference selectors/storage vocabulary loads to the expected config") {
    val loaded = ConfigLoader.load("configs/colombia_like.yml")
    assert(loaded == colombiaLike)
  }

  test("reference storage blocks bind to JDBC table specs") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("configs/colombia_like.yml")), "UTF-8")
    val raw = ConfigLoader.storageTable(src, "raw")
    assert(raw.table == "proyectos_raw" && raw.primaryKey == "row_hash" &&
      raw.lookupKey == "no_camara" && raw.insertExclude == Set("last_seen"))
    assert(raw.columns == Seq(
      "no_camara" -> "TEXT", "row_hash" -> "TEXT NOT NULL",
      "last_seen" -> "TIMESTAMP NOT NULL DEFAULT NOW()"))
    assert(raw.insertColumns == Seq("no_camara", "row_hash"))
    val fin = ConfigLoader.storageTable(src, "final")
    assert(fin.table == "proyectos" && fin.insertExclude.isEmpty &&
      fin.columns.map(_._1) == colombiaLike.storageColumns)
    assert(fin.declaredType("documentos") == "JSONB")
  }

  test("a reference-shaped config drives Pipeline.run end-to-end") {
    val spark = TestSpark.spark
    import spark.implicits._
    val cfg = ConfigLoader.load("configs/colombia_like.yml")
    val raw = Seq(
      (Seq("101", "12", "Ley Uno", "tramite"), Seq(null, null, "/ley/101"),
       "<div><h1>Ley minera</h1><a href=\"/d1.pdf\">ver</a><span>01/02/2021</span></div>",
       "presentado 2021-02-01 luego 2021-03-15 Objeto: regular mineria fin"),
      (Seq("102", "13", "Ley Dos", "tramite"), Seq(null, null, "/ley/102"),
       "<div><h1>Ley salud</h1></div>",
       "sin fechas aqui")
    ).toDF("cells", "hrefs", "html", "text")
    val state = Seq.empty[(String, String)].toDF("no_camara", "row_hash")
    val out = Pipeline.run(raw, state, cfg, gated = false)
    val rows = out.collect().map(r => r.getAs[String]("no_camara") -> r).toMap
    val r1 = rows("101")
    assert(r1.getAs[String]("proyecto") == "Ley Uno")
    assert(r1.getAs[String]("detail_url") == "/ley/101")
    // the reference's labeled-link form: {label, url} structs
    assert(r1.getSeq[org.apache.spark.sql.Row](r1.fieldIndex("documentos"))
      .map(d => (d.getAs[String]("label"), d.getAs[String]("url")))
      .toList == List(("ver", "/d1.pdf")))
    assert(r1.getAs[String]("titulo_detalle") == "Ley minera")
    assert(r1.getAs[String]("fecha_camara") == "2021-02-01")
    assert(r1.getAs[String]("fecha_senado") == "2021-03-15")
    assert(r1.getAs[String]("fecha_presentacion_detalle") == "01/02/2021")
    assert(r1.getAs[String]("objeto") == "regular mineria fin")
    // no rules + no categories → every detail row takes the default label
    assert(r1.getAs[String]("sector") == "otros")
    assert(r1.getAs[String]("route") == "detail")
    val r2 = rows("102")
    assert(r2.getAs[String]("fecha_camara") == null) // findall miss → NULL
    assert(r2.getSeq[org.apache.spark.sql.Row](r2.fieldIndex("documentos")).isEmpty)
    // fingerprint replays over the configured hash subset
    val expectedHash = Seq(("x", 1)).toDF("a", "b").select(
      graft.operators.Fingerprint.rowHash(Seq(
        org.apache.spark.sql.functions.lit("101"),
        org.apache.spark.sql.functions.lit("12"),
        org.apache.spark.sql.functions.lit("Ley Uno"),
        org.apache.spark.sql.functions.lit("/ley/101")))).as[String].head()
    assert(r1.getAs[String]("row_hash") == expectedHash)
  }

  test("q83 pipeline output is identical via the YAML path") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val cfg = ConfigLoader.load("configs/docs_e2e.yml")
    val viaYaml = Pipeline.run(
      CorePack.e2eRaw(spark, dir), CorePack.e2eState(spark, dir), cfg,
      gated = false)
    val viaCode = Pipeline.run(
      CorePack.e2eRaw(spark, dir), CorePack.e2eState(spark, dir),
      CorePack.e2eConfig, gated = false)
    assert(viaYaml.schema == viaCode.schema)
    assert(viaYaml.exceptAll(viaCode).isEmpty && viaCode.exceptAll(viaYaml).isEmpty)
  }
}
