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
