package graft.config

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import graft.operators.Classify.Rule
import graft.config.Yaml.{MapNode, Node}

/** YAML → [[DatasetConfig]] binding — the Spark-side equivalent of the
  * reference's `load_country_config` (src/scrapers/config_loader.py:10-21)
  * plus the scattered dict reads that interpret the tree
  * (list_parser.py:24-28, detail_parser.py:24-95, classifier.py:40-72,
  * storage.py:27-53).
  *
  * Key vocabulary follows the reference configs where a counterpart
  * exists: `hash: {key, fields}` (colombia.yml selectors.list.hash),
  * `classifier: {titulo, detalle}` (colombia.yml classifier block),
  * `rules: [- {pattern, category}]` / `categories:` (classifier.yml),
  * per-field `xpath`/`attr`/`multiple`/`regex`/`find_all`/`index`
  * (colombia.yml selectors.detail.fields). Storage columns may be given
  * either as a plain list or as the reference's `name: TYPE` map
  * (colombia.yml storage.final.columns), in which case the keys are taken
  * in order.
  */
object ConfigLoader {

  def load(path: String): DatasetConfig = load(Paths.get(path))

  def load(path: Path): DatasetConfig =
    fromYaml(new String(Files.readAllBytes(path), StandardCharsets.UTF_8))

  def fromYaml(source: String): DatasetConfig = {
    val root = asMap(Yaml.parse(source))
    // The reference's nested vocabulary (configs/colombia.yml, peru.yml):
    // `selectors.list.fields` (td:nth-child(N) positional selectors +
    // detail_link_selector), `selectors.list.hash`, `selectors.detail
    // .fields` (xpath/attr/multiple/regex/find_all specs), and
    // `storage.raw|final.{table, primary_key, lookup_key, columns}` —
    // accepted alongside graft's flat form, so a reference YAML drives
    // Pipeline.run without translation.
    val listSel = root.get("selectors").map(asMap)
      .flatMap(_.get("list")).map(asMap)
    val detailSel = root.get("selectors").map(asMap)
      .flatMap(_.get("detail")).map(asMap)
    val storageFinal = root.get("storage").map(asMap)
      .flatMap(_.get("final")).map(asMap)
    val storageRaw = root.get("storage").map(asMap)
      .flatMap(_.get("raw")).map(asMap)
    val hashNode = root.get("hash").orElse(listSel.flatMap(_.get("hash")))
      .map(asMap)
    val selectorFields: Seq[FieldSpec] =
      listSel.toSeq.flatMap(l => l.get("fields").toSeq.flatMap(f =>
        asMap(f).entries.map { case (n, sel) => listFieldSpec(n, str(sel)) })) ++
      listSel.toSeq.flatMap(_.get("detail_link_selector").map(sel =>
        linkFieldSpec("detail_url", str(sel)))) ++
      detailSel.toSeq.flatMap(d => d.get("fields").toSeq.flatMap(f =>
        asMap(f).entries.map { case (n, spec) => detailFieldSpec(n, asMap(spec)) }))
    DatasetConfig(
      name = root.get("name").map(str)
        .orElse(storageFinal.flatMap(_.get("table")).map(str))
        .getOrElse("dataset"),
      lookupKey = root.get("lookup_key").map(str)
        .orElse(storageFinal.flatMap(_.get("lookup_key")).map(str))
        .orElse(storageRaw.flatMap(_.get("lookup_key")).map(str))
        .getOrElse(sys.error("config has no lookup_key (root or storage.*)")),
      hashFields = hashNode.map(h => strList(h("fields"))).getOrElse(Nil),
      fields = root.get("fields").map(_.asList.map(f => fieldSpec(asMap(f))))
        .getOrElse {
          if (selectorFields.nonEmpty) selectorFields
          else sys.error("config has no 'fields' or 'selectors'")
        },
      dates = root.get("dates").toSeq.flatMap(_.asList.map { d =>
        val m = asMap(d)
        DateSpec(str(m("name")), strList(m("formats")))
      }),
      renames = root.get("renames").map(m =>
        asMap(m).entries.map { case (k, v) => k -> str(v) }.toMap)
        .getOrElse(Map.empty),
      classifier = root.get("classifier").map(c => classifierConfig(asMap(c))),
      storageColumns = root.get("storage").toSeq.flatMap { s =>
        // reference shape: storage.final.columns is a `name: TYPE` map
        // (colombia.yml:99-117) under a raw/final split; a flat
        // `storage.columns` (map or plain list) is also accepted
        val sm = asMap(s)
        sm.get("final").map(f => asMap(f)("columns"))
          .orElse(sm.get("columns")).toSeq.flatMap {
            case m: MapNode => m.entries.map(_._1)
            case other      => strList(other)
          }
      },
      hashCol = hashNode.flatMap(_.get("key")).map(str).getOrElse("row_hash"),
      fallback = root.get("fallback").map { f =>
        val m = asMap(f)
        FallbackSpec(
          collection = str(m("collection")),
          key = str(m("key")),
          domain = str(m("domain")),
          secondaryKey = m.get("secondary_key").map(str).getOrElse("url"),
          secondaryValue = m.get("secondary_value").map(str).getOrElse("links"))
      })
  }

  /** Bind a reference-shaped `storage.raw` / `storage.final` block
    * (configs/colombia.yml:84-117) to a JDBC table spec. The raw table
    * excludes `last_seen` from the upsert so the DB default fills it —
    * exactly storage.py:46-48's special case. */
  def storageTable(source: String, section: String): graft.sources.JdbcUpsert.TableSpec = {
    val root = asMap(Yaml.parse(source))
    val sm = asMap(asMap(root("storage"))(section))
    graft.sources.JdbcUpsert.TableSpec(
      table = str(sm("table")),
      columns = asMap(sm("columns")).entries.map { case (k, v) => k -> str(v) },
      primaryKey = str(sm("primary_key")),
      lookupKey = str(sm("lookup_key")),
      insertExclude = if (section == "raw") Set("last_seen") else Set.empty)
  }

  private val NthChild = """td:nth-child\((\d+)\)(\s+a)?""".r

  /** A `selectors.list.fields` entry — `name: "td:nth-child(N)"`
    * (configs/colombia.yml:45-53) → 1-based positional cell over the
    * row's cell-text array column `cells`. */
  private def listFieldSpec(name: String, selector: String): FieldSpec =
    selector.trim match {
      case NthChild(n, null) =>
        FieldSpec(name, from = "cells", kind = "cell_at", index = n.toInt)
      case other => sys.error(
        s"unsupported list selector for '$name': '$other' (expected td:nth-child(N))")
    }

  /** `detail_link_selector: "td:nth-child(N) a"` (colombia.yml:38) — the
    * link href of the N-th cell, read from the parallel `hrefs` array the
    * row scan carries alongside `cells`. */
  private def linkFieldSpec(name: String, selector: String): FieldSpec =
    selector.trim match {
      case NthChild(n, _) =>
        FieldSpec(name, from = "hrefs", kind = "cell_at", index = n.toInt)
      case other => sys.error(
        s"unsupported detail-link selector: '$other' (expected td:nth-child(N) a)")
    }

  /** A `selectors.detail.fields` entry (colombia.yml:66-86,
    * peru.yml:57-73): xpath specs read the fetched page's markup column
    * (`html`), regex/find_all specs its text (`text`); an explicit `from`
    * overrides. xpath+regex compose as node-set extraction then per-value
    * capture refine, exactly the reference's two-step. */
  /** Fail loudly on a labeled-link spec that cannot mean what it says:
    * `label_attr` only has semantics as xpath + `attr` + `multiple: true`
    * (Pipeline.labeled). Anything else used to fall through silently to
    * the plain xpath path, dropping the labels (ADVICE r7) — a config
    * error must be an error, not a degraded column. */
  private def validated(s: FieldSpec): FieldSpec = {
    if (s.labelAttr.nonEmpty)
      require(s.kind == "xpath" && s.attr.nonEmpty && s.multiple,
        s"field '${s.name}': label_attr requires xpath + attr + " +
          s"multiple: true (got kind=${s.kind}, attr='${s.attr}', " +
          s"multiple=${s.multiple})")
    s
  }

  private def detailFieldSpec(name: String, m: MapNode): FieldSpec = {
    val kind =
      if (m.get("xpath").isDefined) "xpath"
      else if (bool(m, "find_all")) "findall"
      else if (m.get("regex").isDefined) "regex"
      else "const_null"
    validated(FieldSpec(
      name = name,
      from = m.get("from").map(str)
        .getOrElse(if (kind == "xpath") "html" else "text"),
      kind = kind,
      pattern = m.get("regex").map(str).getOrElse(""),
      group = m.get("group").map(int).getOrElse(1),
      index = m.get("index").map(int).getOrElse(0),
      xpath = m.get("xpath").map(str).getOrElse(""),
      attr = m.get("attr").map(str).getOrElse(""),
      multiple = bool(m, "multiple"),
      labelAttr = m.get("label_attr").map(str).getOrElse("")))
  }

  /** One `fields:` entry → [[FieldSpec]]. `kind` may be given explicitly
    * or inferred the way the reference's parser dispatches on present keys
    * (detail_parser.py:24-95: xpath → node extraction, find_all → indexed
    * findall, regex alone → single capture, none → positional cell). */
  private def fieldSpec(m: MapNode): FieldSpec = {
    val explicit = m.get("kind").map(str)
    val kind = explicit.getOrElse {
      if (m.get("xpath").isDefined) "xpath"
      else if (bool(m, "find_all")) "findall"
      else if (m.get("anchor").isDefined) "block_after"
      else if (m.get("regex").isDefined || m.get("pattern").isDefined) "regex"
      else "cell"
    }
    validated(FieldSpec(
      name = str(m("name")),
      from = str(m("from")),
      kind = kind,
      pattern = m.get("pattern").orElse(m.get("regex")).map(str).getOrElse(""),
      group = m.get("group").map(int).getOrElse(1),
      index = m.get("index").map(int).getOrElse(0),
      anchor = m.get("anchor").map(str).getOrElse(""),
      fallbacks = m.get("fallbacks").toSeq.flatMap(strList),
      xpath = m.get("xpath").map(str).getOrElse(""),
      attr = m.get("attr").map(str).getOrElse(""),
      multiple = bool(m, "multiple"),
      labelAttr = m.get("label_attr").map(str).getOrElse("")))
  }

  /** Rules/categories are optional: the reference's per-country configs
    * carry only the column binding (colombia.yml:118-120 `titulo` /
    * `detalle`); the rule set lives in a separate classifier.yml. With no
    * rules and no categories every row classifies to the default label
    * (Classify.stub/domainCoerce are empty-safe). */
  private def classifierConfig(m: MapNode): ClassifierConfig =
    ClassifierConfig(
      rules = m.get("rules").toSeq.flatMap(_.asList.map { r =>
        val rm = asMap(r)
        Rule(str(rm("pattern")), str(rm("category")))
      }),
      categories = m.get("categories").map(strList).getOrElse(Nil),
      titleCol = str(m("titulo")),
      detailCol = str(m("detalle")),
      outputCol = m.get("output").map(str).getOrElse("sector"))

  private def asMap(n: Node): MapNode = n match {
    case m: MapNode => m
    case other      => sys.error(s"expected map, got $other")
  }
  private def str(n: Node): String = n.asString
  private def int(n: Node): Int = n.asString.toInt
  // YAML-1.1 boolean vocabulary (what the reference's safe_load accepts,
  // case-insensitive). Anything else fails loudly — a typo like "ture"
  // must not silently mean false.
  private val TrueWords = Set("true", "yes", "on", "1")
  private val FalseWords = Set("false", "no", "off", "0", "")

  private def bool(m: MapNode, key: String): Boolean =
    m.get(key).exists { v =>
      val w = v.asString.toLowerCase
      if (TrueWords(w)) true
      else if (FalseWords(w)) false
      else sys.error(s"key '$key': expected a boolean, got '${v.asString}'")
    }
  private def strList(n: Node): Seq[String] = n.asList.map(_.asString)
}
