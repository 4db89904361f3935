package graft.config

import graft.operators.Classify.Rule

/** Typed configuration mirroring the reference's YAML semantics
  * (SURVEY §1.2 — configs/colombia.yml / configs/peru.yml interpreted by
  * src/scrapers/config_loader.py:10-21, list_parser.py:24-28,
  * detail_parser.py:24-95, storage.py:27-53, classifier.py:40-72).
  *
  * Deliberate design change from the reference (SURVEY §5): config is
  * plain constructor data, not import-time global state — the reference's
  * module-level config loading forces sys.modules surgery in its own tests
  * (tests/test_classifier.py:40-68); ours injects cleanly.
  */

/** One extracted field — the Spark mapping of a `selectors.*.fields` entry.
  * `kind` selects the P1–P10 interpreter branch:
  *  - "cell": trim of a source column (P1, list_parser.py:46-48)
  *  - "cell_at": trim of the `index`-th (1-based) element of an array
  *    source column — the `td:nth-child(N)` positional list selector
  *    (configs/colombia.yml:45-53); short rows yield NULL
  *  - "regex": capture group with ''→miss fallback chain (P5/P10)
  *  - "findall": n-th match of a repeated pattern (P8, 0-based index)
  *  - "block_after": regex applied after a literal anchor (P9)
  *  - "xpath": node text / attribute extraction from a markup column
  *    (P6, detail_parser.py:24-77) — `xpath` selects nodes, `attr`
  *    switches to an attribute value, `pattern` optionally refines each
  *    value with a regex capture, and `multiple = true` yields the
  *    DEDUPLICATED array of all non-empty matches instead of the first
  *    (the reference's set-valued `multiple: true` with `seen`-set dedup)
  *  - "xpath" + `labelAttr` (with `attr` + `multiple`): the reference's
  *    labeled-link form (configs/colombia.yml:64-68 `label_attr`,
  *    detail_parser.py:40-62) — each matched node yields a
  *    {label, url} STRUCT (url = @`attr`, label = node text for
  *    `labelAttr = "text"`, else @`labelAttr`), empty-url matches
  *    dropped, keep-FIRST dedup by url (the reference's `seen` set in
  *    document order). Deviation, documented: the reference appends the
  *    raw string for matches without the url attr (a mixed-type list);
  *    a typed engine drops them instead — the attr-presence predicate
  *    is folded into both node selections so label/url stay aligned.
  *    A NON-text `labelAttr` aligns only when every url-bearing match
  *    also carries the label attribute (missing label attrs shift the
  *    label node set); `labelAttr = "text"` has no such constraint.
  *  - "const_null": unknown-spec null (P11, detail_parser.py:93-95)
  */
final case class FieldSpec(
    name: String,
    from: String,
    kind: String = "cell",
    pattern: String = "",
    group: Int = 1,
    index: Int = 0,
    anchor: String = "",
    fallbacks: Seq[String] = Nil,
    xpath: String = "",
    attr: String = "",
    multiple: Boolean = false,
    labelAttr: String = "")

/** S3 fallback-source stage config (reference detail_parser.py:97-119):
  * when `collection` is empty and `key` is present, fill the collection
  * from a secondary source joined on the key absolutized against `domain`
  * and forced https. The secondary frame itself is runtime data, passed to
  * [[graft.Pipeline.run]] alongside the config; `secondaryKey` /
  * `secondaryValue` name its lookup and value-array columns. */
final case class FallbackSpec(
    collection: String,
    key: String,
    domain: String,
    secondaryKey: String = "url",
    secondaryValue: String = "links")

/** Date column normalization (C6): accepted parse formats in try-order
  * (configs/colombia.yml:72-78 `yyyy-MM-dd`, peru.yml:65-67 `dd/MM/yyyy`). */
final case class DateSpec(name: String, formats: Seq[String])

/** Classifier config (configs/classifier.yml + per-country columns,
  * configs/colombia.yml:118-120). */
final case class ClassifierConfig(
    rules: Seq[Rule],
    categories: Seq[String],
    titleCol: String,
    detailCol: String,
    outputCol: String = "sector")

/** One dataset ("country") — the unit the reference configures per YAML:
  * projection fields, lookup key, fingerprint field subset, date specs,
  * column renames, classifier wiring, and the stored-columns whitelist the
  * upsert prunes to (storage.py:41-53). */
final case class DatasetConfig(
    name: String,
    lookupKey: String,
    hashFields: Seq[String],
    fields: Seq[FieldSpec],
    dates: Seq[DateSpec] = Nil,
    renames: Map[String, String] = Map.empty,
    classifier: Option[ClassifierConfig] = None,
    storageColumns: Seq[String] = Nil,
    hashCol: String = "row_hash",
    fallback: Option[FallbackSpec] = None)
