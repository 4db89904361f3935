package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.config.{DatasetConfig, FieldSpec}
import graft.operators._

/** The reference's whole DAG as one lazy Spark plan (SURVEY §3):
  * scan → config-driven projection → cleaning → fingerprint → delta split
  * (gated) → classification → keep-first upsert-prep. Each stage is a
  * `DataFrame => DataFrame` built from the operator library; composition
  * is lazy, so Catalyst optimizes across stage boundaries (the reference
  * pays a process hop + JSON round-trip per stage, SURVEY §3.1).
  *
  * Scale: stages are all expression work except the delta join (one
  * shuffle on the lookup key) and the final dedup window (one shuffle on
  * the PK) — the minimum shuffle count the semantics admit.
  */
object Pipeline {

  /** The effective xpath for a spec — `attr` folds into the path
    * (node.get(attr) ≙ selecting @attr). */
  private def xpathOf(spec: FieldSpec): String =
    if (spec.attr.nonEmpty) s"${spec.xpath}/@${spec.attr}" else spec.xpath

  /** A labeled-link spec (detail_parser.py:40-62 `label_attr`): each
    * matched node yields a {label, url} struct. This needs the element
    * STRING-VALUE alongside an attribute per node — inexpressible as a
    * zip of `xpath()` calls (element nodes have NULL getNodeValue, and
    * attr-less matches shift the zip) — so it evaluates through the
    * dedicated one-DOM-pass [[graft.functions.XmlLabeledLinks]]. */
  private def labeled(spec: FieldSpec): Boolean =
    spec.kind == "xpath" && spec.labelAttr.nonEmpty &&
      spec.attr.nonEmpty && spec.multiple

  /** P6 post-processing over an already-extracted node set:
    * `pattern` refines each value like the reference's regex step.
    * Single form: first node, '' when absent (→ NULL after C4).
    * Multiple form: all non-empty refined values, deduplicated
    * (array_distinct ≙ the reference's `seen` set). */
  private def xpathField(spec: FieldSpec, nodes: Column): Column = {
    def refine(c: Column): Column =
      if (spec.pattern.isEmpty) trim(c)
      else regexp_extract(trim(c), spec.pattern, spec.group)
    if (spec.multiple)
      array_distinct(filter(transform(nodes, refine(_)), v => v =!= ""))
    else refine(coalesce(get(nodes, lit(0)), lit("")))
  }

  /** P1–P11 interpreter: one projected column per [[FieldSpec]]
    * (reference list_parser.py:46-76, detail_parser.py:24-95). */
  def field(spec: FieldSpec): Column = {
    val src = col(spec.from)
    val base = spec.kind match {
      case "cell" => trim(src)
      case "cell_at" =>
        // P1 positional form (the reference's `td:nth-child(N)` list
        // selectors, configs/colombia.yml:45-53): `from` is the row's
        // cell-text array, `index` the 1-based cell position; a short row
        // yields NULL (the reference skips rows with missing cells).
        trim(try_element_at(src, lit(spec.index)))
      case "regex" =>
        Projection.extractWithFallback(src, spec.pattern, spec.group,
          spec.fallbacks.map(col): _*)
      case "findall" =>
        Projection.indexedFindAll(src, spec.pattern, spec.group, spec.index)
      case "block_after" =>
        Projection.blockAfter(src, spec.anchor, spec.pattern, spec.group)
      case "xpath" if labeled(spec) =>
        // P7 labeled-link form: one DOM pass emits {label, url} pairs.
        graft.functions.XmlFunctions
          .xmlLabeledLinks(src, spec.xpath, spec.attr, spec.labelAttr)
      case "xpath" =>
        // P6 (detail_parser.py:24-77): node set via one xpath() call.
        xpathField(spec, xpath(src, lit(xpathOf(spec))))
      case "const_null" => lit(null).cast("string")
      case other => throw new IllegalArgumentException(s"unknown field kind: $other")
    }
    base.as(spec.name)
  }

  /** Projection stage: configured fields only (column pruning reaches the
    * scan), plus any passthrough columns the caller names.
    *
    * When several xpath specs read the SAME source column, the document is
    * parsed ONCE per row ([[graft.functions.XmlFields]]) and every spec's
    * node set comes from that parse — the reference's lxml shape (one
    * tree, many selectors) instead of the builtin xpath()'s parse-per-
    * call. The intermediate struct lives in a producer projection that
    * Catalyst keeps separate (a non-cheap expression referenced k times is
    * not collapse-inlined), so the parse genuinely happens once. */
  def project(df0: DataFrame, cfg: DatasetConfig,
              passthrough: Seq[String] = Nil): DataFrame = {
    // The config-driven projection is the pipeline's CPU stage (markup
    // parse + regex per field). A narrow input (small file = one scan
    // split) would serialize it on one core; at corpus scale the fan-out
    // is a no-op. See Parallelize.fanOutIfNarrow.
    val df = Parallelize.fanOutIfNarrow(df0)
    // labeled specs evaluate through their own one-pass expression and
    // never join the shared node-value parse
    val shared = cfg.fields.filter(s => s.kind == "xpath" && !labeled(s))
      .groupBy(_.from).filter(_._2.size >= 2)
    if (shared.isEmpty)
      df.select(passthrough.map(col) ++ cfg.fields.map(field): _*)
    else {
      val producers = shared.toSeq.sortBy(_._1).map { case (src, specs) =>
        (src, specs, s"__xml_$src")
      }
      val base = df.select(df.columns.toIndexedSeq.map(col) ++ producers.map {
        case (src, specs, alias) =>
          graft.functions.XmlFunctions
            .xmlFields(col(src), specs.map(xpathOf)).as(alias)
      }: _*)
      val out = passthrough.map(col) ++ cfg.fields.map { spec =>
        if (spec.kind == "xpath" && !labeled(spec) && shared.contains(spec.from)) {
          val (_, specs, alias) = producers.find(_._1 == spec.from).get
          xpathField(spec, col(alias).getField(s"p${specs.indexOf(spec)}"))
            .as(spec.name)
        } else field(spec)
      }
      base.select(out: _*)
    }
  }

  /** Cleaning stage (C1–C6): rename legacy keys, trim + require-nonblank
    * lookup key, ''→NULL on all string fields, multi-format date parse.
    *
    * One `select` over the whole schema, not a `withColumn` per field — a
    * withColumn chain re-analyzes the full (already large) plan per call,
    * which made the e2e pipeline's driver-side cost quadratic in field
    * count. Semantics are unchanged: key trim → ''→NULL → date parse,
    * composed per column in that order. */
  def clean(df: DataFrame, cfg: DatasetConfig): DataFrame = {
    val renames = cfg.renames.toMap
    val dateFormats = cfg.dates.map(d => d.name -> d.formats).toMap
    val cleaned = df.schema.fields.map { f =>
      val name = renames.getOrElse(f.name, f.name)
      var c: Column = col(f.name)
      if (name == cfg.lookupKey) c = trim(c)
      else if (f.dataType.typeName == "string") c = Cleaning.emptyToNull(c)
      dateFormats.get(name).foreach(fmts => c = Cleaning.parseDate(c, fmts))
      c.as(name)
    }
    Cleaning.requireNonBlank(df.select(cleaned.toSeq: _*), cfg.lookupKey)
  }

  /** Fingerprint stage (H1/H2): canonical hash over the configured subset;
    * missing configured fields contribute '' exactly like the reference
    * (scraper.py:54). */
  def fingerprint(df: DataFrame, cfg: DatasetConfig): DataFrame =
    df.withColumn(cfg.hashCol, Fingerprint.rowHash(
      cfg.hashFields.map(f =>
        if (df.columns.contains(f)) col(f) else lit(""))))

  /** Delta stage (J1/J2): split against stored state; bypass rows skip all
    * downstream enrichment (the reference's whole point). */
  def delta(fresh: DataFrame, state: DataFrame,
            cfg: DatasetConfig): (DataFrame, DataFrame) =
    Delta.split(fresh, state, Seq(cfg.lookupKey), cfg.hashCol)

  /** Fallback-source stage (S3, reference detail_parser.py:97-119): fill
    * an empty collection from the secondary source per [[FallbackSpec]].
    * No-op when the config has no fallback block or no secondary frame was
    * supplied (the reference likewise skips when there is no expediente
    * link). Runs on the to-detail branch only — the reference's fallback
    * fetch happens inside detail parsing, which delta-skipped rows never
    * reach. */
  def fallback(df: DataFrame, cfg: DatasetConfig,
               secondary: Option[DataFrame]): DataFrame =
    (cfg.fallback, secondary) match {
      case (Some(fs), Some(sec)) =>
        Enrich.fallbackCollection(df, sec, fs.collection, fs.key,
          fs.secondaryKey, fs.secondaryValue, fs.domain)
      case _ => df
    }

  /** Classification stage (K1–K4): rule pass over lowercased title+detail,
    * stub fallback for unresolved rows, domain coercion. */
  def classify(df: DataFrame, cfg: DatasetConfig): DataFrame =
    cfg.classifier.fold(df) { c =>
      val text = lower(concat_ws(" ", col(c.titleCol), col(c.detailCol)))
      df.withColumn(c.outputCol,
        Classify.domainCoerce(
          Classify.route(Classify.byRules(text, c.rules),
            Classify.stub(text, c.categories)),
          c.categories))
    }

  /** Upsert-prep stage (W2/W3): prune to stored columns, in-batch PK dedup
    * keep-first under an explicit arrival order. The PK here is the
    * FINGERPRINT, not the lookup key — the reference's raw and final
    * tables are both `primary_key: row_hash` (configs/colombia.yml:86-93,
    * storage.py:108-117); two same-lookup-key rows with different content
    * are distinct physical rows by design, superseded via the delta path. */
  def upsertPrep(df: DataFrame, cfg: DatasetConfig,
                 arrivalOrder: Seq[Column]): DataFrame = {
    val pruned =
      if (cfg.storageColumns.isEmpty) df
      else df.select(cfg.storageColumns.filter(df.columns.contains).map(col): _*)
    Upsert.keepFirst(pruned, Seq(cfg.hashCol), arrivalOrder)
  }

  /** End-to-end run (SURVEY §3.1 master DAG): the merged frame of enriched
    * to-detail rows and bypass rows, with a `route` marker.
    *
    * FUSED plan: one left join against state, then `when(changed, …)`
    * expressions for the detail-only stages — not filter/filter/union. The
    * union form embedded the whole fresh-side subtree twice (once per
    * branch), doubling Catalyst optimization and codegen cost for zero
    * execution benefit; with the flag form the detail stages are a
    * conditional expression (classify) and a null-keyed left join
    * (fallback — bypass rows probe with a NULL key and stream through
    * unmatched), so each source row is scanned and shuffled exactly once.
    * Row/column semantics are identical to the union form: bypass rows
    * carry NULL in classifier output columns (what unionByName's missing-
    * column fill produced) and keep their collections untouched.
    *
    * `gated = true` reproduces the reference's cross-job ShortCircuit
    * (J2): an eager isEmpty probe skips the classify stage when the delta
    * is empty — the right shape when classify is a real foreign call.
    * `gated = false` keeps everything one lazy plan (no job at
    * construction; Catalyst's PropagateEmptyRelation provides the
    * short-circuit inside the plan) — the right shape for declared
    * queries and benchmarks. */
  def run(raw: DataFrame, state: DataFrame, cfg: DatasetConfig,
          passthrough: Seq[String] = Nil, gated: Boolean = true,
          secondary: Option[DataFrame] = None): DataFrame = {
    val staged = fingerprint(clean(project(raw, cfg, passthrough), cfg), cfg)
    val st = state.select(col(cfg.lookupKey), col(cfg.hashCol).as("__state_hash"))
    val joined = staged.join(st, Seq(cfg.lookupKey), "left")
    val changed = col("__state_hash").isNull ||
      col("__state_hash") =!= col(cfg.hashCol)
    def fused: DataFrame = {
      val fb = (cfg.fallback, secondary) match {
        case (Some(fs), Some(sec)) =>
          Enrich.fallbackCollection(joined, sec, fs.collection, fs.key,
            fs.secondaryKey, fs.secondaryValue, fs.domain, gate = changed)
        case _ => joined
      }
      val classified = cfg.classifier.fold(fb) { c =>
        val text = lower(concat_ws(" ", col(c.titleCol), col(c.detailCol)))
        fb.withColumn(c.outputCol,
          when(changed,
            Classify.domainCoerce(
              Classify.route(Classify.byRules(text, c.rules),
                Classify.stub(text, c.categories)),
              c.categories)))
      }
      classified
        .withColumn("route", when(changed, lit("detail")).otherwise(lit("bypass")))
        .drop("__state_hash")
    }
    if (gated)
      Delta.gate(joined.filter(changed))(fused)(
        joined.filter(col("__state_hash") === col(cfg.hashCol))
          .drop("__state_hash").withColumn("route", lit("bypass")))
    else fused
  }
}
