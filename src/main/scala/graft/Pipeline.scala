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

  /** P1–P11 interpreter: one projected column per [[FieldSpec]]
    * (reference list_parser.py:46-76, detail_parser.py:24-95). */
  def field(spec: FieldSpec): Column = {
    val src = col(spec.from)
    val base = spec.kind match {
      case "cell" => trim(src)
      case "regex" =>
        Projection.extractWithFallback(src, spec.pattern, spec.group,
          spec.fallbacks.map(col): _*)
      case "findall" =>
        Projection.indexedFindAll(src, spec.pattern, spec.group, spec.index)
      case "block_after" =>
        Projection.blockAfter(src, spec.anchor, spec.pattern, spec.group)
      case "xpath" =>
        // P6 (detail_parser.py:24-77): node set via one xpath() call —
        // `attr` folds into the path (node.get(attr) ≙ selecting @attr),
        // `pattern` refines each value like the reference's regex step.
        // Single form: first node, '' when absent (→ NULL after C4).
        // Multiple form: all non-empty refined values, deduplicated
        // (array_distinct ≙ the reference's `seen` set).
        val path = if (spec.attr.nonEmpty) s"${spec.xpath}/@${spec.attr}"
                   else spec.xpath
        val nodes = xpath(src, lit(path))
        def refine(c: Column): Column =
          if (spec.pattern.isEmpty) trim(c)
          else regexp_extract(trim(c), spec.pattern, spec.group)
        if (spec.multiple)
          array_distinct(filter(transform(nodes, refine(_)), v => v =!= ""))
        else refine(coalesce(get(nodes, lit(0)), lit("")))
      case "const_null" => lit(null).cast("string")
      case other => throw new IllegalArgumentException(s"unknown field kind: $other")
    }
    base.as(spec.name)
  }

  /** Projection stage: configured fields only (column pruning reaches the
    * scan), plus any passthrough columns the caller names. */
  def project(df: DataFrame, cfg: DatasetConfig,
              passthrough: Seq[String] = Nil): DataFrame =
    df.select(passthrough.map(col) ++ cfg.fields.map(field): _*)

  /** Cleaning stage (C1–C6): rename legacy keys, trim + require-nonblank
    * lookup key, ''→NULL on all string fields, multi-format date parse. */
  def clean(df: DataFrame, cfg: DatasetConfig): DataFrame = {
    val renamed = cfg.renames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
    val keyed = Cleaning.requireNonBlank(
      Cleaning.trimmed(renamed, Seq(cfg.lookupKey)), cfg.lookupKey)
    val nulled = keyed.schema.fields.foldLeft(keyed) { (d, f) =>
      if (f.dataType.typeName == "string" && f.name != cfg.lookupKey)
        d.withColumn(f.name, Cleaning.emptyToNull(col(f.name)))
      else d
    }
    cfg.dates.foldLeft(nulled) { (d, ds) =>
      d.withColumn(ds.name, Cleaning.parseDate(col(ds.name), ds.formats))
    }
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

  /** End-to-end run (SURVEY §3.1 master DAG): returns the merged frame of
    * enriched to-detail rows and bypass rows, with a `route` marker.
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
    val (toDetail, bypass) = delta(staged, state, cfg)
    def full = Delta.merge(
      classify(fallback(toDetail, cfg, secondary), cfg)
        .withColumn("route", lit("detail")),
      bypass.withColumn("route", lit("bypass")))
    if (gated) Delta.gate(toDetail)(full)(bypass.withColumn("route", lit("bypass")))
    else full
  }
}
