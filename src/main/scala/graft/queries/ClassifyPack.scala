package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Classify
import graft.operators.Classify.Rule

/** Classifier queries — SURVEY §2.6 K1–K4 (reference src/classifier.py:52-156,
  * rules at configs/classifier.yml:23-47, categories :7-21).
  *
  * Rule matching runs over lowercased text (the reference compiles with
  * re.IGNORECASE, classifier.py:60; lowercasing the input instead keeps the
  * regexes dialect-portable — Java's (?i) is ASCII-only while RE2's is
  * Unicode-aware, and the rule list carries accented chars).
  *
  * The Spark CASE-WHEN chain and the oracle CASE are generated from ONE rule
  * list so first-match order (classifier.py:68-72) can never diverge.
  *
  * Scale: all three queries are row-local codegen'd expressions — no
  * shuffle, pushed projections; the md5-bucket stub is the oracle-checkable
  * stand-in for the batched LLM path ([[Classify.classifyBatched]]).
  */
object ClassifyPack extends QueryPack {

  /** Reference rule list (configs/classifier.yml:23-47), lowercase form,
    * followed by corpus-vocabulary rules so the synthetic `documents` text
    * exercises several categories (same first-match semantics). */
  val rules: Seq[Rule] = Seq(
    Rule("miner[ií]a|oro|gas|petr[oó]leo", "minero-energético"),
    Rule("software|tecnolog", "tecnología"),
    Rule("caf[eé]|agricultura", "agricultura"),
    Rule("servicio", "servicios"),
    Rule("transport", "transporte"),
    Rule("salud", "salud"),
    Rule("educaci[oó]n|educ", "educación"),
    Rule("financ", "financiero"),
    Rule("aliment", "alimentos"),
    Rule("creaci[óo]n.*distrito|distrito", "construcción"),
    Rule("tratado.*transpacífico|tratado", "financiero"),
    Rule("carretera|infraestructura", "transporte"),
    // corpus-vocabulary rules (synthetic documents.text tokens)
    Rule("vector.*spark|spark.*vector", "tecnología"),
    Rule("customer.*order", "servicios"),
    Rule("stream.*window", "telecomunicaciones"),
    Rule("scan.*table|table.*scan", "manufactura"),
  )

  /** The 14 allowed categories (configs/classifier.yml:7-21). */
  val categories: Seq[String] = Seq(
    "minero-energético", "servicios", "tecnología", "agricultura",
    "manufactura", "transporte", "salud", "educación", "telecomunicaciones",
    "construcción", "turismo", "financiero", "alimentos", "otros")

  /** Category universe with out-of-domain labels mixed in, to exercise K3's
    * coercion the way an unruly LLM response would (classifier.py:147-154). */
  private val noisyCategories: Seq[String] =
    categories.take(6) ++ Seq("desconocido", "INVALID") ++ categories.drop(6)

  def ruleCaseSql(textSql: String): String =
    rules.map(r => s"WHEN regexp_matches($textSql, '${r.pattern}') THEN '${r.category}'")
      .mkString("CASE ", " ", " ELSE '' END")

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // K1: ordered first-match rule classification; '' when no rule fires.
    "q15_rule_classify" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        Classify.byRules(lower(col("text")), rules).as("sector")))),

    // K1+K2+K4: rule pass, unresolved rows routed to the deterministic
    // LLM-stub (md5 bucket), mirroring classify_by_sector's two passes.
    "q16_batch_classify_stub" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "documents").select(
        col("doc_id"),
        Classify.route(
          Classify.byRules(lower(col("text")), rules),
          Classify.stub(col("text"), categories)).as("sector")))),

    // K3: out-of-domain labels coerced to 'otros'.
    "q17_domain_coerce" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "documents")
        .select(col("doc_id"),
          Classify.stub(col("text"), noisyCategories).as("raw_label"))
        .withColumn("sector", Classify.domainCoerce(col("raw_label"), categories)))),
  )

  override val oracleSql: Map[String, String] = Map(
    "q15_rule_classify" ->
      s"""SELECT doc_id, lang, ${ruleCaseSql("lower(text)")} AS sector
          FROM documents ORDER BY ALL NULLS FIRST""",

    "q16_batch_classify_stub" ->
      s"""SELECT doc_id,
                 coalesce(nullif(${ruleCaseSql("lower(text)")}, ''),
                          ${Classify.stubSql("text", categories)}) AS sector
          FROM documents ORDER BY ALL NULLS FIRST""",

    "q17_domain_coerce" ->
      s"""SELECT doc_id,
                 ${Classify.stubSql("text", noisyCategories)} AS raw_label,
                 CASE WHEN ${Classify.stubSql("text", noisyCategories)} IN (${categories.map(c => s"'$c'").mkString(", ")})
                      THEN ${Classify.stubSql("text", noisyCategories)}
                      ELSE 'otros' END AS sector
          FROM documents ORDER BY ALL NULLS FIRST""",
  )
}
