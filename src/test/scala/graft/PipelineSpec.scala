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
