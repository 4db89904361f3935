package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classify
import graft.operators.Classify.Rule
import graft.queries.ClassifyPack

/** Rule-classifier kernel tests — first-match order, case handling, miss →
  * '', domain coercion (reference src/classifier.py:52-72,147-154, covered
  * by its tests/test_classifier.py:75-114). */
class ClassifySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val rules = Seq(
    Rule("software|tecnolog", "tecnología"),
    Rule("servicio", "servicios"),
    Rule("salud", "salud"))

  private def classify(text: String, rs: Seq[Rule] = rules): String =
    Seq(text).toDF("t")
      .select(Classify.byRules(lower(col("t")), rs)).as[String].head()

  test("first matching rule wins (list order = CASE order)") {
    assert(classify("software de servicio") == "tecnología")
    assert(classify("servicio de salud") == "servicios")
  }

  test("case-insensitive via lowercased input") {
    assert(classify("SOFTWARE LIBRE") == "tecnología")
  }

  test("no match yields empty string") {
    assert(classify("nada relevante") == "")
  }

  test("rule order is load-bearing: swapped rules change the winner") {
    val swapped = Seq(rules(1), rules(0), rules(2))
    assert(classify("software de servicio", swapped) == "servicios")
  }

  test("domainCoerce keeps valid labels, coerces unknown to otros, idempotent") {
    val allowed = Seq("salud", "servicios")
    val df = Seq("salud", "desconocido", "").toDF("l")
    val once = df.select(Classify.domainCoerce(col("l"), allowed).as("l"))
    assert(once.as[String].collect().toSeq == Seq("salud", "otros", "otros"))
    val twice = once.select(Classify.domainCoerce(col("l"), allowed))
    assert(twice.as[String].collect().toSeq == Seq("salud", "otros", "otros"))
  }

  test("stub is deterministic and lands inside the category list") {
    val cats = ClassifyPack.categories
    val df = Seq("texto uno", "texto dos", "texto uno").toDF("t")
    val got = df.select(Classify.stub(col("t"), cats)).as[String].collect()
    assert(got(0) == got(2))
    assert(got.forall(cats.contains))
  }

  test("route prefers the rule label, falls back on ''") {
    val df = Seq(("salud", "fallback"), ("", "fallback")).toDF("r", "f")
    val got = df.select(Classify.route(col("r"), col("f"))).as[String].collect()
    assert(got.toSeq == Seq("salud", "fallback"))
  }

  test("cached: hits skip the classify stage, misses refresh the cache") {
    val df = Seq(("k1", "salud total"), ("k2", "software x"), ("k3", "nada"))
      .toDF("key", "text")
    val cache = Seq(("k1", "CACHED")).toDF("key", "sector")
    var classifiedKeys = Set.empty[String]
    val (all, newCache) = Classify.cached(df, cache, "key", "sector") { misses =>
      classifiedKeys = misses.select("key").as[String].collect().toSet
      misses.withColumn("sector",
        Classify.domainCoerce(Classify.byRules(lower(col("text")), rules),
          Seq("tecnología", "salud")))
    }
    assert(classifiedKeys == Set("k2", "k3")) // k1 never re-classified
    val labels = all.select("key", "sector").as[(String, String)].collect().toMap
    assert(labels == Map("k1" -> "CACHED", "k2" -> "tecnología", "k3" -> "otros"))
    assert(newCache.count() == 3) // refreshed cache covers all keys
  }

  test("classifyBatched applies client labels; failed batch defaults all rows") {
    val ok = new Classify.BatchClient {
      def classify(batch: Seq[(String, String)]): Map[String, String] =
        batch.map { case (id, text) => id -> s"label-$id" }.toMap
    }
    val df = Seq(("1", "a"), ("2", "b")).toDF("id", "text")
    val got = Classify.classifyBatched(df, "id", "text", "sector", ok)
      .select("id", "sector").as[(String, String)].collect().toMap
    assert(got == Map("1" -> "label-1", "2" -> "label-2"))

    val failing = new Classify.BatchClient {
      def classify(batch: Seq[(String, String)]): Map[String, String] =
        throw new RuntimeException("llm down")
    }
    val defaulted = Classify.classifyBatched(df, "id", "text", "sector", failing)
      .select("sector").as[String].collect()
    assert(defaulted.forall(_ == Classify.DefaultLabel))
  }

  test("parseBatchReply: JSON array of {id,label} records (classifier.py:86-120)") {
    assert(Classify.parseBatchReply(
      """[{"id": "1", "label": "economía"}, {"id": "2", "label": "otros"}]""")
      == Map("1" -> "economía", "2" -> "otros"))
    assert(Classify.parseBatchReply("[]") == Map.empty[String, String])
    assert(Classify.parseBatchReply(
      " [ { \"id\" : \"a\" , \"label\" : \"b\\\"c\\n\" } ] ")
      == Map("a" -> "b\"c\n"))
    assert(Classify.parseBatchReply("""[{"id": "u", "label": "café"}]""")
      == Map("u" -> "café"))
    // extra fields are ignored; field order is free
    assert(Classify.parseBatchReply(
      """[{"label": "salud", "confidence": 0.9, "id": "7"}]""")
      == Map("7" -> "salud"))
  }

  test("parseBatchReply salvages valid records past invalid ones (classifier.py:111-120)") {
    // Every invalid shape the reference warn-skips per record: missing
    // field, empty value (Python truthiness), non-string value, non-object
    // record. Valid neighbors must survive.
    val reply =
      """[
        |  {"id": "1", "label": "economía"},
        |  {"id": "2"},
        |  {"label": "otros"},
        |  {"id": "", "label": "salud"},
        |  {"id": "3", "label": ""},
        |  {"id": "4", "label": null},
        |  {"id": 5, "label": "salud"},
        |  {"id": "6", "label": ["salud"]},
        |  "not a record",
        |  42,
        |  {"id": "7", "label": "servicios"}
        |]""".stripMargin
    assert(Classify.parseBatchReply(reply)
      == Map("1" -> "economía", "7" -> "servicios"))
    // duplicate id: later record overwrites (Python dict insert, :116)
    assert(Classify.parseBatchReply(
      """[{"id": "1", "label": "a"}, {"id": "1", "label": "b"}]""")
      == Map("1" -> "b"))
    // count mismatch vs the request batch is tolerated (log-only, :106-109)
    // — parse sees only the reply, so 1 record for a 20-row batch is fine
    assert(Classify.parseBatchReply("""[{"id": "1", "label": "x"}]""")
      == Map("1" -> "x"))
  }

  test("parseBatchReply zeroes the batch ONLY on parse failure or non-array") {
    // the two shapes the reference maps to {} (classifier.py:98-104)
    val fatal = Seq(
      """Sure! Here are the labels: [{"id": "1", "label": "x"}]""", // prose prefix
      """[{"id": "1", "label": "x"}] Hope that helps!""",           // prose suffix
      """[{"id": "1", "label": "x"}, {"id": "2",""",                // truncation
      """[{"id": "1", "label": "x"},]""",                           // trailing comma
      """{"1": "economía"}""",                                      // object, not array
      """"economía"""",                                             // bare string
      "")                                                           // empty reply
    fatal.foreach { raw =>
      assertThrows[IllegalArgumentException](Classify.parseBatchReply(raw))
    }
  }

  test("parseStrictObjectReply (opt-in) still rejects every drifted shape") {
    assert(Classify.parseStrictObjectReply("""{"1": "economía", "2": "otros"}""")
      == Map("1" -> "economía", "2" -> "otros"))
    assert(Classify.parseStrictObjectReply("{}") == Map.empty[String, String])
    val recorded = Seq(
      """Sure! Here are the labels: {"1": "economía"}""", // prose prefix
      """{"1": "economía"} Hope that helps!""",           // prose suffix
      """{"1": "economía", "2": """,                      // truncation
      """{"1": "economía",}""",                           // trailing comma
      """{"1": ["economía"]}""",                          // non-string value
      """{"1": "a", "1": "b"}""",                         // duplicate id
      """["economía", "otros"]""",                        // array, not object
      "")                                                 // empty reply
    recorded.foreach { raw =>
      assertThrows[IllegalArgumentException](Classify.parseStrictObjectReply(raw))
    }
  }

  test("referencePrompt renders the reference's request contract") {
    val p = Classify.referencePrompt(Seq("salud", "economía"),
      Seq(("CAM-1", "dotación hospital -- obra civil"),
          ("CAM-2", "via terciaria -- mantenimiento")))
    // the instruction block requests exactly the array-of-records shape
    // parseBatchReply parses (classifier.py:86-88)
    assert(p.contains("salud, economía"))
    assert(p.contains("""{"id": "<ID_DEL_PROYECTO>", "label": "<categoría>"}"""))
    assert(p.contains("sin ningún texto adicional"))
    // one id-prefixed line per row, reference line shape (classifier.py:77-80)
    assert(p.endsWith(
      "CAM-1: dotación hospital -- obra civil\nCAM-2: via terciaria -- mantenimiento"))
    // a reply in the requested shape round-trips through the parser
    assert(Classify.parseBatchReply(
      """[{"id": "CAM-1", "label": "salud"}, {"id": "CAM-2", "label": "otros"}]""")
      == Map("CAM-1" -> "salud", "CAM-2" -> "otros"))
  }

  test("a real-shaped Gemini transcript runs RawReplyClient end-to-end") {
    // Recorded-shape transcript: pretty-printed JSON array exactly as the
    // reference's prompt requests it (classifier.py:86-88) and as a
    // Gemini-class model emits it — multi-line, indented, one record per
    // input line, one record degraded mid-reply. No code fences: the
    // prompt says "sin ningún texto adicional" and the reference feeds
    // the raw text straight to json.loads (classifier.py:95-97).
    val transcript =
      """[
        |  {
        |    "id": "CAM-001",
        |    "label": "infraestructura"
        |  },
        |  {
        |    "id": "CAM-002",
        |    "label": "salud"
        |  },
        |  {
        |    "id": "CAM-003",
        |    "label": null
        |  },
        |  {
        |    "id": "CAM-004",
        |    "label": "educación"
        |  }
        |]""".stripMargin
    val client = new Classify.RawReplyClient(_ => transcript)
    val df = Seq(
      ("CAM-001", "construcción de vía terciaria"),
      ("CAM-002", "dotación hospital municipal"),
      ("CAM-003", "proyecto sin descripción"),
      ("CAM-004", "mejoramiento escuela rural"))
      .toDF("id", "text").repartition(1).sortWithinPartitions("id")
    val got = Classify.classifyBatched(df, "id", "text", "sector", client,
      batchSize = 4).select("id", "sector").as[(String, String)].collect().toMap
    // valid records label their rows; the degraded record's row defaults
    assert(got == Map(
      "CAM-001" -> "infraestructura",
      "CAM-002" -> "salud",
      "CAM-003" -> Classify.DefaultLabel,
      "CAM-004" -> "educación"))
  }

  test("a malformed recorded reply defaults ITS batch only; replay is stable") {
    // batch of 2: ids (1,2) share a call, (3,4) share a call. The second
    // call replays a recorded off-contract reply; per-batch isolation
    // must default rows 3-4 while rows 1-2 keep their labels
    // (classifier.py:98-104: parse failure → whole batch 'otros').
    val client = new Classify.RawReplyClient(batch =>
      if (batch.exists(_._1 == "3"))
        """The labels are: [{"id": "3", "label": "economía"}]"""
      else batch.map { case (id, _) => s"""{"id": "$id", "label": "label-$id"}""" }
        .mkString("[", ", ", "]"))
    val df = Seq(("1", "a"), ("2", "b"), ("3", "c"), ("4", "d"))
      .toDF("id", "text").repartition(1).sortWithinPartitions("id")
    val run = Classify.classifyBatched(df, "id", "text", "sector", client,
      batchSize = 2)
    val got = run.select("id", "sector").as[(String, String)].collect().toMap
    assert(got == Map("1" -> "label-1", "2" -> "label-2",
      "3" -> Classify.DefaultLabel, "4" -> Classify.DefaultLabel))
    // a re-executed task (Spark retry ≙ plan re-run) replays the same
    // calls and lands on the same labels — mapPartitions holds no state
    // that a retry could observe differently
    val replay = run.select("id", "sector").as[(String, String)].collect().toMap
    assert(replay == got)
  }
}
