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

  test("parseBatchReply: strict flat string→string JSON object") {
    assert(Classify.parseBatchReply("""{"1": "economía", "2": "otros"}""")
      == Map("1" -> "economía", "2" -> "otros"))
    assert(Classify.parseBatchReply("{}") == Map.empty[String, String])
    assert(Classify.parseBatchReply(" { \"a\" : \"b\\\"c\\n\" } ")
      == Map("a" -> "b\"c\n"))
    assert(Classify.parseBatchReply("""{"u": "café"}""")
      == Map("u" -> "café"))
  }

  test("parseBatchReply rejects every recorded malformed-reply shape") {
    // shapes an LLM actually produces when it drifts off-contract
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
      assertThrows[IllegalArgumentException](Classify.parseBatchReply(raw))
    }
  }

  test("a malformed recorded reply defaults ITS batch only; replay is stable") {
    // batch of 2: ids (1,2) share a call, (3,4) share a call. The second
    // call replays a recorded off-contract reply; per-batch isolation
    // must default rows 3-4 while rows 1-2 keep their labels
    // (classifier.py:91-120: parse failure → whole batch 'otros').
    val client = new Classify.RawReplyClient(batch =>
      if (batch.exists(_._1 == "3"))
        """The labels are: {"3": "economía", "4": "otros"}"""
      else batch.map { case (id, _) => s""""$id": "label-$id"""" }
        .mkString("{", ", ", "}"))
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
