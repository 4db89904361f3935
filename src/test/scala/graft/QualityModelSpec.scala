package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityModel

/** Hashed n-gram linear quality scorer (operators.QualityModel). */
class QualityModelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, Seq("good", "clean", "prose")),
    (2L, Seq("spam")),
    (3L, Seq.empty[String])
  ).toDF("doc_id", "toks")

  test("features are unigrams plus adjacent bigrams — no padded tail") {
    val n = docs.select(col("doc_id"),
        size(QualityModel.featureBuckets(col("toks"), 64)).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(n == Map(1L -> 5, 2L -> 1, 3L -> 0)) // 2n-1 features
  }

  test("score: exact integer sums, spine totality, keep/drop labels") {
    val w = QualityModel.fixtureWeights(spark, 64)
    val got = QualityModel.score(docs, "doc_id", col("toks"), w, 64)
      .orderBy("doc_id").collect()
    assert(got.length == 3)
    val r1 = got(0)
    assert(r1.getLong(r1.fieldIndex("n_feats")) == 5)
    // recompute the expected sum from the fixture formula
    val feats = Seq("good", "clean", "prose", "good clean", "clean prose")
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(f: String): Long = {
      val hex = md.digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 64
    }
    val expected = feats.map(f => (bucket(f) * 41 + 7) % 2001 - 1000).sum
    assert(r1.getLong(r1.fieldIndex("w_sum")) == expected)
    val logit = r1.getDouble(r1.fieldIndex("logit"))
    assert(math.abs(logit - expected / 5e6) < 1e-6)
    assert(r1.getString(r1.fieldIndex("label")) ==
      (if (logit > 0) "keep" else "drop"))
    // empty doc: zero features, NULL logit, drop
    val r3 = got(2)
    assert(r3.getLong(r3.fieldIndex("n_feats")) == 0)
    assert(r3.isNullAt(r3.fieldIndex("logit")))
    assert(r3.getString(r3.fieldIndex("label")) == "drop")
  }

  test("unmatched buckets score 0 (partial weight tables are tolerated)") {
    val partial = Seq((0L, 500L)).toDF("bucket", "w_micro")
    val got = QualityModel.score(docs, "doc_id", col("toks"), partial, 64)
      .filter(col("doc_id") === 1L).collect()(0)
    val wSum = got.getLong(got.fieldIndex("w_sum"))
    assert(wSum % 500 == 0) // only bucket-0 hits contribute
  }

  test("the weight table side is broadcast") {
    val w = QualityModel.fixtureWeights(spark, 64)
    val plan = QualityModel.score(docs, "doc_id", col("toks"), w, 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("gate keeps exactly the docs whose logit clears the threshold") {
    val w = QualityModel.fixtureWeights(spark, 64)
    val scored = QualityModel.score(docs, "doc_id", col("toks"), w, 64)
      .select("doc_id", "logit").as[(Long, Option[Double])].collect().toMap
    val kept = QualityModel.gate(docs, "doc_id", col("toks"), w, 64, 0.0)
      .select("doc_id").as[Long].collect().toSet
    val expected = scored.collect { case (id, Some(l)) if l > 0.0 => id }.toSet
    assert(kept == expected)
  }
}
