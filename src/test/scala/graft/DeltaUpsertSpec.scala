package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Delta, Upsert}

/** Delta-split and keep-first/merge properties (reference
  * dags/scraping_etl.py:51-74, src/storage.py:108-117). */
class DeltaUpsertSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val fresh = Seq(
    ("k1", "h1", "new-same"), // in state, same hash → bypass
    ("k2", "h2x", "changed"), // in state, hash differs → to_detail
    ("k3", "h3", "brandnew")  // not in state → to_detail
  ).toDF("key", "row_hash", "payload")

  private val state = Seq(("k1", "h1"), ("k2", "h2")).toDF("key", "row_hash")

  test("split partition property: to_detail ⊎ bypass = input, disjoint") {
    val (toDetail, bypass) = Delta.split(fresh, state, Seq("key"))
    val d = toDetail.select("key").as[String].collect().toSet
    val b = bypass.select("key").as[String].collect().toSet
    assert(d == Set("k2", "k3"))
    assert(b == Set("k1"))
    assert((d & b).isEmpty)
    assert(toDetail.count() + bypass.count() == fresh.count())
  }

  test("split routes new keys and changed hashes to to_detail") {
    val (toDetail, _) = Delta.split(fresh, state, Seq("key"))
    val payloads = toDetail.select("payload").as[String].collect().toSet
    assert(payloads == Set("changed", "brandnew"))
  }

  test("changedOrNew anti-join form agrees with split's to_detail") {
    val (toDetail, _) = Delta.split(fresh, state, Seq("key"))
    val anti = Delta.changedOrNew(fresh, state, Seq("key"))
    assert(anti.select("key").as[String].collect().toSet ==
           toDetail.select("key").as[String].collect().toSet)
  }

  test("gate short-circuits downstream when the delta is empty (J2)") {
    val unchanged = Seq(("k1", "h1", "same")).toDF("key", "row_hash", "payload")
    val (toDetail, _) = Delta.split(unchanged, state, Seq("key"))
    assert(Delta.gate(toDetail)("ran")("skipped") == "skipped")
    val (toDetail2, _) = Delta.split(fresh, state, Seq("key"))
    assert(Delta.gate(toDetail2)("ran")("skipped") == "ran")
  }

  test("keepFirst picks the deterministic winner under the explicit order") {
    val df = Seq(
      ("k", 2L, "second"), ("k", 1L, "first"), ("k", 3L, "third"),
      ("other", 9L, "only")
    ).toDF("key", "seq", "v")
    val got = Upsert.keepFirst(df, Seq("key"), Seq(col("seq").asc_nulls_first))
      .select("key", "v").as[(String, String)].collect().toMap
    assert(got == Map("k" -> "first", "other" -> "only"))
  }

  test("merge: higher version wins; incoming beats existing on version tie") {
    val existing = Seq(("k1", 1, "old"), ("k2", 5, "old")).toDF("pk", "version", "src")
    val incoming = Seq(("k1", 1, "new"), ("k2", 4, "new")).toDF("pk", "version", "src")
    val got = Upsert.merge(existing, incoming, Seq("pk"), col("version"))
      .select("pk", "src").as[(String, String)].collect().toMap
    assert(got == Map("k1" -> "new", "k2" -> "old"))
  }
}
