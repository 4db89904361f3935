package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

/** Per-column dataset profiling (operators.Profile) — the one-pass
  * stats card. Expected values hand-computed; the empty-string/NULL
  * distinction and the all-null column are the edges q154's fixture
  * can't reach.
  */
class ProfileSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val df = Seq(
    (1L, Some("aa"), Option.empty[String]),
    (2L, Some("b"), None),
    (3L, None, None),
    (4L, Some("aa"), None),
    (5L, Some(""), None)            // empty string is a VALUE, not a null
  ).toDF("id", "s", "t")

  private def card = Profile.profile(df, Seq("id", "s", "t"))
    .as[(String, Long, Long, Long, Option[String], Option[String], Option[Double])]
    .collect().map(r => r._1 -> r).toMap

  test("profile: rows, nulls, distinct, lexicographic min/max, mean length") {
    val id = card("id")
    assert(id == (("id", 5L, 0L, 5L, Some("1"), Some("5"), Some(1.0))))
    val s = card("s")
    // 4 non-null values: "aa","b","aa","" → 3 distinct; min "" max "b";
    // avg_len = (2+1+2+0)/4 = 1.25
    assert(s == (("s", 5L, 1L, 3L, Some(""), Some("b"), Some(1.25))))
  }

  test("profile: an all-null column keeps its row count and NULLs the rest") {
    assert(card("t") == (("t", 5L, 5L, 0L, None, None, None)))
  }

  test("profile: one scan, two keyed exchanges — never a per-column pass") {
    val plan = Profile.profile(df, Seq("id", "s", "t"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <= 2 keyed exchanges, got $exchanges:\n$plan")
  }

  test("profile rejects duplicate and empty column lists") {
    intercept[IllegalArgumentException](Profile.profile(df, Seq.empty))
    intercept[IllegalArgumentException](Profile.profile(df, Seq("id", "id")))
  }
}
