package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOf, Skew}

/** As-of join semantics and salted-join equivalence. */
class AsOfSkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s:00")

  test("asofJoin picks the most recent right row at-or-before each left ts") {
    val left = Seq(
      (1L, "k", t("09:00")), // before any right row → null
      (2L, "k", t("10:00")), // exactly at r1 → inclusive match r1
      (3L, "k", t("10:30")), // between r1 and r2 → r1
      (4L, "k", t("12:00")), // after r2 → r2
      (5L, "z", t("12:00"))  // key with no right rows → null
    ).toDF("id", "key", "ts")
    val right = Seq(
      ("k", t("10:00"), "r1"), ("k", t("11:00"), "r2")
    ).toDF("key", "rts", "rval")
    val got = AsOf.asofJoin(left, "ts", right, "rts", Seq("key"), Seq("rval"))
      .select("id", "rval").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> None, 2L -> Some("r1"), 3L -> Some("r1"),
      4L -> Some("r2"), 5L -> None))
  }

  test("asofJoin: a NULL value on the most recent right row stays NULL") {
    val left = Seq((1L, "k", t("10:30"))).toDF("id", "key", "ts")
    val right = Seq(
      ("k", t("09:00"), Option("old"), Option("o2")),
      ("k", t("10:00"), Option.empty[String], Option("n2"))
    ).toDF("key", "rts", "v1", "v2")
    val got = AsOf.asofJoin(left, "ts", right, "rts", Seq("key"), Seq("v1", "v2"))
      .select("v1", "v2").collect().head
    // the 10:00 row wins atomically: v1 NULL (not back-filled from 09:00),
    // v2 from the same row (no cross-row stitching)
    assert(got.isNullAt(0))
    assert(got.getString(1) == "n2")
  }

  test("saltedJoin rejects join types that emit unmatched dim rows") {
    val big = Seq((1L, "a")).toDF("id", "key")
    val dim = Seq(("a", "x")).toDF("key", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, dim, Seq("key"), 4, joinType = "right")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, dim, Seq("key"), 4, joinType = "full_outer")
    }
  }

  test("bandJoin handles negative values and band boundaries") {
    val left = Seq((1L, -2.5), (2L, -0.3), (3L, 0.0), (4L, 1.0)).toDF("lid", "value")
    val right = Seq((10L, -2.0), (20L, 0.0)).toDF("rid", "center")
    val got = graft.operators.RangeJoin.bandJoin(left, "value", right, "center", 1.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = left.crossJoin(right)
      .filter(col("value") >= col("center") - 1.0 && col("value") <= col("center") + 1.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(got.contains((4L, 20L))) // inclusive upper boundary
  }

  test("saltedJoin equals the unsalted join (inner and left)") {
    val big = Seq((1L, "hot"), (2L, "hot"), (3L, "cold"), (4L, "missing"))
      .toDF("id", "key")
    val dim = Seq(("hot", "H"), ("cold", "C")).toDF("key", "label")
    for (jt <- Seq("inner", "left")) {
      val salted = Skew.saltedJoin(big, dim, Seq("key"), buckets = 4, joinType = jt)
        .select("id", "label").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      val plain = big.join(dim, Seq("key"), jt)
        .select("id", "label").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(salted == plain, s"join type $jt")
    }
  }

  test("saltedJoin spreads a hot key over multiple salt buckets") {
    val big = spark.range(1000).select(col("id"), lit("hot").as("key"))
    val salts = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 1)
  }
}
