package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Fingerprint

/** Golden checksum-parity kernel tests — the semantics of the reference's
  * compute_checksum (src/scrapers/scraper.py:53-56, golden-tested at
  * tests/test_scraper.py:9-36): configured field subset, missing → '',
  * deterministic serialization, extra fields ignored. */
class FingerprintSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("rowHash equals md5 of pipe-joined fields (golden by construction)") {
    val df = Seq(("123", "Test Name", "ignored")).toDF("id", "name", "extra")
    val got = df.select(Fingerprint.rowHash(Seq(col("id"), col("name"))))
      .as[String].head()
    assert(got == md5hex("123|Test Name"))
  }

  test("missing/null field defaults to empty string") {
    val df = Seq(("123", Option.empty[String])).toDF("id", "name")
    val got = df.select(Fingerprint.rowHash(Seq(col("id"), col("name"))))
      .as[String].head()
    assert(got == md5hex("123|"))
  }

  test("extra fields do not affect the hash (field-subset invariance)") {
    val a = Seq(("123", "x")).toDF("id", "name")
      .select(Fingerprint.rowHash(Seq(col("id"), col("name")))).as[String].head()
    val b = Seq(("123", "x", "other", 42)).toDF("id", "name", "junk", "n")
      .select(Fingerprint.rowHash(Seq(col("id"), col("name")))).as[String].head()
    assert(a == b)
  }

  test("sqlExpr mirrors rowHash canonical form") {
    val df = Seq(("a", "b")).toDF("x", "y")
    val viaCol = df.select(Fingerprint.rowHash(Seq(col("x"), col("y")))).as[String].head()
    val viaSql = df.selectExpr(
      Fingerprint.sqlExpr(Seq("x", "y")).replace("AS VARCHAR", "AS STRING")).as[String].head()
    assert(viaCol == viaSql)
  }
}
