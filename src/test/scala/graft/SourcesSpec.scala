package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Readers, Writers}

/** Source/sink surface: explicit-schema readers, partitioned writes, and
  * the versioned parquet-state merge (ON CONFLICT upsert analog). */
class SourcesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("csv/jsonl readers honor the explicit schema") {
    val dir = tmp("csvsrc")
    Files.writeString(java.nio.file.Paths.get(dir, "part.csv"),
      "id,name\n1,alpha\n2,beta\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val got = Readers.csv(spark, dir, schema).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "alpha"), (2L, "beta")))

    val jdir = tmp("jsonsrc")
    Files.writeString(java.nio.file.Paths.get(jdir, "part.jsonl"),
      """{"id": 3, "name": "gamma"}""" + "\n")
    val gotJ = Readers.jsonl(spark, jdir, schema).as[(Long, String)].collect().toSet
    assert(gotJ == Set((3L, "gamma")))
  }

  test("csvPermissive quarantines malformed rows instead of dropping them") {
    val dir = tmp("badcsv")
    Files.writeString(java.nio.file.Paths.get(dir, "part.csv"),
      "id,n\n1,10\nnot-a-number-row,xx\n3,30\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("n", LongType),
      StructField("_corrupt_record", StringType)))
    val df = Readers.csvPermissive(spark, dir, schema).cache()
    val good = df.filter(col("_corrupt_record").isNull)
      .select("id", "n").as[(Long, Long)].collect().toSet
    val bad = df.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").as[String].collect().toSeq
    assert(good == Set((1L, 10L), (3L, 30L)))
    assert(bad == Seq("not-a-number-row,xx"))
  }

  test("keyedLookup: isin and semi-join forms agree") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val byLit = Readers.keyedLookup(df, "k", Seq(1L, 3L))
      .select("v").as[String].collect().toSet
    val keys = Seq(1L, 3L).toDF("kk")
    val bySemi = Readers.keyedLookup(df, "k", keys, "kk")
      .select("v").as[String].collect().toSet
    assert(byLit == Set("a", "c"))
    assert(bySemi == byLit)
  }

  test("partitioned write creates pruning directories") {
    val dir = tmp("part")
    val df = Seq(("es", 1L), ("de", 2L), ("es", 3L)).toDF("lang", "id")
    Writers.partitioned(df, dir, Seq("lang"))
    assert(Files.isDirectory(java.nio.file.Paths.get(dir, "lang=es")))
    val back = spark.read.parquet(dir)
    assert(back.filter(col("lang") === "es").count() == 2)
  }

  test("mergeState: versioned upsert with ON CONFLICT semantics") {
    val dir = tmp("state")
    assert(Writers.latestVersion(dir).isEmpty)

    val b1 = Seq(("k1", 1, "v1a"), ("k2", 1, "v2a")).toDF("pk", "batch", "payload")
    val s1 = Writers.mergeState(spark, dir, b1, Seq("pk"), col("batch"))
    assert(Writers.latestVersion(dir).contains(0L))
    assert(s1.count() == 2)

    // batch 2 updates k1, inserts k3; k2 untouched
    val b2 = Seq(("k1", 2, "v1b"), ("k3", 2, "v3a")).toDF("pk", "batch", "payload")
    val s2 = Writers.mergeState(spark, dir, b2, Seq("pk"), col("batch"))
    assert(Writers.latestVersion(dir).contains(1L))
    val got = s2.select("pk", "payload").as[(String, String)].collect().toMap
    assert(got == Map("k1" -> "v1b", "k2" -> "v2a", "k3" -> "v3a"))

    // the previous version is still readable (readers never see a torn state)
    assert(spark.read.parquet(s"$dir/v0").count() == 2)
  }
}
