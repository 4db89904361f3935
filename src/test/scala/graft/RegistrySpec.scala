package graft

import org.scalatest.funsuite.AnyFunSuite

/** Consistency of the driver-contract registry itself — the failure modes
  * `toMap` hides: a pack silently overwriting another pack's query id, an
  * oracle for a query that no longer exists, or a query quietly shipping
  * without an oracle (the driver then records only a weak rows-only
  * check). Every deliberate rows-only query must be listed here WITH its
  * justification, so a forgotten oracle is a test failure, not a silent
  * downgrade. */
class RegistrySpec extends AnyFunSuite {

  /** Queries that deliberately have no DuckDB oracle (SURVEY §8). */
  private val rowsOnly = Map(
    "q62_multimodal_decode" ->
      "binary payload + foreign decode stub has no SQL equivalent",
    "q63_approx_distinct" ->
      "HLL sketch internals are engine-specific; only the estimate exists",
    "q129_compression_filter" ->
      ("the DEFLATE bitstream is a zlib artifact with no SQL equivalent " +
        "(DuckDB ships no deflate scalar); gate monotonicity and fixtures " +
        "are spec-pinned in TextStatsSpec instead"))

  test("query ids are globally unique across packs (toMap hides collisions)") {
    val packsField = SparkEntry.getClass.getDeclaredFields
      .find(_.getName == "packs").get
    packsField.setAccessible(true)
    val packs = packsField.get(SparkEntry)
      .asInstanceOf[Seq[graft.queries.QueryPack]]
    val all = packs.flatMap(_.queries.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"query id defined in more than one pack: $dups")
    assert(all.size == SparkEntry.queries.size)
  }

  test("every oracle references a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without a query: $orphans")
  }

  test("every query is oracle-checked or documented rows-only") {
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val undocumented = unoracled -- rowsOnly.keySet
    assert(undocumented.isEmpty,
      s"query shipping without an oracle and without a documented " +
        s"rows-only justification: $undocumented")
    val stale = rowsOnly.keySet -- unoracled
    assert(stale.isEmpty,
      s"rows-only entry now HAS an oracle — remove from the list: $stale")
  }

  test("every oracle ends in a total ORDER BY (the hash-compare contract)") {
    val missing = SparkEntry.oracleSql.filterNot { case (_, sql) =>
      sql.toUpperCase.contains("ORDER BY ALL NULLS FIRST")
    }.keys
    assert(missing.isEmpty, s"oracle without ORDER BY ALL NULLS FIRST: $missing")
  }

  test("no declared query emits array/map/struct columns (driver comparator contract)") {
    // The driver's pandas comparator cannot sort/hash nested cells — a raw
    // ArrayType column flips a query to `err` driver-side even when the
    // semantics are right (CORRECTNESS_r05 q83/q87/q88/q99). Every declared
    // query must serialize nested columns (Q.jsonArrays / to_json) before
    // the output boundary. Schema-only: analysis, no job.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, q) =>
      q(TestSpark.spark, dir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"declared query emits nested columns the driver cannot compare: $offenders")
  }

  test("every reference citation in main sources points at a file that exists") {
    // The repo's discipline is line-level citation of the reference; a
    // fabricated path (VERDICT r12 found one) is corrosive precisely
    // because nothing checked it. Extract every cited reference file —
    // absolute (/root/reference/...) or repo-relative (src/...py,
    // dags/...py) — from every main .scala file and stat it.
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val cite = """(?:/root/reference/)?((?:src|dags|tests|configs)/[A-Za-z0-9_/]+\.py)""".r
    val mainDir = Paths.get("src/main/scala")
    val missing = Files.walk(mainDir).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val text = new String(Files.readAllBytes(p), "UTF-8")
        cite.findAllMatchIn(text).map(m => p.toString -> m.group(1))
      }
      .filterNot { case (_, rel) =>
        Files.exists(Paths.get("/root/reference").resolve(rel))
      }
      .toSeq.distinct
    assert(missing.isEmpty,
      s"citation of a nonexistent reference file: $missing")
  }
}
