package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries/oracles are contributed per-pack (graft.queries.*); each pack
  * mirrors a section of SURVEY §2's operator inventory.
  */
object SparkEntry {
  private val packs: Seq[QueryPack] = Seq(
    CorePack,
    ProjectionPack,
    JoinPack,
    ClassifyPack,
    AggPack,
    ScalarPack,
    LlmPack,
    TextPack,
    NearDupPack,
    SamplePack,
    ScalePack,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's whole pipeline shape: scan → fingerprint → delta split
    * → union-merge (SURVEY §3.2). */
  def entry(spark: SparkSession): DataFrame =
    CorePack.pipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
