package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Delta, Fingerprint}

/** Slice 0 — the reference's soul (SURVEY §7.2.1): canonical fingerprint
  * (H1, reference src/scrapers/scraper.py:53-56) feeding the incremental
  * delta anti-join (J1, reference dags/scraping_etl.py:51-74).
  */
object CorePack extends QueryPack {

  private val orderHashFields = Seq("o_orderkey", "o_orderstatus", "o_orderpriority")

  /** Fresh batch: lineitem keyed by (l_orderkey, l_linenumber), fingerprint
    * over stable non-float business fields. */
  private def freshLineitem(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      Fingerprint.rowHash(Seq(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_returnflag"), col("l_linestatus"))).as("row_hash"))

  /** Deterministic simulated stored state: even order keys are "known";
    * among them, rows with l_suppkey % 7 = 0 carry a stale fingerprint
    * (the returnflag they were scraped with has since changed). The stored
    * raw table is PK'd on the lookup key (reference configs/colombia.yml:86-93),
    * so the state side is deduplicated to one hash per key (min for
    * determinism — lineitem keys are not unique in the corpus). */
  private def stateLineitem(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 2 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        Fingerprint.rowHash(Seq(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"),
          when(col("l_suppkey") % 7 === 0, lit("CHANGED")).otherwise(col("l_returnflag")),
          col("l_linestatus"))).as("row_hash"))
      .groupBy("l_orderkey", "l_linenumber")
      .agg(min("row_hash").as("row_hash"))

  private def hashSql(cols: String*) = Fingerprint.sqlExpr(cols)

  /** Flagship end-to-end pipeline shape (scan → fingerprint → delta split →
    * J2 gate → union-merge), used by SparkEntry.entry. When the delta is
    * empty the detail stage is short-circuited entirely (the reference's
    * ShortCircuit branch, dags/scraping_etl.py:76-80). */
  def pipeline(s: SparkSession, dir: String): DataFrame = {
    val (toDetail, bypass) = Delta.split(
      freshLineitem(s, dir), stateLineitem(s, dir),
      Seq("l_orderkey", "l_linenumber"))
    Delta.gate(toDetail) {
      Delta.merge(toDetail.withColumn("route", lit("detail")),
                  bypass.withColumn("route", lit("bypass")))
    } {
      bypass.withColumn("route", lit("bypass"))
    }
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q09_row_checksum" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "orders").select(
        col("o_orderkey"),
        Fingerprint.rowHash(orderHashFields.map(col)).as("row_hash")))),

    "q22_delta_antijoin" -> ((s, dir) => Q.ordered(
      Delta.split(freshLineitem(s, dir), stateLineitem(s, dir),
        Seq("l_orderkey", "l_linenumber"))._1)),
  )

  override val oracleSql: Map[String, String] = Map(
    "q09_row_checksum" ->
      s"""SELECT o_orderkey, ${hashSql("o_orderkey", "o_orderstatus", "o_orderpriority")} AS row_hash
          FROM orders ORDER BY ALL NULLS FIRST""",

    "q22_delta_antijoin" ->
      s"""WITH fresh AS (
            SELECT l_orderkey, l_linenumber,
                   ${hashSql("l_orderkey", "l_linenumber", "l_partkey", "l_returnflag", "l_linestatus")} AS row_hash
            FROM lineitem),
          state AS (
            SELECT l_orderkey, l_linenumber,
                   min(md5(concat_ws('|', coalesce(CAST(l_orderkey AS VARCHAR), ''),
                                       coalesce(CAST(l_linenumber AS VARCHAR), ''),
                                       coalesce(CAST(l_partkey AS VARCHAR), ''),
                                       coalesce(CASE WHEN l_suppkey % 7 = 0 THEN 'CHANGED' ELSE l_returnflag END, ''),
                                       coalesce(l_linestatus, '')))) AS row_hash
            FROM lineitem WHERE l_orderkey % 2 = 0
            GROUP BY l_orderkey, l_linenumber)
          SELECT f.l_orderkey, f.l_linenumber, f.row_hash
          FROM fresh f LEFT JOIN state s
            ON f.l_orderkey = s.l_orderkey AND f.l_linenumber = s.l_linenumber
          WHERE s.row_hash IS NULL OR s.row_hash <> f.row_hash
          ORDER BY ALL NULLS FIRST""",
  )
}
