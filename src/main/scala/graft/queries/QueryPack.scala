package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A pack of declared queries plus their DuckDB-oracle SQL (SURVEY §2).
  * Every oracle-checked query must be row-order deterministic: the driver
  * hash-compares results, so both sides end in a total ORDER BY over all
  * output columns (SURVEY §7.4.8).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}

object Q {
  /** Total deterministic order: all output columns asc, NULLS FIRST —
    * mirrored on the oracle side by `ORDER BY ALL NULLS FIRST` (DuckDB's
    * default null order is LAST; Spark's asc default is FIRST). */
  def ordered(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(c => col(c).asc_nulls_first): _*)

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)
}
