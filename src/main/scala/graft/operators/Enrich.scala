package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-row enrichment joins (SURVEY §2.1 S2/S3, §2.4 J4).
  *
  * The reference enriches each list row by fetching its detail URL and
  * merging parsed fields (scraper.py:104-107), with pass-through-on-missing
  * — exactly LEFT JOIN null-handling. The secondary "expediente" source is
  * a conditional fallback after the join (detail_parser.py:97-119).
  *
  * Scale: AQE picks the join strategy by default — a hard-forced broadcast
  * of a dimension that grows with the corpus (e.g. customer) is a
  * driver/executor OOM at the 100 TB design point. Callers pass
  * `broadcastDim = true` only for provably bounded dims (nation, region).
  */
object Enrich {

  /** S2/J4: left-join enrichment keyed on the row's lookup key. */
  def leftJoin(rows: DataFrame, details: DataFrame, rowKey: String,
               detailKey: String, broadcastDim: Boolean = false): DataFrame = {
    val d = if (broadcastDim) broadcast(details) else details
    rows.join(d, rows(rowKey) === d(detailKey), "left")
  }

  /** S3: conditional fallback — use `primary` unless blank/null, else
    * the enriched fallback (CASE WHEN after the join). */
  def coalesceEnrich(primary: Column, fallback: Column): Column =
    coalesce(Cleaning.emptyToNull(primary), fallback)
}
