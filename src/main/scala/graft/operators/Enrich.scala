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

  /** S3 as a whole-frame stage (reference detail_parser.py:97-119): fill an
    * EMPTY collection column from a secondary source, looked up by the
    * row's fallback URL (absolutized against `domain`, forced https — the
    * reference's urljoin + scheme rewrite).
    *
    * Spark re-expression of the per-row "if not docs and expediente_url:
    * fetch(url)": the conditional fetch becomes ONE left equi-join whose
    * condition includes the needs-fallback predicate, so satisfied rows and
    * keyless rows stream through unmatched (no second pass, no union) and
    * only needy rows probe the build side. `secondary` is (key → ready
    * value-array), i.e. the sub-page already parsed; a row-per-link feed is
    * pre-aggregated by the caller (`collect_list` — one shuffle on the
    * small secondary, none on the main frame when it broadcasts).
    *
    * Rows that need fallback but find no match keep an empty collection,
    * exactly like the reference's fetch-error path.
    *
    * `gate` narrows eligibility beyond the empty+keyed predicate — the
    * fused pipeline passes its delta `changed` flag so bypass rows flow
    * through the join unmatched (null join key) instead of being routed
    * around it with a second pass + union. */
  def fallbackCollection(rows: DataFrame, secondary: DataFrame,
                         collectionCol: String, keyCol: String,
                         secondaryKey: String, secondaryValue: String,
                         domain: String,
                         broadcastSecondary: Boolean = true,
                         gate: Column = lit(true)): DataFrame = {
    val sec0 = secondary.select(col(secondaryKey).as("__fb_key"),
                                col(secondaryValue).as("__fb_val"))
    val sec = if (broadcastSecondary) broadcast(sec0) else sec0
    val need = gate &&
      (col(collectionCol).isNull || size(col(collectionCol)) === 0) &&
      Cleaning.emptyToNull(col(keyCol)).isNotNull
    rows
      .withColumn("__fb_need", need)
      .withColumn("__fb_norm",
        when(col("__fb_need"),
          Cleaning.forceHttps(Cleaning.absolutize(domain, trim(col(keyCol))))))
      .join(sec, col("__fb_norm") === col("__fb_key"), "left")
      .withColumn(collectionCol,
        when(col("__fb_need"),
          coalesce(col("__fb_val"), Cleaning.nullToEmptyArray(col(collectionCol))))
          .otherwise(col(collectionCol)))
      .drop("__fb_need", "__fb_norm", "__fb_key", "__fb_val")
  }
}
