package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental delta split — the reference's core "query" (SURVEY §2.4 J1,
  * reference dags/scraping_etl.py:51-74): a fresh batch is joined against
  * stored state `{lookup_key → row_hash}`; rows whose key is absent OR whose
  * fingerprint changed are routed to reprocessing (`toDetail`), unchanged
  * rows are bypassed.
  *
  * Scale design: one left join keyed on the lookup key — both sides hash
  * partition on the key, so the only shuffle is the join itself. When state
  * is small relative to the batch Catalyst/AQE picks a broadcast join;
  * callers may force it with `broadcast(state)`. The split reuses the single
  * joined plan (two filters over one join), so the join is not recomputed
  * per branch when both branches feed one union (Spark reuses the exchange).
  */
object Delta {

  /** J1: (toDetail, bypass). `state` must carry `keyCols` and `hashCol`. */
  def split(fresh: DataFrame, state: DataFrame, keyCols: Seq[String],
            hashCol: String = "row_hash"): (DataFrame, DataFrame) = {
    val st = state.select((keyCols.map(col) :+ col(hashCol).as("__state_hash")): _*)
    val joined = fresh.join(st, keyCols, "left")
    val changed = col("__state_hash").isNull || col("__state_hash") =!= col(hashCol)
    (joined.filter(changed).drop("__state_hash"),
     joined.filter(col("__state_hash") === col(hashCol)).drop("__state_hash"))
  }

  /** Pure anti-join form of J1: rows with no state match on (key, hash).
    * `left_anti` never materializes right-side columns and plans as a
    * broadcast/shuffled hash anti join — the cheapest delta at scale. */
  def changedOrNew(fresh: DataFrame, state: DataFrame, keyCols: Seq[String],
                   hashCol: String = "row_hash"): DataFrame =
    fresh.join(state.select((keyCols :+ hashCol).map(col): _*),
      keyCols :+ hashCol, "left_anti")

  /** J3 merge (dags/scraping_etl.py:108-114): detailed ++ bypass, where the
    * detailed branch may carry extra columns (detail-stage fields). */
  def merge(detailed: DataFrame, bypass: DataFrame): DataFrame =
    detailed.unionByName(bypass, allowMissingColumns = true)

  /** J2 key-presence gate (reference ShortCircuit/Branch,
    * dags/scraping_etl.py:76-80, dags/master_etl.py:35-49): run the
    * downstream plan only when the delta is non-empty. `isEmpty` is a
    * LIMIT-1 job — O(first non-empty partition), not a full scan; within a
    * single plan Catalyst's PropagateEmptyRelation handles this for free,
    * so the gate exists for cross-job boundaries only. */
  def gate[T](toDetail: DataFrame)(ifNonEmpty: => T)(ifEmpty: => T): T =
    if (toDetail.isEmpty) ifEmpty else ifNonEmpty
}
