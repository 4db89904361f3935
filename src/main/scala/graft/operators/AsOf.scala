package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — attach to each left row the most recent right row with
  * `rTs <= left ts` per key (inclusive), the standard point-in-time
  * enrichment for event/state timelines.
  *
  * Spark has no native as-of join; the naive form (theta join on
  * `rTs <= lTs` + max-per-left-row) is quadratic per key. This is the
  * merge-join form instead: union both sides tagged with a side marker,
  * ONE shuffle+sort on (key, ts, side), forward-fill the right-side value
  * columns with `last(ignoreNulls)` over the running window, keep left
  * rows. Right rows at exactly lTs sort before left rows (side 0 < 1), so
  * the join is inclusive — matching DuckDB's `ASOF JOIN ... ON l.ts >=
  * r.ts` oracle semantics.
  *
  * Right side must be unique per (keys, rTs) — dedupe upstream — or the
  * fill among equal timestamps is nondeterministic.
  */
object AsOf {

  def asofJoin(left: DataFrame, lTs: String,
               right: DataFrame, rTs: String,
               keys: Seq[String], valueCols: Seq[String]): DataFrame = {
    val lSide = left
      .withColumn("__ts", col(lTs))
      .withColumn("__side", lit(1))
    val rSide = right
      .select(keys.map(col) ++ (col(rTs).as("__ts") +: valueCols.map(col)): _*)
      .withColumn("__side", lit(0))
    val combined = lSide.unionByName(rSide, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc_nulls_first, col("__side").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(combined) { (d, v) =>
      d.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__ts", "__side")
  }
}
