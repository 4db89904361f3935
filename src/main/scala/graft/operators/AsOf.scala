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
    // value columns travel as ONE struct so the fill is atomic: the most
    // recent right ROW wins as a unit. Filling columns independently with
    // last(ignoreNulls) would stitch values from different right rows —
    // and would skip a legitimately-NULL value on the most recent row in
    // favor of an older one, diverging from ASOF semantics.
    val rSide = right
      .select(keys.map(col) ++ Seq(col(rTs).as("__ts"),
        struct(valueCols.map(col): _*).as("__vals")): _*)
      .withColumn("__side", lit(0))
    val combined = lSide.unionByName(rSide, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc_nulls_first, col("__side").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = combined
      .withColumn("__vals", last(col("__vals"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        valueCols.map(v => col(s"__vals.$v").as(v)): _*)
  }
}
