package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series repair — the resample + forward-fill step
  * between raw event streams and anything that assumes one row per
  * (key, period): rate monitors, drift baselines, training-curriculum
  * schedules. The reference's daily-run metrics implicitly assume a
  * dense day grid (dags/master_etl.py:22 @daily); this operator makes
  * the densification explicit and engine-side.
  */
object TimeSeries {

  /** Densify per-key period aggregates onto a regular grid and
    * forward-fill the holes:
    *
    *  1. aggregate `valueCol` per (key, `date_trunc(grain, ts)`) with
    *     the engine's exact decimal sum (engine-portable, association-
    *     order-free);
    *  2. explode each key's own [min, max] period span into a dense
    *     grid (`sequence` + 1-`grain` interval) — spans are PER KEY, so
    *     a short-lived key doesn't inherit the corpus's full range;
    *  3. left-join the aggregates back and carry `was_gap` (1 where the
    *     period had no events);
    *  4. forward-fill with `last(ignoreNulls)` over the key's period
    *     order. The first grid row is a key's own min period, which by
    *     construction has data — no leading NULLs to fill.
    *
    * Scale shape: one aggregation shuffle on (key, period), one
    * (key, period) equi-join, one per-key ordered window — all
    * partitioned by key, nothing global. Grid fan-out is span/grain per
    * key: pick the grain so the widest key's span stays a sane
    * partition (an always-on key at hour grain is 8.8k rows/year —
    * fine; at second grain it is 31M — re-grain, don't re-window).
    * Output: (key, period, value_ff, was_gap). */
  def gapFill(df: DataFrame, key: Column, ts: Column, value: Column,
              grain: String = "hour"): DataFrame = {
    val e = df.select(key.as("key"), date_trunc(grain, ts).as("period"),
      value.as("__v"))
    val agg = e.groupBy(col("key"), col("period"))
      .agg(graft.queries.Q.sumExact(col("__v")).as("v"))
    val grid = e.groupBy(col("key"))
      .agg(min(col("period")).as("h0"), max(col("period")).as("h1"))
      .select(col("key"),
        explode(sequence(col("h0"), col("h1"),
          expr(s"interval 1 $grain"))).as("period"))
    val w = Window.partitionBy(col("key")).orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(agg, Seq("key", "period"), "left")
      .select(col("key"), col("period"),
        last(col("v"), ignoreNulls = true).over(w).as("value_ff"),
        col("v").isNull.cast("int").as("was_gap"))
  }
}
