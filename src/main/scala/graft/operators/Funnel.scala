package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-funnel analytics: the furthest stage of an ordered step
  * sequence each entity reached, where every step must occur strictly
  * after the previous one and within a conversion window of it.
  *
  * Shape: one chained conditional-min Window per step over the SAME
  * entity partition — Catalyst stacks same-partitioning windows on a
  * single sort+exchange, so the whole computation shuffles the event
  * table ONCE regardless of step count (the self-join formulation
  * re-shuffles it per step), then collapses to one row per entity. The
  * per-entity collapse reuses the window exchange's partitioning.
  */
object Funnel {

  /** Per-entity furthest stage reached: 0 = none, k = completed step k.
    * Returns (entityCol, stage). `window` is the max gap between
    * consecutive steps (an INTERVAL column, e.g.
    * `expr("INTERVAL 24 HOURS")`); pass a null Column-less overload via
    * [[stageUnbounded]] for no window.
    */
  def stage(events: DataFrame, entityCol: String, typeCol: String,
            tsCol: String, steps: Seq[String], window: Column): DataFrame =
    stageImpl(events, entityCol, typeCol, tsCol, steps, Some(window))

  /** [[stage]] with no conversion-window bound — steps need only be in
    * strict order. */
  def stageUnbounded(events: DataFrame, entityCol: String, typeCol: String,
                     tsCol: String, steps: Seq[String]): DataFrame =
    stageImpl(events, entityCol, typeCol, tsCol, steps, None)

  private def stageImpl(events: DataFrame, entityCol: String, typeCol: String,
                        tsCol: String, steps: Seq[String],
                        window: Option[Column]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(entityCol))
    val withTimes = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col(typeCol) === step
        else {
          val after = col(typeCol) === step && col(tsCol) > col(s"_t${i - 1}")
          window.fold(after)(iv =>
            after && col(tsCol) <= col(s"_t${i - 1}") + iv)
        }
      df.withColumn(s"_t$i", min(when(cond, col(tsCol))).over(w))
    }
    val stage = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"_t$i").isNotNull, i + 1).otherwise(acc)
    }
    val maxes = steps.indices.map(i => max(col(s"_t$i")).as(s"_t$i"))
    withTimes.groupBy(col(entityCol))
      .agg(maxes.head, maxes.tail: _*)
      .select(col(entityCol), stage.as("stage"))
  }
}
