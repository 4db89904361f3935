package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-deduplicated upsert semantics (SURVEY §2.7 W2/W3, reference
  * src/storage.py:90-159: in-batch dedup by PK keep-first, then
  * `INSERT … ON CONFLICT (pk) DO UPDATE`).
  *
  * Python's keep-first is arrival-ordered; a distributed engine has no
  * arrival order, so every dedup here demands an explicit deterministic
  * tiebreaker ordering (SURVEY §7.4.5).
  *
  * Scale: `row_number` over `Window.partitionBy(pk)` is a single hash
  * shuffle on the PK followed by a per-partition sort — the canonical
  * at-scale dedup. Skewed PKs are the caller's concern (salt upstream);
  * for the merge path, AQE skew-join handling applies.
  */
object Upsert {

  /** W2 in-batch dedup: keep the first row per key under `order`. */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** MERGE INTO emulation over plain parquet state: union existing+incoming,
    * keep the winning row per PK — highest `version` wins, and incoming
    * beats existing when versions tie (an explicit source-precedence sort
    * key; ordering by version alone would make the winner
    * non-deterministic on ties). */
  def merge(existing: DataFrame, incoming: DataFrame, pk: Seq[String],
            version: Column): DataFrame =
    keepFirst(
      existing.withColumn("__src", lit(0))
        .unionByName(incoming.withColumn("__src", lit(1)),
          allowMissingColumns = true),
      pk, Seq(version.desc, col("__src").desc))
      .drop("__src")
}
