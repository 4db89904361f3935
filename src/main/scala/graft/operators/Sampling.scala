package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splits — training-data pipeline
  * primitives (SURVEY §2.9 family). `df.sample(fraction, seed)` depends on
  * engine RNG and partitioning, so it is neither reproducible across
  * engines nor stable under repartitioning; hashing a stable key is both:
  * the same row lands in the same split on every engine, every run, every
  * cluster size. This is how reproducible train/val/test splits are done
  * over 100 TB — row-local, no shuffle, pushes nothing but a filter.
  */
object Sampling {

  /** Stable per-row bucket in [0, buckets): md5 of the key column. */
  def hashBucketOf(key: Column, buckets: Int): Column =
    (conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")
      % buckets).cast("long")

  /** Keep ~pct/100 of rows, deterministically by key. */
  def hashSample(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.filter(hashBucketOf(key, 100) < pct)

  /** Label each row train/val/test by stable key hash (e.g. 80/10/10). */
  def split(key: Column, trainPct: Int, valPct: Int): Column = {
    val b = hashBucketOf(key, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Stratified deterministic sample: `perGroup` rows per group, chosen
    * by hash order (stable, engine-portable). One shuffle on the group
    * key. */
  def stratified(df: DataFrame, groupCols: Seq[String], key: Column,
                 perGroup: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(md5(key.cast("string")).asc_nulls_first, key.asc_nulls_first)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perGroup)
      .drop("__rn")
  }
}
