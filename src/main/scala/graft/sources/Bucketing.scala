package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables — co-located joins and aggregations (SURVEY §2.8 G4
  * scale path). Writing both sides of a recurring equi-join bucketed by
  * the join key (same bucket count) lets Spark plan a SortMergeJoin with
  * NO shuffle exchange on either side: each task reads matching bucket
  * files directly. At 100 TB this converts the nightly delta join's two
  * full-table shuffles into zero — the single biggest recurring saving a
  * state-keeping pipeline can bank.
  *
  * Bucket counts must match across co-joined tables, be sized so one
  * bucket fits an executor (rows / buckets ≲ a few hundred MB), and be
  * chosen once — changing them rewrites the table.
  */
object Bucketing {

  /** Write `df` as a bucketed catalog table (sorted within buckets so
    * merge joins skip the sort too). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the catalog). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** True when the physical plan of `joined` contains no shuffle exchange
    * — the co-location check (bucketed joins must pass this). */
  def isShuffleFree(joined: DataFrame): Boolean =
    !joined.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
