package graft.operators

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame

/** Width control for CPU-bound row-local stages.
  *
  * Scan parallelism is split-bound: a parquet file is divisible only at
  * row-group boundaries, so a small file (or a single-row-group file —
  * exactly what tiny dims and test corpora look like) yields ONE task no
  * matter how many cores the cluster has, and every downstream row-local
  * stage (markup parse, regex extraction, hashing) serializes on one
  * core. At the other extreme, a 100 TB corpus yields hundreds of
  * thousands of splits and needs no help — an unconditional repartition
  * there would be a full-corpus shuffle for nothing.
  *
  * [[fanOutIfNarrow]] resolves both ends: it consults the plan's size
  * statistics (file-scan stats are the file bytes — no job runs) and
  * round-robin repartitions to the cluster's core count ONLY when the
  * input is provably narrower than one split per core. The repartition it
  * may introduce moves less than `cores × maxPartitionBytes` by
  * construction — bounded, and only ever paid when the alternative is
  * idling all but one core through a CPU-heavy stage.
  */
object Parallelize {

  /** Fan `df` out to the cluster's default parallelism when its planned
    * input is smaller than one scan split per core; identity otherwise.
    * Use ahead of expensive per-row work, not on cheap projections. */
  def fanOutIfNarrow(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    val maxSplit = JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < BigInt(cores) * BigInt(maxSplit)) df.repartition(cores)
    else df
  }
}
