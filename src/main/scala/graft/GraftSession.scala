package graft

import org.apache.spark.sql.SparkSession

/** Recommended session construction for the engine — the one place the
  * library's session invariants live:
  *  - UTC session timezone (date/time parity with any ANSI oracle);
  *  - nanos-as-long parquet reads (TIMESTAMP(NANOS) sources — Tables);
  *  - AQE with skew-join splitting (on by default in Spark 4, pinned
  *    here so a cluster-side default flip can't regress skewed joins);
  *  - graft native functions registered (SQL-callable graft_dot).
  *
  * `shufflePartitions` should be ≈ total executor cores on a real
  * cluster; the mains pass SPARK_GRAFT_CPUS.
  */
object GraftSession {
  def build(master: String, shufflePartitions: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // isAdjustedToUTC=false µs columns (one events-corpus generation)
      // read directly as session-zoned TimestampType instead of NTZ: the
      // session is pinned UTC so the instants are identical to the
      // NTZ→LTZ cast Tables.events would otherwise apply — and with the
      // cast collapsing to identity, ts predicates push down to the scan
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // catalog-table writes (bucketed layouts — sources.Bucketing) land
      // in tmp scratch, never the library user's cwd
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      // allow co-partitioned joins on a PREFIX of the join keys: tables
      // bucketed by l_orderkey then joined on (l_orderkey, l_linenumber)
      // are correctly co-located (equal keys ⇒ equal bucket) — the
      // default-true strictness would re-shuffle both sides and defeat
      // the bucketed layout for every composite-key delta join (q130)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.GraftFunctions.register(spark)
    spark
  }
}
