package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM (never stopped —
  * suites run sequentially in the same fork). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .config("spark.sql.session.timeZone", "UTC")
    // nanos-typed events corpora need this at session build (Tables.events
    // no longer sets it as a read side-effect — VERDICT r11 #4)
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // prefix-key co-partitioned joins on bucketed layouts (GraftSession
    // mirrors this — q130's delta join on (l_orderkey, l_linenumber)
    // over tables bucketed by l_orderkey)
    .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    .config("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
