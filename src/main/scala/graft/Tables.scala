package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the shared parquet corpus (TESTDATA.md / FIXTURES.md §B).
  *
  * Each table is a directory-less single parquet file; at 100 TB these
  * become multi-file partitioned datasets and `spark.read.parquet(dir)`
  * scans them partition-parallel with predicate pushdown — the Spark
  * mapping of the reference's paginated list source (SURVEY §2.1 S1,
  * reference src/scrapers/scraper.py:67-127).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else read(spark, dir, name)

  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is physically TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects outright; read nanos as long and re-derive a proper
    * TimestampType column (the corpus is µs-aligned, so the division is
    * exact). DuckDB reads the same column as TIMESTAMP_NS natively. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
}
