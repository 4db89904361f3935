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
    spark.read.parquet(s"$dir/$name.parquet")
}
