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

  /** `events.ts` has shipped as two physical types across corpus
    * generations: TIMESTAMP(NANOS) (which Spark's parquet reader rejects
    * outright — read nanos as long and re-derive µs; the corpus is
    * µs-aligned so the division is exact) and plain timestamp[us]
    * without UTC adjustment (which Spark reads as TIMESTAMP_NTZ).
    * Normalize both to session-zoned TimestampType: the session is
    * pinned UTC (GraftSession), so the NTZ→LTZ cast reads the same
    * instants the nanos path produced and every downstream query/oracle
    * sees one stable type. DuckDB reads either physical form natively.
    *
    * The nanos branch needs `spark.sql.legacy.parquet.nanosAsLong=true`
    * AT SESSION BUILD — [[GraftSession]] (and TestSpark) pin it. It used
    * to be (re)set here as a read side-effect, which raced concurrent
    * readers on the shared session conf (VERDICT r11 #4). GraftSession
    * also disables parquet NTZ inference, so on the µs corpus the reader
    * yields session-zoned timestamps directly and the cast below is
    * optimized away — keeping ts predicate pushdown at the scan (a
    * session without that conf still gets correct instants through the
    * live NTZ→LTZ cast; UTC pinning makes them identical). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val df = read(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
