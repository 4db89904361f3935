package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Source surface — SURVEY §2.1. The reference's paginated list source is
  * a partition-parallel multi-file scan in Spark terms (S1,
  * scraper.py:67-127): one file ≙ one page, and Spark schedules partitions
  * the way the reference schedules rounds of concurrent fetches.
  *
  * Scale rules baked in:
  *  - schemas are EXPLICIT for text formats — `inferSchema` double-scans
  *    100 TB before reading it;
  *  - predicate + column pushdown is free for parquet (and for CSV/JSON
  *    column pruning) once the plan is declarative — never pre-filter by
  *    hand on the driver;
  *  - point lookups (S6) stay `isin`/semi-join so they compile to source
  *    `In` pushdown + row-group pruning.
  */
object Readers {

  /** S1: parquet dataset scan (a path or directory of files). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with an explicit schema (never inferred). */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** CSV that captures malformed rows instead of dropping or failing —
    * the source-level form of the malformed-row filter (P2,
    * list_parser.py:36,41-43): rows that don't parse land with their raw
    * text in `corruptCol` and nulls elsewhere, so the pipeline can route
    * them (quarantine, count, retry) instead of silently losing them.
    * `schema` must include `corruptCol` as a string field. */
  def csvPermissive(spark: SparkSession, path: String, schema: StructType,
                    corruptCol: String = "_corrupt_record",
                    header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)

  /** JSON-lines with an explicit schema (the reference's XCom rows are
    * exactly row-oriented JSON — W4, dags/scraping_etl.py:49,72-74). */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S6: keyed point-lookup over any source — `isin` for literal key sets
    * (→ source In-pushdown), semi-join for key frames too large to inline. */
  def keyedLookup(df: DataFrame, key: String, values: Seq[Any]): DataFrame =
    df.filter(col(key).isin(values: _*))

  def keyedLookup(df: DataFrame, key: String, keys: DataFrame,
                  keysCol: String): DataFrame =
    df.join(keys, df(key) === keys(keysCol), "left_semi")
}
