package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity search — SURVEY §2.9 L2.
  *
  * Baseline: brute-force cosine top-k ([[cosine]] + orderBy/limit →
  * TakeOrderedAndProject — per-partition top-k, no global sort). The scale
  * path is [[ivfAssign]]: partition vectors into coarse buckets keyed by
  * their dominant dimensions (an IVF-style inverted file without trained
  * centroids — deterministic, no ML dependency); queries probe only
  * matching buckets, turning a full scan into a bucket-pruned scan.
  *
  * All arithmetic in double (floats widened exactly); both Spark's
  * `aggregate` fold and DuckDB's list functions reduce left-to-right, and
  * results are rounded before any hash-compare (SURVEY §7.4.7).
  */
object Similarity {

  private def d(c: Column): Column = c.cast("double")

  /** Sequential-fold dot product of two float/double array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (s, x) => s + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against one query vector (broadcast). Scores
    * rounded to `scale` decimals BEFORE ranking so the ranking tiebreak
    * (id asc) is engine-portable. */
  def cosineTopK(vectors: DataFrame, idCol: String, vecCol: String,
                 query: DataFrame, queryVecCol: String, k: Int,
                 scale: Int = 6): DataFrame =
    vectors.crossJoin(broadcast(query))
      .select(col(idCol),
        round(cosine(col(vecCol), col(queryVecCol)), scale).as("score"))
      .orderBy(col("score").desc_nulls_last, col(idCol).asc_nulls_first)
      .limit(k)

  /** IVF-style coarse bucketing: bucket = argmax |component| over the first
    * `probeDims` dimensions, signed. Vectors and queries bucketed the same
    * way; ANN search joins on the bucket then ranks within it. */
  def ivfAssign(vec: Column, probeDims: Int): Column = {
    val idx = (1 to probeDims).map { i =>
      struct(abs(d(element_at(vec, i))).as("mag"),
             (lit(i) * signum(d(element_at(vec, i)))).cast("int").as("b"))
    }
    array_max(array(idx: _*)).getField("b")
  }
}
