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

  /** Temperature-scaled source-mixture plan: per-source sampling weight
    * w_s = sqrt(n_s) / Σ sqrt(n), plus the per-source row target out of
    * `budget` total samples. This is the α=0.5 case of the standard
    * count^α mixture reweighting used to flatten source imbalance when
    * assembling a training mix (upweights small sources, downweights
    * mega-sources). sqrt is IEEE-correctly-rounded in every engine —
    * unlike pow/exp — so the weights are engine-portable exactly; the
    * weight denominator is summed in DECIMAL over rounded sqrt values.
    *
    * Per-source targets are apportioned by largest remainder (Hamilton's
    * method): floor every exact share, then hand the leftover
    * budget − Σ floor rows to the sources with the largest fractional
    * parts (ties → source asc), so Σ target_rows == budget EXACTLY
    * (plain flooring undershot by up to #sources−1 rows, ADVICE r7).
    *
    * One partial+final groupBy over the corpus; everything after runs on
    * the ∼#sources-row table as single-partition window functions (the
    * denominator, the leftover, and the fractional rank all share one
    * exchange — no extra aggregate/crossJoin round-trips; the
    * "no partition defined" window is deliberate and bounded by
    * construction) and the driver never sees the data.
    */
  def mixtureWeights(df: DataFrame, sourceCol: Column, sizeCol: Column,
                     budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val allRows = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byFrac = Window.partitionBy()
      .orderBy((col("__exact") - col("__base")).desc_nulls_last,
        col("source").asc_nulls_first)
    df.groupBy(sourceCol.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(sizeCol).cast("long").as("n_tok"))
      .withColumn("w",
        round(sqrt(col("n_tok").cast("double")), 6).cast("decimal(18,6)"))
      .withColumn("tw", sum(col("w")).over(allRows).cast("decimal(28,6)"))
      .withColumn("__exact",
        lit(budget) * (col("w").cast("double") / col("tw").cast("double")))
      .withColumn("__base", floor(col("__exact")).cast("long"))
      .withColumn("__leftover",
        (lit(budget) - sum(col("__base")).over(allRows)).cast("long"))
      .withColumn("__rk", row_number().over(byFrac))
      .select(col("source"), col("n_docs"), col("n_tok"),
        round(col("w").cast("double") / col("tw").cast("double"), 6)
          .as("weight"),
        (col("__base") +
          when(col("__rk") <= col("__leftover"), 1L).otherwise(0L))
          .cast("long").as("target_rows"))
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-Res): each row draws a stable uniform u from md5(key)
    * and ranks by ln(u)/w — the log-monotone form of the u^(1/w) key,
    * avoiding cross-engine pow() — so a row's selection probability is
    * proportional to its weight. The standard way to draw a
    * quality-weighted training subset: one scan + global top-k, which
    * plans as TakeOrderedAndProject (per-partition top-k then a k-row
    * merge — no full sort, no shuffle of the corpus). Weights must be
    * > 0. u is shifted to (0,1) strictly (+0.5/2^32) so ln never sees 0;
    * exact key ties break by the key column for full determinism.
    *
    * Cross-engine caveat: ln() is only ~1-ulp-accurate and its exact
    * bits differ between libm implementations (JVM StrictMath vs
    * DuckDB's C libm), so a near-tie at the top-k BOUNDARY can flip
    * which row an oracle on another engine selects — the within-engine
    * result is fully deterministic, the cross-engine hash match is
    * probabilistic in corpus size (fine at verify SF; a strict-parity
    * variant would need an integer/decimal rank key). */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
                     k: Int): DataFrame = {
    val u = (conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4.294967296e9
    df.withColumn("__es", log(u) / weight)
      .orderBy(col("__es").desc_nulls_last, key.asc_nulls_first)
      .limit(k)
      .drop("__es")
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
