package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Bounded-state frequency/membership sketches — the approximate
  * structures a 100 TB pipeline uses where exact state would itself be
  * data-sized (SURVEY §2.9 scale tier; Cormode & Muthukrishnan 2005
  * count-min, Bloom 1970 membership).
  *
  * Both sketches here are DETERMINISTIC: every hash row is an md5 digest
  * window (`HashFunctions.md5Window`, the engine's portable hash
  * contract, SURVEY §7.4.8), so a DuckDB oracle can replicate the sketch
  * arithmetic bit-for-bit — the estimates themselves are oracle-checked,
  * not just "plausible".
  *
  * Scale shape shared by both:
  *  - BUILD is one map-side-combinable aggregation over the stream of
  *    items: the sketch is `depth × width` (CMS) or ≤ `k·m` (Bloom) rows
  *    REGARDLESS of corpus size — the whole point. One shuffle whose
  *    output is bounded by the sketch dimensions, not the data.
  *  - PROBE broadcasts the bounded sketch and costs one pass over the
  *    probe side — never a corpus × corpus join, never a driver collect.
  *  - The reference's per-row python dict counters
  *    (/root/reference/src/processors/data_processor.py:61-104 keeps
  *    whole-frame state in memory) cannot exceed one machine; these are
  *    the distributed replacements.
  */
object Sketches {

  /** One row per (hash-row, bucket) with this item's positions —
    * `posexplode` supplies the row index r, the value is h_r(item) % width.
    * All `depth` digests come from ONE md5 evaluation (windows 0–3). */
  private def hashRows(item: Column, depth: Int, width: Int): Column = {
    require(depth >= 1 && depth <= 4,
      s"sketch depth must be in [1, 4] — md5 yields 4 independent " +
        s"32-bit windows (got $depth)")
    array((0 until depth).map(r => HashFunctions.md5Window(item, r) % width): _*)
  }

  /** Count-min sketch BUILD: the `depth × width` counts table from one
    * aggregation over `items` (one row per occurrence). Output columns
    * `(r, bucket, cnt)`; at most `depth · width` rows — broadcastable by
    * construction. */
  def cmsBuild(items: DataFrame, item: Column, depth: Int, width: Int): DataFrame =
    items
      .select(posexplode(hashRows(item, depth, width)).as(Seq("r", "bucket")))
      .groupBy("r", "bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Count-min ESTIMATE for each candidate: min over the `depth` rows of
    * the candidate's bucket counts — an OVERESTIMATE of the true count,
    * never an under (collisions only add). `candidates` must expose the
    * item under the column produced by `item`; output `(item, est)`.
    *
    * The sketch is broadcast (≤ depth·width rows); the probe is one pass
    * over `candidates` + a bounded-side join. A candidate absent from
    * the build stream estimates ≥ 0 via the left join (its buckets may
    * simply not exist in the counts table). */
  def cmsEstimate(candidates: DataFrame, item: Column,
                  sketch: DataFrame, depth: Int, width: Int): DataFrame = {
    val probed = candidates
      .select(item.as("item"))
      .select(col("item"),
        posexplode(hashRows(col("item"), depth, width)).as(Seq("r", "bucket")))
    probed
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Deterministic Bloom filter BUILD: the set-bit table for `state`'s
    * keys — bit ids are `r·m + h_r(key) % m` for r in [0, k), so the k
    * hash families occupy disjoint id ranges and a single `distinct`
    * yields ≤ k·m rows (the filter's fixed size, corpus-independent).
    * Size m at ~10 bits per expected distinct key for ~1% false
    * positives with k=4; this builder pins m explicitly so the filter —
    * and its oracle — is a pure function of the state set. */
  def bloomBuild(state: DataFrame, key: Column, k: Int, m: Int): DataFrame =
    state
      .select(explode(hashBits(key, k, m)).as("bit"))
      .distinct()

  private def hashBits(key: Column, k: Int, m: Int): Column = {
    require(k >= 1 && k <= 4,
      s"bloom k must be in [1, 4] — md5 yields 4 independent 32-bit " +
        s"windows (got $k)")
    array((0 until k).map(r =>
      HashFunctions.md5Window(key, r) % m + lit(r.toLong * m)): _*)
  }

  /** Bloom MEMBERSHIP probe: `maybe_member = 1` iff ALL k bit positions
    * of the probe key are set in `bits`. No false negatives (a state key
    * always probes 1); false positives are deterministic given (state,
    * k, m). The bits table is broadcast (≤ k·m rows); cost is one pass
    * over the probe side — the 100 TB "skip known keys" gate that
    * replaces a full anti-join against data-sized state. Output: `probe`
    * plus an INT `maybe_member` column. `probe` rows must be DISTINCT (a
    * keyed table): the re-group after the bit explode folds identical
    * rows together, and a duplicated row would double its bit count. */
  def bloomProbe(probe: DataFrame, key: Column,
                 bits: DataFrame, k: Int, m: Int): DataFrame = {
    val cols = probe.columns
    probe
      .withColumn("__bit", explode(hashBits(key, k, m)))
      .join(broadcast(bits.withColumnRenamed("bit", "__bit")
        .withColumn("__hit", lit(1))), Seq("__bit"), "left")
      .groupBy(cols.map(col).toIndexedSeq: _*)
      .agg((count(col("__hit")) === k).cast("int").as("maybe_member"))
  }
}
