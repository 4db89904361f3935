package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys — the manual fallback when AQE's
  * skew-join splitting isn't applicable (e.g. a broadcast-ineligible dim
  * joined on a power-law key at the 100 TB design point).
  *
  * The big side is salted into `buckets` sub-keys (deterministically, from
  * a hash of the full row, so replays are stable); the dimension side is
  * replicated once per bucket. The shuffle then spreads each hot key over
  * `buckets` reducers at the cost of a `buckets`× dim replication — cheap
  * when dim ≪ fact, which is the only regime where this is needed.
  */
object Skew {

  /** Equi-join `big ⋈ dim` on `keys`, spreading each key over `buckets`
    * partitions. Result equals the unsalted join (salt is internal) for
    * join types that never emit unmatched DIM rows — right/full outer are
    * rejected, because the `buckets`× dim replication would surface each
    * unmatched dim row once per salt. */
  def saltedJoin(big: DataFrame, dim: DataFrame, keys: Seq[String],
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin cannot preserve '$joinType' semantics: unmatched dim " +
        "rows would be replicated once per salt bucket")
    val bigS = big.withColumn("__salt",
      pmod(hash(big.columns.toIndexedSeq.map(col): _*), lit(buckets)))
    val dimS = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigS.join(dimS, keys :+ "__salt", joinType).drop("__salt")
  }
}
