package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Order-insensitive incremental group fingerprint as a custom typed
  * `Aggregator` (SURVEY §4's TypedImperativeAggregate/Aggregator
  * candidate (a)).
  *
  * XOR over per-row 60-bit md5-derived hashes is commutative/associative,
  * so partial (map-side) and final aggregation compose freely and the
  * buffer is ONE long regardless of group size — a collect_list-style
  * aggregate holds the whole group in memory, which dies on an unbounded
  * group at 100 TB (PlanLintSpec bans that shape from registered plans).
  * The md5-derived row hash keeps the oracle replayable in DuckDB
  * (`bit_xor(CAST('0x'||substr(md5(x),1,15) AS BIGINT))`).
  *
  * Trade-off vs q45's modular hash SUM: XOR cancels duplicate rows
  * pairwise (a⊕a=0), so this fingerprint treats groups as multisets
  * mod 2 — fine for set-equality checks over deduped inputs (the
  * engine's state rows are PK-unique); q45's sum keeps duplicates
  * visible when exact multiset identity matters. Both are one-value
  * buffers.
  */
object XorFingerprint extends Aggregator[Long, Long, Long] {
  override def zero: Long = 0L
  override def reduce(b: Long, a: Long): Long = b ^ a
  override def merge(b1: Long, b2: Long): Long = b1 ^ b2
  override def finish(r: Long): Long = r
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  /** 60-bit engine-portable row hash (15 hex chars of md5 — keeps the
    * BIGINT positive in both engines). */
  def rowHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** The aggregate as a Column over a precomputed [[rowHash60]] column. */
  def agg(hashCol: Column): Column =
    udaf(XorFingerprint, Encoders.scalaLong).apply(hashCol)
}
