package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence construction: assign documents to fixed-token-budget
  * sequences (the corpus→training-batch step after curation/dedup).
  *
  * Chunked packing: within a shard, documents are laid out in a
  * deterministic order and a document starts at the running token offset
  * of everything before it; its sequence id is `offset / budget`. A doc
  * straddling a boundary belongs to the sequence it starts in (real
  * loaders split it; the assignment is what the engine owns). This is the
  * standard streaming-concat form — greedy first-fit bin packing is
  * order-dependent and needs a sequential scan, which is exactly what a
  * distributed engine must not do.
  *
  * Scale shape: the window partitions by `shard` — sequences are built
  * per shard (per language / per source / per hash bucket), so no global
  * ordering exists anywhere and each shard's running sum is one
  * partition-local pass. A single global sequence space would force a
  * 1-partition window — refuse that shape; shard instead.
  */
object Packing {

  /** Adds (tok_before, seq_id, tok_offset) per row: running token count
    * before this doc within its shard, the budget-chunk sequence id, and
    * the doc's start offset inside that sequence. */
  def chunkedPack(df: DataFrame, shardCol: Column, orderCol: Column,
                  nTokCol: Column, budget: Int): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("tok_before", sum(nTokCol).over(w) - nTokCol)
      .withColumn("seq_id", floor(col("tok_before") / budget))
      .withColumn("tok_offset", col("tok_before") % budget)
  }
}
