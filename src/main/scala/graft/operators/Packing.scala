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

  /** [[chunkedPack]]'s retrieval-side sibling — overlapping token chunks
    * (RAG / embedding-ingestion windowing): one output row per (doc,
    * chunk), chunk `i` covering tokens `[i·stride, i·stride + size)`.
    * Trailing partial chunks are kept (standard retrieval practice — the
    * tail of a document must be searchable); a 0-token doc yields 0
    * chunks. `stride < size` gives the overlap that keeps a fact
    * straddling a boundary intact in at least one chunk.
    *
    * Scale shape: map-only — the chunk starts are a per-row `sequence`
    * explode, no shuffle anywhere; fan-out is n_tok/stride rows per doc
    * (bounded by the documents' own length, the same fan-out any
    * embedding pass pays). Output: (doc_id, chunk_id, chunk,
    * n_chunk_toks). */
  def slidingChunks(docs: DataFrame, id: Column, toks: Column,
                    chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize (got size=$chunkSize stride=$stride)")
    docs
      .select(id.as("doc_id"), toks.as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .select(col("doc_id"), col("__toks"), col("__n"),
        posexplode(
          when(col("__n") === 0, array().cast("array<int>"))
            .otherwise(sequence(lit(0), col("__n") - 1, lit(stride))))
          .as(Seq("chunk_id", "__start")))
      .select(col("doc_id"), col("chunk_id"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(chunkSize)), " ")
          .as("chunk"),
        least(lit(chunkSize), col("__n") - col("__start")).cast("int")
          .as("n_chunk_toks"))
  }
}
