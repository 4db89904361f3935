package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary building + sequence encoding — the step between curation
  * and training that turns text into token-id sequences (the unigram/
  * word-level skeleton of a BPE pipeline; the reference stops at raw
  * text, SURVEY §2.9 L4 extends here).
  *
  * Scale shape: [[build]] is one hash aggregation over the exploded
  * token stream followed by a top-N — the N-row vocab is bounded by
  * construction, so the final global rank window runs over N rows, never
  * corpus rows. [[encode]] broadcasts that bounded vocab into a map-side
  * left join (no shuffle on the corpus beyond the per-doc regroup), so
  * at 100 TB the corpus streams past an in-memory dictionary — UNLESS
  * the dictionary's estimated size exceeds `maxBroadcastBytes`, in which
  * case the hint is withheld and the lookup plans as a shuffle join (a
  * forced broadcast of an executor-memory-sized dictionary is an OOM,
  * not an optimization — VERDICT r7 #6).
  */
object Vocab {

  /** Top-`n` vocabulary by (count DESC, token ASC — the deterministic
    * tie-break), with contiguous 1-based `token_id` in that order. */
  def build(tokens: DataFrame, tokenCol: String, n: Int): DataFrame = {
    val counted = tokens.groupBy(col(tokenCol).as("token"))
      .agg(count(lit(1)).as("n_tok"))
      .orderBy(col("n_tok").desc, col("token").asc)
      .limit(n)
    // rank window over the already-bounded top-N (<= n rows, one task)
    counted.withColumn("token_id",
      row_number().over(Window.orderBy(col("n_tok").desc, col("token").asc))
        .cast("long"))
  }

  /** Encode each document's token sequence as vocab ids, order-preserving;
    * out-of-vocabulary tokens map to `unkId`. Returns (idCol, ids, n_tok).
    * `vocab` must carry (token, token_id) — pass [[build]]'s output.
    *
    * The broadcast hint is applied only while Catalyst's size estimate of
    * the dictionary stays under `maxBroadcastBytes` (default 64 MiB — a
    * few million tokens); above it the plain join lets Spark pick a
    * shuffle join, trading one extra corpus shuffle on `token` for not
    * materializing the dictionary on every executor. The estimate comes
    * from plan statistics (no job runs at construction). */
  def encode(docs: DataFrame, idCol: String, toks: Column,
             vocab: DataFrame, unkId: Long = 0L,
             maxBroadcastBytes: Long = 64L << 20): DataFrame = {
    val dict = vocab.select(col("token"), col("token_id"))
    val small =
      dict.queryExecution.optimizedPlan.stats.sizeInBytes <= maxBroadcastBytes
    docs.select(col(idCol), posexplode(toks).as(Seq("__pos", "token")))
      .join(if (small) broadcast(dict) else dict, Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(
        transform(
          array_sort(collect_list(struct(col("__pos"),
            coalesce(col("token_id"), lit(unkId)).as("__tid")))),
          p => p.getField("__tid")).as("ids"),
        count(lit(1)).as("n_tok"))
  }
}
