package graft.operators

import scala.collection.mutable.ArrayBuffer

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

  /** Distributed BPE merge-table TRAINING (Sennrich et al. 2016 —
    * learn_bpe's loop; the counterpart of [[graft.functions.BpeTokens]],
    * which only ENCODES with a given table, VERDICT r12 #1). Input is
    * the word-TYPE table `(word, weight)` — the caller aggregates the
    * corpus down to distinct words with counts first, which is the ONE
    * corpus-sized step of BPE training (at 100 TB: one hash aggregation;
    * everything after runs on the bounded type table, exactly how
    * subword-nmt/fastBPE train on `get_vocabulary()` output).
    *
    * Loop, per merge rank k:
    *  1. pair counts: one aggregation over the type table's adjacent
    *     symbol pairs, weighted by word frequency (every adjacent
    *     position counts, the get_stats contract);
    *  2. argmax with the DETERMINISTIC tie-break (count DESC, then pair
    *     lexicographic ASC) as a TakeOrdered limit(1) — one row to the
    *     driver per rank (the merge decision is inherently sequential;
    *     the collected artifact is the ≤ nMerges-row model, the kmeans-
    *     centroid bounded-collect pattern);
    *  3. re-pair: merge all leftmost-non-overlapping occurrences of the
    *     winning pair in every type's symbol array — a row-local
    *     higher-order `aggregate` fold, no shuffle.
    * State is `(syms, weight)` with `localCheckpoint` lineage truncation
    * every `checkpointEvery` ranks (the q103/q92 iterative-loop shape:
    * without it the fold stack grows one plan level per rank).
    *
    * The learned table is VALID by construction — rank k's components
    * exist before rank k — which is precisely the property
    * [[graft.functions.Bpe]]'s ascending-pass oracle equivalence rests
    * on, so the learned merges feed `bpeTokens` directly (VocabSpec
    * round-trips the corpus through the learned table). Initial symbols
    * are Unicode code points via `bpeTokens(word, Nil)` — the SAME
    * symbolization the encoder starts from. Returns the merge list in
    * rank order; stops early when no adjacent pair remains. */
  def learnBpe(types: DataFrame, word: Column, weight: Column, nMerges: Int,
               checkpointEvery: Int = 8): Seq[(String, String)] = {
    require(nMerges >= 0, s"nMerges must be >= 0 (got $nMerges)")
    var state = types
      .select(graft.functions.BpeFunctions.bpeTokens(word, Nil).as("syms"),
        weight.cast("long").as("w"))
      .filter(size(col("syms")) >= 2)
      .localCheckpoint()
    val merges = ArrayBuffer.empty[(String, String)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val top = state
        .select(col("w"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("w")).as("cnt"))
        .orderBy(col("cnt").desc, col("x").asc, col("y").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (x, y) = (top(0).getString(0), top(0).getString(1))
        merges += ((x, y))
        state = state.withColumn("syms", mergePair(col("syms"), x, y))
        rank += 1
        if (rank % checkpointEvery == 0) state = state.localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Adjacent symbol pairs of one array as `struct(x, y)` — every
    * position, including overlapping repeats (aaa → (a,a) twice: the
    * get_stats counting contract). */
  private def adjacentPairs(syms: Column): Column =
    zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (a, b) => struct(a.as("x"), b.as("y")))

  /** Merge all leftmost-non-overlapping `(x, y)` adjacencies into `xy` —
    * one row-local fold: carry (emitted prefix, pending symbol); a
    * pending `x` followed by `y` emits the merged symbol and clears,
    * anything else flushes the pending symbol. Matches
    * [[graft.functions.Bpe.encode]]'s merge step exactly (VocabSpec
    * cross-checks the fold against the JVM loop). */
  private def mergePair(syms: Column, x: String, y: String): Column = {
    val empty = typedLit(Seq.empty[String]).as("acc")
    val noPend = lit(null).cast("string").as("pend")
    aggregate(
      syms,
      struct(empty, noPend),
      (st, s) => {
        val acc = st.getField("acc")
        val pend = st.getField("pend")
        when(pend.isNull, struct(acc.as("acc"), s.as("pend")))
          .when(pend === lit(x) && s === lit(y),
            struct(concat(acc, array(lit(x + y))).as("acc"), noPend))
          .otherwise(struct(concat(acc, array(pend)).as("acc"), s.as("pend")))
      },
      st => when(st.getField("pend").isNull, st.getField("acc"))
        .otherwise(concat(st.getField("acc"), array(st.getField("pend")))))
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
