package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Vocab

/** Vocabulary build + sequence encoding (operators.Vocab). */
class VocabSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b b c"),
    (2L, "b c c z"),
    (3L, "")
  ).toDF("doc_id", "text")

  private def toks = docs.select(explode(split(col("text"), " ")).as("token"))

  test("build ranks by count desc then token asc, ids contiguous from 1") {
    val v = Vocab.build(toks, "token", n = 3)
      .select("token", "n_tok", "token_id")
      .as[(String, Long, Long)].collect().toList.sortBy(_._3)
    // counts: b=3, c=3, a=1, z=1, ""=1 → tie-breaks: b before c, "" first
    // among count-1 (empty string sorts lowest)
    assert(v == List(("b", 3L, 1L), ("c", 3L, 2L), ("", 1L, 3L)))
  }

  test("encode preserves order and maps OOV to unk") {
    val v = Vocab.build(toks, "token", n = 2) // keeps only b, c
    val got = Vocab.encode(docs, "doc_id", split(col("text"), " "), v)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Long](r.fieldIndex("ids")).toList,
        r.getLong(r.fieldIndex("n_tok"))))
      .toList
    assert(got == List(
      (1L, List(0L, 1L, 1L, 2L), 4L),   // a→unk, b→1, b→1, c→2
      (2L, List(1L, 2L, 2L, 0L), 4L),   // z→unk
      (3L, List(0L), 1L)))              // "" splits to [""] → one unk
  }

  test("encode's dictionary side is a broadcast join (no corpus shuffle)") {
    val v = Vocab.build(toks, "token", n = 2)
    val plan = Vocab.encode(docs, "doc_id", split(col("text"), " "), v)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("an over-threshold dictionary falls back to a shuffle join, same result") {
    val v = Vocab.build(toks, "token", n = 2)
    val shuffled =
      Vocab.encode(docs, "doc_id", split(col("text"), " "), v,
        maxBroadcastBytes = 1L)
    // the hint is withheld: the lookup must NOT be a forced broadcast
    // (Catalyst may still auto-broadcast a genuinely tiny side, so pin
    // the logical plan: no ResolvedHint survives analysis)
    val logical = shuffled.queryExecution.analyzed.toString
    assert(!logical.contains("UnresolvedHint") && !logical.contains("ResolvedHint"),
      logical)
    // and with auto-broadcast off it plans as a real shuffle join
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Vocab.encode(docs, "doc_id", split(col("text"), " "), v,
        maxBroadcastBytes = 1L).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // both shapes agree on the encoding
    val broadcasted =
      Vocab.encode(docs, "doc_id", split(col("text"), " "), v)
        .orderBy("doc_id").collect().map(_.toString).toList
    assert(shuffled.orderBy("doc_id").collect().map(_.toString).toList
      == broadcasted)
  }
}
