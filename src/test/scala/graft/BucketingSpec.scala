package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

/** Bucketed co-located join: same-bucketed tables join with zero shuffle
  * exchanges. */
class BucketingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed-by-key join plans without a shuffle exchange") {
    val facts = (1L to 1000L).map(i => (i % 50, s"f$i")).toDF("key", "fact")
    val state = (0L until 50L).map(i => (i, s"s$i")).toDF("key", "label")
    Bucketing.writeBucketed(facts, "graft_facts_b", Seq("key"), 8)
    Bucketing.writeBucketed(state, "graft_state_b", Seq("key"), 8)
    // force SortMergeJoin so the exchange presence/absence is what's tested
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.readBucketed(spark, "graft_facts_b")
        .join(Bucketing.readBucketed(spark, "graft_state_b"), Seq("key"))
      assert(Bucketing.isShuffleFree(joined),
        s"expected no shuffle:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 1000L)

      // control: the same join over unbucketed frames DOES shuffle
      val plain = facts.join(state, Seq("key"))
      assert(!Bucketing.isShuffleFree(plain))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_facts_b")
      spark.sql("DROP TABLE IF EXISTS graft_state_b")
    }
  }
}
