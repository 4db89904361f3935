package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan lint over EVERY registered query: no accidental CartesianProduct
  * or BroadcastNestedLoopJoin may appear in any physical plan — the two
  * shapes that silently turn into scale-killers. Queries that
  * intentionally cross-join a bounded side (1-row aggregates, bounded
  * candidate sets) are whitelisted explicitly so a new offender fails
  * loudly. Plans are built against sf0.001 (analysis only — nothing
  * executes).
  */
class PlanLintSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Intentional bounded cross joins: q51/q65 broadcast a 1-row query
    * vector, q61 crosses a filtered bounded candidate set (kept as the
    * small-N oracle twin of the IVF-bucketed q86), q71 crosses a 1-row
    * corpus count, q50/q60 broadcast a 1-row corpus count for the
    * jaccardPairs df-cap guard. q81 is deliberately NOT here anymore —
    * its length-band prefilter made it a plain equi-join. */
  private val crossJoinWhitelist = Set(
    "q51_cosine_topk", "q61_embedding_neardup", "q65_cosine_topk_native",
    "q71_tfidf", "q50_jaccard_pairs", "q60_ngram_jaccard")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plan has no unbounded nested-loop or cartesian join") {
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val offending =
        plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")
      if (crossJoinWhitelist.contains(name)) assert(true)
      else assert(!offending, s"scale-killer join shape in $name:\n$plan")
    }
  }

  test("q58 LSH candidate join is guarded by the bucket-size cap") {
    // Dedup.lshCandidates implements the cap as a count window over
    // (band, bucket) before the self-join; an unguarded inline bucket
    // self-join (the shape that measured 172× slower on a homogeneous
    // corpus, SCALE.md) has no Window operator in its physical plan.
    val plan = SparkEntry.queries("q58_minhash_lsh")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"),
      s"q58 lost its LSH bucket-size cap (no Window in plan):\n$plan")
  }
}
