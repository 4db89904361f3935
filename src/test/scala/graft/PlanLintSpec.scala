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
    * vector, q61/q81 cross filtered bounded candidate sets, q71 crosses a
    * 1-row corpus count. */
  private val crossJoinWhitelist = Set(
    "q51_cosine_topk", "q61_embedding_neardup", "q65_cosine_topk_native",
    "q71_tfidf", "q81_levenshtein")

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
}
