package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Iterative link-graph analytics (Graph.pageRank). */
class GraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("pageRank on a cycle is the uniform fixed point at every iteration") {
    // 0→1→2→0: outdeg 1 everywhere, so PR = 1/3 is exactly preserved —
    // teleport (0.15/3) + 0.85·(1/3) = 1/3 in IEEE? Not bit-exactly, but
    // ranks must stay equal across nodes and sum to ~1.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, "src", "dst", iterations = 4)
      .as[(Long, Double)].collect().toMap
    assert(pr.keySet == Set(0L, 1L, 2L))
    assert(pr.values.toSet.size == 1) // symmetry ⇒ identical ranks
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
  }

  test("pageRank concentrates mass on the sink-hub of a star (hand-checked)") {
    // 1→0, 2→0, 0→1: after one iteration PR(0) = 0.15/3 + 0.85·(2/3),
    // PR(1) = 0.15/3 + 0.85·(1/3), PR(2) = 0.15/3 (teleport only).
    val edges = Seq((1L, 0L), (2L, 0L), (0L, 1L)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, "src", "dst", iterations = 1)
      .as[(Long, Double)].collect().toMap
    val t = 0.15 / 3
    assert(math.abs(pr(0L) - (t + 0.85 * (2.0 / 3))) < 1e-12)
    assert(math.abs(pr(1L) - (t + 0.85 * (1.0 / 3))) < 1e-12)
    assert(math.abs(pr(2L) - t) < 1e-12)
    assert(pr(0L) > pr(1L) && pr(1L) > pr(2L))
  }

  test("pageRank is deterministic across runs and partitioning") {
    val edges = (0L until 60L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 60), (i, (i * 7 + 2) % 60))).toDF("src", "dst")
    val a = Graph.pageRank(edges.repartition(7), "src", "dst", 3)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    val b = Graph.pageRank(edges.repartition(3), "src", "dst", 3)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(a == b) // decimal-exact sums ⇒ bit-identical, any partitioning
  }

  test("iterations = 0 returns the uniform start vector") {
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, "src", "dst", iterations = 0)
      .as[(Long, Double)].collect().toMap
    assert(pr == Map(0L -> 0.5, 1L -> 0.5))
  }
}
