package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative link-graph analytics — the numeric sibling of
  * [[Dedup.clusterPairs]]' label-propagation connected components. A
  * crawl-curation pipeline uses link-graph centrality as a document
  * quality prior (the classic PageRank-weighted sampling of web corpora);
  * this is that computation, Spark-first.
  *
  * Scale design: each iteration is one equi-join of the edge table with
  * the current rank vector on src (co-partitioned after the first
  * shuffle — the join key never changes, so AQE reuses the exchange) plus
  * one aggregation by dst. Nothing is ever collected to the driver; the
  * per-iteration `localCheckpoint` truncates the growing lineage exactly
  * like the CC loop does. Edge lists at 100 TB shuffle once per
  * iteration, keyed on the same column throughout.
  *
  * Float parity (for oracle-checked use): per-node contribution sums
  * accumulate in DECIMAL(38,18) (exact — partial-aggregation order can't
  * matter) and recast through DECIMAL(28,12) before the double (ranks are
  * < 1, so the scaled integer stays < 2^53 and both engines convert
  * exactly). Every other step is scalar IEEE double math replayed
  * identically by any engine — no per-iteration rounding is needed, and
  * none is applied (round() itself is the one op whose decimal
  * interpretation can differ across engines). Callers matching an
  * oracle must force DOUBLE subtraction for the teleport constant:
  * Spark's `lit(1.0 - damping)` is IEEE double math
  * (0.15000000000000002 for damping=0.85), but a SQL engine like
  * DuckDB evaluates the bare literal expression `1.0 - 0.85` in exact
  * DECIMAL arithmetic (= the different double 0.15) — write
  * `CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)` on the oracle side.
  */
object Graph {

  private def decSum(c: Column): Column =
    sum(c.cast("decimal(38,18)")).cast("decimal(28,12)").cast("double")

  /** Fixed-iteration damped PageRank over an edge DataFrame. Returns
    * (node, pr). Dangling nodes (no out-edges) contribute no mass —
    * callers whose graphs have them should add self-edges or accept the
    * leaked mass (the reference-free standard simplification); nodes
    * with no IN-edges keep the teleport term only.
    *
    * @param edges      (src, dst) rows; parallel edges count twice
    * @param iterations fixed iteration count (the oracle-checkable form —
    *                   convergence loops belong to the caller)
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    // Loop invariants are materialized ONCE (r19 measurement: the caller's
    // edge-construction subtree — q103's fixture is a global-window join —
    // re-executed inside every iteration's contrib AND rank-update jobs,
    // ~3 subtree recomputes per iteration; at 100 TB that is 3 extra full
    // passes over the edge list per iteration). `nodes` and `outdeg`
    // (|V|-bounded) and the edge list itself are checkpointed before the
    // loop; everything they pinned is released before returning — the
    // returned rank vector is its own checkpoint and no longer reads them.
    val eTbl = edges.select(col(srcCol), col(dstCol))
    val e = if (iterations > 0) eTbl.localCheckpoint() else eTbl
    val nodes0 = e.select(col(srcCol).as("node"))
      .union(e.select(col(dstCol).as("node"))).distinct()
    val nodes = if (iterations > 0) nodes0.localCheckpoint() else nodes0
    // 1-row broadcast: node count feeds the teleport term of every rank
    val n = broadcast(nodes.agg(count(lit(1)).cast("double").as("n_nodes")))
    val outdeg0 = e.groupBy(col(srcCol).as("src_node"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
    val outdeg = if (iterations > 0) outdeg0.localCheckpoint() else outdeg0
    var pr = nodes.crossJoin(n)
      .select(col("node"), (lit(1.0) / col("n_nodes")).as("pr"))
    var prPinned = false
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(pr.withColumnRenamed("node", "src_node")
          .withColumnRenamed("pr", "src_pr"), col(srcCol) === col("src_node"))
        .join(outdeg, "src_node")
        .select(col(dstCol).as("node"), (col("src_pr") / col("outdeg")).as("c"))
        .groupBy(col("node")).agg(decSum(col("c")).as("in_sum"))
      val next = nodes.crossJoin(n)
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) / col("n_nodes") +
            lit(damping) * coalesce(col("in_sum"), lit(0.0))).as("pr"))
        .localCheckpoint()
      // next is materialized (eager checkpoint) — free the previous
      // round's pinned blocks instead of waiting for GC
      if (prPinned) pr.unpersist()
      pr = next
      prPinned = true
    }
    if (iterations > 0) { e.unpersist(); nodes.unpersist(); outdeg.unpersist() }
    pr
  }
}
