package graft

import org.apache.spark.sql.catalyst.plans.QueryPlan

/** Dev loop: where does a query's wall-time go — plan construction,
  * analysis, optimization, physical planning, or execution? Surfaces
  * driver-side plan blowups (expression-tree duplication through
  * project collapse) that per-query totals hide.
  * Run: sbt "runMain graft.PlanProbe q88_pipeline_fallback [...]"
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    System.setProperty(graft.queries.Q.NoOrderProp, "true")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus)

    def exprNodes(p: QueryPlan[_]): Long = {
      var n = 0L
      p.foreach {
        case node: QueryPlan[_] =>
          node.expressions.foreach(_.foreach(_ => n += 1))
        case _ => ()
      }
      n
    }

    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      val analyzed = df.queryExecution.analyzed
      val t2 = System.nanoTime()
      val opt = df.queryExecution.optimizedPlan
      val t3 = System.nanoTime()
      df.queryExecution.executedPlan
      val t4 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t5 = System.nanoTime()
      // fresh plan, warm JVM: what a second bench pass pays
      val df2 = fn(spark, sfDir)
      val t6 = System.nanoTime()
      df2.write.format("noop").mode("overwrite").save()
      val t7 = System.nanoTime()
      println(f"[probe] $name%-26s construct=${(t1 - t0) / 1e9}%.2f analyze=${(t2 - t1) / 1e9}%.2f optimize=${(t3 - t2) / 1e9}%.2f physical=${(t4 - t3) / 1e9}%.2f exec1=${(t5 - t4) / 1e9}%.2f rerun=${(t7 - t6) / 1e9}%.2f exprNodes analyzed=${exprNodes(analyzed)} optimized=${exprNodes(opt)}")
      if (sys.env.contains("SPARK_GRAFT_METRICS")) {
        // the noop write above plans its OWN QueryExecution, so df2's
        // tree never ran and its metrics are all zero — execute df2's
        // plan directly (toRdd materializes every column of every row)
        // and read the metrics that execution populated
        val df3 = fn(spark, sfDir)
        df3.queryExecution.toRdd.foreach(_ => ())
        // AQE final trees nest executed subtrees inside QueryStageExec
        // LEAVES (ResultQueryStage/ShuffleQueryStage/BroadcastQueryStage
        // in 4.1) — plain foreach stops at the stage boundary, so walk
        // through each stage's wrapped plan explicitly
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
          f(p)
          p match {
            case a: AdaptiveSparkPlanExec => walk(a.executedPlan)(f)
            case s: QueryStageExec => walk(s.plan)(f)
            case other => other.children.foreach(walk(_)(f))
          }
        }
        walk(df3.queryExecution.executedPlan) { node =>
          val interesting = node.metrics.filter { case (k, m) =>
            m.value > 0 && (k.contains("time") || k.contains("duration") ||
              k == "numOutputRows" || k.contains("Time"))
          }
          if (interesting.nonEmpty)
            println(s"[metrics] ${node.nodeName}: " + interesting.map {
              case (k, m) => s"$k=${m.value}"
            }.mkString(" "))
        }
      }
    }
    spark.stop()
  }
}
