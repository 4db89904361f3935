package graft

/** Targeted per-query timing (dev loop for single-query optimization —
  * Bench.scala remains the driver-facing full sweep). Same measurement
  * contract as Bench: no-order plans through the noop sink, best of N.
  * Run: sbt "runMain graft.QueryBench q88_pipeline_fallback [q83_...]"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_PASSES (default 3). */
object QueryBench {
  def main(args: Array[String]): Unit = {
    System.setProperty(graft.queries.Q.NoOrderProp, "true")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val spark = GraftSession.build(s"local[$cpus]", cpus)
    try Tables.load(spark, sfDir, "lineitem").limit(1)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    args.foreach { name =>
      // paired A/B toggles, applied to the queries that FOLLOW:
      // --nowide strips Q.wide fan-outs; --wide restores the default
      if (name == "--nowide") {
        System.setProperty(graft.queries.Q.NoWideProp, "true"); ()
      } else if (name == "--wide") {
        System.clearProperty(graft.queries.Q.NoWideProp); ()
      } else {
      val fn = SparkEntry.queries(name)
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val mode = if (sys.props.get(graft.queries.Q.NoWideProp)
        .contains("true")) " (nowide)" else ""
      println(f"[qbench] $name$mode%-28s best ${times.min}%.3f s  all ${times.map(t => f"$t%.3f").mkString(" ")}")
      }
    }
    spark.stop()
  }
}
