package graft

import org.apache.spark.sql.functions._

import graft.operators.{Delta, Fingerprint, Upsert}
import graft.queries.Q

/** Scale smoke: the shuffle-heavy core operators at ~10× the bench corpus
  * (sf0.1 lineitem unioned 10× ≈ 6M rows) — evidence the partition
  * strategy holds as data grows, not just at the verified SF.
  * Run: sbt "runMain graft.ScaleSmoke [multiplier]" */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus)

    val base = Tables.load(spark, sfDir, "lineitem")
    // union-multiply with perturbed keys so cardinality actually grows
    val big = (0 until mult).map { i =>
      base.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 10000000L))
    }.reduce(_ unionByName _)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale] $label%-22s rows=$n%10d  ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    val rows = big.count()
    println(s"[scale] input rows=$rows (x$mult)")

    time("fingerprint+scan") {
      big.select(Fingerprint.rowHash(Seq(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_returnflag"))).as("h"))
        .agg(count(lit(1))).head().getLong(0)
    }
    time("delta-antijoin") {
      val fresh = big.select(col("l_orderkey"), col("l_linenumber"),
        Fingerprint.rowHash(Seq(col("l_orderkey"), col("l_partkey"))).as("row_hash"))
      val state = fresh.filter(col("l_orderkey") % 2 === 0)
        .groupBy("l_orderkey", "l_linenumber").agg(min("row_hash").as("row_hash"))
      Delta.changedOrNew(fresh, state, Seq("l_orderkey", "l_linenumber")).count()
    }
    time("window-dedup") {
      Upsert.keepFirst(big, Seq("l_orderkey", "l_linenumber"),
        Seq(col("l_partkey").asc_nulls_first, col("l_suppkey").asc_nulls_first)).count()
    }
    time("group-agg") {
      big.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(Q.sumExact(col("l_quantity")).as("s"), count(lit(1)).as("n"))
        .count()
    }
    spark.stop()
  }
}
