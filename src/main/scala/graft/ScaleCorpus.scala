package graft

import org.apache.spark.sql.functions._

/** Materializes an N×-scaled, TESTDATA-SHAPED corpus mirror
  * (`<out>/<table>.parquet`, same layout `Tables.load` and the DuckDB
  * oracle both read) so the ORACLE COMPARISON itself can run at scale
  * (VERDICT r13 #6): `runMain graft.ScaleCorpus 10` then
  * `runMain graft.Verify <out> ...` + `tools/check.py <out> ...` —
  * CORRECTNESS_sf01 proved ×10-over-sf0.01 parity on natural data;
  * this proves it again on a corpus whose duplicate/rounding/decimal
  * EDGES are 10× denser (the q111 class of bug only surfaced at
  * sf0.1).
  *
  * Scheme: fact tables replicate `mult`× with per-replica PRIMARY-key
  * offsets (ids stay unique; a replica's rows never collide with
  * another's), while dimension-side foreign keys (o_custkey,
  * user_id, l_partkey/l_suppkey) repeat AS-IS so every replica joins
  * the same single-copy dimension rows — fact-side growth, stable
  * dimensional density, which is also how a real corpus scales.
  * `customer` ships as the unscaled single copy. Document/embedding
  * CONTENT repeats verbatim: near-dup tiers see 10× denser duplicate
  * structure, exactly the stress the scale-tier queries should agree
  * with the oracle on. */
object ScaleCorpus {
  val Offset = 10000000L

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = args.drop(1).headOption
      .getOrElse(s"/tmp/graft_scale/corpus_x$mult")
    val spark = GraftSession.build("local[32]", "32")
    def write(name: String, keyCols: Seq[String]): Unit = {
      val base = Tables.load(spark, sfDir, name)
      val scaled =
        if (keyCols.isEmpty) base
        else (0 until mult).map { i =>
          keyCols.foldLeft(base) { (df, k) =>
            df.withColumn(k, col(k) + lit(i * Offset))
          }
        }.reduce(_ unionByName _)
      scaled.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scale-corpus] $name -> $outDir/$name.parquet")
    }
    write("documents", Seq("doc_id"))
    write("embeddings", Seq("vec_id"))
    write("lineitem", Seq("l_orderkey"))
    write("orders", Seq("o_orderkey"))
    write("events", Seq("event_id"))
    // dimensions ship as unscaled single copies (stable dimensional
    // density) so the FULL suite — not just the fact-table tier — runs
    // unchanged against the mirror
    Seq("customer", "part", "supplier", "nation", "region")
      .foreach(write(_, Seq.empty))
    spark.stop()
  }
}
