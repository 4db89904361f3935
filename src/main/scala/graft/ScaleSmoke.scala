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

    // LLM-op scale paths: LSH candidates (never all-pairs) over a 10×
    // documents corpus, and IVF-bucketed cosine pairs over 10× embeddings
    // (brute force would be |V|²; bucket pruning keeps it linear-ish).
    val docsBase = Tables.load(spark, sfDir, "documents")
    val bigDocs = (0 until mult).map { i =>
      docsBase.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
    }.reduce(_ unionByName _)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    time("minhash-lsh-cands") {
      val sigs = bigDocs.select(col("doc_id"),
        operators.Dedup.minhashSignature(col("toks"), 8).as("sig"))
      val buckets = operators.Dedup.lshBuckets(sigs, "doc_id", col("sig"), 4, 2)
      // the bucket-size cap is the load-bearing guard: uncapped, this
      // homogeneous corpus produced 9.6e8 candidate pairs (691 s)
      operators.Dedup.lshCandidates(buckets, maxBucketSize = 50).count()
    }
    time("lsh-cluster-cc") {
      // the real dedup composition: LSH candidates (bucket-capped) →
      // connected components. The label table is |V| rows regardless of
      // corpus bytes; rounds are O(log diameter) via pointer jumping.
      val sigs = bigDocs.select(col("doc_id"),
        operators.Dedup.minhashSignature(col("toks"), 8).as("sig"))
      val buckets = operators.Dedup.lshBuckets(sigs, "doc_id", col("sig"), 4, 2)
      val cands = operators.Dedup.lshCandidates(buckets, maxBucketSize = 50)
      operators.Dedup.clusterPairs(cands, "id_a", "id_b",
        bigDocs.select(col("doc_id")), "doc_id")
        .filter(col("is_rep")).count()
    }
    time("incremental-neardup") {
      // q93 shape at 10×: the fresh slice (10% of the corpus) probes the
      // STORED bucket table instead of re-pairing the corpus — probe cost
      // ∝ |fresh| + matched-bucket membership, not corpus bytes. The
      // state-side mega-bucket cap is applied before the join (PlanLint
      // pins it at the query level).
      val sigs = bigDocs.select(col("doc_id"),
        operators.Dedup.minhashSignature(col("toks"), 8).as("sig"))
      val buckets = operators.Dedup.lshBuckets(sigs, "doc_id", col("sig"), 4, 2)
      operators.Dedup.incrementalLshCandidates(
        state = buckets.filter(col("doc_id") % 10 =!= 0),
        fresh = buckets.filter(col("doc_id") % 10 === 0),
        maxBucketSize = 50).count()
    }
    // shared 10× docs union with ORIGINAL token order (bigDocs above is
    // distinct-token shaped for minhash) — one definition, two stages
    val bigDocsOrdered = (0 until mult).map { i =>
      docsBase.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
    }.reduce(_ unionByName _)
    time("unigram-logprob") {
      // q97/q71 shuffle shape at 10×: token explode → tf + counts hash
      // aggs → token equi-join → per-doc agg. Work ∝ total tokens. The
      // filter forces the logprob aggregate to evaluate — a bare count()
      // would let Catalyst prune the DECIMAL math this stage times.
      operators.TextStats.unigramLogprob(
        bigDocsOrdered.select(col("doc_id"), col("text")),
        "doc_id", split(col("text"), " "))
        .filter(col("mean_logprob").isNotNull).count()
    }
    time("bm25") {
      // q28 shape at 10×: row-local per-term tf (the corpus is never
      // exploded token-wise), df as a count window over the ≤|terms|
      // rows/doc hit stream, broadcast 1-row stats. Work ∝ corpus bytes
      // (two scans) + hit-stream shuffles ∝ matching docs.
      operators.Retrieval.bm25(
        bigDocsOrdered.select(col("doc_id"), col("text")),
        "doc_id", split(col("text"), " "),
        Seq("join", "filter", "scan"))
        .filter(col("bm25").isNotNull).count()
    }
    time("decontaminate") {
      // replication multiplies train-df 10x but leaves the DISTINCT test
      // gram set unchanged — join output = Σ_{g∈test∩kept} df_train(g),
      // so the collapse of the test side is what keeps this linear here;
      // the df-cap guards the adversarial (boilerplate-gram) shape.
      val ordered = bigDocsOrdered
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val train = ordered.filter(col("doc_id") % 10 =!= 0)
      val test = ordered.filter(col("doc_id") % 10 === 0)
      operators.Dedup.decontaminate(train, test, "doc_id",
        operators.TextStats.ngrams(col("toks"), 3),
        minFrac = 0.25, maxDfFrac = 0.5).count()
    }
    time("jaccard-cluster-cc") {
      // q92 at 10×: bigram-Jaccard pairs over the doc_id%10 slice →
      // connected components. Pair generation is df-capped (Σ df(t)²
      // bound); the CC label table is |slice| rows and rounds scale with
      // component diameter, not corpus bytes.
      val slice = bigDocsOrdered.filter(col("doc_id") % 10 === 0)
      val pairs = operators.Dedup.jaccardPairs(slice, "doc_id",
        operators.TextStats.bigrams(split(col("text"), " ")), tau = 0.08,
        maxDfFrac = 0.5)
      operators.Dedup.clusterPairs(pairs, "id_a", "id_b",
        slice.select(col("doc_id")), "doc_id")
        .filter(col("is_rep")).count()
    }
    val vecBase = Tables.load(spark, sfDir, "embeddings")
    val bigVecs = (0 until mult).map { i =>
      vecBase.withColumn("vec_id", col("vec_id") + lit(i.toLong * 10000000L))
    }.reduce(_ unionByName _)
    time("ivf-cosine-pairs") {
      val bucketed = bigVecs.select(col("vec_id"), col("embedding"),
        operators.Similarity.ivfAssign(col("embedding"), 8).as("bkt"),
        operators.Similarity.norm(col("embedding")).as("nrm"))
      val a = bucketed.select(col("vec_id").as("ida"), col("embedding").as("va"),
        col("bkt"), col("nrm").as("na"))
      val b = bucketed.select(col("vec_id").as("idb"), col("embedding").as("vb"),
        col("bkt"), col("nrm").as("nb"))
      a.join(b, Seq("bkt")).filter(col("ida") < col("idb"))
        .filter(functions.VectorFunctions.dotNative(col("va"), col("vb")) /
          (col("na") * col("nb")) >= 0.3)
        .count()
    }
    time("incr-embedding-probe") {
      // the incremental L2 shape at 10×: a 10% fresh slice probes the
      // stored bucketed corpus instead of re-pairing it — cost ∝ |fresh|
      // × matched-bucket membership, the embedding twin of q93.
      val bucketed = bigVecs
        .withColumn("bucket", operators.Similarity.ivfAssign(col("embedding"), 8))
        .filter(col("bucket").isNotNull)
      operators.Similarity.incrementalEmbeddingCandidates(
        state = bucketed.filter(col("vec_id") % 10 =!= 0)
          .select("vec_id", "bucket", "embedding"),
        fresh = bucketed.filter(col("vec_id") % 10 === 0)
          .select("vec_id", "embedding"),
        "vec_id", "embedding", probeDims = 8, maxBucketSize = 100,
        minCosine = 0.3).count()
    }
    spark.stop()
  }
}
