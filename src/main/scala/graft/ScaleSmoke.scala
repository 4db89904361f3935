package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Delta, Fingerprint, Upsert}
import graft.queries.Q

/** Scale smoke: the shuffle-heavy core operators at N× the bench corpus
  * (sf0.1 lineitem unioned N× — 10× ≈ 6M rows, 100× ≈ 60M) — evidence the
  * partition strategy holds as data grows, not just at the verified SF.
  * Includes the Zipfian-skew twins (same column math, hot-key
  * distribution) whose skewed/uniform ratios SCALE.md records.
  * Run: sbt "runMain graft.ScaleSmoke [multiplier] [stageSubstr,...]"
  * — the optional second arg runs only stages whose label contains one of
  * the comma-separated substrings (the 100× runs target the flagship
  * compositions without paying for the whole suite). */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val only: Set[String] =
      args.drop(1).headOption.map(_.split(",").toSet).getOrElse(Set.empty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus)

    // The N× corpora are MATERIALIZED to parquet once and re-read — a
    // real 100× corpus is a table on disk, not an N-way union plan. The
    // union form was measured to poison every downstream number at 100×:
    // each branch carries distinct perturbation expressions, so analysis/
    // optimization/codegen cost grows with N in every action (an
    // annSearchBatch that runs in 44 s against materialized parquet took
    // 200 s against the live 100-branch union). Materialization cost is
    // reported separately and excluded from stage timings.
    val scratch = sys.env.getOrElse("SPARK_GRAFT_SCRATCH", "/tmp/graft_scale")
    def materialize(name: String, build: => DataFrame): DataFrame = {
      val path = s"$scratch/${name}_x$mult"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) {
        val t0 = System.nanoTime()
        build.write.mode("overwrite").parquet(path)
        println(f"[scale] materialize $name x$mult  ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      spark.read.parquet(path)
    }

    val base = Tables.load(spark, sfDir, "lineitem")
    // union-multiply with perturbed keys so cardinality actually grows
    val big = materialize("lineitem", (0 until mult).map { i =>
      base.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 10000000L))
    }.reduce(_ unionByName _))

    val durations = scala.collection.mutable.LinkedHashMap[String, Double]()
    def stageActive(label: String): Boolean =
      only.isEmpty || only.exists(label.contains)
    def time(label: String)(f: => Long): Unit =
      if (stageActive(label)) {
        val t0 = System.nanoTime()
        val n = f
        val s = (System.nanoTime() - t0) / 1e9
        durations(label) = s
        println(f"[scale] $label%-22s rows=$n%10d  $s%7.2f s")
      }
    // best-of-N for stages whose RATIO is the claim (the skew twins): a
    // transient load spike on a shared box poisons a single measurement
    // and flips a ratio both ways — min-of-3 measures the plan, not the
    // machine (same rationale as Bench's best-of-passes)
    def timeBest(label: String, passes: Int = 3)(f: => Long): Unit =
      if (stageActive(label)) {
        var best = Double.MaxValue
        var n = 0L
        (1 to passes).foreach { _ =>
          val t0 = System.nanoTime()
          n = f
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        durations(label) = best
        println(f"[scale] $label%-22s rows=$n%10d  $best%7.2f s (best of $passes)")
      }
    def withConf[T](kvs: (String, String)*)(f: => T): T = {
      val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f
      finally saved.foreach { case (k, old) =>
        old.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }

    if (only.isEmpty) println(s"[scale] input rows=${big.count()} (x$mult)")

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

    // ---- Bounded-state sketches (q122/q123 cores) ----
    // The scale claim is structural: the CMS counts table is ≤ depth·width
    // rows and the Bloom bit table ≤ k·m rows AT EVERY MULT — only the
    // one-pass build stream grows. Stage times should scale ~linearly
    // with the stream (map-side-combinable agg + broadcast probe); the
    // state-rows stages print the constant to make the bound visible in
    // the same log.
    time("cms-build+probe") {
      val items = big.select(col("l_partkey").cast("string").as("w"))
      val sk = operators.Sketches.cmsBuild(items, col("w"), 4, 2048)
      // failOnSaturation=false: w=2048 against 20k distinct partkeys is
      // the DELIBERATELY-saturated legacy row (SCALE.md r12) that the
      // r13 guard would now reject — kept so the time series stays
      // comparable; cms-quality below is the sized-vs-saturated pair
      operators.Sketches.cmsEstimate(items.distinct(), col("w"), sk, 4, 2048,
          failOnSaturation = false)
        .filter(col("est") >= 1000).count()
    }
    time("cms-state-rows") {
      operators.Sketches.cmsBuild(
        big.select(col("l_partkey").cast("string").as("w")), col("w"), 4, 2048)
        .count()
    }
    // Estimate QUALITY, saturated vs properly-sized (VERDICT r12 #3),
    // over a ZIPF stream (~100k distinct keys, P(k) ∝ 1/k — real heavy
    // hitters, unlike the uniform partkey stream): w=2048 (capacity
    // ~11.8k ≪ 100k distinct — saturated; guard off to even run it) vs
    // w=32768 (capacity ~189k — sized by the width ≥ distinct·ln2/depth
    // rule the guard's error message states). Metric = heavy-hitter
    // PRECISION at est ≥ T: of the keys the sketch flags, how many are
    // truly ≥ T (exact from one groupBy). Recall is 1 by construction
    // (CMS never undercounts), so precision IS the quality number
    // SCALE.md records recovering.
    for ((w, fail) <- Seq(2048 -> false, 32768 -> true))
      if (stageActive("cms-quality")) {
        val u = conv(substring(md5((col("l_orderkey") * 31 +
          col("l_linenumber")).cast("string")), 1, 8), 16, 10)
          .cast("double") / 4.294967296e9
        val items = big.select(
          (floor(exp(u * math.log(100000.0))) + 1)
            .cast("long").cast("string").as("w"))
        val thresh = 1000L
        val sk = operators.Sketches.cmsBuild(items, col("w"), 4, w)
        val est = operators.Sketches.cmsEstimate(
          items.distinct(), col("w"), sk, 4, w, failOnSaturation = fail)
        val exact = items.groupBy(col("w").as("item"))
          .agg(count(lit(1)).as("true_cnt"))
        val joined = est.filter(col("est") >= thresh)
          .join(exact, Seq("item"))
          .agg(count(lit(1)).as("flagged"),
            sum(when(col("true_cnt") >= thresh, 1L).otherwise(0L)).as("hits"))
          .head()
        val (flagged, hits) = (joined.getLong(0), joined.getLong(1))
        println(f"[scale] cms-quality w=$w%-5d flagged=$flagged%8d " +
          f"true-heavy=$hits%8d precision=${
            if (flagged == 0) 1.0 else hits.toDouble / flagged}%.3f")
      }
    // KMV distinct sketch (q135): state is ≤ k values per task at EVERY
    // mult; distinct l_orderkey grows ~N× with the perturbed corpus, so
    // the printed estimate/exact pair shows the ~1/√k error holding
    // while the input cardinality scales 100×.
    time("kmv-distinct") {
      val r = operators.Sketches.kmvDistinct(
        big, col("l_orderkey").cast("string"), 256).head()
      val exact = big.select(col("l_orderkey")).distinct().count()
      println(f"[scale] kmv-distinct est=${r.getDouble(3)}%.0f exact=$exact " +
        f"err=${math.abs(r.getDouble(3) - exact) / exact}%.3f")
      exact
    }
    time("bloom-build+probe") {
      val keyed = big.select(col("l_partkey").cast("string").as("k"))
      val bits = operators.Sketches.bloomBuild(
        keyed.filter(col("k").cast("long") % 2 === 0).distinct(),
        col("k"), 4, 1 << 17)
      operators.Sketches.bloomProbe(keyed.distinct(), col("k"), bits, 4, 1 << 17)
        .filter(col("maybe_member") === 1).count()
    }
    time("bloom-state-rows") {
      operators.Sketches.bloomBuild(
        big.select(col("l_partkey").cast("string").as("k"))
          .filter(col("k").cast("long") % 2 === 0).distinct(),
        col("k"), 4, 1 << 17).count()
    }

    // ---- Zipfian-skew robustness (VERDICT r7 next-round #2) ----
    // The J1 delta split (the reference's soul, dags/scraping_etl.py:51-74)
    // and W2 keep-first dedup (storage.py:108-117) under a hot-key
    // distribution. Both twins derive their key from the SAME md5 uniform
    // u∈[0,1) — identical per-row cost, only the distribution differs:
    //   zipf   k = floor(exp(u·ln K))  → P(k) ∝ 1/k, ~6% of ALL rows on k=1
    //   unif   k = floor(u·K)
    // The measured claim (SCALE.md): skewed/uniform wall-clock < 2× on both
    // shapes — W2 because keep-first plans a partial WindowGroupLimit
    // (the hot key collapses to ≤1 row per map task before the shuffle),
    // J1 because AQE's skew-join split divides the hot partition (broadcast
    // is disabled for the stage to force the shuffled corpus-scale plan).
    val keySpace = 100000.0
    val uniformU =
      conv(substring(md5((col("l_orderkey") * 31 + col("l_linenumber"))
        .cast("string")), 1, 8), 16, 10).cast("double") / 4.294967296e9
    def keyedCopy(k: Column): DataFrame =
      big.withColumn("__u", uniformU).withColumn("k", k.cast("long")).drop("__u")
    val skewTwins = Seq(
      "zipf" -> keyedCopy(floor(exp(col("__u") * math.log(keySpace))) + 1),
      "unif" -> keyedCopy(floor(col("__u") * keySpace) + 1))

    for ((dist, keyed) <- skewTwins) {
      timeBest(s"delta-split-$dist") {
        // corpus-scale state (one stored fingerprint per key) with
        // broadcast OFF: the join MUST run shuffled, like 100 TB state
        val fresh = keyed.select(col("k"), col("l_quantity"),
          Fingerprint.rowHash(Seq(col("l_orderkey"), col("l_partkey")))
            .as("row_hash"))
        val state = fresh.groupBy("k").agg(min("row_hash").as("row_hash"))
        withConf(
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
          Delta.split(fresh, state, Seq("k"))._1.count()
        }
      }
      timeBest(s"window-dedup-$dist") {
        Upsert.keepFirst(keyed, Seq("k"),
          Seq(col("l_partkey").asc_nulls_first,
            col("l_suppkey").asc_nulls_first,
            col("l_orderkey").asc_nulls_first)).count()
      }
    }
    // Funnel skew twins: the window form (one shuffle, but WindowExec
    // buffers each entity's full partition) vs the agg/join form (one
    // shuffle per step, but partial aggregation collapses the hot key
    // map-side). The claim: the agg/join form's zipf/unif ratio stays
    // < 2 where the window form's degrades with the hot key.
    for ((dist, keyed) <- skewTwins) {
      val ev = keyed.select(col("k"),
        element_at(array(lit("view"), lit("click"), lit("purchase"),
          lit("x"), lit("y")), (col("l_linenumber") % 5 + 1).cast("int"))
          .as("etype"),
        col("l_shipdate").as("ts"))
      val steps = Seq("view", "click", "purchase")
      timeBest(s"funnel-window-$dist") {
        operators.Funnel.stageUnbounded(ev, "k", "etype", "ts", steps).count()
      }
      timeBest(s"funnel-aggjoin-$dist") {
        withConf(
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
          operators.Funnel.stageSkewSafeUnbounded(ev, "k", "etype", "ts",
            steps).count()
        }
      }
    }
    for (shape <- Seq("delta-split", "window-dedup",
                      "funnel-window", "funnel-aggjoin")
         if durations.contains(s"$shape-zipf") && durations.contains(s"$shape-unif")) {
      val r = durations(s"$shape-zipf") / durations(s"$shape-unif")
      println(f"[scale] $shape%-22s zipf/unif ratio = $r%.2f (target < 2)")
    }

    // ---- AQE skew-join split vs manual salting (VERDICT r12 #6) ----
    // Same zipf fact (hot key ≈ 1/ln(K) of ALL rows), same
    // broadcast-ineligible dim (the 100 TB regime Skew.saltedJoin was
    // written for), three remedies: AQE's runtime skew split, nothing,
    // and the manual 16-bucket salt (AQE split off so the remedies don't
    // stack). SCALE.md records which one wins — if AQE alone matches the
    // salt, the operator's scaladoc claim gets demoted to "AQE-disabled
    // environments only".
    for ((dist, keyExpr) <- Seq(
        // zipf: hot key ≈ 1/ln(K) ≈ 9% of rows — heavy tail, mild pivot
        "zipf" -> (floor(exp(col("__u") * math.log(keySpace))) + 1),
        // mega: HALF the corpus on one key — the pathological-tenant
        // shape manual salting exists for
        "mega" -> when(col("__u") < 0.5, lit(1L))
          .otherwise(floor(col("__u") * keySpace) + 1))) {
      val keyed = keyedCopy(keyExpr)
      val dimTable = keyed.select(col("k")).distinct()
        .withColumn("dim_payload", col("k") * 17 % 97)
      for ((label, aqeSkew, manual) <- Seq(
          (s"skewjoin-$dist-aqe", "true", false),
          (s"skewjoin-$dist-none", "false", false),
          (s"skewjoin-$dist-salted", "false", true)))
        timeBest(label) {
          withConf(
            "spark.sql.autoBroadcastJoinThreshold" -> "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
            "spark.sql.adaptive.skewJoin.enabled" -> aqeSkew) {
            val fact = keyed.select(col("k"), col("l_quantity"))
            val joined =
              if (manual) operators.Skew.saltedJoin(fact, dimTable, Seq("k"), 16)
              else fact.join(dimTable, Seq("k"))
            // filter on the dim column so the join must actually produce
            // rows (a bare count lets Catalyst prune the probe)
            joined.filter(col("dim_payload") >= 0).count()
          }
        }
    }

    // LLM-op scale paths: LSH candidates (never all-pairs) over a 10×
    // documents corpus, and IVF-bucketed cosine pairs over 10× embeddings
    // (brute force would be |V|²; bucket pruning keeps it linear-ish).
    val docsBase = Tables.load(spark, sfDir, "documents")
    // DISTINCT-content growth model for the near-dup path: each replica's
    // tokens carry a replica prefix, so the N× corpus behaves like N
    // independent sf0.1 corpora (same bucket-depth distribution, N× more
    // buckets). Plain replication would put every doc in a 100-deep
    // identical clone group — the mega-bucket cap then (correctly) drops
    // EVERY bucket and the stage measures nothing. Real corpus growth is
    // new content, not 100 copies of the same web page; the
    // replication-shaped semantics are covered by bigDocsOrdered below
    // (decontaminate / jaccard rows, documented in SCALE.md).
    val bigDocs = materialize("docs_toks", (0 until mult).map { i =>
      docsBase.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        transform(array_distinct(split(col("text"), " ")),
          t => concat(lit(s"r$i"), t)).as("toks"))
    }.reduce(_ unionByName _))
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
    val bigDocsOrdered = materialize("docs_ordered", (0 until mult).map { i =>
      docsBase.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
    }.reduce(_ unionByName _))
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
    // q169's stored-index probe vs the live q28 arm above — the index
    // materialized ONCE (cost reported as materialization, excluded —
    // the postings-layout framing), then a probe pays only the terms'
    // directory IO + the hit-stream shuffles. The stored-vs-live delta
    // at growing mult is the Lucene-shape claim for the ranked tier.
    val bm25IdxPath = s"$scratch/bm25_x$mult"
    val bm25IdxMarker =
      java.nio.file.Paths.get(s"$bm25IdxPath/_graft_bm25_v1")
    if (stageActive("bm25-stored-probe") &&
        !java.nio.file.Files.exists(bm25IdxMarker)) {
      val t0 = System.nanoTime()
      val base = bigDocsOrdered
        .select(col("doc_id"), split(col("text"), " ").as("__toks"))
        .select(col("doc_id"), col("__toks"),
          size(col("__toks")).cast("long").as("dl"))
      base.agg(count(lit(1)).as("n_docs"),
          round(sum(col("dl").cast("decimal(28,6)")).cast("decimal(28,6)")
            .cast("double") / count(lit(1)), 6).as("avgdl"))
        .write.mode("overwrite").parquet(s"$bm25IdxPath/stats")
      base.select(col("doc_id"), col("dl"),
          explode(col("__toks")).as("token"))
        .groupBy(col("token"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).as("tf"))
        .withColumn("tok_part",
          graft.sources.Writers.tokenPart(col("token")))
        .write.partitionBy("tok_part").mode("overwrite")
        .parquet(s"$bm25IdxPath/tf")
      java.nio.file.Files.writeString(bm25IdxMarker, "ok")
      println(f"[scale] materialize bm25 index x$mult  ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    timeBest("bm25-stored-probe") {
      val terms = Seq("join", "filter", "scan")
      val parts = terms.map(graft.sources.Writers.tokenPartOf).distinct
      operators.Retrieval.bm25Stored(
        spark.read.parquet(s"$bm25IdxPath/tf")
          .filter(col("tok_part").isin(parts: _*) &&
            col("token").isin(terms: _*))
          .select(col("token"), col("doc_id"), col("tf"), col("dl")),
        spark.read.parquet(s"$bm25IdxPath/stats"),
        "doc_id", terms)
        .filter(col("bm25").isNotNull).count()
    }

    // q171's merged-vs-rebuilt A/B (VERDICT r16 #1): fold the 10% fresh
    // slice into a pre-existing 90% index vs rebuilding the full index
    // from scratch. The merge is a SEGMENT APPEND — fresh tf rows
    // computed ∝ |fresh| and written as new files, nothing existing
    // read — so its cost should track the fresh slice, near-flat per
    // fresh byte as mult grows; the rebuild re-tokenizes, re-aggregates
    // and rewrites the WHOLE corpus every batch. The guarded variant
    // adds the new-doc-id semi-join over the touched directories (the
    // only non-fresh-proportional cost; Delta.split-routed production
    // ingest turns it off). Each merge pass gets an untimed fresh 90%
    // base (append mutates its input layout).
    if (stageActive("bm25-merge")) {
      val docsAll = bigDocsOrdered.select(col("doc_id"), col("text"))
      val baseSlice = docsAll.filter(col("doc_id") % 10 =!= 0)
      val freshSlice = docsAll.filter(col("doc_id") % 10 === 0)
      timeBest("bm25-merge-rebuild", passes = 2) {
        graft.sources.Writers.writeBm25Index(
          docsAll, s"$scratch/bm25_rebuild_x$mult")
        spark.read.parquet(s"$scratch/bm25_rebuild_x$mult/stats")
          .head().getLong(0)
      }
      Seq(false, true).foreach { guarded =>
        val label =
          if (guarded) "bm25-merge-append-guard" else "bm25-merge-append"
        var best = Double.MaxValue
        var n = 0L
        (0 until 2).foreach { r =>
          val p = s"$scratch/bm25_mb_${if (guarded) "g" else "u"}${r}_x$mult"
          graft.sources.Writers.writeBm25Index(baseSlice, p) // untimed base
          val t0 = System.nanoTime()
          graft.sources.Writers.mergeBm25Index(spark, p, freshSlice,
            checkNewDocIds = guarded)
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
          n = spark.read.parquet(s"$p/stats").head().getLong(0)
        }
        durations(label) = best
        println(f"[scale] $label%-22s rows=$n%10d  $best%7.2f s (best of 2)")
      }
    }

    // q177/q179's delete-vs-rebuild A/B: tombstone the 10% slice OUT of
    // a full index vs rebuilding the complement from scratch. The
    // delete leg reads only the deleted ids' doclen directories,
    // appends one tombstone segment and rewrites the 1-row stats — cost
    // ∝ the deleted batch; the rebuild re-tokenizes and rewrites the
    // whole complement every time. The probe arm prices the gen-aware
    // visibility anti-join a tombstoned layout adds to q169's plan
    // (vs bm25-stored-probe above), and the compact arm prices folding
    // the tombstones back in (the maintenance amortizer, run on a
    // cadence). Each delete pass gets an untimed fresh full base
    // (tombstoning mutates its input layout).
    if (stageActive("bm25-delete")) {
      val docsAll = bigDocsOrdered.select(col("doc_id"), col("text"))
      val delIds = docsAll.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"))
      timeBest("bm25-delete-rebuild", passes = 2) {
        graft.sources.Writers.writeBm25Index(
          docsAll.filter(col("doc_id") % 10 =!= 0),
          s"$scratch/bm25_delreb_x$mult")
        spark.read.parquet(s"$scratch/bm25_delreb_x$mult/stats")
          .head().getLong(0)
      }
      var best = Double.MaxValue
      var deleted = 0L
      val delPath = s"$scratch/bm25_del_x$mult"
      (0 until 2).foreach { _ =>
        graft.sources.Writers.writeBm25Index(docsAll, delPath) // untimed base
        val t0 = System.nanoTime()
        deleted = graft.sources.Writers.deleteFromBm25Index(
          spark, delPath, delIds)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      durations("bm25-delete-tombstone") = best
      println(f"[scale] bm25-delete-tombstone  rows=$deleted%10d  $best%7.2f s (best of 2)")
      val terms = Seq("join", "filter", "scan")
      timeBest("bm25-delete-probe") {
        operators.Retrieval.bm25Stored(
          graft.sources.Writers.prunedBm25Tf(spark, delPath, terms),
          spark.read.parquet(s"$delPath/stats"), "doc_id", terms)
          .filter(col("bm25").isNotNull).count()
      }
      time("bm25-delete-compact") {
        graft.sources.Writers.compactBm25Index(spark, delPath)
        spark.read.parquet(s"$delPath/tf").count()
      }
    }

    // q180's update-vs-rebuild A/B: REPLACE the 10% changed slice in a
    // full index (tombstone + re-merge stamped past the tombstones —
    // both halves ∝ the changed batch) vs rebuilding the UPDATED corpus
    // from scratch. The describe arm prices the maintenance-policy
    // decision (maintainBm25Index's input) — parquet footer counts +
    // a driver listing, which must stay near-flat as the corpus grows.
    // Each update pass gets an untimed fresh full base.
    if (stageActive("bm25-update")) {
      val docsAll = bigDocsOrdered.select(col("doc_id"), col("text"))
      val changed = docsAll.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          concat(col("text"), lit(" fresh join")).as("text"))
      timeBest("bm25-update-rebuild", passes = 2) {
        graft.sources.Writers.writeBm25Index(
          docsAll.filter(col("doc_id") % 10 =!= 0).unionByName(changed),
          s"$scratch/bm25_updreb_x$mult")
        spark.read.parquet(s"$scratch/bm25_updreb_x$mult/stats")
          .head().getLong(0)
      }
      var best = Double.MaxValue
      val updPath = s"$scratch/bm25_upd_x$mult"
      (0 until 2).foreach { _ =>
        graft.sources.Writers.writeBm25Index(docsAll, updPath) // untimed base
        val t0 = System.nanoTime()
        // the FUSED one-flip verb (r19): one stats read, one tombstone
        // probe on the pruned doclen leg, one commit flip — vs the
        // chained delete+merge's doubled fixed job overhead (r18's
        // measured ~3 s floor at local[32])
        graft.sources.Writers.updateBm25Index(spark, updPath, changed)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      durations("bm25-update-inplace") = best
      println(f"[scale] bm25-update-inplace   $best%7.2f s (best of 2)")
      // the 1% batch arm: an update batch is normally SMALL relative to
      // the corpus — in-place cost ∝ batch shrinks with it while the
      // rebuild arm stays corpus-proportional (the 10% arm above sits
      // near the fixed per-job overhead floor at this toy corpus size,
      // where chaining two verbs' jobs ≈ one rebuild's shuffles)
      val changedSmall = docsAll.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id"),
          concat(col("text"), lit(" fresh join")).as("text"))
      var bestS = Double.MaxValue
      (0 until 2).foreach { _ =>
        graft.sources.Writers.writeBm25Index(docsAll, updPath) // untimed base
        val t0 = System.nanoTime()
        graft.sources.Writers.updateBm25Index(spark, updPath, changedSmall)
        bestS = math.min(bestS, (System.nanoTime() - t0) / 1e9)
      }
      durations("bm25-update-small") = bestS
      println(f"[scale] bm25-update-small    $bestS%7.2f s (best of 2)")
      time("bm25-describe") {
        graft.sources.Writers.describeBm25Index(spark, updPath).doclenRows
      }
    }

    time("phrase-merge") {
      // q148+q149 at N×: collocation learning is two map+agg passes into
      // VOCAB-bounded count tables (vocabulary fixed as the corpus
      // replicates — the realistic axis, the bpe-train-ordered framing),
      // the greedy merge one (doc_id; pos) keyed exchange over the token
      // stream. Expect ~linear scan-bound wall; the learned table and
      // the broadcast phrase side stay CONSTANT across mults.
      val docs = bigDocsOrdered.select(col("doc_id"), col("text"))
      val phrases = operators.TextStats.collocations(
        docs, split(col("text"), " "), minCount = 10L * mult)
        .filter(col("score") >= 1.2)
      // the token filter forces the merge projection to evaluate — a
      // bare count() would let Catalyst prune the concat this stage times
      operators.TextStats.phraseMerge(
        docs, "doc_id", split(col("text"), " "), phrases)
        .filter(col("token").isNotNull).count()
    }
    time("training-order") {
      // q150 at N×: the total-order assignment WITHOUT a global sort —
      // (bucket, hex-cell) rank windows parallelize buckets×16 ways,
      // the offsets table stays a bounded single-partition window, and
      // nothing range-partitions the corpus. Expect scan-bound ~linear
      // wall; the position-sum check forces every position to evaluate
      // (it equals N(N+1)/2 iff the bijection holds at this mult).
      val d = bigDocsOrdered.select(col("doc_id"),
        least(floor(size(split(col("text"), " ")) / lit(10)), lit(9))
          .cast("long").as("b"))
      val out = operators.Sampling.trainingOrder(d, "doc_id", col("b"), "ep1")
      val (n, psum) = {
        val r = out.agg(count(lit(1)), sum(col("pos"))).head()
        (r.getLong(0), r.getLong(1))
      }
      require(psum == n * (n + 1) / 2,
        s"training-order bijection broke at x$mult: n=$n pos-sum=$psum")
      n
    }
    // q113's exact shape (url synthesis from doc_id → canonicalUrl →
    // keep-first window) with and without the fan-out wrap — the paired
    // evidence VERDICT r12 #4 asked for at N×. The map work here is
    // doc_id-derived string ops, the cheapest thing Q.wide guards.
    for ((label, wrap) <- Seq(
        "url-canon-wide" -> true, "url-canon-nowide" -> false))
      timeBest(label) {
        import org.apache.spark.sql.expressions.Window
        val src = if (wrap)
          operators.Parallelize.fanOutIfNarrow(bigDocsOrdered)
        else bigDocsOrdered
        val k = col("doc_id") % 100
        src.select(col("doc_id"), concat(
            when(col("doc_id") % 2 === 0, lit("HTTP")).otherwise(lit("http")),
            lit("://"),
            when(col("doc_id") % 3 === 0,
                concat(lit("WWW.Site"), k, lit(".Example.COM")))
              .otherwise(concat(lit("www.site"), k, lit(".example.com"))),
            when(col("doc_id") % 5 === 0, lit(":80")).otherwise(lit("")),
            lit("/a/b"), k,
            when(col("doc_id") % 7 === 0, lit("/")).otherwise(lit("")),
            when(col("doc_id") % 4 === 0, lit("?utm_source=feed&b=2&a=1"))
              .otherwise(lit("?b=2&a=1")),
            when(col("doc_id") % 6 === 0, lit("#sec")).otherwise(lit(""))
          ).as("url"))
          .withColumn("canonical_url",
            operators.Cleaning.canonicalUrl(col("url")))
          .withColumn("kept",
            row_number().over(Window.partitionBy(col("canonical_url"))
              .orderBy(col("doc_id").asc_nulls_first)) === 1)
          .filter(col("kept")).count()
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
    // Sub-document dedup family (q106/q112 shapes) on a replica-distinct
    // ORDERED token corpus: tokens keep their positions (windows need
    // order; bigDocs above is array_distinct'd for minhash) but carry a
    // replica prefix, so the N× corpus behaves like N independent
    // corpora — natural within-replica duplication only, the real-growth
    // model (plain replication would empty every replica>0 doc and
    // measure the degenerate all-duplicate shape instead).
    val bigDocsRtoks = materialize("docs_rtoks", (0 until mult).map { i =>
      docsBase.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        transform(split(col("text"), " "),
          t => concat(lit(s"r$i"), t)).as("toks"))
    }.reduce(_ unionByName _))
    time("paragraph-dedup") {
      // q106 shape at N×: page the token stream into 7-token chunk
      // paragraphs (row-local synthesis), then keep-first at paragraph
      // grain — one groupBy(paragraph hash) with a self-contained
      // min-struct winner + one reassembly groupBy(doc). Work ∝ tokens.
      val paged = bigDocsRtoks
        .withColumn("n", size(col("toks")))
        .withColumn("nc", ((col("n") + 6) / 7).cast("int"))
        .select(col("doc_id"), array_join(
          transform(sequence(lit(0), col("nc") - 1),
            i => array_join(slice(col("toks"), i * 7 + 1, lit(7)), " ")),
          "\n").as("ptext"))
      operators.Dedup.dedupParagraphs(paged, "doc_id", "ptext", "\n",
        withSpine = false).count()
    }
    time("substring-dedup") {
      // q112 shape at N×: overlapping 8-token windows, keep-first winner
      // per window hash, coverage explode (8× on duplicate windows
      // only), position anti-join, reassembly. Three corpus passes, all
      // keyed on high-cardinality hashes — expect ~linear in tokens.
      operators.Dedup.dedupTokenWindows(bigDocsRtoks, "doc_id",
        col("toks"), 8)
        .filter(col("n_kept") < col("n_tok")).count()
    }
    time("substring-retokenize") {
      // Materialize-once A/B (VERDICT r11 #4): the SAME corpus as
      // substring-dedup, but stored as TEXT — the operator's token
      // column is a live split(), so each of its two input references
      // (window stream + token re-explode, operator scaladoc) re-splits
      // the corpus instead of reading the persisted token arrays the
      // stage above consumes. The delta vs substring-dedup measures what
      // the W4 parquet handoff (sources/Writers — materialize the
      // tokenized table once between stages) saves a 100 TB pipeline
      // whose tokenization is carried as an expression into a
      // multi-reference DAG. SCALE.md records both at 10×/100×.
      val bigDocsRtext = materialize("docs_rtext",
        bigDocsRtoks.select(col("doc_id"),
          array_join(col("toks"), " ").as("text")))
      operators.Dedup.dedupTokenWindows(bigDocsRtext, "doc_id",
        split(col("text"), " "), 8)
        .filter(col("n_kept") < col("n_tok")).count()
    }
    // BPE training at N× (q132's core, r13): the scale claim is that the
    // ITERATIONS run on the bounded word-TYPE table — only the one-time
    // type aggregation sees corpus bytes. Two axes: bpe-train-ordered
    // grows the corpus with a FIXED vocabulary (replicated text — the
    // realistic axis: natural vocabularies grow sublinearly, so the
    // 24-rank loop's cost should stay ~flat while the type agg tracks
    // the scan); bpe-train-rtoks grows the vocabulary ~N× with the
    // corpus (replica-prefixed tokens — the adversarial axis: the type
    // table itself scales, bounding the loop's growth by |types|).
    for ((label, words) <- Seq(
        "bpe-train-ordered" -> bigDocsOrdered.select(explode(
          regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
          .as("word")),
        "bpe-train-rtoks" -> bigDocsRtoks
          .select(explode(col("toks")).as("word"))))
      time(label) {
        val types = words.groupBy("word").agg(count(lit(1)).as("w"))
        operators.Vocab.learnBpe(types, col("word"), col("w"), 24).length
          .toLong
      }
    time("bpe-train-ranks") {
      // VERDICT r13 #1 — the RANK axis (the one that binds for a
      // production 32k-merge vocab): FIXED corpus (the natural sf
      // documents vocabulary, un-replicated), merge count growing with
      // the multiplier (24 ranks at x1 → 2400 at x100). The r13 loop
      // paid a full type-table pair aggregation + driver argmax PER
      // RANK (linear-with-full-recount); the incremental-view rewrite
      // pays ONE pair aggregation total on an alphabetic corpus
      // (complete view) plus one affected-types delta job per validated
      // batch, and per-batch cost shrinks down the Zipf tail — so
      // wall-clock must grow SUB-linearly in ranks. The natural sf
      // documents vocabulary exhausts at 89 merges, far short of the
      // axis target, so the fixture is a deterministic 200k-type
      // md5-hex table (16-char alphabet → deep merge structure; skewed
      // deterministic weights) — rows= reports the merges actually
      // learned (the honest saturation marker if a corpus runs dry).
      val types = spark.range(200000).select(
        substring(md5(col("id").cast("string")), 1, 12).as("word"),
        (col("id") % 97 + 1).as("w"))
      operators.Vocab.learnBpe(types, col("word"), col("w"), 24 * mult)
        .length.toLong
    }
    time("bpe-train-cjk") {
      // VERDICT r14 #4 — the NON-COMPLETE view regime: a CJK-scale
      // initial symbol inventory. The alphabet is 2048 BMP ideographs;
      // words are 4 deterministic chars, so the REALIZED initial pair
      // universe (~3×2048 ≈ 6k) exceeds the default snapshotSize=4096
      // and the view can never be complete — every batch runs the
      // floor-trust machinery. MEASURED (SCALE.md r15): the feared
      // re-snapshot storm does not materialize (ONE snapshot across
      // 2400 ranks — the Zipf tail keeps the floor far below the merge
      // horizon); the regime's real cost is truncation-capped
      // speculation depth on this tie-dense alphabet (exponent ~0.93
      // vs the complete fixture's 0.63). Stats printed per run;
      // correctness is VocabSpec's golden-match on this fixture shape.
      val alpha = new String((0 until 2048).map(i => (0x4e00 + i).toChar).toArray)
      val types = spark.range(200000).select(
        concat(Seq(3, 5, 7, 9).map(m =>
          lit(alpha).substr((pmod(col("id") * m, lit(2048)) + 1).cast("int"),
            lit(1))): _*).as("word"),
        (col("id") % 97 + 1).as("w"))
      val (ms, st) = operators.Vocab.learnBpeWithStats(
        types, col("word"), col("w"), 24 * mult)
      println(s"[scale] bpe-train-cjk stats x$mult: " +
        s"snapshots=${st.snapshots} batches=${st.batches} " +
        s"truncations=${st.truncations} ranks=${ms.length}")
      ms.length.toLong
    }
    time("substring-dedup-hotwin") {
      // skew twin: every doc (every replica — the banner is NOT
      // replica-prefixed) carries the same 8-token banner, so ONE
      // window hash concentrates |corpus| occurrences in a single
      // rank-window partition — the WindowExec group-buffer worst case
      // (row_number streams through the spillable sorter; nothing is
      // collected per group). Target: same order as the natural run.
      val banner = array((1 to 8).map(i => lit(s"hw$i")): _*)
      operators.Dedup.dedupTokenWindows(
        bigDocsRtoks.select(col("doc_id"),
          concat(col("toks"), banner).as("toks")),
        "doc_id", col("toks"), 8)
        .filter(col("n_kept") < col("n_tok")).count()
    }
    time("hamming-neardup") {
      // q108's pair stage at N×: 64-bit perceptual hashes in groups of 4
      // (base ⊕ one flipped bit), banded 4×16-bit equi-join. Band-value
      // occupancy governs cost: distinct bases grow ∝ corpus over a
      // fixed 2^16-per-band space, so Σ bucket² grows ~quadratically
      // ONCE occupancy passes 1 — the measured exponent documents where
      // the banding needs a wider band space (the probeDims capacity
      // knob, SCALE.md).
      val hashes = bigDocsRtoks.select(col("doc_id"),
        xxhash64(floor(col("doc_id") / 4).cast("string"))
          .bitwiseXOR(expr("shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 4 * 13 AS INT))"))
          .as("phash"))
      operators.Dedup.hammingPairs(hashes, "doc_id", "phash", maxDist = 2)
        .count()
    }
    val vecBase = Tables.load(spark, sfDir, "embeddings")
    // distinct-direction growth model (same reasoning as bigDocs): each
    // replica circularly shifts the components, producing genuinely new
    // directions with the same norm distribution — plain replication
    // would make every IVF bucket a 100-deep clone pile that the bucket
    // cap (correctly) drops whole.
    val vecDim = vecBase.select(size(col("embedding"))).head().getInt(0)
    val bigVecs = materialize("vecs", (0 until mult).map { i =>
      val s = i % vecDim
      val shifted =
        if (s == 0) col("embedding")
        else concat(slice(col("embedding"), s + 1, vecDim - s),
          slice(col("embedding"), 1, s))
      vecBase.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        shifted.cast("array<float>").as("embedding"))
    }.reduce(_ unionByName _))
    // The IVF bucket space must GROW with the corpus — 2^probeDims
    // buckets at constant per-bucket occupancy (~8 vectors here). A fixed
    // probeDims at 100× pushes every bucket past the mega-bucket cap and
    // the guard (correctly) drops the whole corpus: the cap is the
    // adversarial-shape guard, bucket-count scaling is the capacity knob.
    val probeDims =
      8 + (math.log(mult.toDouble) / math.log(2)).ceil.toInt.max(0)
    // The synthetic embeddings are CLUSTERED (~13 tight clusters; the
    // shift replicas add directions, so bucket count grows ∝ mult while
    // occupancy stays at the cluster size, ~150-240). The cap is DERIVED
    // from the corpus's own occupancy distribution (3 × p99 — SCALE.md's
    // "caps sit above natural occupancy" rule made mechanical): it
    // guards the adversarial tail, and a corpus whose occupancy grows
    // can never be silently zeroed by a stale constant. Derivation cost
    // (one quantile over the bucket-count table) is setup, not stage
    // time.
    val vecBucketCap =
      if (stageActive("ivf-cosine-pairs") || stageActive("incr-embedding-probe")) {
        val bucketed = bigVecs.select(
          operators.Similarity.ivfAssign(col("embedding"), probeDims).as("bkt"))
          .filter(col("bkt").isNotNull)
        val cap = operators.Similarity.capBucketsAuto(bucketed, "bkt")._2
        println(s"[scale] derived vec bucket cap = $cap (3 x p99 occupancy)")
        cap
      } else 300
    time("ivf-cosine-pairs") {
      val bucketed = operators.Similarity.capBuckets(
        bigVecs.select(col("vec_id"), col("embedding"),
          operators.Similarity.ivfAssign(col("embedding"), probeDims).as("bkt"),
          operators.Similarity.norm(col("embedding")).as("nrm")),
        "bkt", vecBucketCap)
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
        .withColumn("bucket",
          operators.Similarity.ivfAssign(col("embedding"), probeDims))
        .filter(col("bucket").isNotNull)
      operators.Similarity.incrementalEmbeddingCandidates(
        state = bucketed.filter(col("vec_id") % 10 =!= 0)
          .select("vec_id", "bucket", "embedding"),
        fresh = bucketed.filter(col("vec_id") % 10 === 0)
          .select("vec_id", "embedding"),
        "vec_id", "embedding", probeDims = probeDims,
        maxBucketSize = vecBucketCap, minCosine = 0.3).count()
    }
    time("ann-search-batch") {
      // the flagship batch-ANN composition (q23/q86/q99's production
      // form): 16 query vectors against the N× corpus in ONE corpus scan
      // — centroids are bounded by the bucket key space (≤2^probeDims),
      // never by corpus rows, so the only corpus-sized work is the
      // bucket equi-join + per-query top-k rank.
      val queries = vecBase.filter(col("vec_id") < 16)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      operators.Similarity.annSearchBatch(bigVecs, "vec_id", "embedding",
        queries, "qid", "qvec", probeDims = probeDims, nprobe = 8,
        k = 10).count()
    }

    time("pq-search") {
      // q125's PQ-ANN shape at N×: the corpus side of the search is the
      // (id, m, code) SMALL-INT table (~16× smaller than the float
      // embeddings), the query side a broadcast ADC distance table over
      // the bounded codebook — expect scan-bound ~linear growth with NO
      // data-sized state anywhere (codebook ≤ m·(2p+1)² rows at every
      // mult). In production the codes are materialized once; this
      // stage pays the coding + two codebook scans live, so it is an
      // UPPER bound on the per-search cost.
      val query = vecBase.filter(col("vec_id") === 1)
        .select(col("embedding").as("qvec"))
      operators.Similarity.pqSearch(bigVecs, "vec_id", "embedding",
        query, "qvec", k = 10, m = 4, subDim = vecDim / 4,
        probeDims = math.min(4, vecDim / 4)).count()
    }

    time("ivfpq-search") {
      // q141's IVF×PQ serving shape at N× (VERDICT r13 #4): coarse
      // routing cuts the ADC scan to nprobe buckets of small-int codes,
      // so the per-search marginal cost should grow SLOWER than the
      // flat pq-search above (whose exponent is already ~0.10) — the
      // probed population is a bucket-fraction of the corpus while
      // every bounded artifact (coarse centroid table, codebook, ADC
      // table) stays constant-size across mults. Like pq-search this
      // pays the coding + centroid training live, an upper bound on
      // the production cost where (bucket, codes) are materialized.
      val query = vecBase.filter(col("vec_id") === 1)
        .select(col("embedding").as("qvec"))
      operators.Similarity.ivfPqSearch(bigVecs, "vec_id", "embedding",
        query, "qvec", coarseDims = probeDims, nprobe = 8, k = 10,
        m = 4, subDim = vecDim / 4,
        probeDims = math.min(4, vecDim / 4)).count()
    }

    time("sq8-search") {
      // q146's symmetric-int8 serving shape at N×: scale training is a
      // 1-row agg, coding is row-local, the search is a map-only scan
      // of 4×-compressed codes + TakeOrdered — expect scan-bound
      // ~linear wall with ZERO data-sized state anywhere (the scale
      // and the query codes are both single rows). Pays the coding
      // live (production materializes the code table once) — an upper
      // bound on per-search cost, the pq-search framing.
      val query = vecBase.filter(col("vec_id") === 1)
        .select(col("embedding").as("qvec"))
      operators.Similarity.sq8Search(bigVecs, "vec_id", "embedding",
        query, "qvec", k = 10).count()
    }

    if (stageActive("bm25-batch")) {
      // q142/q173's scale axis is the QUERY COUNT, not the corpus (a
      // training batch retrieves for many probes at once): corpus
      // FIXED (the natural sf documents), 8·mult queries of 3 terms
      // drawn deterministically from the corpus vocabulary.
      val docs = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      val vocab = docs.select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc).limit(200)
        .select(col("token")).collect().map(_.getString(0))
      time("bm25-batch-queries") {
        // LIVE arm: the one-pass design means wall grows sub-linearly
        // in queries — the corpus explode + semi-prune + tf/df
        // aggregation are paid ONCE for the union term set (which
        // grows slower than the query count: terms repeat across
        // queries, as they do in real training batches), and only the
        // final bounded (qid, token) fan-out join scales with mult. A
        // per-query bm25 loop is the linear strawman this stage
        // exists to dominate.
        val queries = spark.range(8L * mult).select(col("id").as("qid"),
          array((0 until 3).map(j =>
            element_at(typedLit(vocab.toSeq),
              ((col("id") * 7 + j * 13) % vocab.length).cast("int") + 1)): _*)
            .as("terms"))
          .select(col("qid"), array_distinct(col("terms")).as("terms"))
        operators.Retrieval.bm25Batch(docs, "doc_id", split(col("text"), " "),
          queries, "qid", col("terms")).count()
      }
      // STORED arm (q173): the SAME query batch answered from the
      // stored index in ONE pruned scan — the live arm's two
      // corpus-text scans and the union-set explode/semi-prune/tf
      // aggregation are replaced by a directory-pruned read of the
      // (token, doc_id, tf, dl) layout. Index built once (memoized
      // ensureBm25Index over the same natural corpus; the cost is the
      // bm25-stored-probe stage's build row).
      val batchSeq: Seq[(Long, Seq[String])] = (0L until 8L * mult).map {
        i => (i, (0 until 3).map(j =>
          vocab(((i * 7 + j * 13) % vocab.length).toInt)).distinct.toSeq)
      }
      timeBest("bm25-batch-stored") {
        val path = graft.sources.Writers.ensureBm25Index(spark, sfDir)
        operators.Retrieval.bm25StoredBatch(
          graft.sources.Writers.prunedBm25Tf(
            spark, path, batchSeq.flatMap(_._2).distinct),
          spark.read.parquet(s"$path/stats"),
          "doc_id", batchSeq).count()
      }
    }

    time("hist-quantiles") {
      // q143's sketch at N×: ONE map-combinable pass over the N×
      // value stream into the bounded (bin, cnt) table, quantiles read
      // off the bounded table — expect ~linear wall in corpus while the
      // reported row count (the SKETCH size) stays CONSTANT across
      // mults: that constancy is the stage's claim, printed as rows=
      val sk = operators.Sketches.histBuild(
        big.select((col("l_extendedprice") * 100).cast("long").as("v")),
        col("v"), 5).persist()
      operators.Sketches.histQuantiles(sk, 5, Seq(50, 90, 99)).collect()
      val rows = sk.count()
      sk.unpersist()
      rows
    }

    time("heavy-hitters") {
      // q145's SON two-phase at N×, on the distribution it exists for:
      // a Zipf(~2) item stream (inverse-md5 synthesis — P(rank r) ∝
      // 1/r²) whose VOCABULARY grows with the corpus. With the global
      // threshold a FIXED FRACTION of the stream (T = n/1000), the
      // phase-1 candidate bound n·P/T = 1000·P is CONSTANT across
      // mults — candidate state never scales with data, which is the
      // whole claim. rows= prints the measured phase-1 candidate count
      // (the audit column): expect ~flat while the stream grows N×
      // (the leading count() is threshold derivation — setup inside
      // the stage, ~one scan of N× rows like both phases).
      val stream = big.select(
        concat(lit("t"), floor(lit(1.0) /
          ((functions.HashFunctions.md5Window(
              concat_ws("_", col("l_orderkey"), col("l_linenumber"),
                col("l_partkey")), 0).cast("double") + lit(0.5))
            / lit(4294967296.0))).cast("long")).as("item"),
        concat_ws("_", col("l_orderkey"), col("l_linenumber")).as("rk"))
      val n = stream.count()
      operators.Sketches.frequentItems(stream, col("item"), col("rk"),
        shards = 8, minCount = math.max(1L, n / 1000))
        .agg(max(col("n_candidates"))).head().getLong(0)
    }

    // q144's incremental claim, measured as twins (the AQE-vs-salt A/B
    // discipline): a FIXED fresh batch folded into an N×-key history.
    // The rebuild re-windows every observation ever seen (~linear in
    // N); the merge's only history-sized work is the broadcast
    // anti/semi scan split (fresh keys are small → broadcast, no
    // history shuffle) — its windows run over touched keys only, so
    // the merge/rebuild ratio should WIDEN with N.
    val scd2Obs = materialize("scd2obs", (0 until mult).map { i =>
      Tables.load(spark, sfDir, "events")
        .select((col("user_id") + lit(i.toLong * 1000000L)).as("key"),
          col("ts"), (col("event_id") + lit(i.toLong * 100000000L)).as("id"),
          col("event_type").as("v"))
    }.reduce(_ unionByName _))
    val scd2Hist = materialize("scd2hist",
      Delta.scd2(scd2Obs, Seq("key"), "ts", Seq("id"), Seq("v")))
    val scd2Fresh = Tables.load(spark, sfDir, "events")
      .filter(col("user_id") < 50)
      .select(col("user_id").as("key"),
        expr("timestampadd(DAY, 400, ts)").as("ts"),
        (col("event_id") + lit(10000000000L)).as("id"),
        col("event_type").as("v"))
    timeBest("scd2-merge-incr") {
      Delta.scd2Merge(scd2Hist, scd2Fresh,
        Seq("key"), "ts", Seq("id"), Seq("v")).count()
    }
    timeBest("scd2-rebuild") {
      Delta.scd2(scd2Obs.unionByName(scd2Fresh),
        Seq("key"), "ts", Seq("id"), Seq("v")).count()
    }

    // ---- Positional phrase search (q151) — layout A/B twins ----
    // The probe's 100 TB claim is the STORED token-partitioned index
    // (q131's directory-pruning leg): a phrase probe reads only its
    // tokens' partitions, so probe work tracks the PHRASE's posting
    // mass, not corpus bytes. The flat twin pays the full live index
    // build + whole-stream filter — what a probe costs WITHOUT the
    // layout. Index build cost is materialization (reported once,
    // excluded from stage timings), exactly like every stored table
    // here. Postings for "fast table" grow ∝ replicas, so pruned-probe
    // wall grows with its own posting mass — the A/B delta, not the
    // absolute exponent, is the claim.
    val postingsPath = s"$scratch/postings_x$mult"
    // gate the build on EITHER probe label (an `only` filter of the
    // exact stage name used to skip the build yet run the probe —
    // ADVICE r14), and key reuse on a completion MARKER carrying a
    // layout-version token, so a partial write or a postings-generator
    // change rebuilds instead of silently reusing a stale directory.
    val postingsMarker =
      java.nio.file.Paths.get(s"$postingsPath/_graft_postings_v1")
    if ((stageActive("phrase-probe-pruned") ||
          stageActive("phrase-probe-flat")) &&
        !java.nio.file.Files.exists(postingsMarker)) {
      val t0 = System.nanoTime()
      operators.Retrieval.invertedIndex(
        bigDocsOrdered.select(col("doc_id"),
          filter(split(col("text"), " "), t => t =!= "").as("toks")),
        "doc_id", col("toks"))
        .write.partitionBy("token").mode("overwrite").parquet(postingsPath)
      val rows = spark.read.parquet(postingsPath).count()
      java.nio.file.Files.writeString(postingsMarker, rows.toString)
      println(f"[scale] materialize postings x$mult rows=$rows ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    timeBest("phrase-probe-pruned") {
      operators.Retrieval.phraseSearch(
        spark.read.parquet(postingsPath), "doc_id", Seq("fast", "table"))
        .count()
    }
    timeBest("phrase-probe-flat") {
      operators.Retrieval.phraseSearch(
        operators.Retrieval.invertedIndex(
          bigDocsOrdered.select(col("doc_id"),
            filter(split(col("text"), " "), t => t =!= "").as("toks")),
          "doc_id", col("toks")),
        "doc_id", Seq("fast", "table")).count()
    }

    time("token-budget") {
      // q152 at N×: 20 sources, per-source budget growing with the
      // corpus (admitted fraction ~constant — the realistic axis: a
      // bigger crawl feeds a bigger mix). The stage REQUIRES every
      // source's budget to actually FILL (last admitted doc crosses the
      // line) before reporting — the admission law, not just a row
      // count. Window parallelism is sources×16 hex cells at every
      // mult; the offsets table stays 320 bounded rows.
      val docs = bigDocsRtoks.select(col("doc_id"),
        concat(lit("s"), col("doc_id") % 20).as("source"),
        size(col("toks")).cast("long").as("n_tok"))
      val budget = 2000L * mult
      val budgets = spark.range(20).select(
        concat(lit("s"), col("id")).as("source"), lit(budget).as("budget"))
      val admitted = operators.Sampling.tokenBudget(
        docs, "doc_id", col("source"), col("n_tok"), budgets, "mix1")
      val fills = admitted.groupBy("source")
        .agg(max(col("tok_before") + col("n_tok")).as("mass"))
        .filter(col("mass") >= budget).count()
      require(fills == 20, s"only $fills/20 budgets filled at x$mult")
      admitted.count()
    }

    // ---- Data recipe (q159) — composed vs tier-materialized (W4) ----
    // q159's declared plan is the three selection tiers (mixture →
    // token-budget admission → curriculum order) as ONE lazy
    // composition, whose curriculum tier re-references the admitted-mix
    // subtree (the PlanLint-priced 6-scan/13-exchange shape). PLANS.md
    // carries a production note that a real pipeline materializes
    // between tiers (the W4 handoff) and pays each tier's budget once —
    // this pair puts a NUMBER on that note: same tiers, same data, one
    // arm composed, one with a parquet handoff after admission (write
    // cost INCLUDED — it is the price the handoff pays to stop the
    // re-execution).
    def recipeDocs = bigDocsRtoks.select(col("doc_id"),
      concat(lit("s"), col("doc_id") % 20).as("source"),
      size(col("toks")).cast("long").as("n_tok"))
    def recipeBudgets(docs: DataFrame) = operators.Sampling
      .mixtureWeights(docs, col("source"), col("n_tok"),
        budget = 2000L * mult)
      .select(col("source"), col("target_rows").as("budget"))
    def recipeOrder(admitted: DataFrame, salt: String) =
      operators.Sampling.trainingOrder(
        admitted.withColumn("b",
          least(floor(col("n_tok") / lit(10)), lit(9)).cast("long")),
        "doc_id", col("b"), salt, carry = Seq("source", "n_tok"))
    timeBest("recipe-composed") {
      val docs = recipeDocs
      val admitted = operators.Sampling.tokenBudget(
        docs, "doc_id", col("source"), col("n_tok"),
        recipeBudgets(docs), "rcpA")
      recipeOrder(admitted, "ordA").count()
    }
    timeBest("recipe-materialized") {
      val docs = recipeDocs
      val admitted = operators.Sampling.tokenBudget(
        docs, "doc_id", col("source"), col("n_tok"),
        recipeBudgets(docs), "rcpA")
      admitted.write.mode("overwrite").parquet(s"$scratch/recipe_admit_x$mult")
      recipeOrder(spark.read.parquet(s"$scratch/recipe_admit_x$mult"), "ordA")
        .count()
    }

    time("profile") {
      // q154 at N×: one melted pass over six lineitem columns — the
      // value-count exchange carries one row per DISTINCT (col, value),
      // so the high-cardinality key columns dominate and wall tracks
      // the scan ~linearly; output is SIX rows at every mult.
      operators.Profile.profile(big, Seq("l_orderkey", "l_partkey",
        "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate"))
        .count()
    }

    time("hard-negatives") {
      // q153 at N×: a FIXED 16-query contrastive batch against the N×
      // corpus — the broadcast-batch × corpus-scan shape, cost ∝
      // corpus×|Q| map work with WindowGroupLimit cutting each probe's
      // exchange to ≤ k·partitions rows. Expect scan-bound ~linear
      // wall; nothing data-sized is ever collected or broadcast.
      val queries = vecBase.filter(col("vec_id") < 16)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          (col("vec_id") % 5).as("qlabel"))
      operators.Similarity.hardNegatives(
        bigVecs.withColumn("label", col("vec_id") % 5),
        "vec_id", "embedding", "label",
        queries, "qid", "qvec", "qlabel", k = 10).count()
    }

    time("routed-negatives") {
      // q155 at N×: the SAME 16-query batch, IVF-routed — each query
      // ranks only its nprobe=4 nearest coarse buckets' population, so
      // wall tracks the probed posting mass while the brute stage above
      // scans corpus×|Q|. The centroid training pass is corpus-linear
      // but |Q|-independent (amortized over every query in the batch);
      // the candidate stage (the |Q|-scaling one) reads only probed
      // buckets via the bucket equi-join. Expect a corpus-axis exponent
      // clearly below the brute stage's ~0.5 once training amortizes.
      val queries = vecBase.filter(col("vec_id") < 16)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          (col("vec_id") % 5).as("qlabel"))
      operators.Similarity.routedNegatives(
        bigVecs.withColumn("label", col("vec_id") % 5),
        "vec_id", "embedding", "label",
        queries, "qid", "qvec", "qlabel",
        probeDims = 8, nprobe = 4, k = 10).count()
    }

    time("ivfpq-search-trained") {
      // q156 at N×: identical serving shape to ivfpq-search above, but
      // routed by a TRAINED (caller-provided) coarse centroid table —
      // the q156 fixed low-id rule, 8 centroids from the natural
      // corpus — so the two stages differ ONLY in how routing picks
      // nprobe bucket ids. Every routing artifact stays bounded (8
      // centroids collected, ≤nprobe probed ids, the ADC literal
      // table); the scan side is the same map-only filter over
      // compressed codes. Expect the ivfpq-search exponent.
      val query = vecBase.filter(col("vec_id") === 1)
        .select(col("embedding").as("qvec"))
      val coarse = vecBase.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      operators.Similarity.ivfPqSearchTrained(bigVecs, "vec_id",
        "embedding", query, "qvec", coarse, "cid", "cvec",
        nprobe = 8, k = 10, m = 4, subDim = vecDim / 4,
        probeDims = math.min(4, vecDim / 4)).count()
    }

    // ---- Stored IVF×PQ probe (q162) — the A/B against the live arms ----
    // Every live IVF×PQ stage above pays coding + codebook training per
    // call (documented upper bounds); this materializes the bucket-
    // partitioned index ONCE (build cost reported as materialization,
    // excluded — the postings-layout framing) and measures what a probe
    // costs against the STORED layout: two bounded reads + probed-
    // bucket directory IO. The stored-vs-live delta, not the absolute
    // exponent, is the claim.
    val ivfIdxPath = s"$scratch/ivfpq_x$mult"
    val ivfIdxMarker =
      java.nio.file.Paths.get(s"$ivfIdxPath/_graft_ivfpq_v2")
    if ((stageActive("ivfpq-stored-probe") ||
         stageActive("routed-negs-stored")) &&
        !java.nio.file.Files.exists(ivfIdxMarker)) {
      val t0 = System.nanoTime()
      val coarse = vecBase.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      // label rides the codes layout (the routedNegativesStored payload
      // contract) — same synthetic label rule as the live mining arms
      val (codes, book) = operators.Similarity.ivfPqIndexTables(
        bigVecs.withColumn("label", col("vec_id") % 5),
        "vec_id", "embedding", coarse, "cid", "cvec",
        m = 4, subDim = vecDim / 4,
        probeDims = math.min(4, vecDim / 4),
        passthrough = Seq("label"))
      codes.write.partitionBy("bucket").mode("overwrite")
        .parquet(s"$ivfIdxPath/codes")
      book.write.mode("overwrite").parquet(s"$ivfIdxPath/codebook")
      coarse.write.mode("overwrite").parquet(s"$ivfIdxPath/centroids")
      val rows = spark.read.parquet(s"$ivfIdxPath/codes").count()
      java.nio.file.Files.writeString(ivfIdxMarker, rows.toString)
      println(f"[scale] materialize ivfpq index x$mult rows=$rows ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    timeBest("ivfpq-stored-probe") {
      val query = vecBase.filter(col("vec_id") === 1)
        .select(col("embedding").as("qvec"))
      operators.Similarity.ivfPqSearchStored(
        spark.read.parquet(s"$ivfIdxPath/codes"),
        spark.read.parquet(s"$ivfIdxPath/codebook"),
        spark.read.parquet(s"$ivfIdxPath/centroids"),
        "vec_id", query, "qvec", nprobe = 8, k = 10,
        m = 4, subDim = vecDim / 4,
        probeDims = math.min(4, vecDim / 4)).count()
    }

    // q174's merged-vs-rebuilt A/B (the q171 lifecycle for the ANN leg):
    // fold the 10% fresh vector slice into a pre-existing 90% index —
    // one map-only encode against the FROZEN centroids + a bucket-
    // directory append, cost ∝ |fresh| — vs rebuilding the whole layout
    // (codebook re-training + full re-encode + full rewrite). The
    // guarded variant adds the new-id semi-join over the fresh buckets'
    // directories. Each merge pass gets an untimed fresh 90% base.
    if (stageActive("ivfpq-merge")) {
      val coarseM = vecBase.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val mSub = vecDim / 4
      val pDims = math.min(4, vecDim / 4)
      val vBase = bigVecs.filter(col("vec_id") % 10 =!= 0)
      val vFresh = bigVecs.filter(col("vec_id") % 10 === 0)
      def buildTo(p: String, vs: org.apache.spark.sql.DataFrame): Unit = {
        val (codes, book) = operators.Similarity.ivfPqIndexTables(
          vs, "vec_id", "embedding", coarseM, "cid", "cvec",
          m = 4, subDim = mSub, probeDims = pDims)
        codes.write.partitionBy("bucket").mode("overwrite")
          .parquet(s"$p/codes")
        book.write.mode("overwrite").parquet(s"$p/codebook")
        coarseM.write.mode("overwrite").parquet(s"$p/centroids")
      }
      timeBest("ivfpq-merge-rebuild", passes = 2) {
        val p = s"$scratch/ivfpq_rebuild_x$mult"
        buildTo(p, bigVecs)
        spark.read.parquet(s"$p/codes").count()
      }
      Seq(false, true).foreach { guarded =>
        val label =
          if (guarded) "ivfpq-merge-append-guard" else "ivfpq-merge-append"
        var best = Double.MaxValue
        var n = 0L
        (0 until 2).foreach { r =>
          val p = s"$scratch/ivfpq_mb_${if (guarded) "g" else "u"}${r}_x$mult"
          buildTo(p, vBase) // untimed: the pre-existing index
          val t0 = System.nanoTime()
          graft.sources.Writers.mergeIvfPqIndex(spark, p, vFresh,
            m = 4, subDim = mSub, probeDims = pDims, checkNewIds = guarded)
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
          n = spark.read.parquet(s"$p/codes").count()
        }
        durations(label) = best
        println(f"[scale] $label%-22s rows=$n%10d  $best%7.2f s (best of 2)")
      }
    }

    // q178's delete arms (FAISS remove_ids at N×): the tombstone append
    // itself (∝ |deleted ids|, never the layout), the probe price of
    // the visibility anti-join vs the tombstone-free ivfpq-stored-probe
    // above, and the compaction that folds tombstones into the codes
    // directories. Builds its own layout copy — the shared ivfIdxPath
    // feeds the stored-probe/mining stages and must stay undeleted.
    if (stageActive("ivfpq-delete")) {
      val mSub = vecDim / 4
      val pDims = math.min(4, vecDim / 4)
      val delPath = s"$scratch/ivfpq_del_x$mult"
      val coarseD = vecBase.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val delIds = bigVecs.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id"))
      var best = Double.MaxValue
      (0 until 2).foreach { _ =>
        val (codes, book) = operators.Similarity.ivfPqIndexTables(
          bigVecs, "vec_id", "embedding", coarseD, "cid", "cvec",
          m = 4, subDim = mSub, probeDims = pDims)
        codes.write.partitionBy("bucket").mode("overwrite")
          .parquet(s"$delPath/codes")
        book.write.mode("overwrite").parquet(s"$delPath/codebook")
        coarseD.write.mode("overwrite").parquet(s"$delPath/centroids")
        graft.sources.Writers.clearTombstones(delPath) // rebuilt in place
        val t0 = System.nanoTime()
        graft.sources.Writers.deleteFromIvfPqIndex(spark, delPath, delIds)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      durations("ivfpq-delete-tombstone") = best
      println(f"[scale] ivfpq-delete-tombstone  $best%7.2f s (best of 2)")
      timeBest("ivfpq-delete-probe") {
        val query = vecBase.filter(col("vec_id") === 1)
          .select(col("embedding").as("qvec"))
        operators.Similarity.ivfPqSearchStored(
          graft.sources.Writers.liveCodes(spark, delPath),
          spark.read.parquet(s"$delPath/codebook"),
          spark.read.parquet(s"$delPath/centroids"),
          "vec_id", query, "qvec", nprobe = 8, k = 10,
          m = 4, subDim = mSub, probeDims = pDims).count()
      }
      time("ivfpq-delete-compact") {
        graft.sources.Writers.compactIvfPqIndex(spark, delPath)
        spark.read.parquet(s"$delPath/codes").count()
      }
    }

    // q184's update-vs-rebuild A/B on the VECTOR leg: replace the 10%
    // changed vectors (reversed — new buckets, new codes) via
    // tombstone + frozen-codebook re-encode vs re-coding and rewriting
    // the whole updated corpus. The update arm's cost ∝ the changed
    // batch (one map-only encode + bucket-directory appends + a
    // one-task tombstone write); the rebuild re-encodes everything.
    // Each pass gets an untimed fresh gen-capable padded base.
    if (stageActive("ivfpq-update")) {
      val mSub = vecDim / 4
      val pDims = math.min(4, vecDim / 4)
      val coarseU = vecBase.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val changed = bigVecs.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
      timeBest("ivfpq-update-rebuild", passes = 2) {
        val upd = bigVecs.filter(col("vec_id") % 10 =!= 0)
          .select(col("vec_id"), col("embedding")).unionByName(changed)
        val (codes, book) = operators.Similarity.ivfPqIndexTables(
          upd, "vec_id", "embedding", coarseU, "cid", "cvec",
          m = 4, subDim = mSub, probeDims = pDims)
        graft.sources.Writers.writeIvfCodes(spark, codes,
          s"$scratch/ivfpq_updreb_x$mult")
        book.write.mode("overwrite")
          .parquet(s"$scratch/ivfpq_updreb_x$mult/codebook")
        spark.read.parquet(s"$scratch/ivfpq_updreb_x$mult/codes").count()
      }
      var best = Double.MaxValue
      val updPath = s"$scratch/ivfpq_upd_x$mult"
      (0 until 2).foreach { _ =>
        val (codes, book) = operators.Similarity.ivfPqIndexTables(
          bigVecs.select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", coarseU, "cid", "cvec",
          m = 4, subDim = mSub, probeDims = pDims)
        graft.sources.Writers.writeIvfCodes(spark, codes, updPath)
        graft.sources.Writers.padIvfPqCodebook(spark, book, 4, mSub, pDims)
          .write.mode("overwrite").parquet(s"$updPath/codebook")
        coarseU.write.mode("overwrite").parquet(s"$updPath/centroids")
        val t0 = System.nanoTime()
        graft.sources.Writers.updateIvfPqIndex(spark, updPath, changed,
          m = 4, subDim = mSub, probeDims = pDims)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      durations("ivfpq-update-inplace") = best
      println(f"[scale] ivfpq-update-inplace  $best%7.2f s (best of 2)")
      time("ivfpq-describe") {
        graft.sources.Writers.describeIvfPqIndex(spark, updPath).codesRows
      }
    }

    timeBest("routed-negs-stored") {
      // q168 at N× — the stored twin of the routed-negatives stage
      // above, SAME 16-query batch: routing is driver-side integer
      // argsort over the stored centroid table, the probed-bucket
      // union is a plan-time PartitionFilters literal set, and the
      // only corpus-sized read is the pruned codes directories (with
      // the label payload in-layout, so disqualification adds no
      // join). The live arm re-buckets + re-trains centroids per call
      // and scans full embeddings; the stored arm's delta vs it is
      // the build-once/probe-many claim for MINING, not just q162's
      // single-query serving.
      val queries = vecBase.filter(col("vec_id") < 16)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          (col("vec_id") % 5).as("qlabel"))
      operators.Similarity.routedNegativesStored(
        spark.read.parquet(s"$ivfIdxPath/codes"),
        spark.read.parquet(s"$ivfIdxPath/codebook"),
        spark.read.parquet(s"$ivfIdxPath/centroids"),
        "vec_id", "label", queries, "qid", "qvec", "qlabel",
        nprobe = 4, k = 10, m = 4, subDim = vecDim / 4,
        probeDims = math.min(4, vecDim / 4)).count()
    }

    time("tfidf-keywords") {
      // q157 at N×: ONE (doc, term) tf aggregation drives everything —
      // df as a term-keyed window over it, N as a 1-row broadcast, the
      // per-doc top-k as a WindowGroupLimit rank. Token-linear work
      // with no data-sized driver state; the rtoks corpus keeps replica
      // vocabularies disjoint, so the df window's key space grows with
      // the corpus (the honest axis: term cardinality, not row count).
      operators.TextStats.tfidfKeywords(
        bigDocsRtoks.select(col("doc_id"), col("toks")),
        "doc_id", col("toks"), 5).count()
    }

    time("cluster-balanced") {
      // q161 at N×: assignment is corpus × broadcast-4 row-local argmin
      // + ONE keyed agg; the per-cluster quality top-k cuts via
      // WindowGroupLimit BEFORE its k-partition window exchange, so the
      // window shuffle carries ≤ tasks×4×64 candidate rows at every
      // mult and the output is a constant 4×64 rows. Expect scan-bound
      // ~linear wall; the constant output/exchange mass is the claim.
      val quality = bigVecs.select(col("vec_id"),
        (col("vec_id") % 9973L).as("q"))
      operators.Sampling.clusterBalanced(bigVecs, "vec_id", "embedding",
        4, quality, "vec_id", col("q"), 64).count()
    }

    time("fit-multiclass") {
      // q160's training loop at N×: k=5 one-vs-rest models trained
      // SIMULTANEOUSLY — per iteration ONE fused-margin corpus pass
      // (graft_lookup_sums: all 5 margins in one feature-array
      // traversal) + ONE bucket-keyed partial agg; ≤ k×buckets gradient
      // rows reach the driver per iteration. Expect ~linear wall in
      // corpus (iters × 2 corpus-linear jobs after the one-time
      // featurize checkpoint); rows= prints the weight-table size —
      // bounded at every mult, the state claim.
      val labeled = bigDocsRtoks.select(col("doc_id"),
        concat(lit("c"), (col("doc_id") % 5).cast("string")).as("lab"),
        col("toks"))
      operators.QualityModel.fitMulticlass(labeled, col("toks"),
        col("lab"), (0 until 5).map(i => s"c$i"), 128, 2).count()
    }

    // q165's serving half at N×: the model is a FIXED artifact trained
    // once on the natural corpus (the ensureModel contract — trained
    // OUTSIDE the timed stage, as the stored layout implies); the
    // corpus is the axis. Serving is map-only: one scan, the one-pass
    // native featurize kernel + the fused k-margin lookup + argmax.
    // Expect scan-bound ~linear — THE shape a 100 TB labeling pass
    // runs.
    val langidServeW = if (stageActive("langid-serve")) {
      val labeledNat = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"),
          concat(lit("c"), (col("doc_id") % 5).cast("string")).as("lab"),
          filter(split(col("text"), " "), t => t =!= "").as("toks"))
      operators.QualityModel.fitMulticlass(labeledNat, col("toks"),
        col("lab"), (0 until 5).map(i => s"c$i"), 128, 1).localCheckpoint()
    } else null
    timeBest("langid-serve") {
      // filter on the prediction so count() cannot prune the map work
      // (the Bench noop-sink rule: a bare count measures the scan only)
      operators.QualityModel.predictClass(
        bigDocsRtoks.select(col("doc_id"), col("toks")),
        col("toks"), langidServeW, (0 until 5).map(i => s"c$i"), 128)
        .filter(col("pred_class").isNotNull).count()
    }

    time("kmeans-train") {
      // q164's trainer at N×: 2 Lloyd's iterations at k=8 under the
      // exact-seeding regime — per iteration ONE broadcast-literal
      // argmin assignment job + ONE (cluster, pos)-keyed exact-
      // millionth centroid aggregation; driver state is k×dim doubles
      // and the full-dedup seed pick is a corpus-keyed agg ONCE.
      // Expect ~linear wall in corpus rows (iters × 2 corpus-linear
      // jobs + the seed dedup); rows= is the assignment (corpus-sized
      // OUTPUT, bounded driver state — the claim is the state, not
      // the output).
      operators.Similarity.kmeans(bigVecs, "vec_id", "embedding",
        k = 8, maxIter = 2, seedLevels = Seq(1024L, 32L, 1L)).count()
    }

    time("pagerank-3iter") {
      // q103's iterative link-graph shape at N×: 3 out-edges per node
      // over an N×-sized id space (no union-plan concern — the edge
      // table is one narrow range transform). Expect ~linear in edges:
      // each iteration is one src-keyed join + one dst aggregation.
      val ids = spark.range(5000L * mult).select(col("id").as("doc_id"))
      val n = broadcast(ids.agg(count(lit(1)).as("n_docs")))
      val edges = ids.crossJoin(n)
        .select(col("doc_id").as("src"), col("n_docs"),
          explode(array(lit(1), lit(2), lit(3))).as("k"))
        .select(col("src"),
          ((col("src") * 31 + col("k")) % col("n_docs")).as("dst"))
        .filter(col("src") =!= col("dst"))
      operators.Graph.pageRank(edges, "src", "dst", iterations = 3).count()
    }
    spark.stop()
  }
}
