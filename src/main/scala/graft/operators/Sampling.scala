package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splits — training-data pipeline
  * primitives (SURVEY §2.9 family). `df.sample(fraction, seed)` depends on
  * engine RNG and partitioning, so it is neither reproducible across
  * engines nor stable under repartitioning; hashing a stable key is both:
  * the same row lands in the same split on every engine, every run, every
  * cluster size. This is how reproducible train/val/test splits are done
  * over 100 TB — row-local, no shuffle, pushes nothing but a filter.
  */
object Sampling {

  /** Stable per-row bucket in [0, buckets): md5 of the key column.
    * Native first-window digest read — bit-identical to the
    * conv(substring(md5)) chain the oracles replay (Md5Hash32). */
  def hashBucketOf(key: Column, buckets: Int): Column =
    graft.functions.HashFunctions.md5Bucket(key.cast("string"), buckets)
      .cast("long")

  /** Keep ~pct/100 of rows, deterministically by key. */
  def hashSample(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.filter(hashBucketOf(key, 100) < pct)

  /** Label each row train/val/test by stable key hash (e.g. 80/10/10). */
  def split(key: Column, trainPct: Int, valPct: Int): Column = {
    val b = hashBucketOf(key, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Temperature-scaled source-mixture plan: per-source sampling weight
    * w_s = sqrt(n_s) / Σ sqrt(n), plus the per-source row target out of
    * `budget` total samples. This is the α=0.5 case of the standard
    * count^α mixture reweighting used to flatten source imbalance when
    * assembling a training mix (upweights small sources, downweights
    * mega-sources). sqrt is IEEE-correctly-rounded in every engine —
    * unlike pow/exp — so the weights are engine-portable exactly; the
    * weight denominator is summed in DECIMAL over rounded sqrt values.
    *
    * Per-source targets are apportioned by largest remainder (Hamilton's
    * method): floor every exact share, then hand the leftover
    * budget − Σ floor rows to the sources with the largest fractional
    * parts (ties → source asc), so Σ target_rows == budget EXACTLY
    * (plain flooring undershot by up to #sources−1 rows, ADVICE r7).
    *
    * One partial+final groupBy over the corpus; everything after runs on
    * the ∼#sources-row table as single-partition window functions (the
    * denominator, the leftover, and the fractional rank all share one
    * exchange — no extra aggregate/crossJoin round-trips; the
    * "no partition defined" window is deliberate and bounded by
    * construction) and the driver never sees the data.
    */
  def mixtureWeights(df: DataFrame, sourceCol: Column, sizeCol: Column,
                     budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val allRows = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byFrac = Window.partitionBy()
      .orderBy((col("__exact") - col("__base")).desc_nulls_last,
        col("source").asc_nulls_first)
    df.groupBy(sourceCol.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(sizeCol).cast("long").as("n_tok"))
      .withColumn("w",
        round(sqrt(col("n_tok").cast("double")), 6).cast("decimal(18,6)"))
      .withColumn("tw", sum(col("w")).over(allRows).cast("decimal(28,6)"))
      .withColumn("__exact",
        lit(budget) * (col("w").cast("double") / col("tw").cast("double")))
      .withColumn("__base", floor(col("__exact")).cast("long"))
      .withColumn("__leftover",
        (lit(budget) - sum(col("__base")).over(allRows)).cast("long"))
      .withColumn("__rk", row_number().over(byFrac))
      .select(col("source"), col("n_docs"), col("n_tok"),
        round(col("w").cast("double") / col("tw").cast("double"), 6)
          .as("weight"),
        (col("__base") +
          when(col("__rk") <= col("__leftover"), 1L).otherwise(0L))
          .cast("long").as("target_rows"))
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-Res): each row draws a stable uniform u from md5(key)
    * and ranks by ln(u)/w — the log-monotone form of the u^(1/w) key,
    * avoiding cross-engine pow() — so a row's selection probability is
    * proportional to its weight. The standard way to draw a
    * quality-weighted training subset: one scan + global top-k, which
    * plans as TakeOrderedAndProject (per-partition top-k then a k-row
    * merge — no full sort, no shuffle of the corpus). Weights must be
    * > 0. u is shifted to (0,1) strictly (+0.5/2^32) so ln never sees 0;
    * exact key ties break by the key column for full determinism.
    *
    * Cross-engine caveat: ln() is only ~1-ulp-accurate and its exact
    * bits differ between libm implementations (JVM StrictMath vs
    * DuckDB's C libm), so a near-tie at the top-k BOUNDARY can flip
    * which row an oracle on another engine selects — the within-engine
    * result is fully deterministic, the cross-engine hash match is
    * probabilistic in corpus size (fine at verify SF; a strict-parity
    * variant would need an integer/decimal rank key). */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
                     k: Int): DataFrame = {
    val u = (graft.functions.HashFunctions.md5Window(key.cast("string"), 0)
      .cast("double") + 0.5) / 4.294967296e9
    df.withColumn("__es", log(u) / weight)
      .orderBy(col("__es").desc_nulls_last, key.asc_nulls_first)
      .limit(k)
      .drop("__es")
  }

  /** Stratified deterministic sample: `perGroup` rows per group, chosen
    * by hash order (stable, engine-portable). One shuffle on the group
    * key. */
  def stratified(df: DataFrame, groupCols: Seq[String], key: Column,
                 perGroup: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(md5(key.cast("string")).asc_nulls_first, key.asc_nulls_first)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perGroup)
      .drop("__rn")
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each doc by
    * how much more likely its hashed-n-gram features are under a TARGET
    * distribution than under the RAW corpus distribution, then keep the
    * top-k. The standard trick for skewing a crawl toward a wanted
    * domain without a trained model: both distributions are bag-of-
    * hashed-ngram unigram models estimated from the corpus itself
    * (target = rows where `isTarget`), add-1 smoothed over the bucket
    * space so unseen buckets stay finite.
    *
    * Determinism/parity: features are the md5-hashed unigram+bigram
    * buckets ([[QualityModel.featureBuckets]]); per-bucket log ratios
    * are `round(ln(p),8)` differences accumulated in DECIMAL(28,8) (the
    * q97 parity technique — association order can't matter), and the
    * only float op is the final mean — ONE IEEE division of the exact
    * decimal sum (scale-8 scaled integer < 2^53, so the decimal→double
    * cast is exact in both engines), bit-identical cross-engine. The
    * mean is deliberately NOT rounded: sf0.1 produced a doc whose exact
    * mean was precisely −0.0053455 — a perfect round-6 half case —
    * and Spark's round (shortest-repr decimal, HALF_UP → −0.005346)
    * disagreed with DuckDB's (binary double just below half →
    * −0.005345). A raw correctly-rounded quotient has no such boundary;
    * rounding an IEEE value that sits ON a decimal half is the one op
    * engines resolve differently (CORRECTNESS_sf01, r13). `selected`
    * is a rank cut over (logratio desc, id asc) — exact given
    * bit-identical scores.
    *
    * Scale shape: two corpus passes, both shuffle-lean. Pass 1
    * estimates the distributions — explode features, ONE partial+final
    * groupBy(bucket) counting target/raw occurrences; output is
    * BOUNDED (≤ `buckets` rows), so the totals window and the log-ratio
    * arithmetic run on a model-artifact-sized table. Pass 2 scores —
    * the ratio table is BROADCAST back onto the exploded features and
    * re-aggregated per doc (map-side partials; a doc's features are
    * co-located by construction). Nothing unbounded ever reaches the
    * driver; the rank cut never globally sorts the corpus — the k-th
    * (logratio desc, id asc) row is found by a TakeOrderedAndProject
    * top-k (per-partition top-k, k-row merge), reduced to ONE row and
    * broadcast back as a threshold compare.
    *
    * The scored table is `localCheckpoint`ed before the cut: the
    * threshold and the output both consume `scored`, and the two
    * consumers' column sets differ enough that exchange reuse cannot
    * deduplicate the subtrees — without the checkpoint the ENTIRE
    * featurize→ratio→score pipeline executes twice (verified on the
    * adaptive plan). Same executor-local materialization the q92/q103
    * iteration state uses; the checkpointed table is narrow (id,
    * n_feats, logratio). */
  def importanceWeights(docs: DataFrame, idCol: String, toks: Column,
                        isTarget: Column, buckets: Int, k: Int): DataFrame = {
    // r20 (guide §3.3): the feature stream feeds BOTH the bucket-count
    // aggregation and the per-doc scoring join — two references, each
    // re-running the corpus tokenize + md5 featureBuckets explode (the
    // expensive half of this operator). Materialize the (id, flag,
    // bucket) metadata stream once.
    val feats = docs.select(col(idCol), isTarget.cast("boolean").as("__t"),
      explode(QualityModel.featureBuckets(toks, buckets)).as("bucket"))
      .localCheckpoint()
    val allRows = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    def lp(c: Column, n: Column): Column =
      round(log((c + lit(1)).cast("double") /
        (n + lit(buckets)).cast("double")), 8)
    val ratios = feats.groupBy(col("bucket"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"),
        count(lit(1)).as("__cr"))
      .withColumn("__nt", sum(col("__ct")).over(allRows))
      .withColumn("__nr", sum(col("__cr")).over(allRows))
      .select(col("bucket"),
        (lp(col("__ct"), col("__nt")) - lp(col("__cr"), col("__nr")))
          .cast("decimal(18,8)").as("__lr"))
    val scored = feats
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("__lr")).cast("decimal(28,8)").as("__lrs"))
      .withColumn("logratio",
        col("__lrs").cast("double") / col("n_feats") + lit(0.0))
      .localCheckpoint()
    require(k >= 1, s"k must be >= 1 (got $k)")
    val kth = scored
      .orderBy(col("logratio").desc_nulls_last, col(idCol).asc_nulls_first)
      .limit(k)
      .agg(max(struct((col("logratio") * -1).as("__nlr"), col(idCol).as("__id")))
        .as("__kth"))
    scored.crossJoin(broadcast(kth))
      .select(col(idCol), col("n_feats"), col("logratio"),
        (struct((col("logratio") * -1).as("__nlr"), col(idCol).as("__id"))
          <= col("__kth")).as("selected"))
  }

  /** Training-order assignment — curriculum ordering (Bengio et al.
    * 2009) WITHOUT a global sort: every document gets a dense 1-based
    * position such that ordering by `pos` is EXACTLY ordering by
    * `(bucket, md5(salt_id), id)` — curriculum buckets first (e.g.
    * short→long documents), an md5-stable shuffle within each bucket
    * (re-salting re-shuffles deterministically per epoch), id as the
    * total tiebreak.
    *
    * A literal ORDER BY over the corpus funnels 100 TB through a range
    * sort whose output order no downstream writer preserves anyway; the
    * scalable form is distributed rank + offsets: positions are computed
    * as `offset(bucket, sub) + rank within (bucket, sub)` where `sub` is
    * the first hex char of the shuffle hash — 16 sub-cells per bucket,
    * so the rank windows parallelize `buckets×16` ways and the offset
    * table (one count per cell, cumulated in one bounded single-partition
    * window) broadcasts. Widening `sub` to k hex chars gives 16^k cells —
    * the same split extends to any fan-out a larger cluster wants. The bijection law (sorting by pos == sorting by
    * the declared key; positions dense 1..N) is spec-pinned, and the
    * ORACLE computes positions with the straight global-sort
    * `row_number() OVER (ORDER BY ...)` — parity across two genuinely
    * different plans.
    *
    * Output: (idCol, carry..., bucket, pos) — `carry` names extra input
    * columns to pass through unchanged (they ride the SAME rank windows,
    * costing nothing; the q159 recipe carries source/n_tok so the
    * ordered mix needs no join back onto its own subtree, which would
    * re-execute it). */
  def trainingOrder(df: DataFrame, idCol: String, bucketCol: Column,
                    salt: String, carry: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(
      (col(idCol) +: carry.map(col)) :+
        bucketCol.cast("long").as("bucket") :+
        md5(concat(lit(salt), lit("_"), col(idCol).cast("string"))).as("__h"): _*)
      .withColumn("__sub", substring(col("__h"), 1, 1))
    val offsets = base.groupBy(col("bucket"), col("__sub"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum(col("__n")).over(Window.partitionBy(lit(1))
          .orderBy(col("bucket"), col("__sub"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("__sub"), col("__off"))
    base
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("bucket"), col("__sub"))
          .orderBy(col("__h"), col(idCol))))
      .join(broadcast(offsets), Seq("bucket", "__sub"))
      .select((col(idCol) +: carry.map(col)) :+ col("bucket") :+
        (col("__off") + col("__r")).as("pos"): _*)
  }

  /** Token-budget corpus cut — assemble a training mix by admitting each
    * source's documents, in a deterministic md5-shuffled order, until
    * that source's token budget is spent (the selection step after
    * [[mixtureWeights]] decides how many tokens each source OWES the
    * mix). A document is admitted while the tokens BEFORE it are under
    * budget, so the first doc to cross the line is kept (budgets fill,
    * never undershoot) and everything after it is cut.
    *
    * Scale shape — [[trainingOrder]]'s distributed-rank pattern with
    * WEIGHTED running sums: a naive per-source running sum is one window
    * partition per source (a handful of partitions for 100 TB — the
    * skew this family refuses), so the per-doc prefix sum is computed as
    * `cell offset + within-cell running sum` over (source, first hex
    * char of the shuffle hash) cells: 16 sub-cells per source, window
    * parallelism `sources×16` (widen the hex prefix for more), and the
    * per-cell offset table (one bounded aggregation, cumulated per
    * source) broadcasts. `budgets` carries (source, budget) — one row
    * per source, broadcast into the admission filter.
    *
    * Output: admitted docs as (idCol, source, n_tok, tok_before). The
    * oracle computes the same admission with the literal per-source
    * running-sum window — parity across two genuinely different plans
    * (the q150 check). */
  def tokenBudget(df: DataFrame, idCol: String, sourceCol: Column,
                  nTokCol: Column, budgets: DataFrame,
                  salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol), sourceCol.as("source"),
      nTokCol.cast("long").as("n_tok"),
      md5(concat(lit(salt), lit("_"), col(idCol).cast("string"))).as("__h"))
      .withColumn("__sub", substring(col("__h"), 1, 1))
    val offsets = base.groupBy(col("source"), col("__sub"))
      .agg(sum(col("n_tok")).as("__cell"))
      .withColumn("__off", coalesce(
        sum(col("__cell")).over(Window.partitionBy(col("source"))
          .orderBy(col("__sub"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("__sub"), col("__off"))
    base
      .withColumn("__run", sum(col("n_tok")).over(
        Window.partitionBy(col("source"), col("__sub"))
          .orderBy(col("__h"), col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - col("n_tok"))
      .join(broadcast(offsets), Seq("source", "__sub"))
      .join(broadcast(budgets), Seq("source"))
      .withColumn("tok_before", col("__off") + col("__run"))
      .filter(col("tok_before") < col("budget"))
      .select(col(idCol), col("source"), col("n_tok"), col("tok_before"))
  }

  /** Cluster-balanced selection — the coverage-balancing step of
    * cluster-based data pruning (the SemDeDup/DiverseEvol family's
    * selection half): assign every vector to its nearest seed centroid
    * ([[Similarity.seedAssign]]'s exact-integer argmin), join the quality
    * table, keep the top `perCluster` rows PER CLUSTER by (quality DESC,
    * id ASC). Where [[mixtureWeights]] balances by source label, this
    * balances by embedding-space REGION — sparse regions contribute their
    * best docs at full weight instead of drowning under a dominant mode.
    *
    * Scale shape: corpus × broadcast-k assignment → one keyed
    * aggregation → id equi-join to the quality table → per-cluster rank
    * window. The window partitions on `cluster` (k partitions — the skew
    * this family refuses for RANKING), but the `rank <= perCluster`
    * filter is a WindowGroupLimit: each map task pre-cuts to its local
    * top-`perCluster` per cluster BEFORE the exchange, so the window's
    * shuffle carries ≤ tasks × k × perCluster rows, never the corpus.
    *
    * Output: (cluster, qIdCol, quality, rank, carry...). */
  def clusterBalanced(vectors: DataFrame, idCol: String, vecCol: String,
                      k: Int, quality: DataFrame, qIdCol: String,
                      qualityCol: Column, perCluster: Int,
                      carry: Seq[String] = Nil): DataFrame =
    clusterBalancedAssigned(
      Similarity.seedAssign(vectors, idCol, vecCol, k),
      idCol, quality, qIdCol, qualityCol, perCluster, carry)

  /** [[clusterBalanced]] over a CALLER-PROVIDED assignment table
    * `(idCol, cluster)` — the TRAINED path: [[Similarity.kmeans]]
    * output (or any clustering) plugs in directly, with no k ≤ 8
    * packing limit; the fixed-seed form above is exactly this composed
    * with [[Similarity.seedAssign]]. Same plan shape from the
    * assignment onward: id equi-join + per-cluster WindowGroupLimit. */
  def clusterBalancedAssigned(assigned: DataFrame, idCol: String,
                              quality: DataFrame, qIdCol: String,
                              qualityCol: Column, perCluster: Int,
                              carry: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val asg = assigned.select(col(idCol), col("cluster"))
    val q = quality.select(
      col(qIdCol) +: qualityCol.cast("long").as("quality") +: carry.map(col): _*)
    val joined =
      if (qIdCol == idCol) q.join(asg, Seq(idCol))
      else q.join(asg, col(qIdCol) === col(idCol)).drop(idCol)
    joined
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("cluster"))
          .orderBy(col("quality").desc, col(qIdCol).asc)).cast("long"))
      .filter(col("rank") <= perCluster)
      .select(col("cluster") +: col(qIdCol) +: col("quality") +:
        col("rank") +: carry.map(col): _*)
  }
}
