package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic sampling / split queries — reproducible-at-scale
  * alternatives to RNG sampling (row-local hash filters, no shuffle
  * except the stratified window).
  */
object SamplePack extends QueryPack {

  private val bucketSql =
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100"

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ~10% reproducible sample by key hash.
    "q75_hash_sample" -> ((s, dir) => Q.ordered(
      Sampling.hashSample(Q.t(s, dir, "documents"), col("doc_id"), 10)
        .select(col("doc_id"), col("lang")))),

    // stable train/val/test labeling (80/10/10).
    "q76_train_split" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "documents").select(
        col("doc_id"),
        Sampling.split(col("doc_id"), 80, 10).as("split")))),

    // stratified: 3 docs per language, hash-ordered (engine-portable).
    "q77_stratified_sample" -> ((s, dir) => Q.ordered(
      Sampling.stratified(Q.t(s, dir, "documents"), Seq("lang"),
        col("doc_id"), 3)
        .select(col("lang"), col("doc_id")))),

    // weighted sampling WITHOUT replacement (Efraimidis–Spirakis):
    // quality-weighted subset draw — selection probability ∝ n_chars.
    // ln(u)/w ranking with md5-stable u; plans as TakeOrderedAndProject
    // (per-partition top-k, no corpus shuffle/sort).
    "q104_weighted_sample" -> ((s, dir) => Q.ordered(
      Sampling.weightedSample(Q.t(s, dir, "documents"),
          col("doc_id"), col("n_chars").cast("double"), 100)
        .select(col("doc_id"), col("n_chars")))),

    // DSIR importance resampling (Xie et al. 2023): skew the corpus
    // toward a target slice (here lang='en') by hashed-n-gram log
    // likelihood ratio — two shuffle-lean passes (bounded bucket-count
    // table, broadcast ratios, map-side per-doc partials), top-k cut by
    // broadcast threshold (never a global sort). Parity: q97's
    // round-8-per-term DECIMAL-sum technique.
    "q111_dsir_weights" -> ((s, dir) => Q.ordered {
      Sampling.importanceWeights(
        Q.wide(Q.t(s, dir, "documents")).select(col("doc_id"), col("lang"),
          filter(split(col("text"), " "), t => t =!= "").as("toks")),
        "doc_id", col("toks"), col("lang") === "en", 4096, 100)
    }),

    // temperature-scaled source mixture: w_s = sqrt(n_tok_s) / Σ sqrt —
    // the count^α (α=0.5) reweighting for assembling a training mix.
    // sqrt is IEEE-exact in every engine (pow/exp are not).
    "q29_mixture_weights" -> ((s, dir) => Q.ordered(
      Sampling.mixtureWeights(
        Q.t(s, dir, "documents"),
        col("source"),
        size(split(col("text"), " ")),
        budget = 1000000L))),

    // curriculum training-order assignment (Bengio et al. 2009) WITHOUT
    // a global sort: dense 1-based positions equal to ORDER BY (length
    // bucket short→long, md5 epoch-salted shuffle, doc_id) — computed as
    // distributed rank + broadcast offsets over (bucket, hex-char)
    // cells (the offset table is one bounded single-partition window).
    // The ORACLE takes the literal global-sort row_number() — parity
    // across two genuinely different plans is the check.
    "q150_training_order" -> ((s, dir) => Q.ordered {
      val d = Q.t(s, dir, "documents").select(col("doc_id"),
        least(floor(size(split(col("text"), " ")) / lit(10)), lit(9))
          .cast("long").as("b"))
      Sampling.trainingOrder(d, "doc_id", col("b"), "ep1")
    }),

    // token-budget corpus cut (the selection step after q29 decides the
    // mixture): each source admits md5-ordered docs until its budget is
    // spent — first doc to cross the line kept, rest cut. The engine
    // computes prefix sums as cell-offset + within-cell running sum
    // (q150's distributed-rank pattern, weighted); the ORACLE is the
    // literal per-source running-sum window — parity across two
    // genuinely different plans. Budgets here derive from the source id
    // (300 + 200·(srcnum mod 4) tokens — cuts each ~1.4k-token source
    // to roughly its front quarter-to-half).
    "q152_token_budget" -> ((s, dir) => Q.ordered {
      val docs = Q.t(s, dir, "documents").select(col("doc_id"), col("source"),
        size(filter(split(col("text"), " "), t => t =!= ""))
          .cast("long").as("n_tok"))
      // explicit digit-suffix parse that FAILS LOUDLY on a fixture-shape
      // drift (ADVICE r14): the old substring cast returned NULL on a
      // non-numeric suffix and the budget join silently dropped that
      // source's rows, while the oracle's CAST errored — a confusing
      // parity mismatch instead of a clear failure. regexp_extract +
      // raise_error makes both sides total-or-raise.
      val srcnum = regexp_extract(col("source"), "([0-9]+)$", 1)
      val budgets = docs.select(col("source")).distinct()
        .withColumn("budget", lit(300L) + lit(200L) *
          (when(srcnum =!= "", srcnum.cast("long"))
            .otherwise(raise_error(concat(
              lit("q152: source without numeric suffix: "), col("source"))))
            % 4))
      Sampling.tokenBudget(docs, "doc_id", col("source"), col("n_tok"),
        budgets, "mix1")
    }),

    // THE data-recipe flagship (VERDICT r14 #6): the three selection
    // tiers composed as ONE lazy plan, no driver loop — q29's
    // temperature mixture apportions a 2000-token global budget into
    // per-source token budgets (largest-remainder, so they sum exactly);
    // q152's admission admits each source's md5-ordered docs until its
    // budget fills; q150's curriculum assigns dense training positions
    // (length bucket short→long, salted shuffle, id tiebreak) over the
    // admitted mix — source/n_tok CARRIED through the rank windows so
    // the ordered mix needs no join back onto its own subtree. The
    // oracle replays all three tiers as chained CTEs with the literal
    // global-sort forms. Production materializes between tiers (the W4
    // handoff) — the in-plan tier re-references are priced by the
    // PlanLint scan budget.
    "q159_data_recipe" -> ((s, dir) => Q.ordered {
      val docs = Q.t(s, dir, "documents").select(
        col("doc_id"), col("source"),
        size(filter(split(col("text"), " "), t => t =!= ""))
          .cast("long").as("n_tok"))
      val budgets = Sampling.mixtureWeights(
          docs, col("source"), col("n_tok"), budget = 2000L)
        .select(col("source"), col("target_rows").as("budget"))
      val admitted = Sampling.tokenBudget(
        docs, "doc_id", col("source"), col("n_tok"), budgets, "rcp1")
      Sampling.trainingOrder(
        admitted.withColumn("b",
          least(floor(col("n_tok") / lit(10)), lit(9)).cast("long")),
        "doc_id", col("b"), "ord1", carry = Seq("source", "n_tok"))
    }),

    // cluster-balanced selection (the SemDeDup/DiverseEvol family's
    // selection half): nearest-seed assignment over the embedding space
    // (q23's exact-integer packed argmin, k=4 fixed low-id seeds), join
    // the documents table for a quality signal, keep the best 50 docs
    // PER CLUSTER by (n_chars DESC, doc_id ASC) — coverage balanced by
    // embedding-space REGION where q29 balances by source label, so
    // sparse regions contribute their best docs at full weight instead
    // of drowning under a dominant mode. The rank<=50 cut is a
    // WindowGroupLimit: map tasks pre-cut to their local top-50 per
    // cluster BEFORE the k-partition window exchange.
    "q161_cluster_balanced" -> ((s, dir) => Q.ordered(
      Sampling.clusterBalanced(
        Q.wide(Q.t(s, dir, "embeddings")), "vec_id", "embedding", k = 4,
        Q.t(s, dir, "documents"), "doc_id", col("n_chars"),
        perCluster = 50, carry = Seq("source")))),
  )

  override val oracleSql: Map[String, String] = Map(
    "q75_hash_sample" ->
      s"""SELECT doc_id, lang FROM documents
          WHERE $bucketSql < 10 ORDER BY ALL NULLS FIRST""",

    "q76_train_split" ->
      s"""SELECT doc_id,
                 CASE WHEN $bucketSql < 80 THEN 'train'
                      WHEN $bucketSql < 90 THEN 'val'
                      ELSE 'test' END AS split
          FROM documents ORDER BY ALL NULLS FIRST""",

    // largest-remainder apportionment (Hamilton): floor each exact
    // share, hand the leftover rows to the largest fractional parts so
    // Σ target_rows == budget exactly — same math as the Spark side.
    "q29_mixture_weights" ->
      """WITH s AS (SELECT source, count(*) AS n_docs,
                           CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS n_tok
                    FROM documents GROUP BY 1),
         w AS (SELECT *, CAST(round(sqrt(CAST(n_tok AS DOUBLE)), 6) AS DECIMAL(18,6)) AS w FROM s),
         t AS (SELECT CAST(sum(w) AS DECIMAL(28,6)) AS tw FROM w),
         e AS (SELECT source, n_docs, n_tok,
                      round(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE), 6) AS weight,
                      1000000 * (CAST(w AS DOUBLE) / CAST(tw AS DOUBLE)) AS ex
               FROM w CROSS JOIN t),
         b AS (SELECT *, CAST(floor(ex) AS BIGINT) AS base FROM e),
         l AS (SELECT CAST(1000000 - sum(base) AS BIGINT) AS leftover FROM b),
         r AS (SELECT *, row_number() OVER (ORDER BY ex - base DESC, source ASC) AS rk FROM b)
         SELECT source, n_docs, n_tok, weight,
                CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS target_rows
         FROM r CROSS JOIN l ORDER BY ALL NULLS FIRST""",

    // the same A-Res key: u shifted to (0,1) strictly, ln-form to avoid
    // cross-engine pow(); exact ties break by doc_id
    "q104_weighted_sample" ->
      """SELECT doc_id, n_chars FROM (
           SELECT doc_id, n_chars,
                  ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) + 0.5) / 4294967296.0)
                    / CAST(n_chars AS DOUBLE) AS es
           FROM documents
           ORDER BY es DESC, doc_id ASC LIMIT 100)
         ORDER BY ALL NULLS FIRST""",

    // DSIR: add-1-smoothed hashed-n-gram LM log ratio, target vs raw.
    // Per-bucket round(ln,8) differences, DECIMAL-summed per doc (q97
    // technique); the Spark side's broadcast-threshold top-k cut equals
    // this row_number form exactly (doc_id makes the order total).
    "q111_dsir_weights" ->
      """WITH d AS (SELECT doc_id, lang,
                           list_filter(str_split(text, ' '), t -> t <> '') AS toks
                    FROM documents),
         f AS (SELECT doc_id, lang,
                      unnest(toks || list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i + 1])) AS feat
               FROM d),
         b AS (SELECT doc_id, (lang = 'en') AS t,
                      CAST('0x' || substr(md5(feat), 1, 8) AS BIGINT) % 4096 AS bucket
               FROM f),
         c AS (SELECT bucket,
                      CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
                      CAST(count(*) AS BIGINT) AS cr
               FROM b GROUP BY 1),
         c2 AS (SELECT *, sum(ct) OVER () AS nt, sum(cr) OVER () AS nr FROM c),
         r AS (SELECT bucket,
                      CAST(round(ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + 4096 AS DOUBLE)), 8)
                         - round(ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + 4096 AS DOUBLE)), 8)
                           AS DECIMAL(18,8)) AS lr
               FROM c2),
         s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
                      CAST(sum(lr) AS DECIMAL(28,8)) AS lrs
               FROM b JOIN r USING (bucket) GROUP BY 1),
         t2 AS (SELECT doc_id, n_feats,
                       CAST(lrs AS DOUBLE) / n_feats
                         + CAST(0.0 AS DOUBLE) AS logratio
                FROM s)
         SELECT doc_id, n_feats, logratio,
                row_number() OVER (ORDER BY logratio DESC, doc_id ASC) <= 100 AS selected
         FROM t2 ORDER BY ALL NULLS FIRST""",

    "q77_stratified_sample" ->
      """SELECT lang, doc_id FROM (
           SELECT lang, doc_id,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY md5(CAST(doc_id AS VARCHAR)) NULLS FIRST,
                                              doc_id NULLS FIRST) AS rn
           FROM documents) WHERE rn <= 3
         ORDER BY ALL NULLS FIRST""",

    // the literal global-sort form of the position assignment the Spark
    // side computes via distributed rank + offsets — same declared order
    // key (bucket, epoch-salted md5, id), a genuinely different plan
    "q150_training_order" ->
      """SELECT doc_id, bucket,
                CAST(row_number() OVER (ORDER BY bucket, h, doc_id)
                     AS BIGINT) AS pos
         FROM (SELECT doc_id,
                      least(len(str_split(text, ' ')) // 10, 9) AS bucket,
                      md5('ep1_' || CAST(doc_id AS VARCHAR)) AS h
               FROM documents)
         ORDER BY ALL NULLS FIRST""",

    // the literal per-source running-sum admission the engine computes
    // via cell offsets + within-cell windows (see the Spark-side comment)
    "q152_token_budget" ->
      """WITH d AS (SELECT doc_id, source,
                           CAST(len(list_filter(str_split(text, ' '),
                                t -> t <> '')) AS BIGINT) AS n_tok,
                           md5('mix1_' || CAST(doc_id AS VARCHAR)) AS h
                    FROM documents),
         b AS (SELECT DISTINCT source,
                      300 + 200 * (CAST(regexp_extract(source, '([0-9]+)$')
                                        AS BIGINT) % 4)
                        AS budget
               FROM documents),
         r AS (SELECT doc_id, source, n_tok,
                      CAST(sum(n_tok) OVER (PARTITION BY source
                             ORDER BY h, doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tok
                           AS BIGINT) AS tok_before
               FROM d)
         SELECT doc_id, source, n_tok, tok_before
         FROM r JOIN b USING (source)
         WHERE tok_before < budget
         ORDER BY ALL NULLS FIRST""",

    // the three tiers replayed as chained CTEs: the q29 apportionment
    // (budget 2000), the q152 literal running-sum admission (salt
    // rcp1), the q150 literal global-sort curriculum (salt ord1) over
    // the admitted mix
    "q159_data_recipe" ->
      """WITH d AS (SELECT doc_id, source,
                           CAST(len(list_filter(str_split(text, ' '),
                                t -> t <> '')) AS BIGINT) AS n_tok,
                           md5('rcp1_' || CAST(doc_id AS VARCHAR)) AS h
                    FROM documents),
         s AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_tok
               FROM d GROUP BY 1),
         w AS (SELECT *, CAST(round(sqrt(CAST(src_tok AS DOUBLE)), 6)
                              AS DECIMAL(18,6)) AS w
               FROM s),
         t AS (SELECT CAST(sum(w) AS DECIMAL(28,6)) AS tw FROM w),
         e AS (SELECT source,
                      2000 * (CAST(w AS DOUBLE) / CAST(tw AS DOUBLE)) AS ex
               FROM w CROSS JOIN t),
         b0 AS (SELECT *, CAST(floor(ex) AS BIGINT) AS base FROM e),
         l AS (SELECT CAST(2000 - sum(base) AS BIGINT) AS leftover FROM b0),
         rb AS (SELECT *, row_number() OVER (ORDER BY ex - base DESC,
                                             source ASC) AS rk
                FROM b0),
         b AS (SELECT source,
                      CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                           AS BIGINT) AS budget
               FROM rb CROSS JOIN l),
         r AS (SELECT doc_id, source, n_tok,
                      CAST(sum(n_tok) OVER (PARTITION BY source
                             ORDER BY h, doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tok
                           AS BIGINT) AS tok_before
               FROM d),
         adm AS (SELECT r.doc_id, r.source, r.n_tok
                 FROM r JOIN b USING (source)
                 WHERE tok_before < budget),
         f AS (SELECT doc_id, source, n_tok,
                      least(n_tok // 10, 9) AS bucket,
                      md5('ord1_' || CAST(doc_id AS VARCHAR)) AS h2
               FROM adm)
         SELECT doc_id, source, n_tok, CAST(bucket AS BIGINT) AS bucket,
                CAST(row_number() OVER (ORDER BY bucket, h2, doc_id)
                     AS BIGINT) AS pos
         FROM f ORDER BY ALL NULLS FIRST""",

    // the q23 packed-argmin CTE chain, then per-cluster quality top-k
    "q161_cluster_balanced" ->
      """WITH q AS (SELECT vec_id,
                           list_transform(embedding,
                             x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
                    FROM embeddings),
            seeds AS (SELECT vec_id AS c, qv AS qc FROM q WHERE vec_id < 4),
            ql AS (SELECT vec_id, unnest(qv) AS x,
                          generate_subscripts(qv, 1) AS i FROM q),
            sl AS (SELECT c, unnest(qc) AS y,
                          generate_subscripts(qc, 1) AS i FROM seeds),
            dd AS (SELECT ql.vec_id, sl.c,
                          CAST(sum((ql.x - sl.y) * (ql.x - sl.y)) AS BIGINT) AS dist
                   FROM ql JOIN sl ON ql.i = sl.i GROUP BY 1, 2),
            a AS (SELECT vec_id, CAST(min(dist * 8 + c) % 8 AS BIGINT) AS cluster
                  FROM dd GROUP BY 1),
            j AS (SELECT a.cluster, d.doc_id,
                         CAST(d.n_chars AS BIGINT) AS quality, d.source
                  FROM a JOIN documents d ON d.doc_id = a.vec_id),
            r AS (SELECT *, CAST(row_number() OVER (PARTITION BY cluster
                           ORDER BY quality DESC, doc_id ASC) AS BIGINT) AS rank
                  FROM j)
         SELECT cluster, doc_id, quality, rank, source FROM r
         WHERE rank <= 50 ORDER BY ALL NULLS FIRST""",
  )
}
