package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Fingerprint

/** Aggregation / window / sort queries — SURVEY §2.8 G1–G3, G6, G7, G11 and
  * §2.7 W5 (head-sample, reference dags/scraping_etl.py:44).
  *
  * Float-parity rule (SURVEY §7.4.7): any `sum` over doubles is computed
  * over DECIMAL(28,10) casts and cast back to double — decimal addition is
  * exact, so Spark's partial/final aggregation order and DuckDB's cannot
  * diverge. Window orderings always carry a unique tiebreaker column and
  * explicit NULLS FIRST/LAST on both engines.
  *
  * Scale notes: groupBy aggregations plan partial (map-side) + final
  * HashAggregate — one shuffle on the group keys; rollup adds the grouping-
  * set expansion before the same shuffle. Windows shuffle once on the
  * partition key then sort within partitions. Top-k per group is the
  * window + filter form (no global sort); the global order+limit plans as
  * TakeOrderedAndProject (per-partition top-k, no full sort at scale).
  * Both group fingerprints (q45 modular hash sum, q69 XOR Aggregator) are
  * constant-memory per group — no registered plan holds a whole group in
  * an aggregation buffer (PlanLintSpec pins this).
  */
object AggPack extends QueryPack {

  private def dec(c: Column): Column = c.cast("decimal(28,10)")

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W5/G7: deterministic head-sample — ORDER BY with unique tiebreak + LIMIT.
    "q19_limit_topn" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_first)
        .limit(50)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")))),

    // G1: TPC-H Q1-shape hash aggregation (partial+final, filter pushed).
    "q30_group_agg" -> ((s, dir) => Q.ordered(
      Q.wide(Q.t(s, dir, "lineitem"))
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Q.sumExact(col("l_quantity")).as("sum_qty"),
          Q.sumExact(col("l_extendedprice")).as("sum_base_price"),
          Q.sumExact(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order")))),

    // G1/G6: per-group EXACT quantiles (the distribution summary every
    // monitoring rollup wants next to its means) at binary-exact
    // p-values — 0.25/0.5/0.75 are exact binary fractions and
    // l_quantity's domain is small integers, so the linear interpolation
    // is exact IEEE arithmetic in BOTH engines regardless of lerp
    // formula (a p like 0.95 would not be: p·(n−1) inexact → the
    // engines' different lerp orderings diverge by ulps). Scale note:
    // Spark's exact percentile buffers a per-group value→count map —
    // bounded by the VALUE DOMAIN (50 graded quantities here), not the
    // group size; for unbounded continuous domains reach for
    // approx_percentile instead (engine-specific sketch, the q63
    // rows-only stance).
    "q137_group_quantiles" -> ((s, dir) => Q.ordered {
      Q.t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").as("__q"))
        .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"),
          element_at(col("__q"), 1).as("p25"),
          element_at(col("__q"), 2).as("p50"),
          element_at(col("__q"), 3).as("p75"))
    }),

    // G2: exact distinct-count per group (approx_count_distinct is the
    // non-oracle scale variant — HLL sketch, no exact shuffle of values).
    "q31_count_distinct" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
             count(lit(1)).as("n_orders")))),

    // G2 scale variant: HLL approximate distinct — constant-size sketch
    // per group instead of shuffling distinct values; the 100 TB form of
    // q31. No DuckDB oracle (sketch internals are engine-specific):
    // driver rows-only check; exactness is q31's job.
    "q63_approx_distinct" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(approx_count_distinct(col("o_custkey"), rsd = 0.02).as("n_cust_approx"),
             count(lit(1)).as("n_orders")))),

    // G1/G9: exact interpolated percentiles per group (rounded before
    // compare — both engines use linear interpolation but may associate
    // the float blend differently).
    "q72_percentile" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(round(percentile(col("value"), lit(0.5)), 6).as("p50"),
             round(percentile(col("value"), lit(0.9)), 6).as("p90")))),

    // G3: rollup over two grouping axes (subtotals + grand total).
    "q32_rollup" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
             Q.sumExact(col("o_totalprice")).as("total")))),

    // G3: cube — all grouping-set combinations + grouping_id metadata.
    "q70_cube" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
             grouping_id().cast("long").as("gid")))),

    // G3 sibling: pivot with an explicit value list (no extra distinct
    // scan; deterministic column set). Missing combos coalesced to 0 to
    // match the FILTER-count oracle.
    "q73_pivot" -> ((s, dir) => Q.ordered {
      val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val pivoted = Q.t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", priorities)
        .agg(count(lit(1)))
      pivoted.select(col("o_orderstatus") +:
        priorities.map(p => coalesce(col(s"`$p`"), lit(0L)).as(p)): _*)
    }),

    // G3's reshape complement: UNPIVOT/melt — wide metric columns to the
    // long (key, metric, value) form every generic aggregator/plotter
    // consumes. Row-local (Generate in-plan, no shuffle, no join); the
    // 4× row fan-out is the operator's contract, not a plan accident.
    // NULL pin (ADVICE r12): Spark's unpivot RETAINS rows whose value is
    // NULL, DuckDB's UNPIVOT EXCLUDES them by default — the explicit
    // IS-NOT-NULL filter makes the Spark side match the oracle's
    // semantics instead of relying on these four lineitem metrics
    // happening to be non-null.
    "q126_unpivot" -> ((s, dir) => Q.ordered {
      Q.t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "value")
        .filter(col("value").isNotNull)
    }),

    // G6/G2: regular-grid densification + forward fill — resample events
    // to per-user hourly sums, explode each user's own [min,max] span to
    // a dense hour grid, left-join, forward-fill with last(ignoreNulls).
    // was_gap marks synthesized periods (3.2k of 3.5k grid rows at
    // sf0.01 — events are sparse per user).
    "q127_gap_fill" -> ((s, dir) => Q.ordered {
      graft.operators.TimeSeries.gapFill(
        Q.t(s, dir, "events").filter(col("user_id") < 5),
        col("user_id"), col("ts"), col("value"), "hour")
        .withColumnRenamed("key", "user_id")
        .withColumnRenamed("period", "h")
    }),

    // SQL entry point: the same engine through spark.sql over temp views —
    // a user can drive every operator from SQL text as well as the
    // DataFrame API.
    "q74_sql_api" -> ((s, dir) => Q.ordered {
      Q.t(s, dir, "orders").createOrReplaceTempView("orders_v")
      Q.t(s, dir, "customer").createOrReplaceTempView("customer_v")
      s.sql("""
        SELECT c.c_mktsegment, count(*) AS n,
               CAST(CAST(sum(CAST(o.o_totalprice AS DECIMAL(28,10))) AS DECIMAL(28,4)) AS DOUBLE) AS total
        FROM orders_v o JOIN customer_v c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus = 'O'
        GROUP BY c.c_mktsegment
      """)
    }),

    // G6: rank within group (rank, not row_number — tie-stable).
    "q37_window_rank" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc_nulls_last,
                   col("o_orderkey").asc_nulls_first)).as("rnk")))),

    // G6 completeness: the remaining ranking/navigation window family in
    // one pass — ntile quartiles, percent_rank, cume_dist, lag/lead —
    // all over ONE (custkey) window spec, so the plan shuffles once.
    // percent_rank/cume_dist are exact rational divisions ((r-1)/(n-1),
    // k/n) — bit-identical IEEE doubles on both engines, no rounding
    // needed (unlike sums, there is no association order to pin).
    "q128_window_suite" -> ((s, dir) => Q.ordered {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc_nulls_last,
          col("o_orderkey").asc_nulls_first)
      Q.t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"))
    }),

    // G6: running sum with an explicit frame (decimal-exact accumulation).
    "q38_window_running" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "events").select(
        col("user_id"), col("event_id"), col("value"),
        sum(dec(col("value"))).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts").asc_nulls_first, col("event_id").asc_nulls_first)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("decimal(28,4)").cast("double").as("running_value")))),

    // G6: time-RANGE window frame — rolling 1-hour per-user sum/count.
    // The frame is defined over epoch MICROseconds (exact integers on
    // both engines; second-granularity epoch truncates sub-second
    // timestamps differently across engines), so tie rows are peers in
    // both and the frame edges agree exactly.
    "q49_range_window" -> ((s, dir) => Q.ordered {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000L, Window.currentRow)
      Q.t(s, dir, "events").select(
        col("user_id"), col("event_id"),
        sum(dec(col("value"))).over(w)
          .cast("decimal(28,4)").cast("double").as("roll_sum"),
        count(lit(1)).over(w).as("roll_n"))
    }),

    // G7: top-k per group — window row_number + filter, no global sort.
    "q39_topk_per_group" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "orders")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice").desc_nulls_last,
                     col("o_orderkey").asc_nulls_first)))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn")))),

    // G6 composition: 3-stage sequential funnel (view → click →
    // purchase, each strictly after the previous AND within a 24 h
    // conversion window, per user). Three chained conditional-min
    // windows over the SAME user_id partition — ONE exchange, no
    // self-joins (at 100 TB the join formulation re-shuffles events
    // three times; this shuffles once), then a per-user collapse and a
    // stage histogram.
    "q101_funnel" -> ((s, dir) => Q.ordered(
      graft.operators.Funnel.stage(Q.t(s, dir, "events"),
          "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"), expr("INTERVAL 24 HOURS"))
        .groupBy(col("stage")).agg(count(lit(1)).as("n_users")))),

    // G6 composition: weekly cohort retention — cohort = the user's
    // first-event week, retention = distinct active users per (cohort,
    // week offset). Both aggregates key on user_id (AQE co-partitions
    // the join with the cohort agg's exchange); the offset division is
    // exact (both dates are week-truncated, datediff is a multiple of
    // 7), floor() pins identical semantics on both engines anyway.
    "q102_retention" -> ((s, dir) => Q.ordered {
      val ev = Q.t(s, dir, "events")
      val cohort = ev.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort"))
      val weekly = ev.select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk")).distinct()
      weekly.join(cohort, "user_id")
        .select(col("cohort"),
          floor(datediff(col("wk"), col("cohort")) / 7).cast("int")
            .as("week_offset"))
        .groupBy(col("cohort"), col("week_offset"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // G11 scale form: custom typed Aggregator — incremental XOR group
    // fingerprint, one-long buffer per group (vs q45's collect_list).
    "q69_xor_fingerprint" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "orders")
        .select(col("o_custkey"),
          graft.functions.XorFingerprint.rowHash60(
            Fingerprint.rowHash(Seq(col("o_orderkey"), col("o_orderstatus"),
              col("o_orderpriority")))).as("h60"))
        .groupBy(col("o_custkey"))
        .agg(graft.functions.XorFingerprint.agg(col("h60")).as("xor_hash"),
             count(lit(1)).as("n")))),

    // G11: order-insensitive MULTISET group fingerprint — the reference's
    // checksum kernel (H1) lifted to aggregate form (SURVEY §2.8 G11).
    // Constant-memory scale form (VERDICT r7 #5): the exact DECIMAL sum
    // of 60-bit row hashes, reduced mod 2^60 back to BIGINT, replaces
    // the old sort_array(collect_list(...)) — the sum is commutative/
    // associative (map-side partials compose), its buffer is one decimal
    // regardless of group size, and unlike q69's XOR it does NOT cancel
    // duplicate rows pairwise (a+a ≠ 0 mod 2^60), so multiset identity
    // is preserved up to hash/modular collision.
    "q45_udaf_checksum_agg" -> ((s, dir) => Q.ordered(
      Q.wide(Q.t(s, dir, "orders"))
        .select(col("o_custkey"),
          graft.functions.XorFingerprint.rowHash60(
            Fingerprint.rowHash(Seq(col("o_orderkey"), col("o_orderstatus"),
              col("o_orderpriority")))).as("h60"))
        .groupBy(col("o_custkey"))
        .agg(pmod(sum(col("h60").cast("decimal(38,0)")),
            lit(1152921504606846976L)).cast("long").as("group_hash"),
          count(lit(1)).as("n")))),

    // Dataset profiling — the per-column stats card (rows/nulls/distinct/
    // lexicographic min-max/mean length) every curation stage prints.
    // One corpus scan: map-side melt to (col_name, v), value-counts
    // first (partial agg collapses repeats — the second exchange carries
    // one row per DISTINCT value), then per-column rollup. `lang_nn`
    // nulls out the majority language to exercise the null/empty-column
    // paths the raw fixture lacks.
    "q154_profile" -> ((s, dir) => Q.ordered {
      import graft.operators.Profile
      Profile.profile(
        Q.t(s, dir, "documents").select(
          col("doc_id"), col("lang"), col("source"), col("n_chars"),
          when(col("lang") === "en", lit(null).cast("string"))
            .otherwise(col("lang")).as("lang_nn")),
        Seq("doc_id", "lang", "source", "n_chars", "lang_nn"))
    }),
  )

  private val rowHashSql =
    Fingerprint.sqlExpr(Seq("o_orderkey", "o_orderstatus", "o_orderpriority"))

  override val oracleSql: Map[String, String] = Map(
    "q126_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, value
         FROM (SELECT l_orderkey, l_linenumber, l_quantity,
                      l_extendedprice, l_discount, l_tax FROM lineitem) t
         UNPIVOT (value FOR metric IN
           (l_quantity, l_extendedprice, l_discount, l_tax))
         ORDER BY ALL NULLS FIRST""",

    "q127_gap_fill" ->
      s"""WITH e AS (SELECT user_id, date_trunc('hour', ts) AS h, value
                     FROM events WHERE user_id < 5),
          agg AS (SELECT user_id, h, ${Q.sumExactSql("value")} AS v
                  FROM e GROUP BY 1, 2),
          span AS (SELECT user_id, min(h) AS h0, max(h) AS h1
                   FROM e GROUP BY 1),
          grid AS (SELECT user_id,
                          unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
                   FROM span),
          j AS (SELECT g.user_id, g.h, a.v, CAST(a.v IS NULL AS INT) AS was_gap
                FROM grid g LEFT JOIN agg a USING (user_id, h))
          SELECT user_id, h,
                 last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
                   ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS value_ff,
                 was_gap
          FROM j
          ORDER BY ALL NULLS FIRST""",

    // sequential-dependency oracle in its natural SQL form: three
    // chained conditional-min CTEs (the join formulation the Spark side
    // deliberately avoids), then the same stage histogram
    "q101_funnel" ->
      """WITH t1 AS (SELECT user_id, min(ts) AS ts1 FROM events
                     WHERE event_type = 'view' GROUP BY 1),
              t2 AS (SELECT e.user_id, min(e.ts) AS ts2 FROM events e
                     JOIN t1 ON e.user_id = t1.user_id
                     WHERE e.event_type = 'click' AND e.ts > t1.ts1
                       AND e.ts <= t1.ts1 + INTERVAL 24 HOURS GROUP BY 1),
              t3 AS (SELECT e.user_id, min(e.ts) AS ts3 FROM events e
                     JOIN t2 ON e.user_id = t2.user_id
                     WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
                       AND e.ts <= t2.ts2 + INTERVAL 24 HOURS GROUP BY 1),
              u AS (SELECT DISTINCT user_id FROM events)
         SELECT CASE WHEN ts3 IS NOT NULL THEN 3
                     WHEN ts2 IS NOT NULL THEN 2
                     WHEN ts1 IS NOT NULL THEN 1
                     ELSE 0 END AS stage,
                CAST(count(*) AS BIGINT) AS n_users
         FROM u LEFT JOIN t1 USING (user_id)
                LEFT JOIN t2 USING (user_id)
                LEFT JOIN t3 USING (user_id)
         GROUP BY 1 ORDER BY ALL NULLS FIRST""",

    "q102_retention" ->
      """WITH cohort AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
                         FROM events GROUP BY 1),
              weekly AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
                         FROM events)
         SELECT cohort,
                CAST(floor(date_diff('day', cohort, wk) / 7) AS INT) AS week_offset,
                CAST(count(*) AS BIGINT) AS n_users
         FROM weekly JOIN cohort USING (user_id)
         GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""",

    "q49_range_window" ->
      """SELECT user_id, event_id,
                CAST(CAST(sum(CAST(value AS DECIMAL(28,10))) OVER (
                  PARTITION BY user_id ORDER BY epoch_us(ts)
                  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DECIMAL(28,4)) AS DOUBLE) AS roll_sum,
                count(*) OVER (
                  PARTITION BY user_id ORDER BY epoch_us(ts)
                  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS roll_n
         FROM events ORDER BY ALL NULLS FIRST""",

    "q19_limit_topn" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_custkey, o_totalprice FROM orders
           ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST
           LIMIT 50)
         ORDER BY ALL NULLS FIRST""",

    "q30_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DECIMAL(28,4)) AS DOUBLE) AS sum_qty,
                CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS DECIMAL(28,4)) AS DOUBLE) AS sum_base_price,
                CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DECIMAL(28,4)) AS DOUBLE) AS sum_disc_price,
                count(*) AS count_order,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DECIMAL(28,4)) AS DOUBLE) / count(*) AS avg_qty
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY ALL NULLS FIRST""",

    "q31_count_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
         FROM orders GROUP BY o_orderstatus ORDER BY ALL NULLS FIRST""",

    // binary-exact p-values over a small-integer domain: the linear
    // interpolation is exact in both engines (see the Spark-side note)
    "q137_group_quantiles" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n_rows,
                quantile_cont(l_quantity, 0.25) AS p25,
                quantile_cont(l_quantity, 0.5) AS p50,
                quantile_cont(l_quantity, 0.75) AS p75
         FROM lineitem GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""",

    "q32_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(28,10))) AS DECIMAL(28,4)) AS DOUBLE) AS total
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         ORDER BY ALL NULLS FIRST""",

    "q70_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY ALL NULLS FIRST""",

    "q73_pivot" ->
      """SELECT o_orderstatus,
                count(*) FILTER (o_orderpriority = '1-URGENT') AS "1-URGENT",
                count(*) FILTER (o_orderpriority = '2-HIGH') AS "2-HIGH",
                count(*) FILTER (o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
                count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
                count(*) FILTER (o_orderpriority = '5-LOW') AS "5-LOW"
         FROM orders GROUP BY o_orderstatus ORDER BY ALL NULLS FIRST""",

    "q74_sql_api" ->
      """SELECT c.c_mktsegment, count(*) AS n,
                CAST(CAST(sum(CAST(o.o_totalprice AS DECIMAL(28,10))) AS DECIMAL(28,4)) AS DOUBLE) AS total
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         WHERE o.o_orderstatus = 'O'
         GROUP BY c.c_mktsegment ORDER BY ALL NULLS FIRST""",

    "q72_percentile" ->
      """SELECT event_type,
                round(quantile_cont(value, 0.5), 6) AS p50,
                round(quantile_cont(value, 0.9), 6) AS p90
         FROM events GROUP BY event_type ORDER BY ALL NULLS FIRST""",

    "q37_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                rank() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC NULLS LAST,
                                      o_orderkey ASC NULLS FIRST) AS rnk
         FROM orders ORDER BY ALL NULLS FIRST""",

    "q128_window_suite" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                CAST(ntile(4) OVER w AS INT) AS quartile,
                percent_rank() OVER w AS pct_rank,
                cume_dist() OVER w AS cume,
                lag(o_totalprice, 1) OVER w AS prev_price,
                lead(o_totalprice, 1) OVER w AS next_price
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC NULLS LAST,
                               o_orderkey ASC NULLS FIRST)
         ORDER BY ALL NULLS FIRST""",

    "q38_window_running" ->
      """SELECT user_id, event_id, value,
                CAST(CAST(sum(CAST(value AS DECIMAL(28,10))) OVER (
                  PARTITION BY user_id
                  ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(28,4)) AS DOUBLE)
                  AS running_value
         FROM events ORDER BY ALL NULLS FIRST""",

    "q39_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC NULLS LAST,
                                              o_orderkey ASC NULLS FIRST) AS rn
           FROM orders) WHERE rn <= 3
         ORDER BY ALL NULLS FIRST""",

    "q69_xor_fingerprint" ->
      s"""SELECT o_custkey,
                 bit_xor(CAST('0x' || substr(md5($rowHashSql), 1, 15) AS BIGINT)) AS xor_hash,
                 count(*) AS n
          FROM orders GROUP BY o_custkey ORDER BY ALL NULLS FIRST""",

    // DuckDB sums BIGINT into HUGEINT (exact); % 2^60 brings it back to
    // BIGINT range, matching Spark's pmod-of-decimal-sum bit for bit.
    "q45_udaf_checksum_agg" ->
      s"""SELECT o_custkey,
                 CAST(sum(h) % 1152921504606846976 AS BIGINT) AS group_hash,
                 count(*) AS n
          FROM (SELECT o_custkey,
                       CAST('0x' || substr(md5($rowHashSql), 1, 15) AS BIGINT) AS h
                FROM orders)
          GROUP BY o_custkey ORDER BY ALL NULLS FIRST""",

    // the literal per-column aggregate over the same string casts; the
    // engine's two-step (value counts → rollup) must agree with the
    // direct count(DISTINCT)/min/max/avg formulation. Integer-length
    // sums are exact, so the DECIMAL→DOUBLE avg_len chain is 1-ulp safe.
    "q154_profile" ->
      """WITH src AS (SELECT doc_id, lang, source, n_chars,
                             CASE WHEN lang = 'en' THEN NULL ELSE lang END
                               AS lang_nn
                      FROM documents),
         m AS (SELECT 'doc_id' AS col_name, CAST(doc_id AS VARCHAR) AS v FROM src
               UNION ALL SELECT 'lang', lang FROM src
               UNION ALL SELECT 'source', source FROM src
               UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM src
               UNION ALL SELECT 'lang_nn', lang_nn FROM src)
         SELECT col_name, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(count(*) - count(v) AS BIGINT) AS n_null,
                CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
                min(v) AS min_v, max(v) AS max_v,
                round(CAST(CAST(sum(len(v)) AS DECIMAL(28,6)) AS DOUBLE)
                      / count(v), 4) AS avg_len
         FROM m GROUP BY col_name
         ORDER BY ALL NULLS FIRST""",
  )
}
