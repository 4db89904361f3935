package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Enrich, RangeJoin, Skew, Upsert}

/** Join / union / set-op / dedup queries — SURVEY §2.4 (J3/J4), §2.1
  * (S2/S3), §2.7 (W2) and §2.8 G4/G5/G8.
  *
  * Scale notes: only provably bounded dims (nation: 25 rows at any SF)
  * force a broadcast; growing dims (customer) are left to AQE so the plan
  * survives a 100× corpus. The band join is the bucketized equi-join form
  * (RangeJoin) — no BroadcastNestedLoop. Set ops and dedup shuffle once on
  * their keys.
  */
object JoinPack extends QueryPack {

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J3: union-merge of two disjointly-filtered branches.
    "q10_union" -> ((s, dir) => Q.ordered {
      val o = Q.t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
      o.filter(col("o_orderstatus") === "F").withColumn("branch", lit("final"))
        .unionByName(
          o.filter(col("o_orderpriority") === "1-URGENT").withColumn("branch", lit("urgent")))
    }),

    // W2: PK keep-first dedup with explicit deterministic tiebreaker
    // (asc_nulls_first spelled out — DuckDB defaults nulls LAST).
    "q18_upsert_keep_first" -> ((s, dir) => Q.ordered(
      Upsert.keepFirst(Q.t(s, dir, "events"),
        Seq("user_id", "event_type"),
        Seq(col("ts").asc_nulls_first, col("event_id").asc_nulls_first))
        .select(col("user_id"), col("event_type"), col("event_id"), col("value")))),

    // S2/J4: left-join enrichment, dimension broadcast.
    "q20_left_join_enrich" -> ((s, dir) => Q.ordered(
      Enrich.leftJoin(Q.t(s, dir, "orders"), Q.t(s, dir, "customer"),
        "o_custkey", "c_custkey")
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"), col("c_mktsegment")))),

    // S3: conditional fallback after a left join against a partial source.
    "q21_coalesce_enrich" -> ((s, dir) => Q.ordered {
      val partial = Q.t(s, dir, "customer").filter(col("c_custkey") % 3 === 0)
      Enrich.leftJoin(Q.t(s, dir, "orders"), partial, "o_custkey", "c_custkey")
        .select(col("o_orderkey"), col("o_custkey"),
          Enrich.coalesceEnrich(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
    }),

    // S3 as a whole-frame Pipeline stage (reference detail_parser.py:97-119):
    // empty collection + fallback URL → fill from the secondary source.
    // Four deterministic branches: nonempty passthrough (id%3!=0), empty
    // without key (id%3=0, id%2!=0), empty+key without a secondary match
    // (id%6=0, id%12!=0 → stays []), and filled (id%12=0). The key mixes
    // relative and http:// forms to exercise absolutize + force-https.
    "q87_fallback_source" -> ((s, dir) => Q.ordered {
      val docs = Q.t(s, dir, "documents")
      val primary = docs.select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, array().cast("array<string>"))
          .otherwise(array(col("lang"))).as("links"),
        when(col("doc_id") % 2 === 0,
          when(col("doc_id") % 4 === 0,
            concat(lit("http://portal.example/exp/"), col("doc_id").cast("string")))
            .otherwise(concat(lit("/exp/"), col("doc_id").cast("string"))))
          .as("exp_url"))
      val secondary = docs.filter(col("doc_id") % 12 === 0).select(
        concat(lit("https://portal.example/exp/"), col("doc_id").cast("string")).as("url"),
        array(concat(lit("https://portal.example/files/"),
          col("doc_id").cast("string"), lit(".pdf"))).as("links"))
      Q.jsonArrays(
        Enrich.fallbackCollection(primary, secondary, "links", "exp_url",
          "url", "links", "https://portal.example")
          .select(col("doc_id"), col("exp_url"), col("links")))
    }),

    // G4: 3-way join — nation is a bounded dim (25 rows at any SF) so its
    // broadcast is forced; customer grows with the corpus, AQE decides.
    "q33_join_3way" -> ((s, dir) => Q.ordered {
      val o = Q.t(s, dir, "orders")
      val c = Q.t(s, dir, "customer")
      val n = broadcast(Q.t(s, dir, "nation"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .select(col("o_orderkey"), col("c_name"), col("n_name"))
    }),

    // G4: semi join (EXISTS) — right side never materialized in output.
    "q34_semi" -> ((s, dir) => Q.ordered {
      val big = Q.t(s, dir, "orders").filter(col("o_totalprice") > 100000)
      Q.t(s, dir, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    // G4: anti join (NOT EXISTS) — the delta primitive in isolation.
    "q35_anti" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "customer")
        .join(Q.t(s, dir, "orders").filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name")))),

    // G5: band (theta) join — bucketized equi-join + refine (RangeJoin):
    // linear in match count, no BroadcastNestedLoop, survives both sides
    // growing with the corpus.
    "q36_range_join" -> ((s, dir) => Q.ordered {
      val probes = Q.t(s, dir, "orders").filter(col("o_orderkey") % 499 === 0)
        .select(col("o_orderkey"), (col("o_totalprice") / 1000.0).as("center"))
      RangeJoin.bandJoin(Q.t(s, dir, "events"), "value", probes, "center", 1.0)
        .select(col("o_orderkey"), col("event_id"), col("value"))
    }),

    // G5 extended: as-of join — each event enriched with the most recent
    // order at-or-before its timestamp per customer (merge-join form: one
    // shuffle+sort, no quadratic theta join). Oracle: DuckDB native ASOF.
    "q66_asof_join" -> ((s, dir) => Q.ordered {
      val orders = Upsert.keepFirst(
        Q.t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice")),
        Seq("o_custkey", "o_orderdate"), Seq(col("o_orderkey").asc_nulls_first))
      AsOf.asofJoin(
        Q.t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts")),
        "ts",
        orders.withColumnRenamed("o_custkey", "user_id"), "o_orderdate",
        Seq("user_id"), Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"), col("o_orderkey"), col("o_totalprice"))
    }),

    // G4 skew path: salted equi-join — result equals the plain join (the
    // salt is internal), but each hot key spreads over 8 reducers.
    "q82_salted_join" -> ((s, dir) => Q.ordered(
      Skew.saltedJoin(
        Q.t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        Q.t(s, dir, "customer").select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        Seq("o_custkey"), buckets = 8)
        .select(col("o_orderkey"), col("o_custkey"), col("c_mktsegment")))),

    // G8: UNION (distinct) — q10 is the ALL form; this is the set form.
    "q84_union_distinct" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "orders").filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("custkey"))
        .union(Q.t(s, dir, "customer").filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("custkey")))
        .distinct())),

    // G4: null-safe equality join (<=> / IS NOT DISTINCT FROM) — NULL keys
    // match NULL keys instead of vanishing, the semantic a dedup-by-
    // nullable-column needs.
    "q85_nullsafe_join" -> ((s, dir) => Q.ordered {
      val o = Q.t(s, dir, "orders").select(col("o_orderkey"),
        when(col("o_orderkey") % 10 === 0, lit(null)).otherwise(col("o_orderpriority"))
          .as("prio"))
      val ref = Q.t(s, dir, "orders")
        .select(when(col("o_orderkey") % 10 === 0, lit(null))
          .otherwise(col("o_orderpriority")).as("prio"))
        .distinct()
        .withColumn("prio_group", coalesce(col("prio"), lit("(none)")))
      o.join(ref, o("prio") <=> ref("prio"))
        .select(col("o_orderkey"), col("prio_group"))
    }),

    // G4/G8: correlated EXISTS + NOT EXISTS subqueries — Catalyst
    // rewrites them to a left-semi and a left-anti join on c_custkey
    // (verified via explain: no nested-loop, both sides shuffle-keyed).
    "q46_exists_subquery" -> ((s, dir) => Q.ordered {
      Q.t(s, dir, "customer").createOrReplaceTempView("customer_sq")
      Q.t(s, dir, "orders").createOrReplaceTempView("orders_sq")
      s.sql("""
        SELECT c_custkey, c_name FROM customer_sq c
        WHERE EXISTS (SELECT 1 FROM orders_sq o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM orders_sq o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      """)
    }),

    // G8: INTERSECT (distinct) on key sets.
    "q40_intersect" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "orders").select(col("o_custkey").as("custkey"))
        .intersect(Q.t(s, dir, "customer").filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("custkey"))))),

    // G8: EXCEPT (distinct) — keys never ordered.
    "q41_except" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey"))
        .except(Q.t(s, dir, "orders").filter(col("o_totalprice") > 300000)
          .select(col("o_custkey").as("custkey"))))),
  )

  override val oracleSql: Map[String, String] = Map(
    "q46_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
           AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
         ORDER BY ALL NULLS FIRST""",

    "q10_union" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority, 'final' AS branch
         FROM orders WHERE o_orderstatus = 'F'
         UNION ALL
         SELECT o_orderkey, o_orderstatus, o_orderpriority, 'urgent' AS branch
         FROM orders WHERE o_orderpriority = '1-URGENT'
         ORDER BY ALL NULLS FIRST""",

    "q18_upsert_keep_first" ->
      """SELECT user_id, event_type, event_id, value FROM events
         QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts NULLS FIRST, event_id NULLS FIRST) = 1
         ORDER BY ALL NULLS FIRST""",

    "q20_left_join_enrich" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey
         ORDER BY ALL NULLS FIRST""",

    "q21_coalesce_enrich" ->
      """SELECT o_orderkey, o_custkey,
                coalesce(nullif(trim(c_mktsegment), ''), 'UNKNOWN') AS segment
         FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 3 = 0) c
           ON o_custkey = c_custkey
         ORDER BY ALL NULLS FIRST""",

    "q87_fallback_source" ->
      """WITH base AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 3 = 0 THEN CAST([] AS VARCHAR[])
                       ELSE [lang] END AS links,
                  CASE WHEN doc_id % 2 = 0 THEN
                    CASE WHEN doc_id % 4 = 0
                         THEN 'http://portal.example/exp/' || CAST(doc_id AS VARCHAR)
                         ELSE '/exp/' || CAST(doc_id AS VARCHAR) END
                  END AS exp_url
           FROM documents),
         sec AS (
           SELECT 'https://portal.example/exp/' || CAST(doc_id AS VARCHAR) AS url,
                  ['https://portal.example/files/' || CAST(doc_id AS VARCHAR) || '.pdf'] AS fb
           FROM documents WHERE doc_id % 12 = 0),
         n AS (
           SELECT doc_id, links, exp_url,
                  CASE WHEN len(links) = 0 AND exp_url IS NOT NULL AND trim(exp_url) <> ''
                       THEN regexp_replace(
                         CASE WHEN trim(exp_url) LIKE 'http%' THEN trim(exp_url)
                              ELSE 'https://portal.example' || trim(exp_url) END,
                         '^http:', 'https:')
                  END AS nk
           FROM base)
         SELECT n.doc_id, n.exp_url,
                to_json(CASE WHEN n.nk IS NOT NULL THEN coalesce(s.fb, n.links)
                        ELSE n.links END)::VARCHAR AS links
         FROM n LEFT JOIN sec s ON n.nk = s.url
         ORDER BY ALL NULLS FIRST""",

    "q33_join_3way" ->
      """SELECT o_orderkey, c_name, n_name
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         ORDER BY ALL NULLS FIRST""",

    "q34_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 100000)
         ORDER BY ALL NULLS FIRST""",

    "q35_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 300000)
         ORDER BY ALL NULLS FIRST""",

    "q36_range_join" ->
      """SELECT o_orderkey, event_id, value
         FROM events
         JOIN (SELECT o_orderkey, o_totalprice / 1000.0 AS center
               FROM orders WHERE o_orderkey % 499 = 0) p
           ON value >= center - 1.0 AND value <= center + 1.0
         ORDER BY ALL NULLS FIRST""",

    "q82_salted_join" ->
      """SELECT o_orderkey, o_custkey, c_mktsegment
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY ALL NULLS FIRST""",

    "q66_asof_join" ->
      """WITH r AS (
           SELECT o_custkey AS user_id, o_orderdate, o_orderkey, o_totalprice
           FROM orders
           QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                      ORDER BY o_orderkey NULLS FIRST) = 1)
         SELECT e.event_id, e.user_id, r.o_orderkey, r.o_totalprice
         FROM events e
         ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
         ORDER BY ALL NULLS FIRST""",

    "q84_union_distinct" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
         UNION
         SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
         ORDER BY ALL NULLS FIRST""",

    "q85_nullsafe_join" ->
      """WITH o AS (SELECT o_orderkey,
                           CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderpriority END AS prio
                    FROM orders),
          ref AS (SELECT DISTINCT prio, coalesce(prio, '(none)') AS prio_group
                  FROM (SELECT CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderpriority END AS prio
                        FROM orders))
         SELECT o.o_orderkey, ref.prio_group
         FROM o JOIN ref ON o.prio IS NOT DISTINCT FROM ref.prio
         ORDER BY ALL NULLS FIRST""",

    "q40_intersect" ->
      """SELECT o_custkey AS custkey FROM orders
         INTERSECT
         SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
         ORDER BY ALL NULLS FIRST""",

    "q41_except" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
         EXCEPT
         SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
         ORDER BY ALL NULLS FIRST""",
  )
}
