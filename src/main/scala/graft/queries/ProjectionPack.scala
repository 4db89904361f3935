package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Cleaning, Projection}

/** Projection / extraction / cleaning queries — SURVEY §2.2 (P1–P11) and
  * §2.5 (C1–C7). All pure row-local expressions: filters and projections
  * push down to the parquet scan; no shuffles besides the final
  * deterministic ORDER BY (verification-only — not part of the operator).
  */
object ProjectionPack extends QueryPack {

  override val queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    // S1: full scan + projection (column pruning reaches the scan).
    "q01_scan_project" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_extendedprice"), col("l_returnflag")))),

    // S6: keyed point-lookup scan (isin → In pushdown to parquet).
    "q02_filter_isin" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "orders")
        .filter(col("o_custkey").isin(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L, 55L, 89L))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority")))),

    // P1 + C3: positional projection with trim and rename.
    "q03_project_trim" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "customer").select(
        col("c_custkey"),
        Projection.cell(col("c_name"), "name"),
        col("c_mktsegment").as("segment")))),

    // P2/P3: malformed-row + header-row compound predicate filter.
    "q04_filter_pred" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "part")
        .filter(col("p_name").isNotNull && trim(col("p_name")) =!= "" &&
          lower(col("p_name")) =!= "p_name" &&
          col("p_size") > 10 && col("p_type") =!= "PROMO")
        .select(col("p_partkey"), col("p_name"), col("p_size"), col("p_type")))),

    // P4: first array element passing an exclusion predicate.
    "q05_array_first_match" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "documents").select(
        col("doc_id"),
        Projection.firstMatch(split(col("text"), " "),
          t => length(t) >= 5 && !t.endsWith("e")).as("first_tok")))),

    // P5/P10: regex capture with fallback chain ('' capture = miss).
    "q06_regexp_extract" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "documents").select(
        col("doc_id"),
        Projection.extractWithFallback(col("text"), "the ([a-z]+)", 1,
          col("lang")).as("extracted")))),

    // P7: multi-valued extraction → explode → distinct.
    "q07_explode_distinct" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .distinct())),

    // P8 + P9: indexed findall and block-anchored regex.
    "q08_regexp_extract_all" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "documents").select(
        col("doc_id"),
        Projection.indexedFindAll(col("text"), "([a-z]{5,})", 1, 2).as("third_long"),
        Projection.blockAfter(col("text"), "data", "([a-z]{4,})", 1).as("after_data")))),

    // C1/C2: require-nonblank-key filter after trim (key derived so the
    // filter actually discriminates: all-zero customer 0 strips to '').
    "q11_notblank" -> ((s, dir) => Q.ordered(
      Cleaning.requireNonBlank(
        Q.t(s, dir, "customer")
          .select(col("c_custkey"),
            regexp_replace(col("c_name"), "^Customer#0*", "").as("biz_key")),
        "biz_key"))),

    // C4: ''-after-trim → NULL normalization.
    "q12_nullif_norm" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "orders").select(
        col("o_orderkey"),
        Cleaning.emptyToNull(regexp_extract(col("o_orderpriority"), "NOT ([A-Z]+)", 1))
          .as("not_kind")))),

    // C6: multi-format date parse + date arithmetic.
    "q13_to_date" -> ((s, dir) => Q.ordered(
      Q.wide(Q.t(s, dir, "lineitem")).select(
        col("l_orderkey"), col("l_linenumber"),
        Cleaning.parseDate(date_format(col("l_shipdate"), "dd/MM/yyyy"),
          Seq("yyyy-MM-dd", "dd/MM/yyyy")).as("ship_date"))
        .withColumn("ship_plus30", date_add(col("ship_date"), 30))
        .withColumn("age_days",
          datediff(to_date(lit("1998-12-01")), col("ship_date")).cast("long")))),

    // C7: URL absolutize (relative → base-joined, absolute passthrough) +
    // force-https + host extraction.
    "q14_url_norm" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "documents").select(
        col("doc_id"),
        Cleaning.forceHttps(
          concat(lit("http://"), col("source"), lit(".example.com/"),
            col("doc_id").cast("string"))).as("url"),
        Cleaning.absolutize("https://base.example.com",
          when(col("doc_id") % 2 === 0,
            concat(lit("/files/"), col("doc_id").cast("string")))
            .otherwise(concat(lit("http://other.example.com/"),
              col("doc_id").cast("string")))).as("abs_url"))
        .withColumn("host", regexp_extract(col("url"), "https://([^/]+)/", 1)))),

    // P-family JSON tier: typed parsing of a JSON API payload —
    // `from_json` with an explicit schema extracts nested scalars and
    // array elements, and MALFORMED payloads degrade to NULL fields
    // (valid=0) instead of failing the task: the tolerance contract the
    // reference's JSON consumers live by (src/classifier.py:97-105
    // try/except json.loads → {}; src/scrapers/scraper.py:52-56 builds
    // its checksums from JSON dumps of item dicts). Payloads are
    // synthesized with identical string concatenation on both sides
    // (the q83 pattern) with a deterministic truncated-corruption slice;
    // the oracle parses with DuckDB's json_extract family behind a
    // json_valid guard. Row-local, map-only — shuffle budget 0.
    "q139_json_payload" -> ((s, dir) => Q.ordered {
      val payload = concat(
        lit("{\"id\": "), col("doc_id"),
        lit(", \"meta\": {\"lang\": \""), col("lang"),
        lit("\", \"n\": "), col("n_chars"),
        lit("}, \"tags\": [\"t"), col("doc_id") % 3,
        lit("\", \"t"), col("doc_id") % 5, lit("\"]}"))
      val j = from_json(col("payload"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "id BIGINT, meta STRUCT<lang: STRING, n: BIGINT>, " +
            "tags ARRAY<STRING>"))
      Q.t(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 17 === 0, substring(payload, 1, 20))
            .otherwise(payload).as("payload"))
        .select(col("doc_id"), j.as("j"))
        .select(col("doc_id"),
          col("j.id").as("json_id"),
          col("j.meta.lang").as("json_lang"),
          col("j.meta.n").as("json_n"),
          element_at(col("j.tags"), 1).as("tag0"),
          element_at(col("j.tags"), 2).as("tag1"),
          col("j.id").isNotNull.cast("int").as("valid"))
    }),

    // C1/C7 edit-distance tier: fuzzy canonical-key recovery — scraped
    // part names arrive with deterministic character damage (dropped /
    // doubled / substituted letter by partkey residue, the q113
    // synthesized-mess pattern — INCLUDING position-1 damage: residues
    // 3/4 drop or substitute the FIRST character, which r13's
    // first-char-only blocking could never recover; VERDICT r13 #5) and
    // are resolved against the bounded canonical name dictionary by
    // blocked levenshtein (first-char ∪ last-char + length-band
    // blocking, exact verify, deterministic (dist, name) min). Both
    // engines share the same unit-cost levenshtein, so the recovered
    // keys and distances hash-match exactly.
    "q138_fuzzy_match" -> ((s, dir) => Q.ordered {
      val parts = Q.t(s, dir, "part")
      val n = col("p_name")
      val scraped = when(col("p_partkey") % 5 === 0,
          concat(substring(n, 1, 2), substring(n, 4, 1000)))
        .when(col("p_partkey") % 5 === 1,
          concat(substring(n, 1, 4), substring(n, 4, 1000)))
        .when(col("p_partkey") % 5 === 2,
          concat(substring(n, 1, 1), lit("x"), substring(n, 3, 1000)))
        .when(col("p_partkey") % 5 === 3, substring(n, 2, 1000))
        .otherwise(concat(lit("x"), substring(n, 2, 1000)))
      Cleaning.fuzzyMatch(
        parts.select(col("p_partkey"), scraped.as("s")),
        "p_partkey", col("s"), parts, "p_name", maxDist = 2)
    }),
  )

  override val oracleSql: Map[String, String] = Map(
    "q01_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice, l_returnflag
         FROM lineitem ORDER BY ALL NULLS FIRST""",

    "q02_filter_isin" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
         WHERE o_custkey IN (1,2,3,5,8,13,21,34,55,89) ORDER BY ALL NULLS FIRST""",

    "q03_project_trim" ->
      """SELECT c_custkey, trim(c_name) AS name, c_mktsegment AS segment
         FROM customer ORDER BY ALL NULLS FIRST""",

    "q04_filter_pred" ->
      """SELECT p_partkey, p_name, p_size, p_type FROM part
         WHERE p_name IS NOT NULL AND trim(p_name) <> '' AND lower(p_name) <> 'p_name'
           AND p_size > 10 AND p_type <> 'PROMO' ORDER BY ALL NULLS FIRST""",

    "q05_array_first_match" ->
      """SELECT doc_id,
                list_filter(str_split(text, ' '),
                            t -> len(t) >= 5 AND NOT ends_with(t, 'e'))[1] AS first_tok
         FROM documents ORDER BY ALL NULLS FIRST""",

    "q06_regexp_extract" ->
      """SELECT doc_id,
                coalesce(nullif(regexp_extract(text, 'the ([a-z]+)', 1), ''), lang) AS extracted
         FROM documents ORDER BY ALL NULLS FIRST""",

    "q07_explode_distinct" ->
      """SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS token
         FROM documents ORDER BY ALL NULLS FIRST""",

    "q08_regexp_extract_all" ->
      """SELECT doc_id,
                regexp_extract_all(text, '([a-z]{5,})', 1)[3] AS third_long,
                CASE WHEN instr(text, 'data') > 0
                     THEN regexp_extract(substr(text, instr(text, 'data') + 4), '([a-z]{4,})', 1)
                END AS after_data
         FROM documents ORDER BY ALL NULLS FIRST""",

    "q11_notblank" ->
      """SELECT c_custkey, regexp_replace(c_name, '^Customer#0*', '') AS biz_key
         FROM customer
         WHERE regexp_replace(c_name, '^Customer#0*', '') IS NOT NULL
           AND trim(regexp_replace(c_name, '^Customer#0*', '')) <> ''
         ORDER BY ALL NULLS FIRST""",

    "q12_nullif_norm" ->
      """SELECT o_orderkey,
                nullif(trim(regexp_extract(o_orderpriority, 'NOT ([A-Z]+)', 1)), '') AS not_kind
         FROM orders ORDER BY ALL NULLS FIRST""",

    "q13_to_date" ->
      """SELECT l_orderkey, l_linenumber,
                try_strptime(strftime(l_shipdate, '%d/%m/%Y'), '%d/%m/%Y')::DATE AS ship_date,
                try_strptime(strftime(l_shipdate, '%d/%m/%Y'), '%d/%m/%Y')::DATE + 30 AS ship_plus30,
                date_diff('day', try_strptime(strftime(l_shipdate, '%d/%m/%Y'), '%d/%m/%Y')::DATE,
                          DATE '1998-12-01') AS age_days
         FROM lineitem ORDER BY ALL NULLS FIRST""",

    "q14_url_norm" ->
      """SELECT doc_id,
                regexp_replace('http://' || source || '.example.com/' || CAST(doc_id AS VARCHAR),
                               '^http:', 'https:') AS url,
                CASE WHEN doc_id % 2 = 0
                     THEN 'https://base.example.com/files/' || CAST(doc_id AS VARCHAR)
                     ELSE 'http://other.example.com/' || CAST(doc_id AS VARCHAR) END AS abs_url,
                regexp_extract(regexp_replace('http://' || source || '.example.com/' || CAST(doc_id AS VARCHAR),
                               '^http:', 'https:'), 'https://([^/]+)/', 1) AS host
         FROM documents ORDER BY ALL NULLS FIRST""",

    // identical payload synthesis; DuckDB's json_extract family behind a
    // json_valid guard mirrors from_json's malformed→NULL tolerance
    "q139_json_payload" ->
      """WITH p AS (SELECT doc_id,
                '{"id": ' || CAST(doc_id AS VARCHAR) ||
                ', "meta": {"lang": "' || lang ||
                '", "n": ' || CAST(n_chars AS VARCHAR) ||
                '}, "tags": ["t' || CAST(doc_id % 3 AS VARCHAR) ||
                '", "t' || CAST(doc_id % 5 AS VARCHAR) || '"]}' AS payload
              FROM documents),
         b AS (SELECT doc_id,
                 CASE WHEN doc_id % 17 = 0 THEN substr(payload, 1, 20)
                      ELSE payload END AS payload
               FROM p)
         SELECT doc_id,
                CASE WHEN json_valid(payload)
                     THEN CAST(json_extract(payload, '$.id') AS BIGINT) END AS json_id,
                CASE WHEN json_valid(payload)
                     THEN json_extract_string(payload, '$.meta.lang') END AS json_lang,
                CASE WHEN json_valid(payload)
                     THEN CAST(json_extract(payload, '$.meta.n') AS BIGINT) END AS json_n,
                CASE WHEN json_valid(payload)
                     THEN json_extract_string(payload, '$.tags[0]') END AS tag0,
                CASE WHEN json_valid(payload)
                     THEN json_extract_string(payload, '$.tags[1]') END AS tag1,
                CAST(json_valid(payload) AS INT) AS valid
         FROM b ORDER BY ALL NULLS FIRST""",

    // same corruption residues, same blocking, same (dist, name) best-
    // match rule; unmatched scraped keys keep NULL (route to review)
    "q138_fuzzy_match" ->
      """WITH dict AS (SELECT DISTINCT p_name FROM part),
         dirty AS (SELECT p_partkey,
                          CASE CAST(p_partkey % 5 AS INT)
                            WHEN 0 THEN substr(p_name, 1, 2) || substr(p_name, 4, 1000)
                            WHEN 1 THEN substr(p_name, 1, 4) || substr(p_name, 4, 1000)
                            WHEN 2 THEN substr(p_name, 1, 1) || 'x' || substr(p_name, 3, 1000)
                            WHEN 3 THEN substr(p_name, 2, 1000)
                            ELSE 'x' || substr(p_name, 2, 1000)
                          END AS dirty
                   FROM part),
         cand AS (SELECT d.p_partkey, d.dirty, c.p_name AS cand,
                         CAST(levenshtein(d.dirty, c.p_name) AS BIGINT) AS dist
                  FROM dirty d JOIN dict c
                    ON (substr(d.dirty, 1, 1) = substr(c.p_name, 1, 1)
                        OR substr(d.dirty, length(d.dirty), 1)
                           = substr(c.p_name, length(c.p_name), 1))
                   AND abs(length(d.dirty) - length(c.p_name)) <= 2
                   AND levenshtein(d.dirty, c.p_name) <= 2),
         best AS (SELECT p_partkey, cand AS matched, dist FROM (
                    SELECT *, row_number() OVER (PARTITION BY p_partkey
                               ORDER BY dist ASC, cand ASC) AS rn
                    FROM cand) WHERE rn = 1)
         SELECT d.p_partkey, d.dirty, b.matched, b.dist
         FROM dirty d LEFT JOIN best b USING (p_partkey)
         ORDER BY ALL NULLS FIRST""",
  )
}
