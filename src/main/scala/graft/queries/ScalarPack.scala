package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar JSON / date-math / time-bucket queries — SURVEY §2.8 G9/G10
  * (batch form). Seeds: `events.props` JSON strings ≙ the reference's
  * `documentos` JSONB sink (src/storage.py:146-147); daily micro-batch
  * schedule ≙ tumbling-bucket aggregation (dags/master_etl.py:22).
  *
  * All row-local codegen'd built-ins; q44's bucket agg is one partial+final
  * hash aggregate shuffled on (bucket, event_type) — the batch-equivalent
  * of the Structured Streaming tumbling window (graft.streaming).
  */
object ScalarPack extends QueryPack {

  private def dec(c: Column): Column = c.cast("decimal(28,10)")

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // G9: JSON field extraction — string and typed forms.
    "q42_json_extract" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_num"),
        get_json_object(col("props"), "$.missing").as("k_missing")))),

    // G9: date part extraction + truncation + arithmetic.
    "q43_datemath" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        year(col("l_shipdate")).cast("long").as("yr"),
        month(col("l_shipdate")).cast("long").as("mon"),
        date_trunc("month", col("l_shipdate")).cast("date").as("ship_month"),
        date_add(to_date(col("l_shipdate")), 30).as("ship_plus30"),
        datediff(to_date(lit("1998-12-01")), to_date(col("l_shipdate")))
          .cast("long").as("days_to_cutoff")))),

    // G1/G9: statistical aggregates — correlation and sample stddev per
    // group, rounded before compare (both engines accumulate float moments
    // in partition order).
    "q78_corr_stats" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
             round(stddev_samp(col("l_discount")), 6).as("disc_stddev"),
             count(lit(1)).as("n")))),

    // G9/G11: positional explode — token with its offset, the generator
    // every position-aware text pipeline starts from (posexplode keeps
    // the element index; plain explode loses it).
    "q48_posexplode" -> ((s, dir) => Q.ordered(
      Q.wide(Q.t(s, dir, "documents"))
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("token")))),

    // G9: JSON object → MAP → exploded key/value rows (the dynamic-keys
    // form of q42's fixed-path extraction).
    "q79_map_explode" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "events")
        .select(col("event_id"),
          explode(from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("MAP<STRING,BIGINT>")))
            .as(Seq("k", "v"))))),

    // G9: array scalar library over token arrays — sort, membership,
    // position, overlap, bounded slice.
    "q80_array_funcs" -> ((s, dir) => Q.ordered {
      val toks = split(col("text"), " ")
      Q.t(s, dir, "documents").select(
        col("doc_id"),
        array_join(slice(sort_array(array_distinct(toks)), 1, 5), ",").as("first5_sorted"),
        array_contains(toks, "data").as("has_data"),
        array_position(toks, "spark").cast("long").as("spark_pos"),
        arrays_overlap(toks, array(lit("vector"), lit("stream"))).as("has_vec_or_stream"),
        size(toks).cast("long").as("n_tok"))
    }),

    // G10 batch form: tumbling-hour bucket aggregation over the event stream.
    "q44_tumbling_batch" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             Q.sumExact(col("value")).as("sum_value")))),

    // P6: real XPath extraction (xpath_string) over XML assembled from
    // corpus columns. The oracle is the independent ground truth (the
    // values the XML was built from), not a DuckDB xpath replay.
    "q68_xpath" -> ((s, dir) => Q.ordered(
      graft.operators.Parallelize.fanOutIfNarrow(Q.t(s, dir, "documents"))
        .withColumn("xml", concat(
          lit("<doc><title>"), col("lang"), lit("</title><n>"),
          col("n_chars").cast("string"), lit("</n></doc>")))
        // one xpath() call = one XML parse per row (xpath_string per field
        // would re-parse the document for every extracted field)
        .withColumn("parts", xpath(col("xml"), lit("/doc/*/text()")))
        .select(col("doc_id"),
          element_at(col("parts"), 1).as("title"),
          element_at(col("parts"), 2).cast("long").as("n")))),

    // G10 batch form: session windows (gap-merged per user). The oracle
    // replays Spark's session semantics — a new session starts when the
    // gap since the previous event is >= the timeout — via lag + running
    // sum of boundaries (the classic SQL sessionization).
    "q64_session_batch" -> ((s, dir) => Q.ordered(
      Q.t(s, dir, "events")
        .groupBy(session_window(col("ts"), "1 hour"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("session_window.start").as("session_start"),
          col("user_id"), col("n")))),
  )

  override val oracleSql: Map[String, String] = Map(
    "q48_posexplode" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
         SELECT doc_id,
                CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos,
                unnest(toks) AS token
         FROM t ORDER BY ALL NULLS FIRST""",

    "q42_json_extract" ->
      """SELECT event_id,
                json_extract_string(props, '$.k') AS k_str,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
                json_extract_string(props, '$.missing') AS k_missing
         FROM events ORDER BY ALL NULLS FIRST""",

    "q43_datemath" ->
      """SELECT l_orderkey, l_linenumber,
                year(l_shipdate) AS yr,
                month(l_shipdate) AS mon,
                date_trunc('month', l_shipdate) AS ship_month,
                l_shipdate::DATE + 30 AS ship_plus30,
                date_diff('day', l_shipdate::DATE, DATE '1998-12-01') AS days_to_cutoff
         FROM lineitem ORDER BY ALL NULLS FIRST""",

    "q44_tumbling_batch" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type,
                count(*) AS n,
                CAST(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DECIMAL(28,4)) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""",

    "q68_xpath" ->
      """SELECT doc_id, lang AS title, n_chars AS n
         FROM documents ORDER BY ALL NULLS FIRST""",

    "q80_array_funcs" ->
      """SELECT doc_id,
                array_to_string(list_sort(list_distinct(str_split(text, ' ')))[1:5], ',') AS first5_sorted,
                list_contains(str_split(text, ' '), 'data') AS has_data,
                CAST(coalesce(list_position(str_split(text, ' '), 'spark'), 0) AS BIGINT) AS spark_pos,
                len(list_intersect(str_split(text, ' '), ['vector', 'stream'])) > 0 AS has_vec_or_stream,
                len(str_split(text, ' ')) AS n_tok
         FROM documents ORDER BY ALL NULLS FIRST""",

    "q78_corr_stats" ->
      """SELECT l_returnflag,
                round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
                round(stddev_samp(l_discount), 6) AS disc_stddev,
                count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY ALL NULLS FIRST""",

    "q79_map_explode" ->
      """SELECT event_id, k,
                CAST(json_extract_string(props, '$."' || k || '"') AS BIGINT) AS v
         FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)
         ORDER BY ALL NULLS FIRST""",

    // event_id rides both windows as a TIEBREAKER: with duplicate
    // (user_id, ts) rows — the ×10 mirror replicates events verbatim —
    // an ORDER BY ts alone lets the lag pass and the running-sum pass
    // order the tie group DIFFERENTLY (parallel-sort instability), so
    // the brk=1 row can land mid-group in the second pass and split a
    // session that Spark's tie-insensitive session_window correctly
    // merges (caught by the r14 ×10-corpus sweep; the engine was right)
    "q64_session_batch" ->
      """WITH m AS (
           SELECT user_id, ts, event_id,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 1 HOUR
                       THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT user_id, ts,
                  sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
           FROM m)
         SELECT min(ts) AS session_start, user_id, count(*) AS n
         FROM s GROUP BY user_id, sid
         ORDER BY ALL NULLS FIRST""",
  )
}
