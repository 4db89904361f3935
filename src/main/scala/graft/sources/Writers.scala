package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.operators.Upsert

/** Sink surface — SURVEY §2.7 (W1–W3). The reference upserts into
  * Postgres with `INSERT … ON CONFLICT (pk) DO UPDATE`
  * (src/storage.py:41-53,126-131); over immutable parquet the same
  * semantics are a versioned state rewrite: read the latest state, MERGE
  * with the incoming batch (PK keep-winner), write the next version.
  *
  * Scale notes: [[partitioned]] chooses the pruning key — date/tenant-like
  * low-cardinality columns, never the PK (one file per row). The merge
  * rewrite shuffles once on the PK; on a real deployment the same operator
  * pair targets a table format with MERGE INTO (Delta/Iceberg) instead of
  * directory versions — the operator semantics (Upsert.merge) are
  * unchanged, only the commit protocol differs.
  */
object Writers {

  /** Partitioned parquet write — `partitionBy` columns become directory
    * pruning keys for every downstream scan. */
  def partitioned(df: DataFrame, path: String,
                  partitionCols: Seq[String]): Unit =
    df.write.partitionBy(partitionCols: _*).mode("overwrite").parquet(path)

  // Path -> completion marker. computeIfAbsent (not a keySet add):
  // Verify runs queries in a parallel pool, so two first callers of one
  // layout can race — with add-then-write the loser gets the path back
  // while the winner is still writing and reads a missing/partial layout
  // (ADVICE r13). computeIfAbsent blocks every concurrent caller of the
  // same key until the mapping function (the write) completes.
  private val preparedPartitions =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Partitioned layout of corpus table `name`, written AT MOST ONCE per
    * (JVM, corpus dir) into tmp scratch — the one-time directory layout
    * whose pruning every subsequent filtered scan banks (the
    * [[graft.sources.Bucketing.ensureBucketed]] pattern for partition
    * keys instead of bucket keys). Returns the path. */
  def ensurePartitioned(spark: SparkSession, dir: String, name: String,
                        partitionCols: Seq[String]): String = {
    // PID-scoped scratch (two concurrent graft processes must not
    // overwrite each other's live layout — the warehouse rule, ADVICE
    // r12) + md5-derived corpus token (String.hashCode can collide)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-partitioned-" +
      s"${ProcessHandle.current().pid()}/" +
      s"${name}_${SourceKeys.dirToken(dir)}_${partitionCols.mkString("_")}"
    preparedPartitions.computeIfAbsent(path, { p =>
      partitioned(graft.Tables.load(spark, dir, name), p, partitionCols)
      p
    })
  }

  // computeIfAbsent map, same race rationale as preparedPartitions
  private val preparedSorted =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Range-SORTED layout of corpus table `name` — the fourth layout leg
    * (buckets serve joins: Bucketing; directories serve categorical
    * filters: [[ensurePartitioned]]; SORT ORDER serves range predicates):
    * `repartitionByRange(numRanges)` + `sortWithinPartitions` on
    * `sortCol` clusters the table globally, so every parquet row group's
    * min/max band on `sortCol` is tight and a range predicate skips all
    * non-overlapping row groups inside the reader — IO ∝ the selected
    * band, not the table (PlanLint's q133 test pins the scan-metrics
    * drop). The reference's keyed point-lookup
    * (src/storage.py:76-88 `fetch_final_by_ids`) generalized to range
    * predicates over immutable parquet.
    *
    * Written AT MOST ONCE per (JVM, corpus dir) into PID-scoped tmp
    * scratch (the [[ensurePartitioned]] contract). `numRanges` is the
    * skip granularity at test scale; at production scale each range file
    * holds many 128 MB row groups and the same sort order yields
    * per-row-group stats naturally. One RangePartitioning exchange +
    * in-partition sort is the one-time layout cost every subsequent
    * banded scan amortizes. */
  def ensureSorted(spark: SparkSession, dir: String, name: String,
                   sortCol: String, numRanges: Int = 8): String = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-sorted-" +
      s"${ProcessHandle.current().pid()}/" +
      s"${name}_${SourceKeys.dirToken(dir)}_${sortCol}_$numRanges"
    preparedSorted.computeIfAbsent(path, { p =>
      import org.apache.spark.sql.functions.col
      // cloned session (own SQLConf, shared context): the sorted layout
      // MUST write INT64-micros timestamps — the INT96 session default
      // carries no usable min/max stats and no predicate pushdown, which
      // silently disables the row-group skipping this layout exists for.
      // A clone instead of a session-wide flip because the driver's
      // comparator reads INT96 as tz-naive: flipping the main session
      // broke hash parity on every timestamp-emitting oracle query
      // (q44/q64/q127, r13). Conf-isolated, so concurrent Verify threads
      // never observe a mutated session.
      val writer = spark.newSession()
      writer.conf.set("spark.sql.parquet.outputTimestampType",
        "TIMESTAMP_MICROS")
      graft.Tables.load(writer, dir, name)
        .repartitionByRange(numRanges, col(sortCol))
        .sortWithinPartitions(sortCol)
        .write.mode("overwrite").parquet(p)
      p
    })
  }

  // computeIfAbsent map, same race rationale as preparedPartitions
  private val preparedPostings =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The postings partition key: first two hex chars of md5(token) —
    * 256 directories regardless of vocabulary size (partitioning by the
    * raw token would mint one directory per vocab entry, unbounded at
    * corpus scale), engine-portable, and computable on the DRIVER for a
    * literal probe phrase so the partition filter is a plan-time
    * constant (directory pruning, not a runtime filter). */
  def tokenPart(token: Column): Column =
    org.apache.spark.sql.functions.substring(
      org.apache.spark.sql.functions.md5(token), 1, 2)

  /** Driver-side twin of [[tokenPart]] — MUST produce the identical
    * prefix for the identical token or probes read the wrong
    * directories (spec-pinned in SourcesSpec). */
  def tokenPartOf(token: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    f"${d(0) & 0xff}%02x".take(2)
  }

  /** Doc-id partition key of the BM25 layout's doclen leg — [[tokenPart]]
    * over the id's decimal string: 256 bounded directories at any corpus
    * size, so delete/merge existence checks prune to the touched ids'
    * directories instead of scanning a corpus-sized table. */
  def idPart(id: Column): Column = tokenPart(id.cast("string"))

  /** Driver-side twin of [[idPart]] (the [[tokenPartOf]] contract). */
  def idPartOf(id: Long): String = tokenPartOf(id.toString)

  /** Token-partitioned positional postings of corpus table `name` —
    * the STORED inverted index the lexical retrieval tier probes
    * (VERDICT r14 #5: the q151 pruned-vs-flat A/B lived only in
    * ScaleSmoke; this is the declared layout leg, the q131/q133
    * discipline for the postings table). One map-only invertedIndex
    * pass, written partitioned by [[tokenPart]] (256 bounded
    * directories); every phrase probe then reads ONLY its tokens'
    * directories via [[prunedPostings]] — probe IO tracks the phrase's
    * posting mass, not corpus bytes. Written AT MOST ONCE per (JVM,
    * corpus dir) into PID-scoped tmp scratch (the [[ensurePartitioned]]
    * contract). */
  def ensurePostings(spark: SparkSession, dir: String,
                     name: String = "documents"): String = {
    import org.apache.spark.sql.functions.{col, filter, split}
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-postings-" +
      s"${ProcessHandle.current().pid()}/" +
      s"${name}_${SourceKeys.dirToken(dir)}"
    preparedPostings.computeIfAbsent(path, { p =>
      writeClustered(
        postingsRows(graft.Tables.load(spark, dir, name)), p,
        "tok_part", "overwrite")
      p
    })
  }

  /** The (token, doc_id, pos, tok_part) rows of a postings layout for
    * `docs` (doc_id, text) — q151's tokenization (split on space,
    * empties dropped), one map-only posexplode. */
  private def postingsRows(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, filter, split}
    graft.operators.Retrieval.invertedIndex(
      docs.select(col("doc_id"),
        filter(split(col("text"), " "), t => t =!= "").as("toks")),
      "doc_id", col("toks"))
      .withColumn("tok_part", tokenPart(col("token")))
  }

  /** Fold a FRESH document batch into a stored [[ensurePostings]]
    * layout — the [[mergeBm25Index]] segment-append discipline for the
    * POSITIONAL postings leg: fresh (token, doc_id, pos) rows are one
    * map-only posexplode ∝ |fresh|, appended as new files inside their
    * md5-prefix directories; nothing existing is read or rewritten,
    * and there is no stats table to update. Same new-doc-id guard
    * contract as the BM25 merge (a changed document needs
    * delete-then-compact, not a double posting list). */
  def mergePostings(spark: SparkSession, path: String, fresh: DataFrame,
                    checkNewDocIds: Boolean = true): Unit = {
    import org.apache.spark.sql.functions.col
    val freshPost =
      if (checkNewDocIds) postingsRows(fresh).cache()
      else postingsRows(fresh)
    try {
      if (checkNewDocIds) {
        val touched = freshPost.select(col("tok_part")).distinct()
          .collect().map(_.getString(0)).toSeq
        if (touched.isEmpty) return // empty batch: layout unchanged
        require(spark.read.parquet(path)
            .filter(col("tok_part").isin(touched: _*))
            .join(freshPost.select(col("doc_id")).distinct(),
              Seq("doc_id"), "left_semi").head(1).isEmpty,
          "mergePostings: fresh batch contains doc_ids already in the " +
            "index — merge takes the delta split's NEW side; changed " +
            "docs need delete-then-compact, not a double posting list")
      }
      writeClustered(freshPost, path, "tok_part", "append")
    } finally freshPost.unpersist()
  }

  // computeIfAbsent map, same race rationale as preparedPartitions
  private val preparedPostingsMerged =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The [[ensurePostings]] layout built INCREMENTALLY — q176's
    * artifact (the q171 lifecycle for the positional leg): build from
    * the doc_id%3≠2 slice, fold the %3=2 slice in as a fresh-batch
    * [[mergePostings]]. A phrase probe of the merged layout must be
    * bit-for-bit the from-scratch q158 probe — q176 shares q151's
    * oracle. Written AT MOST ONCE per (JVM, corpus dir). */
  def ensurePostingsMerged(spark: SparkSession, dir: String,
                           name: String = "documents"): String = {
    import org.apache.spark.sql.functions.col
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-postings-merged-" +
      s"${ProcessHandle.current().pid()}/" +
      s"${name}_${SourceKeys.dirToken(dir)}"
    preparedPostingsMerged.computeIfAbsent(path, { p =>
      val docs = graft.Tables.load(spark, dir, name)
        .select(col("doc_id"), col("text"))
      writeClustered(postingsRows(docs.filter(col("doc_id") % 3 =!= 2)),
        p, "tok_part", "overwrite")
      mergePostings(spark, p, docs.filter(col("doc_id") % 3 === 2))
      p
    })
  }

  /** The tombstone table of a postings layout, when any delete ever
    * ran — one doc_id per row, append-only, deduplicated at write time.
    * No generation column, deliberately ([[deleteFromIvfPqIndex]]'s
    * stance): positions are immutable payloads; a CHANGED document
    * routes delete → [[compactPostings]] → re-merge, and the merge
    * guard correctly rejects a re-add while dead rows still stand. */
  def postingsDeletes(spark: SparkSession, path: String): Option[DataFrame] = {
    // underscore-prefixed: the postings DATA lives at the layout root
    // (tok_part=* directories), and Spark's file index ignores _-hidden
    // siblings — a visible `deletes/` subdir would break the root
    // read's partition discovery
    val d = Paths.get(s"$path/_deletes")
    if (Files.isDirectory(d)) Some(spark.read.parquet(s"$path/_deletes"))
    else None
  }

  /** Delete documents from a stored [[ensurePostings]] layout at cost
    * ∝ |ids| — the [[deleteFromBm25Index]] verb for the positional leg,
    * minus the stats arithmetic (a postings layout keeps none): append
    * the ids to the tombstone table; every [[prunedPostings]] probe
    * anti-joins them before the phrase algebra. Idempotent. */
  def deleteFromPostings(spark: SparkSession, path: String,
                         ids: DataFrame,
                         idCol: String = "doc_id"): Unit = {
    import org.apache.spark.sql.functions.col
    val cand = ids.select(col(idCol).as("doc_id")).distinct()
    val fresh = postingsDeletes(spark, path).fold(cand)(old =>
      cand.join(old, Seq("doc_id"), "left_anti"))
    fresh.coalesce(1) // one tombstone segment per delete batch
      .write.mode("append").parquet(s"$path/_deletes")
  }

  /** Fold postings tombstones into the physical layout (one file per
    * md5-prefix directory — the [[compactBm25Index]] protocol) and drop
    * the tombstone table. Visibility identical before and after;
    * post-compaction probes plan no tombstone scan, and a previously
    * deleted doc_id becomes mergeable again. */
  def compactPostings(spark: SparkSession, path: String): Unit = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val rows = spark.read.parquet(path)
    val live = postingsDeletes(spark, path).fold(rows)(d =>
        rows.join(broadcast(d), Seq("doc_id"), "left_anti"))
      .repartition(col("tok_part")).localCheckpoint()
    live.write.partitionBy("tok_part").mode("overwrite").parquet(path)
    removeDir(s"$path/_deletes")
  }

  // computeIfAbsent map, same race rationale as preparedPartitions
  private val preparedPostingsDeleted =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The q177 lifecycle applied to the POSITIONAL postings leg — q181's
    * artifact: the q176 incremental build (slice → merge), then the
    * doc_id%7=3 docs tombstoned. A phrase probe must equal one over a
    * from-scratch layout of the complement corpus (q181's oracle is
    * q151's filtered to `doc_id % 7 <> 3`). Written AT MOST ONCE per
    * (JVM, corpus dir). */
  def ensurePostingsDeleted(spark: SparkSession, dir: String,
                            name: String = "documents"): String = {
    import org.apache.spark.sql.functions.col
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-postings-deleted-" +
      s"${ProcessHandle.current().pid()}/" +
      s"${name}_${SourceKeys.dirToken(dir)}"
    preparedPostingsDeleted.computeIfAbsent(path, { p =>
      val docs = graft.Tables.load(spark, dir, name)
        .select(col("doc_id"), col("text"))
      writeClustered(postingsRows(docs.filter(col("doc_id") % 3 =!= 2)),
        p, "tok_part", "overwrite")
      mergePostings(spark, p, docs.filter(col("doc_id") % 3 === 2))
      deleteFromPostings(spark, p,
        docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")))
      p
    })
  }

  // computeIfAbsent map, same race rationale as preparedPartitions
  private val preparedBm25 =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The (doc_id, __toks, dl) base every BM25-layout pass starts from —
    * q28's tokenization (`split(text, ' ')`, unfiltered) with the doc
    * length as a long. */
  private def bm25Base(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    docs
      .select(col("doc_id"), split(col("text"), " ").as("__toks"))
      .select(col("doc_id"), col("__toks"),
        size(col("__toks")).cast("long").as("dl"))
  }

  /** The per-(doc, token) index rows of a BM25 layout for `docs` —
    * (token, doc_id, tf, dl, tok_part), the exact column order the tf
    * layout stores. Map-side work ∝ |docs| plus one keyed aggregation
    * over the exploded tokens. */
  private def bm25TfRows(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    bm25Base(docs)
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("token"))
      .groupBy(col("token"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("tok_part", tokenPart(col("token")))
      .select(col("token"), col("doc_id"), col("tf"), col("dl"),
        col("tok_part"))
  }

  /** The write every partitioned-layout pass shares: cluster rows by
    * their partition key FIRST, so each writer task owns whole
    * partition groups and each directory gains ONE file per pass
    * instead of one per (task × directory) — without it a 32-task
    * write of 256 directories opens 8192 tiny files and the write
    * (and every later scan) is file-count-bound, not byte-bound
    * (measured: the 10% BM25 merge cost as much as the 100% rebuild).
    * Parallelism caps at the partition-value count; at a scale where
    * one directory outgrows one task, add a salt column to the
    * repartition — more files per directory, same layout contract. */
  private def writeClustered(df: DataFrame, path: String,
                             partitionCol: String, mode: String): Unit =
    df.repartition(org.apache.spark.sql.functions.col(partitionCol))
      .write.partitionBy(partitionCol).mode(mode).parquet(path)

  private def writeTf(tfRows: DataFrame, path: String, mode: String): Unit =
    writeClustered(tfRows, path, "tok_part", mode)

  /** Segment-MAINTENANCE compaction of a partitioned layout: rewrite
    * the accumulated append files into ONE file per directory —
    * row-identical, a maintenance op, not a semantic one (the Lucene
    * segment-merge analog; q175 oracle-checks exactly that). Cost ∝
    * the whole layout — amortized over the many cheap appends it
    * follows; run it on a cadence, not per batch. localCheckpoint
    * truncates lineage so the overwrite cannot plan a read of the
    * path it replaces; a production deployment stages into a fresh
    * versioned directory and swaps (the mergeState commit protocol)
    * instead of materializing through the block manager. */
  def compactPartitioned(spark: SparkSession, path: String,
                         partitionCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    val ck = spark.read.parquet(path)
      .repartition(col(partitionCol)).localCheckpoint()
    ck.write.partitionBy(partitionCol).mode("overwrite").parquet(path)
  }

  /** One from-scratch BM25 layout write over `docs` (must carry doc_id,
    * text): `tf/` partitioned by [[tokenPart]], `doclen/` the one-row-
    * per-doc (doc_id, dl) table partitioned by [[idPart]] (the Lucene
    * norms-file analog — it makes delete/merge existence checks and the
    * delete-side dl lookup prune to the touched ids' directories), and
    * `stats/` the 1-row (n_docs, avgdl, sum_dl, next_gen) table. `avgdl`
    * is EXACTLY `Retrieval.bm25`'s arithmetic (decimal sum, round-6
    * division); `sum_dl` keeps the un-divided exact DECIMAL length sum
    * alongside it so [[mergeBm25Index]]/[[deleteFromBm25Index]] can
    * update the stats ADDITIVELY/SUBTRACTIVELY and land bit-for-bit on
    * the avgdl a from-scratch build over the changed corpus computes
    * (decimal sums are exact — association order cannot matter).
    *
    * Every stored row carries a GENERATION stamp (`gen`, here 0) and
    * `stats.next_gen` is the monotone counter the next merge/delete
    * draws from — the discipline that makes UPDATE = delete + re-merge
    * batch-proportional: a tombstone (doc_id, del_gen) kills only rows
    * with `gen < del_gen`, so a document re-added after its deletion is
    * visible again without any corpus-sized rewrite (q180). */
  def writeBm25Index(docs: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    // a from-scratch build over a previously-deleted-from path must not
    // inherit stale tombstones (gen restarts at 0, which every old
    // del_gen would kill)
    removeDir(s"$path/deletes")
    bm25Base(docs).agg(
        count(lit(1)).as("n_docs"),
        round(sum(col("dl").cast("decimal(28,6)")).cast("decimal(28,6)")
          .cast("double") / count(lit(1)), 6).as("avgdl"),
        sum(col("dl").cast("decimal(28,6)")).cast("decimal(28,6)")
          .as("sum_dl"))
      .withColumn("next_gen", lit(1L))
      .write.mode("overwrite").parquet(s"$path/stats")
    writeTf(bm25TfRows(docs).withColumn("gen", lit(0L)),
      s"$path/tf", "overwrite")
    writeClustered(
      bm25Base(docs).select(col("doc_id"), col("dl"))
        .withColumn("gen", lit(0L))
        .withColumn("doc_part", idPart(col("doc_id"))),
      s"$path/doclen", "doc_part", "overwrite")
  }

  /** The tombstone table of a BM25 layout, when any delete ever ran —
    * (doc_id, del_gen) rows, append-only segments. A stored row
    * (doc_id, gen) is LIVE iff no tombstone with `gen < del_gen`
    * matches it. Bounded between compactions ([[compactBm25Index]]
    * folds tombstones into the physical layout), so probes broadcast
    * it. */
  def bm25Deletes(spark: SparkSession, path: String): Option[DataFrame] = {
    val d = Paths.get(s"$path/deletes")
    if (Files.isDirectory(d)) Some(spark.read.parquet(s"$path/deletes"))
    else None
  }

  /** Gen-aware tombstone visibility: drop `rows` (must carry doc_id,
    * gen) killed by a tombstone — broadcast anti-join on the doc id
    * with the generation residual, so a re-added doc (gen > every
    * del_gen for its id) survives. Identity when no delete ever ran —
    * layouts without tombstones plan exactly as before. */
  private def visibleRows(rows: DataFrame,
                          deletes: Option[DataFrame]): DataFrame =
    deletes.fold(rows) { del =>
      import org.apache.spark.sql.functions.{broadcast, col}
      val t = del.select(col("doc_id").as("__del_id"),
        col("del_gen").as("__del_gen"))
      rows.join(broadcast(t),
        rows("doc_id") === t("__del_id") && rows("gen") < t("__del_gen"),
        "left_anti")
    }

  /** LIVE rows of the layout's doclen leg, pruned to the given
    * [[idPart]] directories — the existence/dl lookup both merge's
    * misuse guard and delete's stats subtraction run, at cost ∝ the
    * touched ids' directories (narrow two-long rows), never the tf
    * table. */
  private def liveDoclen(spark: SparkSession, path: String,
                         parts: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    visibleRows(
      spark.read.parquet(s"$path/doclen")
        .filter(col("doc_part").isin(parts: _*)),
      bm25Deletes(spark, path))
  }

  /** Token-partitioned STORED BM25 index of corpus table `name` — the
    * [[ensurePostings]] discipline for the RANKED lexical tier (the
    * Lucene deployment shape): `tf/` holds one (token, doc_id, tf, dl)
    * row per (doc, token) — doc length rides the row, so a probe needs
    * NO doclen join — written `partitionBy(tok_part)` ([[tokenPart]]'s
    * 256 bounded md5-prefix directories at any vocabulary size);
    * `stats/` the 1-row (n_docs, avgdl, sum_dl) table in EXACTLY
    * `Retrieval.bm25`'s arithmetic (decimal sum, round-6 division) so
    * stored scoring replays the live chain bit-for-bit. Tokenization is
    * q28's (`split(text, ' ')`, unfiltered). Written AT MOST ONCE per
    * (JVM, corpus dir) into PID-scoped tmp scratch. */
  def ensureBm25Index(spark: SparkSession, dir: String,
                      name: String = "documents"): String = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-bm25-" +
      s"${ProcessHandle.current().pid()}/" +
      s"${name}_${SourceKeys.dirToken(dir)}"
    preparedBm25.computeIfAbsent(path, { p =>
      writeBm25Index(graft.Tables.load(spark, dir, name), p)
      p
    })
  }

  /** Fold a FRESH document batch into a stored [[ensureBm25Index]]
    * layout at cost ∝ |fresh| + its touched token directories — never a
    * from-scratch rebuild (VERDICT r16 #1: the serving layouts were
    * rebuild-only, and at 100 TB an index rebuild per ingest batch is
    * the difference between minutes and a day; this is the q93/q120
    * fresh-vs-state discipline applied to the serving layout itself).
    *
    * `fresh` must carry (doc_id, text) rows whose doc_ids are NEW to
    * the index — the delta split's new side (operators/Delta, the
    * reference's whole incremental contract). The merge:
    *  1. computes the fresh (token, doc_id, tf, dl) rows — map-side
    *     work ∝ |fresh|;
    *  2. APPENDS them as new files inside their md5-prefix directories
    *     (the Lucene segment discipline: a fresh doc's tf rows are new
    *     (token, doc_id) keys, so appended files yield the exact row
    *     set a from-scratch build writes — NOTHING existing is read or
    *     rewritten; a directory rewrite would cost ∝ the OLD rows in
    *     every touched directory, which at 100 TB is terabytes per
    *     small batch);
    *  3. updates the 1-row stats ADDITIVELY through the stored exact
    *     DECIMAL `sum_dl`, landing bit-for-bit on the avgdl a
    *     from-scratch build over old ∪ fresh computes.
    * Probe-equals-rebuild is q171's oracle and SourcesSpec's equality
    * pin. With `checkNewDocIds` (the default) a fresh doc_id LIVE in
    * the index fails loudly — a CHANGED document needs
    * [[deleteFromBm25Index]] first, then a re-merge (q180's update
    * lifecycle), not a silent double-count; the guard semi-joins the
    * fresh ids' doclen directories (narrow two-long rows, pruned by
    * [[idPart]] — NOT the tf table), so an ingest that already routed
    * through Delta.split may pass false and keep the merge strictly
    * fresh-proportional. Fresh rows are stamped `gen = stats.next_gen`,
    * so they survive any earlier tombstone for the same id. Many merges
    * accumulate small files; periodic compaction (rewrite a directory's
    * files into one) is standard segment maintenance and changes no
    * row. On a real deployment the same operator targets a table
    * format's MERGE INTO; over immutable parquet the partitioned append
    * IS the commit protocol. */
  def mergeBm25Index(spark: SparkSession, path: String, fresh: DataFrame,
                     checkNewDocIds: Boolean = true): Unit = {
    import org.apache.spark.sql.functions._
    val statsSchema = spark.read.parquet(s"$path/stats").schema
    require(statsSchema.fieldNames.contains("sum_dl") &&
        statsSchema.fieldNames.contains("next_gen"),
      "mergeBm25Index needs a merge-capable layout: stats/ lacks the " +
        "exact sum_dl / next_gen columns (rebuild the index with this " +
        "version's writeBm25Index before merging)")
    val old = spark.read.parquet(s"$path/stats")
      .select(col("n_docs"), col("sum_dl"), col("next_gen")).head()
    val g = old.getLong(2)
    // the fresh doclen rows drive everything batch-sized: the stats
    // delta, the guard's existence probe, and the doclen append — cache
    // once, ∝ |fresh| narrow rows
    val freshLen = bm25Base(fresh).select(col("doc_id"), col("dl"))
      .withColumn("gen", lit(g))
      .withColumn("doc_part", idPart(col("doc_id")))
      .cache()
    try {
      val freshStat = freshLen.agg(
        count(lit(1)).as("n"),
        sum(col("dl").cast("decimal(28,6)")).cast("decimal(28,6)").as("s"))
        .head()
      if (freshStat.getLong(0) == 0L) return // empty batch: no-op
      // n_docs = 0 ⇒ nothing can be LIVE (and the empty doclen leg has
      // no readable schema) — the bootstrap-from-empty merge skips the
      // guard, not the contract
      if (checkNewDocIds && old.getLong(0) > 0L) {
        val parts = freshLen.select(col("doc_part")).distinct()
          .collect().map(_.getString(0)).toSeq // bounded: ≤256 prefixes
        // misuse trap: a fresh doc_id still LIVE would silently
        // double-count its tokens in every df window downstream
        require(liveDoclen(spark, path, parts)
            .join(freshLen.select(col("doc_id")).distinct(),
              Seq("doc_id"), "left_semi").head(1).isEmpty,
          "mergeBm25Index: fresh batch contains doc_ids LIVE in the " +
            "index — merge takes the delta split's NEW side; changed " +
            "docs need deleteFromBm25Index first, not an in-place " +
            "double-count")
      }
      writeTf(bm25TfRows(fresh).withColumn("gen", lit(g)),
        s"$path/tf", "append")
      writeClustered(freshLen, s"$path/doclen", "doc_part", "append")
      val n = old.getLong(0) + freshStat.getLong(0)
      // an EMPTY layout (writeBm25Index over zero docs — the streaming
      // bootstrap) stores NULL sum_dl; additively that is zero
      val oldSum = if (old.isNullAt(1)) java.math.BigDecimal.ZERO
                   else old.getDecimal(1)
      val s = oldSum.add(freshStat.getDecimal(1)) // exact
      // collected to the driver first: a 1-row overwrite cannot plan a
      // read of the path it replaces
      spark.range(1).select(
          lit(n).as("n_docs"),
          round(lit(s).cast("decimal(28,6)").cast("double") / lit(n), 6)
            .as("avgdl"),
          lit(s).cast("decimal(28,6)").as("sum_dl"),
          lit(g + 1L).as("next_gen"))
        .write.mode("overwrite").parquet(s"$path/stats")
    } finally freshLen.unpersist()
  }

  /** Delete documents from a stored [[ensureBm25Index]] layout at cost
    * ∝ |deletes| — the Lucene `.del`-file analog, and the lifecycle
    * verb [[mergeBm25Index]]'s add leaves open (opt-outs, contamination
    * takedowns, dedup evictions; at 100 TB a rebuild per delete batch
    * is as unaffordable as one per ingest batch). Returns the number of
    * documents actually deleted.
    *
    * Mechanics, all batch-proportional:
    *  1. candidate ids prune the doclen leg to their [[idPart]]
    *     directories; only ids LIVE there count (absent or already-
    *     tombstoned ids are SKIPPED — delete is idempotent, never a
    *     double-subtract);
    *  2. tombstones (doc_id, del_gen = stats.next_gen) APPEND to
    *     `deletes/` — nothing corpus-sized is read or rewritten; every
    *     probe anti-joins them gen-aware ([[prunedBm25Tf]]), so df
    *     windows, n_terms and scores see only survivors;
    *  3. stats update SUBTRACTIVELY through the exact DECIMAL sum_dl
    *     with the deleted docs' dl from the pruned doclen read —
    *     landing bit-for-bit on the avgdl a from-scratch build over
    *     the complement computes (q177's oracle).
    * Deleting the LAST document is refused (an empty index has no
    * avgdl — rebuild instead). [[compactBm25Index]] later folds
    * tombstones into the physical layout; between compactions the
    * tombstone table is the bounded broadcast side of every probe. */
  def deleteFromBm25Index(spark: SparkSession, path: String,
                          deletes: DataFrame,
                          idCol: String = "doc_id"): Long = {
    import org.apache.spark.sql.functions._
    val old = spark.read.parquet(s"$path/stats")
      .select(col("n_docs"), col("sum_dl"), col("next_gen")).head()
    if (old.getLong(0) == 0L) return 0L // empty index: nothing to delete
    val g = old.getLong(2)
    val cand = deletes.select(col(idCol).as("doc_id")).distinct()
      .withColumn("doc_part", idPart(col("doc_id")))
      .cache()
    try {
      val parts = cand.select(col("doc_part")).distinct()
        .collect().map(_.getString(0)).toSeq // bounded: ≤256 prefixes
      if (parts.isEmpty) return 0L
      val present = liveDoclen(spark, path, parts)
        .join(cand.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .cache()
      try {
        val st = present.agg(
          count(lit(1)).as("n"),
          sum(col("dl").cast("decimal(28,6)")).cast("decimal(28,6)").as("s"))
          .head()
        val cnt = st.getLong(0)
        if (cnt == 0L) return 0L
        val n = old.getLong(0) - cnt
        require(n > 0,
          "deleteFromBm25Index would empty the index — an empty layout " +
            "has no avgdl; rebuild instead of deleting every document")
        present.select(col("doc_id"), lit(g).as("del_gen"))
          .coalesce(1) // one tombstone segment per delete batch
          .write.mode("append").parquet(s"$path/deletes")
        val s = old.getDecimal(1).subtract(st.getDecimal(1)) // exact
        spark.range(1).select(
            lit(n).as("n_docs"),
            round(lit(s).cast("decimal(28,6)").cast("double") / lit(n), 6)
              .as("avgdl"),
            lit(s).cast("decimal(28,6)").as("sum_dl"),
            lit(g + 1L).as("next_gen"))
          .write.mode("overwrite").parquet(s"$path/stats")
        cnt
      } finally present.unpersist()
    } finally cand.unpersist()
  }

  /** Fold accumulated tombstones INTO the physical layout and compact
    * segments: rewrite tf/ and doclen/ keeping only LIVE rows (one
    * file per directory — [[compactPartitioned]]'s write protocol),
    * then drop the tombstone table. Row VISIBILITY is identical before
    * and after (q179 shares q177's oracle) and probes of the compacted
    * layout plan NO tombstone scan — q169's exact shape. Cost ∝ the
    * layout, amortized over the many batch-proportional deletes it
    * follows — run on a cadence, not per batch. */
  def compactBm25Index(spark: SparkSession, path: String): Unit = {
    import org.apache.spark.sql.functions.col
    val del = bm25Deletes(spark, path)
    val tf = visibleRows(spark.read.parquet(s"$path/tf"), del)
      .repartition(col("tok_part")).localCheckpoint()
    tf.write.partitionBy("tok_part").mode("overwrite").parquet(s"$path/tf")
    val dlr = visibleRows(spark.read.parquet(s"$path/doclen"), del)
      .repartition(col("doc_part")).localCheckpoint()
    dlr.write.partitionBy("doc_part").mode("overwrite")
      .parquet(s"$path/doclen")
    removeDir(s"$path/deletes")
  }

  /** Health snapshot of a stored BM25 layout — the operational surface
    * every real index exposes (Lucene's SegmentInfos): live docs (from
    * the exact stats), total doclen rows (one per merged doc VERSION —
    * parquet footer metadata, no payload scan), their difference =
    * dead rows awaiting compaction, tombstone count, the generation
    * counter, and the worst per-directory segment-file count of the tf
    * leg (driver-side listing). Everything is metadata-priced; nothing
    * corpus-sized runs. */
  final case class Bm25IndexInfo(liveDocs: Long, doclenRows: Long,
                                 deadDocs: Long, tombstoneRows: Long,
                                 nextGen: Long, tfDirs: Int,
                                 maxTfFilesPerDir: Int) {
    /** Fraction of doclen rows that are dead versions — the compaction
      * trigger metric. 0 on a freshly built or just-compacted layout. */
    def deadFraction: Double =
      if (doclenRows == 0L) 0.0 else deadDocs.toDouble / doclenRows
  }

  /** Compute [[Bm25IndexInfo]] for the layout at `path`. */
  def describeBm25Index(spark: SparkSession, path: String): Bm25IndexInfo = {
    import org.apache.spark.sql.functions.col
    val st = spark.read.parquet(s"$path/stats")
      .select(col("n_docs"), col("next_gen")).head()
    val live = st.getLong(0)
    val doclenRows =
      if (live == 0L) 0L else spark.read.parquet(s"$path/doclen").count()
    val tomb = bm25Deletes(spark, path).map(_.count()).getOrElse(0L)
    val tfRoot = Paths.get(s"$path/tf")
    var dirs = 0
    var maxFiles = 0
    if (Files.isDirectory(tfRoot)) {
      val it = Files.list(tfRoot)
      try it.iterator().forEachRemaining { d =>
        if (Files.isDirectory(d) &&
            d.getFileName.toString.startsWith("tok_part=")) {
          dirs += 1
          val fl = Files.list(d)
          try {
            var n = 0
            fl.iterator().forEachRemaining { f =>
              if (f.getFileName.toString.endsWith(".parquet")) n += 1
            }
            maxFiles = math.max(maxFiles, n)
          } finally fl.close()
        }
      } finally it.close()
    }
    Bm25IndexInfo(live, doclenRows, doclenRows - live, tomb,
      st.getLong(1), dirs, maxFiles)
  }

  /** Policy-driven maintenance — the Lucene merge-policy analog: run
    * [[compactBm25Index]] iff the layout has accumulated enough debt
    * to amortize the rewrite — dead-version fraction above
    * `maxDeadFraction` OR any tf directory holding more than
    * `maxFilesPerDir` append segments. Returns true iff a compaction
    * ran. The decision reads only metadata ([[describeBm25Index]]), so
    * calling this after every merge/delete batch is cheap; the rewrite
    * itself stays ∝ the layout and fires on the policy's cadence. */
  def maintainBm25Index(spark: SparkSession, path: String,
                        maxDeadFraction: Double = 0.2,
                        maxFilesPerDir: Int = 8): Boolean = {
    val info = describeBm25Index(spark, path)
    val due = info.deadFraction > maxDeadFraction ||
      info.maxTfFilesPerDir > maxFilesPerDir
    if (due) compactBm25Index(spark, path)
    due
  }

  /** Drop a layout's tombstone table WITHOUT rewriting data — the
    * fresh-overwrite companion: a layout rebuilt in place must never
    * inherit stale tombstones ([[writeBm25Index]] calls this
    * internally; manual codes/ overwrites call it explicitly). */
  def clearTombstones(path: String): Unit = removeDir(s"$path/deletes")

  /** Recursive local-filesystem directory removal (deepest-first) —
    * the tombstone-table drop after a compaction folded it in. */
  private def removeDir(path: String): Unit = {
    val d = Paths.get(path)
    if (Files.isDirectory(d)) {
      val walk = Files.walk(d)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally walk.close()
    }
  }

  // computeIfAbsent map, same race rationale as preparedPartitions
  private val preparedBm25Merged =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The [[ensureBm25Index]] layout built INCREMENTALLY — the artifact
    * q171 probes: build from the doc_id%3=0 slice, then fold the %3=1
    * and %3=2 slices in as two fresh-batch [[mergeBm25Index]] calls
    * (two merges so merge-onto-merged is exercised, not just
    * merge-onto-built). The resulting probe must be bit-for-bit the
    * from-scratch q169 probe — lifecycle, not semantics (q171 shares
    * q28's oracle). Written AT MOST ONCE per (JVM, corpus dir). */
  def ensureBm25IndexMerged(spark: SparkSession, dir: String,
                            name: String = "documents"): String = {
    import org.apache.spark.sql.functions.col
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-bm25-merged-" +
      s"${ProcessHandle.current().pid()}/" +
      s"${name}_${SourceKeys.dirToken(dir)}"
    preparedBm25Merged.computeIfAbsent(path, { p =>
      val docs = graft.Tables.load(spark, dir, name)
        .select(col("doc_id"), col("text"))
      writeBm25Index(docs.filter(col("doc_id") % 3 === 0), p)
      mergeBm25Index(spark, p, docs.filter(col("doc_id") % 3 === 1))
      mergeBm25Index(spark, p, docs.filter(col("doc_id") % 3 === 2))
      p
    })
  }

  /** Probe-side read of an [[ensureBm25Index]] tf layout — the
    * [[prunedPostings]] contract: driver-computed [[tokenPartOf]]
    * literals prune directories at plan time, the residual
    * `token IN (...)` pushes into the parquet reader. When the layout
    * carries tombstones ([[deleteFromBm25Index]]) the pruned hits are
    * additionally filtered through the gen-aware broadcast anti-join —
    * deleted docs vanish from the hit stream BEFORE the df windows, so
    * stored scoring over the survivors replays a complement rebuild
    * bit-for-bit (q177); tombstone-free layouts plan exactly as before.
    * Returns (token, doc_id, tf, dl). */
  def prunedBm25Tf(spark: SparkSession, path: String,
                   terms: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    require(terms.nonEmpty, "prunedBm25Tf needs at least one term")
    val parts = terms.distinct.map(tokenPartOf).distinct
    visibleRows(
        spark.read.parquet(s"$path/tf")
          .filter(col("tok_part").isin(parts: _*) &&
            col("token").isin(terms.distinct: _*)),
        bm25Deletes(spark, path))
      .select(col("token"), col("doc_id"), col("tf"), col("dl"))
  }

  // computeIfAbsent map, same race rationale as preparedPartitions
  private val preparedBm25Compacted =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The FULL BM25-layout lifecycle as one artifact — q175's: build
    * from the doc_id%3=0 slice, merge the other two slices as fresh
    * batches (segments accumulate), then [[compactPartitioned]] the tf
    * directories back to one file each. The compacted probe must be
    * bit-for-bit the from-scratch probe — compaction is maintenance,
    * never semantics (q175 shares q28's oracle; SourcesSpec pins the
    * one-file-per-directory invariant and row identity). Written AT
    * MOST ONCE per (JVM, corpus dir). */
  def ensureBm25IndexCompacted(spark: SparkSession, dir: String,
                               name: String = "documents"): String = {
    import org.apache.spark.sql.functions.col
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-bm25-compact-" +
      s"${ProcessHandle.current().pid()}/" +
      s"${name}_${SourceKeys.dirToken(dir)}"
    preparedBm25Compacted.computeIfAbsent(path, { p =>
      val docs = graft.Tables.load(spark, dir, name)
        .select(col("doc_id"), col("text"))
      writeBm25Index(docs.filter(col("doc_id") % 3 === 0), p)
      mergeBm25Index(spark, p, docs.filter(col("doc_id") % 3 === 1))
      mergeBm25Index(spark, p, docs.filter(col("doc_id") % 3 === 2))
      compactPartitioned(spark, s"$p/tf", "tok_part")
      p
    })
  }

  // computeIfAbsent map, same race rationale as preparedPartitions
  private val preparedBm25Deleted =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The DELETE leg of the lifecycle as one artifact — q177's: the
    * q171 incremental build (slice → merge → merge), then the doc_id%7=3
    * docs deleted as one [[deleteFromBm25Index]] tombstone batch. A
    * probe of this layout must equal a from-scratch build over the
    * COMPLEMENT corpus (q177's oracle replays BM25 over
    * `doc_id % 7 <> 3`) — the tombstone visibility join, the subtracted
    * stats, and the survivor-only df windows all have to land exactly.
    * Written AT MOST ONCE per (JVM, corpus dir). */
  def ensureBm25IndexDeleted(spark: SparkSession, dir: String,
                             name: String = "documents"): String = {
    import org.apache.spark.sql.functions.col
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-bm25-deleted-" +
      s"${ProcessHandle.current().pid()}/" +
      s"${name}_${SourceKeys.dirToken(dir)}"
    preparedBm25Deleted.computeIfAbsent(path, { p =>
      val docs = graft.Tables.load(spark, dir, name)
        .select(col("doc_id"), col("text"))
      writeBm25Index(docs.filter(col("doc_id") % 3 === 0), p)
      mergeBm25Index(spark, p, docs.filter(col("doc_id") % 3 === 1))
      mergeBm25Index(spark, p, docs.filter(col("doc_id") % 3 === 2))
      deleteFromBm25Index(spark, p,
        docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")))
      p
    })
  }

  // computeIfAbsent map, same race rationale as preparedPartitions
  private val preparedBm25DeleteCompacted =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** [[ensureBm25IndexDeleted]] followed by [[compactBm25Index]] —
    * q179's artifact: tombstones folded into the physical layout, the
    * tombstone table dropped. The probe must STILL equal the complement
    * rebuild (q179 shares q177's oracle) while planning q169's exact
    * tombstone-free shape (PlanLint pins the scan count back at 2).
    * Written AT MOST ONCE per (JVM, corpus dir). */
  def ensureBm25IndexDeleteCompacted(spark: SparkSession, dir: String,
                                     name: String = "documents"): String = {
    import org.apache.spark.sql.functions.col
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-bm25-delcomp-" +
      s"${ProcessHandle.current().pid()}/" +
      s"${name}_${SourceKeys.dirToken(dir)}"
    preparedBm25DeleteCompacted.computeIfAbsent(path, { p =>
      val docs = graft.Tables.load(spark, dir, name)
        .select(col("doc_id"), col("text"))
      writeBm25Index(docs.filter(col("doc_id") % 3 === 0), p)
      mergeBm25Index(spark, p, docs.filter(col("doc_id") % 3 === 1))
      mergeBm25Index(spark, p, docs.filter(col("doc_id") % 3 === 2))
      deleteFromBm25Index(spark, p,
        docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")))
      compactBm25Index(spark, p)
      p
    })
  }

  // computeIfAbsent map, same race rationale as preparedPartitions
  private val preparedBm25Updated =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** UPDATE = delete + re-merge on the serving layout — q180's
    * artifact, the reference's `ON CONFLICT (pk) DO UPDATE`
    * (src/storage.py:41-53) realized on the index itself: build over
    * the full corpus, tombstone the doc_id%5=4 docs, then merge their
    * CHANGED versions (text + " fresh join") back in as a fresh batch.
    * The generation discipline carries it: the re-added rows are
    * stamped past the tombstone (`gen > del_gen`), so probes see
    * exactly one — the new — version of every updated doc, and both
    * steps stay ∝ the changed batch. A probe must equal a from-scratch
    * build over the UPDATED corpus (q180's oracle). Written AT MOST
    * ONCE per (JVM, corpus dir). */
  def ensureBm25IndexUpdated(spark: SparkSession, dir: String,
                             name: String = "documents"): String = {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-bm25-updated-" +
      s"${ProcessHandle.current().pid()}/" +
      s"${name}_${SourceKeys.dirToken(dir)}"
    preparedBm25Updated.computeIfAbsent(path, { p =>
      val docs = graft.Tables.load(spark, dir, name)
        .select(col("doc_id"), col("text"))
      writeBm25Index(docs, p)
      val changed = docs.filter(col("doc_id") % 5 === 4)
      deleteFromBm25Index(spark, p, changed.select(col("doc_id")))
      mergeBm25Index(spark, p, changed.select(col("doc_id"),
        concat(col("text"), lit(" fresh join")).as("text")))
      p
    })
  }

  // computeIfAbsent map, same race rationale as preparedPartitions
  private val preparedIvfPq =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Bucket-partitioned STORED IVF×PQ index of corpus table `name` —
    * the materialized ANN serving layout (the [[ensurePostings]]
    * discipline applied to vectors): `codes/` holds (vec_id, codes,
    * bucket) written `partitionBy("bucket")` so a probe's coarse
    * routing prunes DIRECTORIES, `codebook/` the exact integer-sum PQ
    * codebook, `centroids/` the coarse table (cid, cvec) — here the
    * q156 fixed low-id rule over `coarseK` vectors; a kmeans-trained
    * table stores the same way. Every live IVF×PQ search above pays
    * coding + codebook training per call (documented upper bounds);
    * probes of THIS layout pay only probed-bucket IO + two bounded
    * reads. Written AT MOST ONCE per (JVM, corpus dir, params) into
    * PID-scoped tmp scratch (the [[ensurePartitioned]] contract). */
  def ensureIvfPqIndex(spark: SparkSession, dir: String,
                       name: String = "embeddings", coarseK: Int = 8,
                       m: Int = 4, subDim: Int = 16,
                       probeDims: Int = 4): String = {
    import org.apache.spark.sql.functions.col
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-ivfpq-" +
      s"${ProcessHandle.current().pid()}/" +
      s"${name}_${SourceKeys.dirToken(dir)}_${coarseK}_${m}_${subDim}_$probeDims"
    preparedIvfPq.computeIfAbsent(path, { p =>
      val vecs = graft.Tables.load(spark, dir, name)
      val coarse = vecs.filter(col("vec_id") < coarseK)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      // label rides the codes layout as the FAISS-style payload column,
      // so stored-index mining (routedNegativesStored) disqualifies
      // in-scan without re-joining the corpus-sized base table
      val (codes, book) = graft.operators.Similarity.ivfPqIndexTables(
        vecs, "vec_id", "embedding", coarse, "cid", "cvec",
        m, subDim, probeDims, passthrough = Seq("label"))
      codes.write.partitionBy("bucket").mode("overwrite")
        .parquet(s"$p/codes")
      book.write.mode("overwrite").parquet(s"$p/codebook")
      coarse.write.mode("overwrite").parquet(s"$p/centroids")
      p
    })
  }

  /** Fold a FRESH vector batch into a stored [[ensureIvfPqIndex]]-shape
    * layout at cost ∝ |fresh| — the FAISS add() contract, and the
    * [[mergeBm25Index]] discipline for the ANN leg: the codebook and
    * centroid artifacts stay FROZEN (training is a sampled one-time
    * step; re-training per ingest batch would shift every stored
    * code's meaning), fresh vectors are encoded against them in one
    * map-only pass ([[graft.operators.Similarity.ivfPqEncode]] — a
    * vector's PQ codes are intrinsic, its bucket the exact-integer
    * argmin against the frozen centroids) and APPENDED as new files in
    * their bucket directories; nothing existing is read or rewritten.
    * Merged ≡ from-scratch-with-the-same-frozen-artifacts is q174's
    * oracle and SourcesSpec's equality pin. With `checkNewIds` (the
    * default) a fresh id already coded fails loudly (cost: a semi-join
    * over the fresh buckets' directories — NOT fresh-proportional;
    * Delta-routed ingest passes false). `passthrough` must match the
    * columns the layout was built with. */
  def mergeIvfPqIndex(spark: SparkSession, path: String, fresh: DataFrame,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      m: Int = 4, subDim: Int = 16, probeDims: Int = 4,
                      passthrough: Seq[String] = Nil,
                      checkNewIds: Boolean = true): Unit = {
    import org.apache.spark.sql.functions.col
    val freshCodes = graft.operators.Similarity.ivfPqEncode(
      fresh, idCol, vecCol, spark.read.parquet(s"$path/centroids"),
      m, subDim, probeDims, passthrough)
    if (checkNewIds) {
      val cached = freshCodes.cache()
      try {
        val buckets = cached.select(col("bucket")).distinct()
          .collect().map(_.getLong(0)) // bounded by the coarse k
        require(spark.read.parquet(s"$path/codes")
            .filter(col("bucket").isin(buckets.toIndexedSeq: _*))
            .join(cached.select(col(idCol)).distinct(), Seq(idCol),
              "left_semi").head(1).isEmpty,
          "mergeIvfPqIndex: fresh batch contains ids already coded in " +
            "the index — merge takes the delta split's NEW side; " +
            "changed vectors need delete-then-compact, not a double add")
        cached.write.partitionBy("bucket").mode("append")
          .parquet(s"$path/codes")
      } finally cached.unpersist()
    } else freshCodes.write.partitionBy("bucket").mode("append")
      .parquet(s"$path/codes")
  }

  // computeIfAbsent map, same race rationale as preparedPartitions
  private val preparedIvfPqMerged =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The [[ensureIvfPqIndex]] layout built INCREMENTALLY — q174's
    * artifact: train the codebook and fix the centroid table on the
    * vec_id%3≠2 slice ONLY (the FAISS train-on-a-sample contract —
    * the stored artifacts then never move), build that slice's codes,
    * and fold the %3=2 slice in as a fresh-batch [[mergeIvfPqIndex]].
    * A probe of the merged layout must equal a probe of a from-scratch
    * build that uses the SAME frozen artifacts — the oracle replays
    * codebook training restricted to the slice, coding/routing over
    * everything. Written AT MOST ONCE per (JVM, corpus dir, params). */
  def ensureIvfPqIndexMerged(spark: SparkSession, dir: String,
                             name: String = "embeddings", coarseK: Int = 8,
                             m: Int = 4, subDim: Int = 16,
                             probeDims: Int = 4): String = {
    import org.apache.spark.sql.functions.col
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-ivfpq-merged-" +
      s"${ProcessHandle.current().pid()}/" +
      s"${name}_${SourceKeys.dirToken(dir)}_${coarseK}_${m}_${subDim}_$probeDims"
    preparedIvfPqMerged.computeIfAbsent(path, { p =>
      import org.apache.spark.sql.functions.{array_repeat, lit}
      val vecs = graft.Tables.load(spark, dir, name)
      val sliceA = vecs.filter(col("vec_id") % 3 =!= 2)
      val coarse = sliceA.filter(col("vec_id") < coarseK)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val (codes, book) = graft.operators.Similarity.ivfPqIndexTables(
        sliceA, "vec_id", "embedding", coarse, "cid", "cvec",
        m, subDim, probeDims)
      codes.write.partitionBy("bucket").mode("overwrite")
        .parquet(s"$p/codes")
      // ORIGIN-CENTROID FALLBACK: the intrinsic sign/abs-rank code of a
      // FRESH vector can be one the training slice never realized — a
      // sample-trained codebook then has no row for it and the ADC
      // lookup would be undefined (pqAdcDense deliberately NaN-fails on
      // impossible lookups). Pad the frozen codebook with every
      // unrealized code value as a zero (origin) centroid — that
      // subquantizer then contributes round(‖q_m‖², 8), the distance to
      // an uninformative centroid: defined, conservative (unseen-code
      // vectors rank behind well-coded ones near the query), and
      // exactly replayable (the q174 oracle pads the same rows). The
      // code space is bounded: (i1+4)·(2p+1) + (i2+4) over signed dim
      // picks — padding the full (2p+1)² rectangle is harmless, extra
      // rows are never looked up.
      val radix = 2 * probeDims + 1
      val pad0 = spark.range(m.toLong).select(col("id").as("m"))
        .crossJoin(spark.range((radix * radix).toLong)
          .select(col("id").as("code")))
        .join(book.select(col("m"), col("code")), Seq("m", "code"),
          "left_anti")
        .select(col("m"), col("code"), lit(1L).as("n_vecs"),
          array_repeat(lit(0L), subDim).as("centroid_msum"))
      val pad = book.schema.fields.foldLeft(pad0)((d, f) =>
        d.withColumn(f.name, col(f.name).cast(f.dataType)))
        .select(book.columns.map(col).toIndexedSeq: _*)
      book.unionByName(pad).write.mode("overwrite").parquet(s"$p/codebook")
      coarse.write.mode("overwrite").parquet(s"$p/centroids")
      mergeIvfPqIndex(spark, p, vecs.filter(col("vec_id") % 3 === 2),
        m = m, subDim = subDim, probeDims = probeDims)
      p
    })
  }

  /** The tombstone table of an IVF×PQ layout, when any delete ever ran
    * — one id per row, append-only, deduplicated at write time. */
  def ivfDeletes(spark: SparkSession, path: String): Option[DataFrame] = {
    val d = Paths.get(s"$path/deletes")
    if (Files.isDirectory(d)) Some(spark.read.parquet(s"$path/deletes"))
    else None
  }

  /** FAISS `remove_ids` for the stored IVF×PQ layout, at cost
    * ∝ |ids|: append the ids to the layout's tombstone table; probes
    * read codes through [[liveCodes]], which anti-joins the broadcast
    * tombstones after directory pruning. No stats to update and no
    * generation needed — ADC ranks rows independently, so a plain id
    * tombstone is complete. Idempotent (ids are deduplicated against
    * the existing table; absent ids are harmless no-ops in the
    * anti-join). Re-adding a deleted id needs [[compactIvfPqIndex]]
    * first — the codes layout has no generation column, deliberately:
    * vectors are immutable payloads, not upserted documents. */
  def deleteFromIvfPqIndex(spark: SparkSession, path: String,
                           ids: DataFrame,
                           idCol: String = "vec_id"): Unit = {
    import org.apache.spark.sql.functions.col
    val cand = ids.select(col(idCol)).distinct()
    val fresh = ivfDeletes(spark, path).fold(cand)(old =>
      cand.join(old, Seq(idCol), "left_anti"))
    fresh.coalesce(1) // one tombstone segment per delete batch
      .write.mode("append").parquet(s"$path/deletes")
  }

  /** Probe-side codes view of a stored IVF×PQ layout: the codes table
    * with tombstoned rows dropped (broadcast anti-join — bounded
    * between compactions), identity when no delete ever ran. The
    * probed-bucket partition filter applied downstream
    * (ivfPqSearchStored) pushes through the anti-join's left side, so
    * directory pruning survives deletion (PlanLint pins q178). */
  def liveCodes(spark: SparkSession, path: String,
                idCol: String = "vec_id"): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val codes = spark.read.parquet(s"$path/codes")
    ivfDeletes(spark, path).fold(codes)(d =>
      codes.join(broadcast(d), Seq(idCol), "left_anti"))
  }

  /** Fold IVF×PQ tombstones into the physical codes layout (one file
    * per bucket directory — the [[compactBm25Index]] protocol) and
    * drop the tombstone table. Visibility identical before and after;
    * post-compaction probes plan no tombstone scan. */
  def compactIvfPqIndex(spark: SparkSession, path: String,
                        idCol: String = "vec_id"): Unit = {
    import org.apache.spark.sql.functions.col
    val live = liveCodes(spark, path, idCol)
      .repartition(col("bucket")).localCheckpoint()
    live.write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$path/codes")
    removeDir(s"$path/deletes")
  }

  // computeIfAbsent map, same race rationale as preparedPartitions
  private val preparedIvfPqDeleted =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** [[ensureIvfPqIndex]]'s build followed by one
    * [[deleteFromIvfPqIndex]] tombstone batch (vec_id%5=2) — q178's
    * artifact, the FAISS remove_ids lifecycle: the codebook and
    * centroid artifacts stay FROZEN exactly as built over the full
    * corpus (deletion never retrains — FAISS semantics; vec_id 2 stays
    * a centroid even though its vector is no longer searchable), only
    * the searchable row set shrinks. The oracle replays the full q156
    * chain and drops deleted ids from the FINAL ranking only. Written
    * AT MOST ONCE per (JVM, corpus dir, params). */
  def ensureIvfPqIndexDeleted(spark: SparkSession, dir: String,
                              name: String = "embeddings", coarseK: Int = 8,
                              m: Int = 4, subDim: Int = 16,
                              probeDims: Int = 4): String = {
    import org.apache.spark.sql.functions.col
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-ivfpq-deleted-" +
      s"${ProcessHandle.current().pid()}/" +
      s"${name}_${SourceKeys.dirToken(dir)}_${coarseK}_${m}_${subDim}_$probeDims"
    preparedIvfPqDeleted.computeIfAbsent(path, { p =>
      val vecs = graft.Tables.load(spark, dir, name)
      val coarse = vecs.filter(col("vec_id") < coarseK)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val (codes, book) = graft.operators.Similarity.ivfPqIndexTables(
        vecs, "vec_id", "embedding", coarse, "cid", "cvec",
        m, subDim, probeDims, passthrough = Seq("label"))
      codes.write.partitionBy("bucket").mode("overwrite")
        .parquet(s"$p/codes")
      book.write.mode("overwrite").parquet(s"$p/codebook")
      coarse.write.mode("overwrite").parquet(s"$p/centroids")
      deleteFromIvfPqIndex(spark, p,
        vecs.filter(col("vec_id") % 5 === 2).select(col("vec_id")))
      p
    })
  }

  // computeIfAbsent map, same race rationale as preparedPartitions
  private val preparedIvfPqTrained =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** [[ensureIvfPqIndex]] with a KMEANS-TRAINED coarse level (VERDICT
    * r15 #3 — the FAISS lifecycle train → build → probe as ONE stored
    * layout): `Similarity.kmeans` at `coarseK`/`kmIters` under the
    * exact-seeding regime (seedLevels = Seq(1) — the q164
    * oracle-replayable form), the final assignment re-meaned through
    * `centroids`/`centroidMeans` into the (cid, cvec) centroid
    * contract, then the identical codes/codebook build. Clusters that
    * end empty simply don't appear in the centroid table — routing
    * ranks whatever the training realized. Written AT MOST ONCE per
    * (JVM, corpus dir, params) into PID-scoped tmp scratch. */
  def ensureIvfPqIndexTrained(spark: SparkSession, dir: String,
                              name: String = "embeddings", coarseK: Int = 4,
                              kmIters: Int = 2, m: Int = 4, subDim: Int = 16,
                              probeDims: Int = 4): String = {
    import org.apache.spark.sql.functions.col
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-ivfpq-trained-" +
      s"${ProcessHandle.current().pid()}/" +
      s"${name}_${SourceKeys.dirToken(dir)}_${coarseK}_${kmIters}_" +
      s"${m}_${subDim}_$probeDims"
    preparedIvfPqTrained.computeIfAbsent(path, { p =>
      import graft.operators.Similarity
      val vecs = graft.Tables.load(spark, dir, name)
      val assigned = Similarity.kmeans(vecs, "vec_id", "embedding",
        coarseK, kmIters, seedLevels = Seq(1L))
      val coarse = Similarity.centroidMeans(Similarity.centroids(
          vecs.join(assigned, Seq("vec_id")),
          col("cluster"), col("embedding")))
        .select(col("bucket").cast("long").as("cid"),
          col("centroid").as("cvec"))
      val (codes, book) = Similarity.ivfPqIndexTables(
        vecs, "vec_id", "embedding", coarse, "cid", "cvec",
        m, subDim, probeDims)
      codes.write.partitionBy("bucket").mode("overwrite")
        .parquet(s"$p/codes")
      book.write.mode("overwrite").parquet(s"$p/codebook")
      coarse.write.mode("overwrite").parquet(s"$p/centroids")
      p
    })
  }

  // computeIfAbsent map, same race rationale as preparedPartitions
  private val preparedModels =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** STORED trained-model table (VERDICT r15 #2 — the learned tier
    * re-trained inside every declared execution; this is its
    * train-once/serve-many leg, the [[ensureIvfPqIndex]] discipline for
    * model weights): `train` runs AT MOST ONCE per (JVM, corpus dir,
    * modelName, paramsToken) and its bounded weight table is persisted
    * as plain parquet; every subsequent caller pays a bounded parquet
    * read instead of the training loop. At 100 TB that is the
    * difference between a retrain-per-query and a parquet read — the
    * model artifact IS a table, versioned/shipped like any layout leg.
    * `paramsToken` must encode every training hyperparameter that
    * changes the weights (it keys the cache). */
  def ensureModel(spark: SparkSession, dir: String, modelName: String,
                  paramsToken: String)(train: => DataFrame): String = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-model-" +
      s"${ProcessHandle.current().pid()}/" +
      s"${modelName}_${SourceKeys.dirToken(dir)}_$paramsToken"
    preparedModels.computeIfAbsent(path, { p =>
      train.write.mode("overwrite").parquet(p)
      p
    })
  }

  /** Probe-side read of an [[ensurePostings]] layout: the partition
    * filter is built from DRIVER-computed [[tokenPartOf]] literals, so
    * Catalyst prunes non-matching directories at planning time
    * (`PartitionFilters` in the scan — PlanLint-pinned via q158); the
    * residual `token IN (...)` predicate pushes into the parquet reader
    * within the surviving directories. Returns (token, doc_id, pos) —
    * [[graft.operators.Retrieval.invertedIndex]]'s schema. */
  def prunedPostings(spark: SparkSession, path: String,
                     tokens: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    require(tokens.nonEmpty, "prunedPostings needs at least one token")
    val parts = tokens.distinct.map(tokenPartOf).distinct
    val pruned = spark.read.parquet(path)
      .filter(col("tok_part").isin(parts: _*) &&
        col("token").isin(tokens.distinct: _*))
    // tombstone visibility ([[deleteFromPostings]]): deleted docs
    // vanish from the posting stream before the phrase algebra;
    // tombstone-free layouts plan exactly as before
    postingsDeletes(spark, path).fold(pruned)(d =>
        pruned.join(broadcast(d), Seq("doc_id"), "left_anti"))
      .select(col("token"), col("doc_id"), col("pos"))
  }

  private def versionOf(p: java.nio.file.Path): Option[Long] = {
    val n = p.getFileName.toString
    if (n.startsWith("v")) n.drop(1).toLongOption else None
  }

  /** Latest committed state version under `stateDir`, if any. */
  def latestVersion(stateDir: String): Option[Long] = {
    val dir = Paths.get(stateDir)
    if (!Files.isDirectory(dir)) None
    else {
      val it = Files.list(dir)
      try {
        val vs = it.iterator()
        var best = Option.empty[Long]
        while (vs.hasNext) versionOf(vs.next()).foreach { v =>
          if (best.forall(_ < v)) best = Some(v)
        }
        best
      } finally it.close()
    }
  }

  /** Read the latest state version (None when uninitialized). */
  def readState(spark: SparkSession, stateDir: String): Option[DataFrame] =
    latestVersion(stateDir).map(v => spark.read.parquet(s"$stateDir/v$v"))

  /** W2/W3: upsert `incoming` into the stored state — union + PK
    * keep-winner (highest version value, incoming beats existing on ties)
    * — and commit as the next version directory. Returns the new state.
    * Writing a NEW directory (never in-place) keeps readers of the old
    * version consistent — the parquet analog of the reference's
    * transactional ON CONFLICT statement.
    *
    * `evict` is the compaction hook: merged rows matching the predicate
    * are dropped before the write, so a caller with a retention rule
    * (epoch age, event-time TTL) keeps the state table bounded instead
    * of growing per merge forever. Eviction runs AFTER the keep-winner
    * merge, so a row that was just refreshed by `incoming` survives under
    * its new version value. The predicate must be a deterministic
    * function of the row and the caller's version watermark — then a
    * replayed merge evicts identically and stays content-idempotent. */
  def mergeState(spark: SparkSession, stateDir: String, incoming: DataFrame,
                 pk: Seq[String], version: Column,
                 evict: Option[Column] = None): DataFrame = {
    val next = latestVersion(stateDir).getOrElse(-1L) + 1
    val merged = readState(spark, stateDir) match {
      case Some(existing) => Upsert.merge(existing, incoming, pk, version)
      case None => Upsert.keepFirst(incoming, pk, Seq(version.desc))
    }
    val retained = evict.fold(merged)(p => merged.filter(!p))
    retained.write.mode("overwrite").parquet(s"$stateDir/v$next")
    spark.read.parquet(s"$stateDir/v$next")
  }
}
