package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus retrieval scoring — SURVEY §2.9 L4 extended. BM25 is the
  * standard lexical-relevance score a training-data pipeline uses to rank
  * corpus documents against a probe query (quality-targeted subset
  * selection, retrieval-augmented dedup triage). Same distributed shape as
  * tf-idf (q71) / the unigram LM (q97): one explode → two partial
  * aggregates → broadcast joins of the tiny term/corpus statistics.
  */
object Retrieval {

  /** Okapi BM25 score of every document containing at least one query
    * term.
    *
    * Plan shape (scale path): per-doc length is `size(tokens)` and each
    * term's tf is `size(filter(tokens, _ === term))` — both row-local
    * expressions, so the corpus is NEVER exploded token-wise (a probe
    * query has bounded terms; scanning the token array |terms| times per
    * row is cheap, exploding ~avgdl rows per doc is not). The generator
    * emits ≤ |queryTerms| (term, tf) rows per doc, tf=0 dropped at the
    * map side; each term's df is a count window over the SAME hit
    * stream (re-aggregating it from a separate branch would rescan the
    * corpus — Spark reuses no un-materialized subtree across branches);
    * the 1-row corpus stats are broadcast. Two corpus scans total
    * (hits + stats), and the only shuffles are over the ≤ |terms|
    * rows/doc hit stream. No driver-side collection.
    *
    * Engine-parity notes (mirrored in the DuckDB oracle): the idf log is
    * rounded to 8 decimals before use (libm vs JVM `Math.log` differ in
    * the last ulp); per-term scores are rounded to 6 and summed in
    * DECIMAL so association order cannot matter; `avgdl` goes through a
    * DECIMAL sum and one rounded division. All constants are doubles on
    * both sides ((k1+1) is passed pre-computed so neither engine
    * re-derives it in a different numeric type).
    */
  def bm25(df: DataFrame, idCol: String, tokensCol: Column,
           queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    require(queryTerms.distinct.size == queryTerms.size,
      "bm25 query terms must be distinct (duplicates double-count)")
    val base = df.select(col(idCol), tokensCol.as("__toks"),
      size(tokensCol).cast("long").as("dl"))
    val st = base.agg(
      count(lit(1)).as("n_docs"),
      round(sum(col("dl").cast("decimal(28,6)")).cast("decimal(28,6)")
        .cast("double") / count(lit(1)), 6).as("avgdl"))
    val tf = base.select(col(idCol), col("dl"),
      explode(array(queryTerms.map(t => struct(
        lit(t).as("token"),
        size(filter(col("__toks"), x => x === t)).cast("long").as("tf"))): _*))
        .as("qt"))
      .select(col(idCol), col("dl"),
        col("qt.token").as("token"), col("qt.tf").as("tf"))
      .filter(col("tf") > 0)
    bm25Score(tf, st, idCol, k1, b)
  }

  /** The per-(doc, matched term) scoring stage every BM25 form shares:
    * takes the matched-hit table (idCol, dl, token, tf — one row per
    * (doc, matched term)) and the 1-row (n_docs, avgdl) stats, computes
    * df as a per-token count window over the hits (never a corpus
    * re-scan) and appends the rounded idf/term-score column. */
  private def bm25ScoredHits(tf: DataFrame, st: DataFrame,
                             k1: Double, b: Double): DataFrame = {
    // one row per (doc, matched term) → the per-token window count IS
    // the distinct-doc df, computed without re-scanning the corpus
    val withDf = tf.withColumn("df", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("token"))))
    val idf = round(
      log((col("n_docs").cast("double") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)) + lit(1.0)), 8)
    val termScore = round(
      idf * (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl")) / col("avgdl"))),
      6)
    withDf
      .crossJoin(broadcast(st))
      .withColumn("term_score", termScore)
  }

  /** The BM25 rank stage shared by [[bm25]] and [[bm25Stored]]:
    * [[bm25ScoredHits]] summed per document (DECIMAL sum — association
    * order cannot matter). */
  private def bm25Score(tf: DataFrame, st: DataFrame, idCol: String,
                        k1: Double, b: Double): DataFrame =
    bm25ScoredHits(tf, st, k1, b)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_terms"),
        round(sum(col("term_score").cast("decimal(28,6)")).cast("double"), 6)
          .as("bm25"))

  /** [[bm25]] against a STORED index (the Lucene deployment shape; the
    * q158/q162 layout discipline applied to the RANKED lexical tier):
    * `tf` is the pruned read of a
    * [[graft.sources.Writers.ensureBm25Index]] layout — (token, idCol,
    * tf, dl) rows for the query's tokens only, reached via md5-prefix
    * PartitionFilters + a residual token-IN pushdown — and `stats` is
    * the layout's 1-row (n_docs, avgdl) table, so a probe never touches
    * corpus text: probe IO tracks the query terms' posting mass. df
    * comes from the same per-token count window as the live form
    * (the pruned rows ARE the matched hits), and every rounding step is
    * [[bm25]]'s — stored ≡ live bit-for-bit (SourcesSpec), oracle
    * shared with q28 (layout, not semantics). */
  def bm25Stored(tf: DataFrame, stats: DataFrame, idCol: String,
                 queryTerms: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Stored needs at least one query term")
    require(queryTerms.distinct.size == queryTerms.size,
      "bm25 query terms must be distinct (duplicates double-count)")
    // re-filter by the terms even though prunedBm25Tf already does:
    // tokenPart only buckets into 256 md5-prefix directories, so a caller
    // passing a partition-filtered-but-not-token-filtered read (or the
    // raw tf layout) would otherwise count prefix-colliding tokens as
    // matched hits — inflated n_terms, wrong df windows, silently wrong
    // scores. On pruned input the predicate is the identical residual
    // pushdown, a plan-level no-op (ADVICE r16).
    bm25Score(
      tf.filter(col("token").isin(queryTerms.distinct: _*))
        .select(col(idCol), col("dl"), col("token"), col("tf")),
      stats, idCol, k1, b)
  }

  /** [[bm25]] for a whole TABLE of queries — retrieval for a training
    * batch, where per-query jobs would be a driver-side loop. Returns
    * (qidCol, idCol, n_terms, bm25), scores identical to running
    * [[bm25]] per query (same rounding contract at every step, and a
    * term's corpus df doesn't depend on which queries ask for it).
    *
    * Plan shape: the query terms explode to a (qid, token) table —
    * query-sized, never corpus-sized — whose DISTINCT term set
    * broadcast-semi-joins the exploded corpus token stream, so only
    * tokens matching SOME query's term survive the map side. Here the
    * corpus IS exploded token-wise: with a query table the probe set
    * isn't known at plan time, so [[bm25]]'s row-local tf columns can't
    * be built — the broadcast semi-join prunes the stream instead. tf
    * is one keyed aggregation over survivors, df a per-token count
    * window over tf, and per-(qid, doc) scores come from broadcasting
    * the small (qid, token) table into the scored hits. No driver-side
    * collection at any step. */
  def bm25Batch(df: DataFrame, idCol: String, tokensCol: Column,
                queries: DataFrame, qidCol: String, termsCol: Column,
                k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // the (qid, token) table joins the scored corpus hits — a query id
    // column named like the corpus id would be silently ambiguous
    require(qidCol != idCol,
      s"query id column must differ from corpus id column (both '$idCol') — alias one")
    val qterms = queries
      .select(col(qidCol), explode(termsCol).as("token")).distinct()
    val termSet = qterms.select(col("token")).distinct()
    val base = df.select(col(idCol), tokensCol.as("__toks"),
      size(tokensCol).cast("long").as("dl"))
    val st = base.agg(
      count(lit(1)).as("n_docs"),
      round(sum(col("dl").cast("decimal(28,6)")).cast("decimal(28,6)")
        .cast("double") / count(lit(1)), 6).as("avgdl"))
    val hits = base
      .select(col(idCol), col("dl"), explode(col("__toks")).as("token"))
      .join(broadcast(termSet), Seq("token"), "left_semi")
    val tf = hits.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    bm25ScoredHits(tf, st, k1, b)
      .join(broadcast(qterms), Seq("token"))
      .groupBy(col(qidCol), col(idCol))
      .agg(
        count(lit(1)).as("n_terms"),
        round(sum(col("term_score").cast("decimal(28,6)")).cast("double"), 6)
          .as("bm25"))
  }

  /** [[bm25Batch]] against a STORED index (VERDICT r16 #4 — q142
    * answers a query TABLE against the live corpus, q169 answers ONE
    * query against the stored layout; this is the batch deployment
    * shape, the q168 move applied to the lexical tier): `queryTerms`
    * is the bounded driver-known training batch (the q168 routing-batch
    * contract — per-query term lists, each distinct), `tf` the pruned
    * read of the UNION term set's directories
    * ([[graft.sources.Writers.prunedBm25Tf]] over
    * `queryTerms.flatMap(_._2).distinct`) — ONE pruned scan serves the
    * whole batch; per-(doc, term) scores are computed once over the
    * shared hit stream (a term's df/idf/term-score don't depend on
    * which queries ask for it) and fanned out to queries through the
    * broadcast (qid, token) table. Scores ≡ running [[bm25Stored]] per
    * query at every rounding step; oracle shared with q142 (layout,
    * not semantics). The term re-filter is [[bm25Stored]]'s misuse
    * trap: on pruned input it is the identical residual pushdown. */
  def bm25StoredBatch(tf: DataFrame, stats: DataFrame, idCol: String,
                      queryTerms: Seq[(Long, Seq[String])],
                      qidCol: String = "qid",
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25StoredBatch needs at least one query")
    queryTerms.foreach { case (qid, ts) =>
      require(ts.nonEmpty && ts.distinct.size == ts.size,
        s"query $qid terms must be non-empty and distinct " +
          "(duplicates double-count)") }
    require(qidCol != idCol,
      s"query id column must differ from corpus id column (both '$idCol')")
    val allTerms = queryTerms.flatMap(_._2).distinct
    val spark = tf.sparkSession
    import spark.implicits._
    val qterms = queryTerms.flatMap { case (q, ts) => ts.map((q, _)) }
      .toDF(qidCol, "token")
    bm25ScoredHits(
        tf.filter(col("token").isin(allTerms: _*))
          .select(col(idCol), col("dl"), col("token"), col("tf")),
        stats, k1, b)
      .join(broadcast(qterms), Seq("token"))
      .groupBy(col(qidCol), col(idCol))
      .agg(
        count(lit(1)).as("n_terms"),
        round(sum(col("term_score").cast("decimal(28,6)")).cast("double"), 6)
          .as("bm25"))
  }

  /** Positional postings table — the inverted index every lexical
    * retrieval system stores: one row per token occurrence, `(token,
    * idCol, pos)` with 0-based positions. Built in one map-only pass
    * (a posexplode, no shuffle); at corpus scale the index is written
    * ONCE partitioned/bucketed by `token` (Writers.ensurePartitioned —
    * q131's directory-pruning leg), so a phrase probe's scan prunes to
    * the phrase's tokens and never touches the rest of the corpus. */
  def invertedIndex(df: DataFrame, idCol: String, tokensCol: Column): DataFrame =
    df.select(col(idCol), posexplode(tokensCol).as(Seq("pos", "token")))
      .select(col("token"), col(idCol), col("pos").cast("long").as("pos"))

  /** Exact phrase search over a positional postings table: a document
    * matches at start `s` when `token(s + i) == phrase(i)` for every i —
    * ALL start positions count, overlapping included (the standard
    * positional-index contract; "aaa" matches "aa" twice).
    *
    * Distributed form (one aligned-start aggregation, never a k-way
    * positional self-join): postings are filtered to the phrase's tokens
    * (on a stored token-partitioned index this is partition pruning, not
    * a scan), each surviving posting emits `(id, pos − i)` for every
    * phrase slot i its token fills (fan-out ≤ the phrase's repeat count,
    * bounded by |phrase|), and a start matches iff its (id, start) group
    * holds exactly k slot-hits — each slot can hit a given start at most
    * once (the posting at `start + i` is unique), so `count == k` is the
    * full conjunction. Two keyed shuffles over phrase-hit rows only;
    * corpus-sized work is the pruned posting scan.
    *
    * Returns one row per matching document: `(idCol, n_matches,
    * first_pos)`. */
  def phraseSearch(postings: DataFrame, idCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch needs a non-empty phrase")
    val k = phrase.length
    val slots = array(phrase.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("t"), lit(i.toLong).as("i")) }: _*)
    postings
      .filter(col("token").isin(phrase.distinct: _*))
      .select(col(idCol), col("pos"),
        explode(filter(slots, e => e.getField("t") === col("token"))).as("m"))
      .select(col(idCol), (col("pos") - col("m").getField("i")).as("__start"))
      .filter(col("__start") >= 0)
      .groupBy(col(idCol), col("__start"))
      .agg(count(lit(1)).as("__nhit"))
      .filter(col("__nhit") === k)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matches"),
        min(col("__start")).as("first_pos"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of two
    * ranked candidate lists — the standard hybrid-retrieval combiner
    * (lexical BM25 list ⊕ vector ANN list) that needs no score
    * calibration because it consumes RANKS: fused = Σ 1/(c + rank),
    * absent-from-a-list contributing 0.
    *
    * Scale shape: inputs are each system's TOP-N list (the practical
    * contract — rank the bounded heads, not the corpora), so the full
    * outer join and everything after run on ≤ 2N rows. Parity: ranks
    * are exact integers and the fused score is a two-term sum of
    * correctly-rounded IEEE divisions in fixed written order —
    * bit-identical cross-engine with no rounding step to disagree on
    * (the q111 lesson). Output: (id, rankA, rankB, rrf). */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
              rankA: String, rankB: String, c: Double = 60.0): DataFrame =
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol), col(rankA), col(rankB),
        (coalesce(lit(1.0) / (lit(c) + col(rankA)), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col(rankB)), lit(0.0))).as("rrf"))

  /** [[rrfFuse]] for a BATCH of queries: the full-outer join keys on
    * (qidCol, idCol), so each query's two ranked heads fuse
    * independently in one pass — everything downstream of the bounded
    * per-query arms runs on ≤ 2·|Q|·N rows. Same parity contract as
    * [[rrfFuse]] (exact integer ranks, two correctly-rounded IEEE
    * divisions in fixed order). Output: (qidCol, idCol, rankA, rankB,
    * rrf). */
  def rrfFuseKeyed(a: DataFrame, b: DataFrame, qidCol: String,
                   idCol: String, rankA: String, rankB: String,
                   c: Double = 60.0): DataFrame =
    a.join(b, Seq(qidCol, idCol), "full_outer")
      .select(col(qidCol), col(idCol), col(rankA), col(rankB),
        (coalesce(lit(1.0) / (lit(c) + col(rankA)), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col(rankB)), lit(0.0))).as("rrf"))

  /** Retrieval-quality evaluation over a ranked candidate table — the
    * metric primitive the retrieval tier is tuned against (recall@k /
    * MRR inputs): per query, the rank of the FIRST relevant hit (NULL
    * when none lands in the top k) and the relevant count within the
    * top k. Deliberately kept in EXACT integers — the fractional
    * aggregates (MRR = avg(1/first_rel_rank), recall@k = n_rel_at_k /
    * total) are one row-local division away and left to the caller, so
    * the oracle-checked surface never leaves BIGINT arithmetic (the
    * q104 ln-lesson: fractional rank keys cost cross-engine parity).
    * `carry` names query-side columns functionally dependent on the
    * qid (a label, a query string) to ride the one keyed aggregation —
    * which runs over ≤ |Q|·k already-cut rows, never the corpus. */
  def rankEval(ranked: DataFrame, qidCol: String, relCol: Column,
               rankCol: Column, k: Int,
               carry: Seq[String] = Nil): DataFrame =
    ranked.filter(rankCol <= lit(k))
      .groupBy(col(qidCol) +: carry.map(col): _*)
      .agg(
        min(when(relCol, rankCol)).cast("long").as("first_rel_rank"),
        sum(when(relCol, lit(1L)).otherwise(lit(0L))).as("n_rel_at_k"))

  /** Spark-round-compatible round-to-6 for the driver-side greedy:
    * `BigDecimal(x).setScale(6, HALF_UP)` is exactly what Catalyst's
    * `round(_, 6)` computes on doubles, `+ 0.0` kills the −0.0 the
    * oracle comparator hash-distinguishes (q109 lesson). */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0

  /** Left-to-right float→double dot — the same accumulation order as
    * [[graft.functions.DotProduct]] and DuckDB's `list_dot_product`, so
    * driver-computed cosines land on the engine-proven parity path. */
  private def dotD(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Maximal-marginal-relevance diverse top-k (Carbonell & Goldstein
    * 1998) — the retrieval head's DEDUP-AWARE form: greedily pick the
    * next document maximizing `λ·rel − (1−λ)·max_{s∈S} sim(d, s)`, so a
    * training-data selection (or RAG context) of k documents doesn't
    * spend its budget on k near-copies of the best hit. The missing
    * piece between the similarity tier (q51/q146 rank PURE relevance)
    * and the dedup tier (q110 prunes near-dups with no query): MMR
    * trades the two off per query.
    *
    * Scale shape (the kmeans/pqAdcDense bounded-driver-state pattern):
    * relevance ranking is a corpus scan + TakeOrdered to the
    * `nCandidates`-row head; the greedy — inherently sequential, k·C
    * cosines over C collected rows — runs on the driver over that
    * bounded head ONLY (C=40 here; production C ≤ a few hundred), never
    * on the corpus. The declared output is the selected table itself
    * (the q140 LocalRelation stance).
    *
    * Parity mechanics: rel and pairwise sims are round-to-6 cosines
    * (the q61-proven chain, replicated here with the identical
    * accumulation order); the marginal score is the fixed IEEE chain
    * `λ·rel − μ·maxSim` with BOTH constants passed pre-computed (never
    * `1 − λ` at runtime — `lit(1.0 - 0.7)` is 0.30000000000000004, the
    * q103 lesson); first pick uses maxSim = 0. Ties break max-score
    * then id-ascending. An n-step DuckDB oracle replays the whole
    * greedy via materialized per-step CTEs (the q132 pattern).
    * Output: `(sel_rank, idCol, rel, mmr)` in selection order. */
  def mmrDiverseTopK(vectors: DataFrame, idCol: String, vecCol: String,
                     query: DataFrame, queryVecCol: String,
                     nCandidates: Int, k: Int,
                     lambda: Double = 0.7,
                     oneMinusLambda: Double = 0.3): DataFrame = {
    require(k >= 1 && nCandidates >= k,
      s"need nCandidates >= k >= 1 (got C=$nCandidates k=$k)")
    val spark = vectors.sparkSession
    import spark.implicits._
    import graft.functions.VectorFunctions.{dotNative, normNative}
    val qv = query.select(col(queryVecCol).as("__qvec"))
    val head = vectors
      .select(col(idCol), col(vecCol).as("__vec"))
      .filter(col("__vec").isNotNull)
      .crossJoin(broadcast(qv))
      .select(col(idCol), col("__vec"),
        (round(dotNative(col("__vec"), col("__qvec")) /
          (normNative(col("__vec")) * normNative(col("__qvec"))), 6)
          + lit(0.0)).as("__rel"))
      .filter(col("__rel").isNotNull)
      .orderBy(col("__rel").desc, col(idCol).asc)
      .limit(nCandidates)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2),
        r.getSeq[Float](1).toArray))
    val norms = head.map { case (_, _, v) => math.sqrt(dotD(v, v)) }
    val remaining = scala.collection.mutable.LinkedHashMap(
      head.zipWithIndex.map { case ((id, rel, _), i) => id -> ((rel, i)) }: _*)
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    (1 to math.min(k, head.length)).foreach { rank =>
      val (bestId, bestScore) = remaining.iterator.map { case (id, (rel, i)) =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.iterator.map { j =>
            round6(dotD(head(i)._3, head(j)._3) / (norms(i) * norms(j)))
          }.max
        (id, lambda * rel - oneMinusLambda * maxSim)
      }.minBy { case (id, s) => (-s, id) }
      val (rel, idx) = remaining.remove(bestId).get
      selected += idx
      out += ((rank, bestId, rel, bestScore))
    }
    out.toSeq.toDF("sel_rank", idCol, "rel", "mmr")
  }
}
