package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Retrieval, Sampling}

/** BM25 retrieval scoring (operators.Retrieval) and source-mixture
  * weighting (operators.Sampling.mixtureWeights). Expected values are
  * hand-computed outside Spark with the same rounding contract
  * (HALF_UP at the documented scales).
  */
class RetrievalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a"),   // dl=3, tf(a)=2
    (2L, "b c"),     // dl=2, tf(c)=1
    (3L, "c c c")    // dl=3, tf(c)=3
  ).toDF("doc_id", "text")

  test("bm25 matches hand-computed scores (k1=1.2, b=0.75)") {
    // N=3, avgdl=round(8/3,6); df(a)=1, df(c)=2;
    // idf(a)=round(ln(2.5/1.5+1),8), idf(c)=round(ln(1.5/2.5+1),8)
    val got = Retrieval.bm25(docs, "doc_id", split(col("text"), " "),
      Seq("a", "c"))
      .select("doc_id", "n_terms", "bm25")
      .as[(Long, Long, Double)].collect().toList.sortBy(_._1)
    assert(got == List(
      (1L, 1L, 1.302837),
      (2L, 1L, 0.523548),
      (3L, 1L, 0.71931)))
  }

  test("bm25 counts matched terms and drops no-match docs") {
    val got = Retrieval.bm25(docs, "doc_id", split(col("text"), " "),
      Seq("a", "b", "z"))
      .select("doc_id", "n_terms").as[(Long, Long)].collect().toList.sortBy(_._1)
    // doc1 matches a+b, doc2 matches b, doc3 matches nothing ('z' never occurs)
    assert(got == List((1L, 2L), (2L, 1L)))
  }

  test("bm25 ranks a rarer term above a common one at equal tf and dl") {
    // 'rare' in 1 of 4 docs, 'common' in 3 of 4; probe docs have tf=1 and
    // identical length, so the idf difference alone orders the scores.
    val corpus = Seq(
      (1L, "rare x"), (2L, "common x"), (3L, "common x"), (4L, "common x")
    ).toDF("doc_id", "text")
    val scores = Retrieval.bm25(corpus, "doc_id", split(col("text"), " "),
      Seq("rare", "common"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    assert(scores(1L) > scores(2L))
    assert(scores(2L) == scores(3L))
  }

  test("bm25 properties: tf raises score with saturation; length normalizes down") {
    // four docs, one probe term; same df/avgdl context for all
    val corpus = Seq(
      (1L, "q x x x"),          // tf=1, dl=4
      (2L, "q q x x"),          // tf=2, dl=4
      (3L, "q q q x"),          // tf=3, dl=4
      (4L, "q x x x x x x x")   // tf=1, dl=8 — longer doc, same tf as doc1
    ).toDF("doc_id", "text")
    val s = Retrieval.bm25(corpus, "doc_id", split(col("text"), " "), Seq("q"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    // monotone in tf...
    assert(s(1L) < s(2L) && s(2L) < s(3L))
    // ...but saturating (k1 bounds the tf contribution): the 2nd
    // occurrence adds less than the 1st
    assert(s(3L) - s(2L) < s(2L) - s(1L))
    // longer doc with equal tf scores lower (b-weighted length norm)
    assert(s(4L) < s(1L))
  }

  test("bm25Batch: one corpus pass scores every query like per-query bm25") {
    val corpus = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val probe = Seq(
      (1L, Seq("join", "filter", "scan")),
      (2L, Seq("hash", "batch")),
      (3L, Seq("no_such_token_anywhere"))
    ).toDF("qid", "terms")
    val batch = Retrieval.bm25Batch(corpus, "doc_id", split(col("text"), " "),
      probe, "qid", col("terms"))
      .select("qid", "doc_id", "n_terms", "bm25")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3, r._4)).toSet).toMap
    for ((qid, terms) <- Seq(1L -> Seq("join", "filter", "scan"),
                             2L -> Seq("hash", "batch"))) {
      val single = Retrieval.bm25(corpus, "doc_id", split(col("text"), " "), terms)
        .select("doc_id", "n_terms", "bm25")
        .as[(Long, Long, Double)].collect().toSet
      assert(batch(qid) == single, s"batch != single for query $qid")
    }
    // a query whose terms match nothing yields no rows, not zeros
    assert(!batch.contains(3L))
  }

  test("bm25StoredBatch: one pruned index scan scores every query like " +
    "live bm25Batch AND like per-query bm25Stored") {
    import graft.sources.Writers
    val dir = "/root/testdata/sf0.001"
    val corpus = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val batchTerms = Seq(
      (1L, Seq("join", "filter", "scan")),
      (2L, Seq("hash", "batch")),
      (3L, Seq("no_such_token_anywhere")))
    val path = Writers.ensureBm25Index(spark, dir)
    val union = batchTerms.flatMap(_._2).distinct
    val stored = Retrieval.bm25StoredBatch(
        Writers.prunedBm25Tf(spark, path, union),
        spark.read.parquet(s"$path/stats"), "doc_id", batchTerms)
      .select("qid", "doc_id", "n_terms", "bm25")
      .as[(Long, Long, Long, Double)].collect().toSet
    val live = Retrieval.bm25Batch(corpus, "doc_id", split(col("text"), " "),
        batchTerms.toDF("qid", "terms"), "qid", col("terms"))
      .select("qid", "doc_id", "n_terms", "bm25")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(stored.nonEmpty && stored == live)
    // per-query stored probes agree too (batch fan-out changes nothing)
    for ((qid, terms) <- batchTerms.take(2)) {
      val single = Retrieval.bm25Stored(
          Writers.prunedBm25Tf(spark, path, terms),
          spark.read.parquet(s"$path/stats"), "doc_id", terms)
        .select("doc_id", "n_terms", "bm25")
        .as[(Long, Long, Double)].collect()
        .map { case (d, n, s) => (qid, d, n, s) }.toSet
      assert(stored.filter(_._1 == qid) == single)
    }
    // misuse traps: duplicate terms within a query; qid colliding with
    // the corpus id column
    intercept[IllegalArgumentException] {
      Retrieval.bm25StoredBatch(
        Writers.prunedBm25Tf(spark, path, union),
        spark.read.parquet(s"$path/stats"), "doc_id",
        Seq((1L, Seq("join", "join"))))
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25StoredBatch(
        Writers.prunedBm25Tf(spark, path, union),
        spark.read.parquet(s"$path/stats"), "doc_id",
        batchTerms, qidCol = "doc_id")
    }
  }

  test("mixtureWeights: sqrt-scaled weights, largest-remainder targets sum to budget") {
    // one row per (source, n_tok) pair: n_tok 9/16/25 → weights 3/12, 4/12, 5/12.
    // Exact shares 250 / 333.33 / 416.67 floor to 999: the one leftover
    // row goes to the largest fractional part (z, .67) — Hamilton's method.
    val df = (Seq.fill(9)("x") ++ Seq.fill(16)("y") ++ Seq.fill(25)("z"))
      .toDF("source").withColumn("n", lit(1))
    val got = Sampling.mixtureWeights(df, col("source"), col("n"), budget = 1000L)
      .select("source", "n_docs", "n_tok", "weight", "target_rows")
      .as[(String, Long, Long, Double, Long)].collect().toList.sortBy(_._1)
    assert(got == List(
      ("x", 9L, 9L, 0.25, 250L),
      ("y", 16L, 16L, 0.333333, 333L),
      ("z", 25L, 25L, 0.416667, 417L)))
    assert(got.map(_._5).sum == 1000L)
  }

  test("mixtureWeights targets sum to budget exactly across many sources") {
    // 7 equal sources against a budget not divisible by 7: flooring alone
    // would undershoot by 6; largest-remainder hands the 6 leftover rows
    // to the 6 tie-broken-first sources and the sum is exact
    val df = (1 to 7).flatMap(i => Seq.fill(10)(s"s$i")).toDF("source")
      .withColumn("n", lit(1))
    val targets = Sampling.mixtureWeights(df, col("source"), col("n"),
        budget = 100L)
      .select("source", "target_rows").as[(String, Long)].collect().toMap
    assert(targets.values.sum == 100L)
    // equal weights → every target is 14 or 15, never wilder
    assert(targets.values.forall(t => t == 14L || t == 15L))
  }

  test("mixtureWeights upweights small sources vs their raw share") {
    val df = (Seq.fill(1)("tiny") ++ Seq.fill(99)("huge"))
      .toDF("source").withColumn("n", lit(1))
    val w = Sampling.mixtureWeights(df, col("source"), col("n"), budget = 100L)
      .select("source", "weight").as[(String, Double)].collect().toMap
    // raw share of tiny = 1%; sqrt share = 1/(1+sqrt(99)) ≈ 9.1%
    assert(w("tiny") > 0.01 && w("tiny") < w("huge"))
  }

  test("weightedSample favors heavy rows, is deterministic, and plans no full sort") {
    // 1000 rows, half weight 1, half weight 50: an unweighted 100-row
    // draw would pick ~50 heavy rows; the E-S draw must pick far more.
    val df = (0L until 1000L).map(i =>
      (i, if (i % 2 == 0) 1.0 else 50.0)).toDF("id", "w")
    val pick = Sampling.weightedSample(df, col("id"), col("w"), 100)
      .as[(Long, Double)].collect()
    assert(pick.length == 100)
    val heavy = pick.count(_._2 == 50.0)
    assert(heavy > 80, s"expected heavy-row dominance, got $heavy/100")
    // deterministic under repartitioning
    val again = Sampling.weightedSample(df.repartition(13), col("id"), col("w"), 100)
      .as[(Long, Double)].collect()
    assert(pick.map(_._1).toSet == again.map(_._1).toSet)
    // global top-k plans as TakeOrderedAndProject — never a full Sort
    val plan = Sampling.weightedSample(df, col("id"), col("w"), 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  // ---- invertedIndex / phraseSearch ---------------------------------------

  private def phraseHits(corpus: Seq[(Long, String)],
                         phrase: Seq[String]): Map[Long, (Long, Long)] = {
    val postings = Retrieval.invertedIndex(
      corpus.toDF("doc_id", "text")
        .select(col("doc_id"), split(col("text"), " ").as("toks")),
      "doc_id", col("toks"))
    Retrieval.phraseSearch(postings, "doc_id", phrase)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("phraseSearch finds every start position, overlapping included") {
    val hits = phraseHits(Seq(
      (1L, "a a a a"),        // "a a" at starts 0,1,2 — overlaps count
      (2L, "x a a y a a"),    // starts 1, 4
      (3L, "a x a"),          // no adjacent pair
      (4L, "a")),             // shorter than the phrase
      Seq("a", "a"))
    assert(hits == Map(1L -> (3L, 0L), 2L -> (2L, 1L)))
  }

  test("phraseSearch requires exact slot alignment for repeated-token phrases") {
    // "a b a": doc must hold a at s, b at s+1, a at s+2 — the repeated
    // token fans each 'a' posting into two slots, but only aligned
    // starts reach count == 3.
    val hits = phraseHits(Seq(
      (1L, "a b a b a"),      // starts 0 and 2
      (2L, "a b b a"),        // 'a b' and 'b a' but never 'a b a'
      (3L, "b a b a")),       // start 1
      Seq("a", "b", "a"))
    assert(hits == Map(1L -> (2L, 0L), 3L -> (1L, 1L)))
  }

  test("phraseSearch single-token phrase degenerates to term frequency") {
    val hits = phraseHits(Seq((1L, "c x c"), (2L, "x y")), Seq("c"))
    assert(hits == Map(1L -> (2L, 0L)))
  }

  test("invertedIndex emits 0-based positions and builds without a shuffle") {
    val postings = Retrieval.invertedIndex(
      Seq((7L, "p q p")).toDF("doc_id", "text")
        .select(col("doc_id"), split(col("text"), " ").as("toks")),
      "doc_id", col("toks"))
    assert(postings.as[(String, Long, Long)].collect().toSet ==
      Set(("p", 7L, 0L), ("q", 7L, 1L), ("p", 7L, 2L)))
    val plan = postings.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"index build must be map-only:\n$plan")
  }

  test("rankEval: first relevant rank, count at k, NULL when nothing " +
    "relevant reaches the cut, carry rides the aggregation") {
    val ranked = Seq(
      // q1: rel at ranks 2 and 4 (4 is beyond k=3)
      (1L, "a", 1L, false), (1L, "a", 2L, true),
      (1L, "a", 3L, false), (1L, "a", 4L, true),
      // q2: nothing relevant within k
      (2L, "b", 1L, false), (2L, "b", 2L, false), (2L, "b", 3L, false),
      // q3: everything relevant
      (3L, "a", 1L, true), (3L, "a", 2L, true))
      .toDF("qid", "qlabel", "rank", "rel")
    val got = Retrieval.rankEval(ranked, "qid", col("rel"), col("rank"),
      k = 3, carry = Seq("qlabel"))
      .select("qid", "qlabel", "first_rel_rank", "n_rel_at_k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, "a", 2L, 1L),   // rank-4 hit is outside k=3
      (2L, "b", -1L, 0L),  // NULL first rank, zero hits
      (3L, "a", 1L, 2L)))
  }
}
