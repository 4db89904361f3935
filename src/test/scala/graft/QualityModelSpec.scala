package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityModel

/** Hashed n-gram linear quality scorer (operators.QualityModel). */
class QualityModelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, Seq("good", "clean", "prose")),
    (2L, Seq("spam")),
    (3L, Seq.empty[String])
  ).toDF("doc_id", "toks")

  test("features are unigrams plus adjacent bigrams — no padded tail") {
    val n = docs.select(col("doc_id"),
        size(QualityModel.featureBuckets(col("toks"), 64)).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(n == Map(1L -> 5, 2L -> 1, 3L -> 0)) // 2n-1 features
  }

  test("native one-pass featureBuckets ≡ the round-15 HOF composition, " +
    "bit for bit, on null/empty/single/duplicate-token edges") {
    val edge = Seq(
      (1L, Some(Seq(Some("good"), Some("clean"), Some("prose")))),
      (2L, Some(Seq(Some("spam")))),
      (3L, Some(Seq.empty[Option[String]])),
      (4L, None), // NULL array -> NULL result on both forms
      (5L, Some(Seq(Some("a"), None, Some("b")))), // null TOKEN element
      (6L, Some(Seq(None, None))), // all-null tokens (bigram = "")
      (7L, Some(Seq(Some("x y"), Some("x"), Some("y")))), // space inside token
      (8L, Some(Seq(Some("dup"), Some("dup"), Some("dup"))))
    ).toDF("id", "toks")
    for (buckets <- Seq(7, 64, 4096)) {
      val got = edge.select(col("id"),
          QualityModel.featureBuckets(col("toks"), buckets).as("native"),
          QualityModel.featureBucketsHof(col("toks"), buckets).as("hof"))
        .collect()
      got.foreach { r =>
        val n = if (r.isNullAt(1)) null else r.getSeq[Any](1)
        val h = if (r.isNullAt(2)) null else r.getSeq[Any](2)
        assert(n == h, s"id ${r.getLong(0)} buckets $buckets: $n != $h")
      }
    }
    // and the SQL registration resolves to the same values
    graft.functions.GraftFunctions.register(spark)
    edge.filter(col("id") === 1).createOrReplaceTempView("fb_edge")
    val viaSql = spark.sql(
      "SELECT graft_feature_buckets(toks, 64) FROM fb_edge")
      .head().getSeq[Any](0)
    val viaCol = edge.filter(col("id") === 1)
      .select(QualityModel.featureBuckets(col("toks"), 64))
      .head().getSeq[Any](0)
    assert(viaSql == viaCol)
  }

  test("score: exact integer sums, spine totality, keep/drop labels") {
    val w = QualityModel.fixtureWeights(spark, 64)
    val got = QualityModel.score(docs, "doc_id", col("toks"), w, 64)
      .orderBy("doc_id").collect()
    assert(got.length == 3)
    val r1 = got(0)
    assert(r1.getLong(r1.fieldIndex("n_feats")) == 5)
    // recompute the expected sum from the fixture formula
    val feats = Seq("good", "clean", "prose", "good clean", "clean prose")
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(f: String): Long = {
      val hex = md.digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 64
    }
    val expected = feats.map(f => (bucket(f) * 41 + 7) % 2001 - 1000).sum
    assert(r1.getLong(r1.fieldIndex("w_sum")) == expected)
    val logit = r1.getDouble(r1.fieldIndex("logit"))
    assert(math.abs(logit - expected / 5e6) < 1e-6)
    assert(r1.getString(r1.fieldIndex("label")) ==
      (if (logit > 0) "keep" else "drop"))
    // empty doc: zero features, NULL logit, drop
    val r3 = got(2)
    assert(r3.getLong(r3.fieldIndex("n_feats")) == 0)
    assert(r3.isNullAt(r3.fieldIndex("logit")))
    assert(r3.getString(r3.fieldIndex("label")) == "drop")
  }

  test("unmatched buckets score 0 (partial weight tables are tolerated)") {
    val partial = Seq((0L, 500L)).toDF("bucket", "w_micro")
    val got = QualityModel.score(docs, "doc_id", col("toks"), partial, 64)
      .filter(col("doc_id") === 1L).collect()(0)
    val wSum = got.getLong(got.fieldIndex("w_sum"))
    assert(wSum % 500 == 0) // only bucket-0 hits contribute
  }

  test("the weight table side is broadcast") {
    val w = QualityModel.fixtureWeights(spark, 64)
    val plan = QualityModel.score(docs, "doc_id", col("toks"), w, 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  // ---- fit (VERDICT r13 #3): deterministic hard-sigmoid delta-rule
  // training producing the integer table score/gate/gateInline consume

  /** Separable fixture: "good" docs share a positive token vocabulary,
    * "bad" docs a disjoint negative one — a linear model over hashed
    * unigrams can drive training error toward 0 on it. */
  private def labeledFixture = {
    val goods = Seq("clean", "prose", "article", "essay", "report")
    val bads = Seq("spam", "click", "win", "free", "pills")
    val rows = (0 until 40).map { i =>
      val voc = if (i % 2 == 0) goods else bads
      val toks = (0 until 6).map(j => voc((i + j * j) % voc.length))
      (i.toLong, toks, (i % 2 == 0).compare(false).toLong)
    }
    rows.toDF("doc_id", "toks", "y")
  }

  test("fit: training reduces mean absolute error on a separable set") {
    val df = labeledFixture
    val w0 = QualityModel.fit(df, col("toks"), col("y"), 256, iters = 0)
    val w6 = QualityModel.fit(df, col("toks"), col("y"), 256, iters = 6,
      lrDen = 16L)
    val e0 = QualityModel.meanAbsError(df, col("toks"), col("y"), w0, 256)
    val e6 = QualityModel.meanAbsError(df, col("toks"), col("y"), w6, 256)
    assert(e0 == 500000.0, s"zero weights must sit at the σ̂(0) midpoint, got $e0")
    assert(e6 < 10000.0, s"training did not converge: e0=$e0 e6=$e6")
  }

  test("fit is deterministic and its table drives score (the q109 scorer) " +
    "to label a held-out doc by its vocabulary") {
    val df = labeledFixture
    val w1 = QualityModel.fit(df, col("toks"), col("y"), 256, iters = 6,
      lrDen = 16L)
    val w2 = QualityModel.fit(df.repartition(7), col("toks"), col("y"),
      256, iters = 6, lrDen = 16L)
    assert(w1.orderBy("bucket").collect().toSeq ==
      w2.orderBy("bucket").collect().toSeq,
      "fit must be partitioning-invariant (exact integer state)")
    // held-out docs made of the training vocabularies, scored by the
    // LEARNED weights through the unchanged q109 scorer surface
    val held = Seq(
      (100L, Seq("prose", "essay", "clean", "report")),
      (101L, Seq("free", "pills", "spam", "win"))
    ).toDF("doc_id", "toks")
    val scored = QualityModel.score(held, "doc_id", col("toks"), w1, 256)
      .select("doc_id", "label").as[(Long, String)].collect().toMap
    assert(scored(100L) == "keep" && scored(101L) == "drop", scored.toString)
  }

  /** Three-language separable fixture for the multiclass tier: distinct
    * vocabularies per language, deterministic token picks. */
  private def langFixture = {
    val voc = Map(
      "aa" -> Seq("der", "die", "das", "und", "nicht"),
      "bb" -> Seq("the", "and", "not", "with", "from"),
      "cc" -> Seq("el", "la", "los", "con", "para"))
    val langs = Seq("aa", "bb", "cc")
    (0 until 60).map { i =>
      val l = langs(i % 3)
      val v = voc(l)
      (i.toLong, (0 until 6).map(j => v((i + j * j) % v.length)), l)
    }.toDF("doc_id", "toks", "lang")
  }

  test("fitMulticlass ≡ k independent binary fits (bit-identical weight " +
    "tables), partitioning-invariant (VERDICT r14 #8)") {
    val df = langFixture
    val classes = Seq("aa", "bb", "cc")
    val multi = QualityModel.fitMulticlass(df, col("toks"), col("lang"),
      classes, 256, iters = 4, lrDen = 16L)
      .as[(String, Long, Long)].collect().toSet
    val separate = classes.flatMap { c =>
      QualityModel.fit(df, col("toks"),
        (col("lang") === c).cast("long"), 256, iters = 4, lrDen = 16L)
        .as[(Long, Long)].collect().map { case (b, w) => (c, b, w) }
    }.toSet
    assert(multi == separate,
      "simultaneous one-vs-rest training diverged from sequential fits")
    val shuffled = QualityModel.fitMulticlass(df.repartition(7), col("toks"),
      col("lang"), classes, 256, iters = 4, lrDen = 16L)
      .as[(String, Long, Long)].collect().toSet
    assert(shuffled == multi, "fitMulticlass must be partitioning-invariant")
  }

  test("trained langid: predictClass argmax recovers every label on the " +
    "separable fixture; featureless docs predict NULL") {
    val df = langFixture
    val classes = Seq("aa", "bb", "cc")
    val w = QualityModel.fitMulticlass(df, col("toks"), col("lang"),
      classes, 256, iters = 6, lrDen = 16L)
    val pred = QualityModel.predictClass(df, col("toks"), w, classes, 256,
      outCol = "lang")
      .select("doc_id", "lang", "pred_lang")
      .as[(Long, String, String)].collect()
    val acc = pred.count(r => r._3 == r._2).toDouble / pred.length
    assert(acc == 1.0, s"trained langid accuracy $acc < 1.0 on the " +
      s"separable fixture: ${pred.filter(r => r._3 != r._2).toSeq}")
    val empty = Seq((999L, Seq.empty[String], "aa"))
      .toDF("doc_id", "toks", "lang")
    val p = QualityModel.predictClass(empty, col("toks"), w, classes, 256,
      outCol = "lang").select("pred_lang").as[Option[String]].head()
    assert(p.isEmpty, s"featureless doc must predict NULL, got $p")
  }

  test("gate keeps exactly the docs whose logit clears the threshold") {
    val w = QualityModel.fixtureWeights(spark, 64)
    val scored = QualityModel.score(docs, "doc_id", col("toks"), w, 64)
      .select("doc_id", "logit").as[(Long, Option[Double])].collect().toMap
    val kept = QualityModel.gate(docs, "doc_id", col("toks"), w, 64, 0.0)
      .select("doc_id").as[Long].collect().toSet
    val expected = scored.collect { case (id, Some(l)) if l > 0.0 => id }.toSet
    assert(kept == expected)
  }
}
