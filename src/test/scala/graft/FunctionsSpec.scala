package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, HashFunctions, VectorFunctions}
import graft.operators.Similarity

/** Native codegen DotProduct vs the higher-order-function form: bit-exact
  * equivalence on well-formed inputs, null propagation, codegen execution. */
class FunctionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val vecs = Seq(
    (Seq(1.5f, -2.25f, 3.125f), Seq(0.5f, 4.0f, -1.75f)),
    (Seq(0f, 0f, 0f), Seq(1f, 2f, 3f)),
    (Seq(0.1f, 0.2f, 0.3f), Seq(0.3f, 0.2f, 0.1f))
  ).toDF("a", "b")

  test("md5Window is bit-identical to the conv(substring(md5)) chain, all windows") {
    val strs = (Seq("", "a", "token", "0|word", "päällä", "日本語",
      new String(Character.toChars(0x1F600))) ++
      (1 to 200).map(i => s"s$i-${i * 37}")).toDF("s")
    (0 to 3).foreach { w =>
      val mismatches = strs.select(
        HashFunctions.md5Window(col("s"), w).as("native"),
        conv(substring(md5(col("s")), 1 + 8 * w, 8), 16, 10)
          .cast("long").as("chain"))
        .filter(col("native") =!= col("chain")).count()
      assert(mismatches == 0, s"window $w diverged from the hex chain")
    }
  }

  test("md5Window: NULL in, NULL out; SQL surface resolves") {
    GraftFunctions.register(spark)
    val r = Seq[Option[String]](Some("x"), None).toDF("s")
      .selectExpr("graft_md5_window(s) AS b", "graft_md5_window(s, 1) AS b1")
      .as[(Option[Long], Option[Long])].collect().toList
    assert(r.head._1.isDefined && r.head._2.isDefined)
    assert(r(1) == (None, None))
  }

  test("graft_md5_bucket(s, n) applies the modulus like md5Bucket") {
    GraftFunctions.register(spark)
    val mismatches = (1 to 50).map(i => s"k$i").toDF("s")
      .select(
        expr("graft_md5_bucket(s, 4096)").as("sql"),
        HashFunctions.md5Bucket(col("s"), 4096).as("col"))
      .filter(col("sql") =!= col("col")).count()
    assert(mismatches == 0)
  }

  test("dotNative is bit-identical to the aggregate/zip_with dot") {
    val got = vecs.select(
      VectorFunctions.dotNative(col("a"), col("b")).as("native"),
      Similarity.dot(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    got.foreach { case (n, h) => assert(n == h) }
  }

  test("interpreted eval agrees with codegen") {
    // eval path: use the expression inside an aggregation filter context
    // that falls back to interpreted mode via a literal frame
    val row = vecs.limit(1)
      .select(VectorFunctions.dotNative(col("a"), col("b"))).as[Double].head()
    val expected = 1.5 * 0.5 + (-2.25) * 4.0 + 3.125 * (-1.75)
    assert(row == expected)
  }

  test("null input propagates to null") {
    val df = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]])).toDF("a", "b")
    val got = df.select(VectorFunctions.dotNative(col("a"), col("b")))
      .collect().head
    assert(got.isNullAt(0))
  }

  test("ragged arrays yield null in BOTH forms (shared oracle contract)") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f))).toDF("a", "b")
    val got = df.select(
      VectorFunctions.dotNative(col("a"), col("b")).as("native"),
      Similarity.dot(col("a"), col("b")).as("hof")).collect().head
    assert(got.isNullAt(0) && got.isNullAt(1))
  }

  test("lookupSumsNative ≡ k independent lookupSumNative columns; " +
    "NULL on out-of-range/null-element/ragged-flat; empty gives k zeros") {
    val w0 = Seq(10L, 20L, 30L)
    val w1 = Seq(1L, 2L, 3L)
    val flat = Seq(10L, 1L, 20L, 2L, 30L, 3L) // bucket-major interleave
    val df = Seq(
      Seq(0L, 2L, 2L),          // in range
      Seq.empty[Long],          // empty -> zeros
      Seq(0L, 3L),              // out of range -> NULL
      Seq(-1L)                  // negative -> NULL
    ).toDF("f")
    val got = df.select(
      VectorFunctions.lookupSumsNative(col("f"), typedLit(flat), 2).as("m"),
      VectorFunctions.lookupSumNative(col("f"), typedLit(w0)).as("s0"),
      VectorFunctions.lookupSumNative(col("f"), typedLit(w1)).as("s1"))
      .collect()
    got.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0))
      else {
        val m = r.getSeq[Long](0)
        assert(m == Seq(r.getLong(1), r.getLong(2)))
      }
    }
    assert(got(1).getSeq[Long](0) == Seq(0L, 0L))
    // flat length not a multiple of k -> NULL (loud, never a silent sum)
    val ragged = df.limit(1)
      .select(VectorFunctions.lookupSumsNative(
        col("f"), typedLit(Seq(1L, 2L, 3L)), 2))
      .collect().head
    assert(ragged.isNullAt(0))
    // null index element -> NULL
    val nullElem = Seq(Seq(Some(0L), None)).toDF("f")
      .select(VectorFunctions.lookupSumsNative(
        col("f"), typedLit(flat), 2)).collect().head
    assert(nullElem.isNullAt(0))
    // pathological huge index: (j + 1) * k overflows Long and would
    // bypass a product-form range check into an out-of-bounds
    // UnsafeArrayData read (ADVICE r15) — must be NULL, never garbage
    val huge = Seq(Seq(Long.MaxValue - 1), Seq(Long.MaxValue / 2)).toDF("f")
      .select(VectorFunctions.lookupSumsNative(
        col("f"), typedLit(flat), 2)).collect()
    assert(huge.forall(_.isNullAt(0)))
  }

  test("graft_dot is SQL-callable after registration") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      """SELECT graft_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
                          CAST(array(3.0, 4.0) AS ARRAY<FLOAT>))""")
      .as[Double].head()
    assert(got == 11.0)
  }

  test("graft_xml_fields / graft_xml_labeled_links are SQL-callable") {
    graft.functions.GraftFunctions.register(spark)
    val xml = "<doc><t>A</t><a href=\"/x.pdf\">ver</a><a href=\"/x.pdf\">dup</a></doc>"
    val got = spark.sql(
      s"""SELECT graft_xml_fields('$xml', '/doc/t/text()', '//a/@href') AS f,
                 to_json(graft_xml_labeled_links('$xml', '//a', 'href', 'text')) AS links""")
      .selectExpr("f.p0[0] AS t", "size(f.p1) AS n_hrefs", "links")
      .as[(String, Int, String)].head()
    assert(got == ("A", 2, """[{"label":"ver","url":"/x.pdf"}]"""))
    // path arguments must be literals (they configure the compiled plan)
    val err = intercept[Exception] {
      spark.sql(s"SELECT graft_xml_fields('$xml', concat('/d', 'oc'))").collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("media header expressions are SQL-callable after registration") {
    graft.functions.GraftFunctions.register(spark)
    // 3x2 PNG (IHDR width/height at fixed offsets) and a bare MP3 frame
    val png = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0, 3, 0, 0, 0, 2).map(_.toByte)
    val mp3 = Array(0xff, 0xfb, 0x90, 0x00).map(_.toByte) ++
      new Array[Byte](1596)
    val got = Seq((png, mp3)).toDF("png", "mp3")
      .createOrReplaceTempView("media_sql")
    val row = spark.sql(
      """SELECT CAST(shiftright(graft_image_dims(png), 24) & 16777215 AS INT) AS w,
                CAST(graft_image_dims(png) & 16777215 AS INT) AS h,
                CAST(shiftright(graft_mp3_info(mp3), 24) AS INT) AS rate,
                graft_wav_info(png) AS not_wav,
                graft_mp4_info(png) AS not_mp4,
                graft_mkv_info(png) AS not_mkv,
                graft_mkv_audio_info(png) AS not_mkv_audio,
                graft_flac_info(png) AS not_flac,
                graft_ogg_info(png) AS not_ogg,
                graft_avi_info(png) AS not_avi
         FROM media_sql""").collect().head
    assert(row.getInt(0) == 3 && row.getInt(1) == 2 && row.getInt(2) == 44100)
    (3 to 9).foreach(i => assert(row.isNullAt(i)))
    // arity is validated at the registry boundary
    val err = intercept[Exception] {
      spark.sql("SELECT graft_mp3_info(X'00', X'00')").collect()
    }
    assert(err.getMessage.contains("1 argument"))
  }

  test("XorFingerprint aggregator: order-insensitive, partial-merge-safe") {
    import graft.functions.XorFingerprint
    val df = Seq(("g", "a"), ("g", "b"), ("g", "c"), ("h", "a")).toDF("k", "v")
      .repartition(4) // force partial aggregation across partitions
      .select(col("k"), XorFingerprint.rowHash60(col("v")).as("h"))
    val fwd = df.groupBy("k").agg(XorFingerprint.agg(col("h")).as("x"))
      .as[(String, Long)].collect().toMap
    val rev = df.orderBy(col("h").desc).groupBy("k")
      .agg(XorFingerprint.agg(col("h")).as("x"))
      .as[(String, Long)].collect().toMap
    assert(fwd == rev)           // order-insensitive
    assert(fwd("g") != fwd("h")) // discriminates different groups
  }

  test("cosineNative matches Similarity.cosine after rounding") {
    val nonZero = Seq(
      (Seq(1.5f, -2.25f, 3.125f), Seq(0.5f, 4.0f, -1.75f)),
      (Seq(0.1f, 0.2f, 0.3f), Seq(0.3f, 0.2f, 0.1f))
    ).toDF("a", "b")
    val got = nonZero.select(
      round(VectorFunctions.cosineNative(col("a"), col("b")), 6).as("n"),
      round(Similarity.cosine(col("a"), col("b")), 6).as("h"))
      .as[(Double, Double)].collect()
    got.foreach { case (n, h) => assert(n == h) }
  }
}
