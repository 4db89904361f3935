package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Bpe, BpeFunctions, GraftFunctions}

/** Real BPE encoding (functions.Bpe / BpeTokens). */
class BpeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def enc(w: String, m: Seq[(String, String)] = BpeFunctions.EnMerges) =
    Bpe.encode(Bpe.table(m), w).toList

  test("golden tokenizations under the EnMerges table") {
    assert(enc("the") == List("the"))
    assert(enc("thing") == List("th", "ing"))
    assert(enc("and") == List("and"))
    // greedy order: (e,r)@4 beats (th,e)@7, so 'other' is o|th|er not o|the|r
    assert(enc("other") == List("o", "th", "er"))
    assert(enc("standing") == List("st", "and", "ing"))
    assert(enc("q") == List("q"))
    assert(enc("") == Nil)
    assert(enc("xyzzy") == List("x", "y", "z", "z", "y"))
  }

  test("within-rank merges are leftmost-non-overlapping") {
    val m = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    assert(enc("aaab", m) == List("aaab")) // aa|ab -> aaab, not a|aa|b
    assert(enc("aaa", m) == List("aa", "a"))
    assert(enc("aaaa", m) == List("aa", "aa"))
  }

  test("code-point aware: surrogate pairs stay whole symbols") {
    val emoji = new String(Character.toChars(0x1F600))
    assert(enc(emoji + "ab", Seq(("a", "b"))) == List(emoji, "ab"))
  }

  /** The plain-Scala twin of the DuckDB oracle: ONE ascending pass over
    * ranks, each rank a leftmost-non-overlapping string replace on the
    * `|sym|`-wrapped form. Valid-table equivalence with the greedy loop
    * is what q107's cross-engine hash rests on. */
  private def ascendingPass(word: String, merges: Seq[(String, String)]): List[String] = {
    var s = word.map(c => s"|$c|").mkString
    merges.foreach { case (x, y) => s = s.replace(s"|$x||$y|", s"|$x$y|") }
    val t = s.stripPrefix("|").stripSuffix("|")
    if (t.isEmpty) Nil else t.split("\\|\\|").toList
  }

  test("greedy loop == ascending nested-replace pass (valid tables, brute force)") {
    val rnd = new Random(1107)
    // random VALID tables: each merge's parts are chars or earlier outputs
    (1 to 50).foreach { _ =>
      val alphabet = "abcdeth"
      var produced = alphabet.map(_.toString).toVector
      val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var attempts = 0
      // validity needs every output string formed ONCE (chars or a unique
      // earlier output) — a string re-produced at a later rank could let a
      // late merge re-create an already-passed pair, which greedy would
      // still merge but the single ascending pass would not
      while (merges.size < 12 && attempts < 200) {
        val x = produced(rnd.nextInt(produced.length))
        val y = produced(rnd.nextInt(produced.length))
        if (!produced.contains(x + y)) {
          produced :+= x + y
          merges += ((x, y))
        }
        attempts += 1
      }
      val table = merges.toSeq
      (1 to 80).foreach { _ =>
        val w = (1 to rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        assert(enc(w, table) == ascendingPass(w, table),
          s"word=$w merges=$table")
      }
    }
  }

  test("BPE decode is piece concatenation: every encoding reconstructs its word") {
    // the round-trip a token-budget gate relies on: encode is a
    // partition of the word's code points, so decode = concat
    val rnd = new Random(1611)
    val words = List("the", "thing", "other", "standing", "xyzzy",
      new String(Character.toChars(0x1F600)) + "ab") ++
      (1 to 200).map(_ => (1 to rnd.nextInt(12))
        .map(_ => "abcdeth".charAt(rnd.nextInt(7))).mkString)
    words.foreach { w =>
      assert(enc(w).mkString == w, s"round-trip failed for '$w'")
    }
  }

  test("column expression: per-word flatten, NULL in -> NULL out") {
    val df = Seq((1L, "the thing"), (2L, null.asInstanceOf[String]))
      .toDF("id", "w")
    val got = df.select(col("id"),
        BpeFunctions.bpeTokens(col("w"), BpeFunctions.EnMerges).as("t"))
      .orderBy("id").collect()
    assert(got(0).getSeq[String](1) == Seq("the", " ", "th", "ing"))
    assert(got(1).isNullAt(1))
  }

  test("SQL surface: graft_bpe with literal merge pairs") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_bpe('thing', 't h', 'i n', 'in g') AS t")
      .collect()(0).getSeq[String](0)
    assert(got == Seq("th", "ing"))
  }

  test("non-literal merge argument is rejected") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_bpe('x', lower('T H')) AS t").collect()
    }
    assert(e.getMessage.contains("literal"))
  }
}
