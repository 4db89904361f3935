package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HtmlContent, HtmlFunctions}

/** Main-content extraction: golden pages, each keep/drop rule in
  * isolation, lexer hardening, SQL registration, and never-throws fuzz
  * (corrupt markup is data, not a task failure). */
class HtmlContentSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val para = "this paragraph has clearly more than twenty five characters"

  test("golden page: chrome dropped, prose kept, counts exact") {
    val html =
      """<html><head><title>Ignored Title</title>
        |<style>p { margin: 0 }</style>
        |<script>if (1<2) { var x = '<p>not a tag</p>'; }</script></head>
        |<body>
        |<header><h1>Site Name</h1></header>
        |<nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a></li></ul></nav>
        |<div class="menu"><a href="/1">first</a> <a href="/2">second</a> <a href="/3">third</a> <a href="/4">fourth</a></div>
        |<main>
        |<p>this paragraph has clearly more than twenty five characters</p>
        |<p>short one</p>
        |<p>a prose block mentioning <a href="/ref">one link</a> inside a longer sentence</p>
        |</main>
        |<div class="foot">(c) 2026 Example Corp</div>
        |<footer><a href="/tos">Terms</a> &middot; <a href="/p">Privacy</a></footer>
        |</body></html>""".stripMargin
    val (text, kept, blocks) = HtmlContent.extract(html)
    // blocks: menu div, three <p>s, foot div — header/nav/footer/head are
    // drop containers and contribute none
    assert(blocks == 5, s"blocks=$blocks text=$text")
    // kept: para 1 (long, no links) and para 3 (long, link density
    // 8/70 < 1/3); menu is pure links, "short one" is under 25 chars,
    // foot div is 21 chars
    assert(kept == 2)
    assert(text ==
      "this paragraph has clearly more than twenty five characters\n" +
        "a prose block mentioning one link inside a longer sentence")
  }

  test("link-density rule: exactly one third keeps, above drops") {
    // 30 text chars of which 10 inside <a>: 3*10 <= 30 → kept
    val border = "<p><a>aaaaaaaaaa</a>bbbbbbbbbbbbbbbbbbbb</p>"
    assert(HtmlContent.extract(border)._2 == 1)
    // 31 link chars of 33: dropped
    val dense = "<p><a>aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa</a>bb</p>"
    assert(HtmlContent.extract(dense) == (("", 0, 1)))
  }

  test("min-length rule: 25 keeps, 24 drops") {
    assert(HtmlContent.extract("<p>" + "x" * 25 + "</p>")._2 == 1)
    assert(HtmlContent.extract("<p>" + "x" * 24 + "</p>") == (("", 0, 1)))
  }

  test("whitespace collapses; entities decode; unknown entity is literal") {
    val (t, _, _) = HtmlContent.extract(
      "<p>  alpha\n\t beta&nbsp;&amp;&nbsp;gamma &#65;&#x42; &undefined; delta  longer than threshold</p>")
    assert(t == "alpha beta & gamma AB &undefined; delta longer than threshold")
  }

  test("nested drop containers and stray close tags stay balanced") {
    val html = "<nav><div>deep <a>menu</a> text</div></nav>" +
      "</style></script>" + // stray raw-text closes must not unbalance
      s"<p>$para</p>" +
      "<aside><aside>x</aside>deeper</aside>" +
      s"<p>$para</p>"
    val (t, kept, blocks) = HtmlContent.extract(html)
    assert(kept == 2 && blocks == 2)
    assert(t == s"$para\n$para")
  }

  test("quoted '>' inside attributes and self-closing drop tags") {
    val html = s"""<div data-x="a > b" title='1 > 2'>$para</div>""" +
      s"""<iframe src="/x"/><p>$para</p>"""
    val (t, kept, _) = HtmlContent.extract(html)
    assert(kept == 2, s"got $t")
  }

  test("raw-text bodies are opaque: tags and '<' inside script/style/textarea") {
    val html = "<script>for(var i=0;i<10;i++){document.write('<div><a>x</a></div>')}</script>" +
      "<textarea>user typed <p>stuff</p> here</textarea>" +
      s"<p>$para</p><style>a:hover { content: '</p>' }</style>"
    val (t, kept, blocks) = HtmlContent.extract(html)
    assert((kept, blocks) == ((1, 1)), s"got $t")
    assert(t == para)
  }

  test("bare '<' before a non-letter is text; unclosed markup never throws") {
    assert(HtmlContent.extract(s"<p>3 < 5 and x <= y $para</p>")._1 ==
      s"3 < 5 and x <= y $para")
    assert(HtmlContent.extract("<p>unterminated " + para)._1.nonEmpty)
    assert(HtmlContent.extract("<script>never closed " + para)._1 == "")
    assert(HtmlContent.extract("<!-- never closed " + para) == (("", 0, 0)))
  }

  test("expression + SQL registration round-trip") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((1L, s"<nav><a href='/'>Home</a></nav><p>$para</p>"), (2L, null))
      .toDF("id", "html")
    val viaColumn = df.select(col("id"),
        HtmlFunctions.mainContent(col("html")).as("m"))
      .select(col("id"), col("m.text"), col("m.kept"), col("m.blocks"))
      .as[(Long, Option[String], Option[Int], Option[Int])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    assert(viaColumn(1L) == ((Some(para), Some(1), Some(1))))
    assert(viaColumn(2L) == ((None, None, None))) // NULL in → NULL out
    df.createOrReplaceTempView("html_pages")
    val viaSql = spark.sql(
      "SELECT id, graft_main_content(html).kept AS k FROM html_pages")
      .as[(Long, Option[Int])].collect().toMap
    assert(viaSql == Map(1L -> Some(1), 2L -> None))
  }

  test("fuzz: extract never throws on arbitrary strings (2000 cases)") {
    val rnd = new scala.util.Random(1105)
    val alphabet = "<>&;/=\"' abAB#!-ps{}\né😀"
    (1 to 2000).foreach { _ =>
      val s = (1 to rnd.nextInt(300)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val (t, kept, blocks) = HtmlContent.extract(s)
      assert(kept <= blocks)
      assert(t.length >= 0)
    }
    // seeded with structure so the lexer gets past the signature paths
    (1 to 500).foreach { _ =>
      val bits = Seq("<p>", "</p>", "<nav>", "</nav>", "<a href='x'>",
        "</a>", "<script>", "</script>", "&amp;", "&#", "<!--", "-->",
        "text words here", "<", ">", "<div", "='>'", "/>")
      val s = (1 to rnd.nextInt(30)).map(_ => bits(rnd.nextInt(bits.size))).mkString
      HtmlContent.extract(s)
    }
  }
}
