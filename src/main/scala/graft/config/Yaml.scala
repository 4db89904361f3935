package graft.config

/** Minimal YAML-subset reader for graft dataset configs.
  *
  * The reference's whole config surface is YAML loaded by
  * `src/scrapers/config_loader.py:10-21` (safe_load → plain dict tree).
  * This is the Spark-side equivalent, deliberately dependency-free (the
  * build allows no new libraries): an indentation-based recursive-descent
  * parser for the subset the reference configs actually use —
  *
  *   - block maps (`key: value` / `key:` + indented block)
  *   - block lists (`- scalar` and `- key: value` map items, as in
  *     configs/classifier.yml `rules:`)
  *   - inline flow lists `[a, b, c]` (scalars only)
  *   - single/double-quoted scalars, `#` comments, blank lines
  *
  * Not supported (not used by any reference config): anchors/aliases,
  * multi-line block scalars (`|`/`>`), flow maps, tags, multi-document
  * streams. Unknown constructs fail loudly rather than misparse.
  */
object Yaml {

  sealed trait Node {
    def asMap: Vector[(String, Node)] = this match {
      case MapNode(e) => e
      case other      => sys.error(s"expected map, got $other")
    }
    def asList: Vector[Node] = this match {
      case ListNode(items) => items
      case other           => sys.error(s"expected list, got $other")
    }
    def asString: String = this match {
      case Scalar(v) => v
      case other     => sys.error(s"expected scalar, got $other")
    }
  }
  final case class Scalar(value: String) extends Node
  final case class ListNode(items: Vector[Node]) extends Node
  /** Entry order preserved — field order is semantic for projections. */
  final case class MapNode(entries: Vector[(String, Node)]) extends Node {
    def get(key: String): Option[Node] = entries.collectFirst {
      case (k, v) if k == key => v
    }
    def apply(key: String): Node =
      get(key).getOrElse(sys.error(s"missing key '$key' (have ${entries.map(_._1).mkString(", ")})"))
  }

  private final case class Line(indent: Int, text: String)

  def parse(source: String): Node = {
    val lines = source.linesIterator.zipWithIndex.flatMap { case (raw, _) =>
      val noComment = stripComment(raw)
      if (noComment.trim.isEmpty) None
      else Some(Line(noComment.takeWhile(_ == ' ').length, noComment.trim))
    }.toVector
    if (lines.isEmpty) MapNode(Vector.empty)
    else {
      val (node, next) = parseBlock(lines, 0, lines.head.indent)
      require(next == lines.length,
        s"trailing content from line ${next + 1}: '${lines(next).text}'")
      node
    }
  }

  /** The ONE quote model for every scanner in this parser (comment
    * stripping, colon finding, flow-list splitting — two contradictory
    * models in one file is how misparses breed):
    *  - a quote char OPENS a scalar only at a position where YAML allows
    *    one to start (line/value/list-item/flow-element start) — an
    *    apostrophe inside an unquoted scalar (o'brien) is plain text;
    *  - inside single quotes, `''` is the escaped-quote pair (consumed,
    *    still inside); a lone `'` closes;
    *  - inside double quotes, `\` escapes the next char (so `\"` does
    *    not close); a bare `"` closes.
    *
    * Walks `s` invoking `outside(c, i)` for every char NOT inside a
    * quoted scalar; the first call that returns true stops the scan and
    * its index is returned (-1 if none). */
  private def scanOutsideQuotes(s: String)(outside: (Char, Int) => Boolean): Int = {
    var inSingle = false; var inDouble = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inSingle) {
        if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 1 // '' escape
          else inSingle = false
        }
      } else if (inDouble) {
        if (c == '\\') i += 1 // \" (or any) escape
        else if (c == '"') inDouble = false
      } else if (c == '\'' && opensQuote(s, i)) inSingle = true
      else if (c == '"' && opensQuote(s, i)) inDouble = true
      else if (outside(c, i)) return i
      i += 1
    }
    -1
  }

  private def opensQuote(s: String, i: Int): Boolean =
    i == 0 || " :,-[".contains(s.charAt(i - 1))

  /** Drop a trailing `#` comment that is not inside quotes. */
  private def stripComment(raw: String): String = {
    val cut = scanOutsideQuotes(raw) { (c, i) =>
      c == '#' && (i == 0 || raw.charAt(i - 1).isWhitespace)
    }
    if (cut < 0) raw else raw.substring(0, cut)
  }

  /** Parse the block starting at `i` whose lines sit at exactly `indent`. */
  private def parseBlock(lines: Vector[Line], i: Int, indent: Int): (Node, Int) =
    if (lines(i).text.startsWith("- ") || lines(i).text == "-")
      parseList(lines, i, indent)
    else parseMap(lines, i, indent)

  private def parseList(lines: Vector[Line], start: Int, indent: Int): (Node, Int) = {
    val items = Vector.newBuilder[Node]
    var i = start
    while (i < lines.length && lines(i).indent == indent &&
           (lines(i).text.startsWith("- ") || lines(i).text == "-")) {
      val body = if (lines(i).text == "-") "" else lines(i).text.drop(2).trim
      if (body.isEmpty) {
        // nested block on the following deeper-indented lines; a bare '-'
        // at EOF or followed by a same/shallower-indent line is an empty
        // item, not a parent (would otherwise swallow its own siblings)
        if (i + 1 < lines.length && lines(i + 1).indent > indent) {
          val (node, next) = parseBlock(lines, i + 1, lines(i + 1).indent)
          items += node; i = next
        } else {
          items += Scalar(""); i += 1
        }
      } else if (colonIndex(body) >= 0) {
        // map item: re-interpret `- key: v` as a map entry at the dash+2
        // column, where continuation keys of the same item sit (the
        // classifier.yml `rules:` / colombia.yml `pipeline:` shape)
        val itemIndent = indent + 2
        val rewritten = lines.updated(i, Line(itemIndent, body))
        val (node, next) = parseMap(rewritten, i, itemIndent)
        items += node; i = next
      } else {
        items += Scalar(unquote(body)); i += 1
      }
    }
    (ListNode(items.result()), i)
  }

  private def parseMap(lines: Vector[Line], start: Int, indent: Int): (Node, Int) = {
    val entries = Vector.newBuilder[(String, Node)]
    var i = start
    while (i < lines.length && lines(i).indent == indent &&
           !lines(i).text.startsWith("- ")) {
      val t = lines(i).text
      val colon = colonIndex(t)
      require(colon >= 0, s"expected 'key:' line, got '$t'")
      val key = unquote(t.substring(0, colon).trim)
      val rest = t.substring(colon + 1).trim
      if (rest.nonEmpty) {
        entries += key -> parseInline(rest); i += 1
      } else if (i + 1 < lines.length && lines(i + 1).indent > indent) {
        val (node, next) = parseBlock(lines, i + 1, lines(i + 1).indent)
        entries += key -> node; i = next
      } else {
        entries += key -> Scalar(""); i += 1
      }
    }
    (MapNode(entries.result()), i)
  }

  /** First unquoted `:` that is followed by space/EOL (so URLs in quoted
    * scalars don't split). */
  private def colonIndex(t: String): Int =
    scanOutsideQuotes(t) { (c, i) =>
      c == ':' && (i == t.length - 1 || t.charAt(i + 1) == ' ')
    }

  private def parseInline(v: String): Node =
    if (v.startsWith("[") && v.endsWith("]")) {
      val inner = v.substring(1, v.length - 1).trim
      if (inner.isEmpty) ListNode(Vector.empty)
      else ListNode(splitFlow(inner).map(s => Scalar(unquote(s.trim))).toVector)
    } else Scalar(unquote(v))

  /** Split a flow-list body on commas outside quotes (same quote model
    * as every other scanner here — see [[scanOutsideQuotes]]). */
  private def splitFlow(s: String): Seq[String] = {
    val cuts = Vector.newBuilder[Int]
    scanOutsideQuotes(s) { (c, i) =>
      if (c == ',') cuts += i
      false // never stop — collect every split point
    }
    val points = cuts.result()
    val out = Seq.newBuilder[String]
    var from = 0
    points.foreach { p => out += s.substring(from, p); from = p + 1 }
    out += s.substring(from)
    out.result()
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && s.head == '"' && s.last == '"')
      unquoteDouble(s.substring(1, s.length - 1))
    else if (s.length >= 2 && s.head == '\'' && s.last == '\'')
      s.substring(1, s.length - 1).replace("''", "'")
    else if (s == "~" || s == "null") ""
    else s

  /** Single left-to-right scan — chained String.replace mis-decodes when
    * a literal backslash precedes an escape letter (input `\\n`, meaning
    * the two chars `\` `n`, must NOT collapse to a newline). */
  private def unquoteDouble(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'   => b += '"'
          case '\\'  => b += '\\'
          case 'n'   => b += '\n'
          case 't'   => b += '\t'
          case other => b += '\\'; b += other // unknown escape: keep verbatim
        }
        i += 2
      } else {
        b += c
        i += 1
      }
    }
    b.result()
  }
}
