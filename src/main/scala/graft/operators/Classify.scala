package graft.operators

import scala.util.control.NonFatal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Classification operators (SURVEY §2.6 K1–K4, reference
  * src/classifier.py:52-156 + configs/classifier.yml).
  *
  * K1 first-match rule semantics are exactly ordered CASE WHEN: the first
  * rule whose case-insensitive regex matches wins; no match → ''. K2's LLM
  * fallback is isolated behind [[BatchClient]]; the production-shaped path
  * batches calls inside `mapPartitions` (the reference batches 20 rows per
  * call, classifier.py:140-142) with per-batch failure → default label
  * (classifier.py:98-100,145). The oracle-checked stub is a pure
  * md5-bucket expression so DuckDB can replay it.
  */
object Classify {

  /** One classification rule: Java∩RE2-safe regex (use inline (?i) for
    * case-insensitivity — both engines support it) → category. */
  final case class Rule(pattern: String, category: String)

  val DefaultLabel = "otros"

  /** K1: ordered first-match rule classifier; '' when nothing matches. */
  def byRules(text: Column, rules: Seq[Rule]): Column =
    rules.foldRight(lit("")) { (r, acc) =>
      when(text.rlike(r.pattern), lit(r.category)).otherwise(acc)
    }

  /** K2 stub: deterministic md5-bucket classifier — the testable stand-in
    * for the LLM batch path, identical in Spark and ANSI SQL. Bucket =
    * position of md5's first hex digit in '0123456789abcdef' (1..16),
    * wrapped into the category list. */
  def stub(text: Column, categories: Seq[String]): Column =
    if (categories.isEmpty) lit(DefaultLabel) // no category space → default
    else element_at(
      array(categories.map(lit): _*),
      (((locate_hex(text) - 1) % categories.size) + 1).cast("int"))

  /** 1-based position of md5(text)'s first hex char — `call_function`
    * reaches the registry's Column-substr `locate` overload (the Scala
    * wrapper only takes a literal String substr). */
  private def locate_hex(text: Column): Column =
    call_function("locate", substring(md5(text), 1, 1), lit("0123456789abcdef"))

  /** Oracle-SQL fragment computing the same bucket, DuckDB dialect. */
  def stubSql(textSql: String, categories: Seq[String]): String = {
    val list = categories.map(c => s"'$c'").mkString("[", ", ", "]")
    s"$list[(((strpos('0123456789abcdef', substr(md5($textSql), 1, 1)) - 1) % ${categories.size}) + 1)::INT]"
  }

  /** K4 routing: rule-resolved rows keep their label; unresolved ('') fall
    * through to the fallback (classifier.py:125-137). */
  def route(ruleLabel: Column, fallback: Column): Column =
    coalesce(nullif(ruleLabel, lit("")), fallback)

  /** K3: domain validation — anything outside `allowed` coerced to
    * [[DefaultLabel]] (classifier.py:147-154). */
  def domainCoerce(label: Column, allowed: Seq[String]): Column =
    when(label.isin(allowed: _*), label).otherwise(lit(DefaultLabel))

  /** Classifier result cache (reference configs/classifier.yml
    * `cache_path`, a key→label JSON): rows whose key is already labeled
    * in `cache` skip the classify stage entirely; only misses run
    * `classify`. Returns (all labeled rows, refreshed cache). The cache
    * join is the same delta shape as J1 — one shuffle on the key, and at
    * scale the cache is just another keyed state table.
    * `cache` must carry exactly (key, out) with unique keys. */
  def cached(df: DataFrame, cache: DataFrame, key: String, out: String)
            (classify: DataFrame => DataFrame): (DataFrame, DataFrame) = {
    val hits = df.join(cache, Seq(key), "inner")
    val misses = classify(df.join(cache.select(key), Seq(key), "left_anti"))
    val all = hits.unionByName(misses)
    (all, all.select(key, out).distinct())
  }

  /** External batch classifier: ids+texts in, id→label out. Production
    * implementations call an LLM; tests inject deterministic fakes. */
  trait BatchClient extends Serializable {
    def classify(batch: Seq[(String, String)]): Map[String, String]
  }

  /** The reference's request prompt (classifier.py:77-90), made
    * executable so a production [[RawReplyClient]] call function only
    * supplies transport: category instruction block asking for exactly
    * the JSON array of `{"id", "label"}` records that
    * [[parseBatchReply]] parses, then one `id: text` line per row (the
    * reference renders `id: titulo -- detalle`; pass text already
    * joined with " -- " to match). Pure string assembly — batching,
    * per-batch isolation, and reply parsing stay where they are. */
  def referencePrompt(categories: Seq[String],
                      batch: Seq[(String, String)]): String = {
    val head =
      "Agrupa **exclusivamente** cada uno de estos proyectos en uno de " +
        "los siguientes sectores económicos:\n" +
        categories.mkString(", ") + ".\n" +
        "Si no encaja claramente en ninguno, entonces clasifícalo como " +
        "\"" + DefaultLabel + "\".\n" +
        "Respóndeme un JSON-Array con objetos de la forma:\n" +
        "  {\"id\": \"<ID_DEL_PROYECTO>\", \"label\": \"<categoría>\"}\n" +
        "sin ningún texto adicional.\n\n"
    head + batch.map { case (id, text) => s"$id: $text" }.mkString("\n")
  }

  /** Adapter from a raw-reply batch endpoint (what an LLM actually
    * returns: one string) to [[BatchClient]]. The default contract is the
    * reference's (classifier.py:86-120): the reply is a JSON **array** of
    * `{"id": …, "label": …}` records, salvaged per record — an invalid
    * record (missing/empty/non-string id or label) is skipped, a length
    * mismatch with the request batch is tolerated, and only a reply that
    * fails to parse or isn't an array THROWS, which
    * [[classifyBatched]]'s per-batch isolation turns into
    * [[DefaultLabel]] for exactly that batch (the reference returns `{}`
    * there, classifier.py:98-104 — same rows, same labels), never a task
    * failure. `strict = true` opts into the unforgiving legacy contract
    * ([[parseStrictObjectReply]]: one flat `{"id": "label", …}` object,
    * any drift throws). */
  final class RawReplyClient(call: Seq[(String, String)] => String,
                             strict: Boolean = false)
      extends BatchClient {
    override def classify(batch: Seq[(String, String)]): Map[String, String] =
      if (strict) parseStrictObjectReply(call(batch))
      else parseBatchReply(call(batch))
  }

  // ── Minimal JSON reader (dependency-free by design: the build adds no
  // JSON library, and the hot path never touches this — it runs once per
  // foreign-call batch). Full value grammar, so a tolerant reply parse
  // can inspect shapes instead of rejecting them. ──────────────────────
  private sealed trait JVal
  private final case class JStr(s: String) extends JVal
  private final case class JNum(raw: String) extends JVal
  private final case class JBool(b: Boolean) extends JVal
  private case object JNull extends JVal
  private final case class JArr(items: List[JVal]) extends JVal
  private final case class JObj(fields: List[(String, JVal)]) extends JVal

  /** Parses exactly one JSON value spanning the whole (trimmed) input;
    * anything else — prose wrapping, truncation, trailing text — throws
    * IllegalArgumentException. Mirrors `json.loads(raw.strip())`
    * (classifier.py:95-97): the reference does NOT strip code fences or
    * salvage prose-wrapped JSON, so neither do we. */
  private def parseJsonValue(s: String): JVal = {
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed batch reply at $i: $msg")
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      if (i >= s.length || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }
    def str(): String = {
      expect('"')
      val b = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        s.charAt(i) match {
          case '\\' =>
            if (i + 1 >= s.length) fail("dangling escape")
            s.charAt(i + 1) match {
              case '"'  => b += '"'
              case '\\' => b += '\\'
              case '/'  => b += '/'
              case 'n'  => b += '\n'
              case 't'  => b += '\t'
              case 'r'  => b += '\r'
              case 'b'  => b += '\b'
              case 'f'  => b += '\f'
              case 'u' =>
                if (i + 5 >= s.length) fail("truncated \\u escape")
                b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
                i += 4
              case other => fail(s"unsupported escape \\$other")
            }
            i += 2
          case c => b += c; i += 1
        }
      }
      expect('"')
      b.result()
    }
    def lit(word: String, v: JVal): JVal = {
      if (!s.startsWith(word, i)) fail(s"expected '$word'")
      i += word.length; v
    }
    def num(): JVal = {
      val start = i
      if (i < s.length && s.charAt(i) == '-') i += 1
      while (i < s.length && s.charAt(i).isDigit) i += 1
      if (i < s.length && s.charAt(i) == '.') {
        i += 1; while (i < s.length && s.charAt(i).isDigit) i += 1
      }
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        while (i < s.length && s.charAt(i).isDigit) i += 1
      }
      if (i == start || s.substring(start, i).matches("-?") ) fail("bad number")
      JNum(s.substring(start, i))
    }
    def value(): JVal = {
      ws()
      if (i >= s.length) fail("empty value")
      s.charAt(i) match {
        case '"' => JStr(str())
        case '{' =>
          i += 1; ws()
          val fields = List.newBuilder[(String, JVal)]
          if (i < s.length && s.charAt(i) == '}') i += 1
          else {
            var more = true
            while (more) {
              ws(); val k = str(); ws(); expect(':')
              fields += (k -> value()); ws()
              if (i < s.length && s.charAt(i) == ',') i += 1
              else { expect('}'); more = false }
            }
          }
          JObj(fields.result())
        case '[' =>
          i += 1; ws()
          val items = List.newBuilder[JVal]
          if (i < s.length && s.charAt(i) == ']') i += 1
          else {
            var more = true
            while (more) {
              items += value(); ws()
              if (i < s.length && s.charAt(i) == ',') i += 1
              else { expect(']'); more = false }
            }
          }
          JArr(items.result())
        case 't' => lit("true", JBool(true))
        case 'f' => lit("false", JBool(false))
        case 'n' => lit("null", JNull)
        case _   => num()
      }
    }
    val v = value()
    ws()
    if (i != s.length) fail("trailing content after value")
    v
  }

  /** Tolerant parser for the reference's batch-reply contract
    * (classifier.py:98-120): a JSON array of `{"id": …, "label": …}`
    * records. Per-record salvage — a record missing either field, with an
    * empty value (Python's `if key and val` truthiness,
    * classifier.py:115), or a non-object/non-string shape is skipped;
    * later duplicates of the same id overwrite earlier ones (Python dict
    * insert, classifier.py:116); a count that doesn't match the request
    * batch is tolerated (log-only in the reference, classifier.py:106-109
    * — unmatched rows default downstream via [[classifyBatched]]'s
    * `getOrElse`). Only parse failure or a non-array top level throws
    * (the reference zeroes the batch there, classifier.py:98-104).
    * Non-string ids/labels are skipped rather than stringified: the
    * reference keeps a truthy non-string, but it can never equal a row's
    * string key / pass K3 domain validation, so both engines land the
    * same rows on [[DefaultLabel]]. */
  def parseBatchReply(raw: String): Map[String, String] =
    parseJsonValue(raw) match {
      case JArr(items) =>
        val out = scala.collection.mutable.LinkedHashMap[String, String]()
        items.foreach {
          case JObj(fields) =>
            val m = fields.toMap // later duplicate field wins, like json.loads
            (m.get("id"), m.get("label")) match {
              case (Some(JStr(id)), Some(JStr(label)))
                  if id.nonEmpty && label.nonEmpty =>
                out(id) = label
              case _ => () // warn-skip in the reference; record salvaged past
            }
          case _ => () // non-object record: no id/label to salvage
        }
        out.toMap
      case other =>
        throw new IllegalArgumentException(
          s"batch reply is ${other.getClass.getSimpleName.stripPrefix("J")}, expected a JSON array")
    }

  /** Opt-in strict contract (pre-round-10 default): exactly one flat JSON
    * object of string→string pairs (`{"id": "label", …}`), nothing before
    * or after — any drift (duplicate id, non-string value, trailing
    * prose) throws. Useful against endpoints with response-schema
    * enforcement where drift means a bug, not noise. */
  def parseStrictObjectReply(raw: String): Map[String, String] =
    parseJsonValue(raw) match {
      case JObj(fields) =>
        val out = scala.collection.mutable.LinkedHashMap[String, String]()
        fields.foreach {
          case (k, JStr(v)) =>
            if (out.contains(k))
              throw new IllegalArgumentException(s"duplicate id '$k'")
            out(k) = v
          case (k, other) =>
            throw new IllegalArgumentException(
              s"non-string value for id '$k': $other")
        }
        out.toMap
      case other =>
        throw new IllegalArgumentException(
          s"batch reply is ${other.getClass.getSimpleName.stripPrefix("J")}, expected a flat JSON object")
    }

  /** K2 production shape: batched foreign calls inside mapPartitions —
    * the partition is the natural batch boundary; `batchSize` bounds each
    * call exactly like the reference's BATCH_SIZE=20. A failed batch
    * yields [[DefaultLabel]] for all its rows instead of failing the task
    * (per-batch isolation, classifier.py:98-100).
    *
    * Scale: no shuffle — each task streams its partition through the
    * client; concurrency = task parallelism. Rate limits are the client's
    * concern. This is the (d) `mapPartitions` tier of the preference
    * order: justified because the operator IS a foreign call. */
  def classifyBatched(df: DataFrame, idCol: String, textCol: String,
                      out: String, client: BatchClient,
                      batchSize: Int = 20): DataFrame = {
    val schema = df.schema.add(out, StringType)
    val (idIdx, textIdx) = (df.schema.fieldIndex(idCol), df.schema.fieldIndex(textCol))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val keyed = batch.map(r => (String.valueOf(r.get(idIdx)), r.getString(textIdx)))
        val labels =
          try client.classify(keyed)
          catch { case NonFatal(_) => Map.empty[String, String] }
        batch.lazyZip(keyed).map { case (r, (id, _)) =>
          Row.fromSeq(r.toSeq :+ labels.getOrElse(id, DefaultLabel))
        }
      }
    }(Encoders.row(schema))
  }
}
