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

  /** Adapter from a raw-reply batch endpoint (what an LLM actually
    * returns: one string) to [[BatchClient]]: the reply must be one flat
    * JSON object mapping each row id to its label (the reference's
    * response contract, classifier.py:91-120). A malformed reply — prose
    * wrapping, truncation, non-string values — THROWS, and
    * [[classifyBatched]]'s per-batch isolation turns that into
    * [[DefaultLabel]] for exactly that batch, never a task failure. */
  final class RawReplyClient(call: Seq[(String, String)] => String)
      extends BatchClient {
    override def classify(batch: Seq[(String, String)]): Map[String, String] =
      parseBatchReply(call(batch))
  }

  /** Strict parser for the batch-reply contract: exactly one flat JSON
    * object of string→string pairs (`{"id": "label", …}`), nothing before
    * or after. Dependency-free by design (the build adds no JSON library)
    * and deliberately unforgiving — an LLM reply that drifts from the
    * contract must fail the batch loudly, not half-parse. */
  def parseBatchReply(raw: String): Map[String, String] = {
    val s = raw
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
    ws(); expect('{'); ws()
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    if (i < s.length && s.charAt(i) == '}') i += 1
    else {
      var more = true
      while (more) {
        val k = str(); ws(); expect(':'); ws(); val v = str(); ws()
        if (out.contains(k)) fail(s"duplicate id '$k'")
        out(k) = v
        if (i < s.length && s.charAt(i) == ',') { i += 1; ws(); more = true }
        else { expect('}'); more = false }
      }
    }
    ws()
    if (i != s.length) fail("trailing content after object")
    out.toMap
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
