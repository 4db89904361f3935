package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Projection / extraction operators — the reference's SELECT clause
  * (SURVEY §2.2 P1–P11). All are codegen'd built-in expressions: row-local,
  * no shuffle, safe inside whole-stage codegen at any scale.
  */
object Projection {

  /** P1 (reference src/scrapers/list_parser.py:24-28,46-48): positional
    * cell projection — select, trim, alias. */
  def cell(c: Column, name: String): Column = trim(c).as(name)

  /** P4 (reference src/scrapers/list_parser.py:30-32,56-67): first element
    * of an array passing an exclusion predicate; null when none does.
    * `try_element_at` is ANSI-safe (null, not error, out of bounds). */
  def firstMatch(arr: Column, pred: Column => Column): Column =
    try_element_at(filter(arr, pred), lit(1))

  /** P5 (reference src/scrapers/list_parser.py:16,69-76): regex capture
    * with fallback chain — '' capture counts as a miss. */
  def extractWithFallback(c: Column, pattern: String, group: Int,
                          fallbacks: Column*): Column =
    coalesce((nullif(regexp_extract(c, pattern, group), lit("")) +: fallbacks): _*)

  /** P8 (reference src/scrapers/detail_parser.py:79-82): indexed findall —
    * the n-th (0-based) regex match, null when fewer matches exist. */
  def indexedFindAll(c: Column, pattern: String, group: Int, idx: Int): Column =
    try_element_at(regexp_extract_all(c, lit(pattern), lit(group)), lit(idx + 1))

  /** P9 (reference src/scrapers/detail_parser.py:84-87): block-anchored
    * extraction — regex applied only to the text after a literal anchor;
    * null when the anchor is absent. */
  def blockAfter(c: Column, anchor: String, pattern: String, group: Int): Column =
    when(instr(c, anchor) > 0,
      regexp_extract(substr(c, instr(c, anchor) + lit(anchor.length)), pattern, group))

  private def substr(c: Column, pos: Column): Column = c.substr(pos, length(c))
}
