package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: `deflate(text).length / text.length`
  * (raw DEFLATE, fixed level, no container header). The standard cheap
  * information-density gate a pretraining pipeline runs per document
  * (the compression-side complement of the Gopher repetition metrics,
  * operators/TextStats): machine-generated/boilerplate text compresses
  * far below prose, binary-ish garbage barely compresses at all, so a
  * keep-band on the ratio drops both tails for the cost of one
  * row-local pass.
  *
  * Rows-only at the oracle (q129): the DEFLATE bitstream is a library
  * artifact with no SQL equivalent — DuckDB ships no deflate scalar.
  * The monotonicity properties the gate relies on (repetitive < prose <
  * high-entropy; ratio exact on fixtures per-JVM) are spec-pinned
  * instead (TextStatsSpec). Determinism: one fixed level/strategy
  * Deflater per thread, reset per row — same JVM, same bytes, same
  * ratio.
  *
  * Codegen calls the static helper ([[Deflate]].ratio — the Md5/Bpe
  * standalone-object pattern, VERDICT r11 #1) so the expression stays
  * inside whole-stage codegen; CodegenLintSpec compiles it.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_ratio expects a string input, got ${t.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_deflate_ratio"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    Deflate.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Deflate.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

/** Static helper for [[DeflateRatio]]'s generated code (standalone object
  * so the static forwarder exists — the Md5 lesson). */
object Deflate {
  private val deflaters: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() =>
      // raw deflate (nohead) at the default level — the container-less
      // bitstream, so the ratio measures content, not gzip framing
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true))

  /** deflated-bytes / raw-bytes of the UTF-8 encoding; empty input → 1.0
    * (nothing to measure — neutral, never a division error). */
  def ratio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = new Array[Byte](64)
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    out.toDouble / raw.length
  }
}

/** Column entry point. */
object QualitySignals {
  def deflateRatio(c: Column): Column =
    ColumnBridge.column(DeflateRatio(ColumnBridge.expression(c)))
}
