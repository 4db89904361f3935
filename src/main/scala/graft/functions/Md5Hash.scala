package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native md5 bucket hash — the codegen twin of the engine's standard
  * engine-portable hash chain
  * `conv(substring(md5(x), 1+8w, 8), 16, 10)` (SURVEY §7.4.8's
  * md5-derived hashing contract): window `w` of the digest read as an
  * unsigned 32-bit int. Bit-identical to the built-in chain — the first
  * 8 hex chars ARE digest bytes 0–3 big-endian — so every existing
  * DuckDB oracle (`CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)`)
  * covers it unchanged.
  *
  * Why native: the built-in chain materializes the 32-char hex string,
  * substrings it, and re-parses hex via conv — three UTF8String
  * allocations plus a radix parse per evaluation. This expression
  * digests the raw bytes and masks out the window in one step, staying
  * inside whole-stage codegen (static helper call, the DotProduct
  * pattern). On the hashed-feature hot paths (q109/q111 featurize:
  * ~40 hashes/doc; minhash signatures: 2 digests/token) the chain
  * overhead is the dominant non-digest cost — MicroBench's `md5-*`
  * rows quantify the delta.
  */
case class Md5Hash32(child: Expression, window: Int)
    extends UnaryExpression {

  require(window >= 0 && window <= 3,
    s"md5 window must be in [0, 3] (got $window)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_window expects a string input, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_window"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    Md5.hash32(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5.hash32($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash32 =
    copy(child = newChild)
}

/** Static digest helper for [[Md5Hash32]]'s generated code. Deliberately a
  * STANDALONE object (the Bpe.encodeRow / HtmlContent.extractRow pattern),
  * not the expression's companion: a companion method named `eval` gets no
  * static forwarder because the class inherits `Expression.eval(InternalRow)`,
  * so the generated Java found only the instance method and Janino rejected
  * the call — dropping every md5 hot path into interpreted projection mode
  * (VERDICT r11 #1). CodegenLintSpec now compiles the projection directly. */
object Md5 {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Unsigned 32-bit read of digest bytes [4w, 4w+4) — the value of
    * `conv(substring(md5(s), 1+8w, 8), 16, 10)`. Called from generated
    * code; must stay a static-shaped helper (janino-friendly). */
  def hash32(s: UTF8String, window: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val o = window * 4
    ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
      ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
  }
}

/** Native fastText featurization — the hashed unigram+bigram bucket
  * array of a token array in ONE codegen'd pass
  * (`graft_feature_buckets`). Bit-identical to the HOF composition
  * [[graft.operators.QualityModel.featureBuckets]] shipped through
  * round 15 (`transform(concat(toks, sliced zip_with bigrams),
  * f => md5Window(f, 0) % buckets)`) — QualityModelSpec pins the
  * equivalence on null/empty/single-token edges — but without the
  * per-feature interpreted lambda dispatch, the intermediate bigram
  * array, or the HOF chain's codegen fallback: the quality-model
  * serving path (q109/q140/q160/q165) evaluates this once per row
  * inside whole-stage codegen. NULL input → NULL; a NULL TOKEN hashes
  * to a NULL element (md5(null) semantics — downstream lookup-sums
  * then return NULL loudly); bigrams join non-null neighbors with a
  * space, concat_ws-style (one-sided null → the survivor, both → ""). */
case class FeatureBuckets(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (buckets < 1) TypeCheckResult.TypeCheckFailure(
      s"graft_feature_buckets expects a positive bucket count, got $buckets")
    else child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_feature_buckets expects array<string>, got ${t.sql}")
    }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_feature_buckets"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    FeatureHash.buckets(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FeatureHash.buckets($c, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): FeatureBuckets =
    copy(child = newChild)
}

/** Static row kernel for [[FeatureBuckets]]'s generated code (the
  * [[Md5]] standalone-object pattern — janino needs a static-shaped
  * call target). */
object FeatureHash {
  def buckets(toks: org.apache.spark.sql.catalyst.util.ArrayData,
              nBuckets: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = toks.numElements()
    val out = new Array[Any](n + math.max(n - 1, 0))
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i))
        out(i) = Md5.hash32(toks.getUTF8String(i), 0) % nBuckets
      i += 1
    }
    val space = UTF8String.fromString(" ")
    i = 0
    while (i < n - 1) {
      val a = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      val b = if (toks.isNullAt(i + 1)) null else toks.getUTF8String(i + 1)
      // concat_ws(" ", a, b): nulls are SKIPPED, never propagated
      val joined =
        if (a == null && b == null) UTF8String.EMPTY_UTF8
        else if (a == null) b
        else if (b == null) a
        else UTF8String.concatWs(space, a, b)
      out(n + i) = Md5.hash32(joined, 0) % nBuckets
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Column entry points for the native md5 hash windows. */
object HashFunctions {

  /** Window `w` (0–3) of md5 as an unsigned 32-bit long — bit-identical
    * to `conv(substring(md5(c), 1+8w, 8), 16, 10).cast("long")`. */
  def md5Window(c: Column, window: Int): Column =
    ColumnBridge.column(Md5Hash32(ColumnBridge.expression(c), window))

  /** The engine's standard bucket hash: first md5 window mod `buckets`. */
  def md5Bucket(c: Column, buckets: Int): Column =
    md5Window(c, 0) % buckets

  /** Native one-pass hashed unigram+bigram feature buckets — see
    * [[FeatureBuckets]]. */
  def featureBuckets(toks: Column, buckets: Int): Column =
    ColumnBridge.column(FeatureBuckets(ColumnBridge.expression(toks), buckets))
}
