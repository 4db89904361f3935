package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression for the float-vector dot product — the
  * codegen-hot path SURVEY §4 reserves for exactly this case (option (b)):
  * the higher-order `aggregate(zip_with(...))` form allocates a zipped
  * array and evaluates two lambdas per element per row, while this
  * expression compiles to a tight primitive loop inside whole-stage
  * codegen. Semantics match [[graft.operators.Similarity.dot]] exactly
  * (sequential left-to-right accumulation in double), so the same DuckDB
  * oracle covers both forms.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects two array<float> inputs, got ${l.sql} / ${r.sql}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullable: Boolean = true

  /** Ragged inputs (unequal lengths) yield NULL — matching the
    * higher-order `aggregate(zip_with(...))` form, where zip_with pads
    * with null and poisons the fold, so both forms share one oracle. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) {
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    ${ev.value} += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native weight-table lookup-sum: Σ weights[idx] over an array<long>
  * of indices against an array<long> weight table (the broadcast-model
  * margin of graft.operators.QualityModel — fit/gateInline/
  * meanAbsError). The higher-order `aggregate(f, 0L, (acc, b) => acc +
  * element_at(wlit, b+1))` form pays interpreted lambda dispatch per
  * FEATURE (~3 s per iteration at 5 k docs — measured r14); this
  * compiles to a primitive loop in whole-stage codegen. Indices are
  * 0-based; an out-of-range index yields NULL (loud, never a silent 0 —
  * the pqAdcRankWide NaN stance), as does a NULL index element. Exact
  * BIGINT arithmetic — same value as the fold, one oracle serves both. */
case class LookupSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_lookup_sum expects two array<bigint> inputs (indices, " +
          s"weight table), got ${l.sql} / ${r.sql}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_lookup_sum"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val idx = a.asInstanceOf[ArrayData]
    val w = b.asInstanceOf[ArrayData]
    val n = idx.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (idx.isNullAt(i)) return null
      val j = idx.getLong(i)
      if (j < 0 || j >= w.numElements()) return null
      s += w.getLong(j.toInt)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $a.numElements() && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $j = $a.getLong($i);
         |  if ($j < 0 || $j >= $b.numElements()) { ${ev.isNull} = true; break; }
         |  ${ev.value} += $b.getLong((int) $j);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LookupSum =
    copy(left = newLeft, right = newRight)
}

/** Native MULTI-table lookup-sum: k weight tables probed in ONE pass
  * over the index array — the one-vs-rest margin/serving kernel of
  * [[graft.operators.QualityModel.fitMulticlass]]/`predictClass`
  * (fastText's k-class linear head over hashed features). k separate
  * [[LookupSum]] columns traverse the feature array k times per row
  * and are NOT common-subexpression-eliminable (k distinct weight
  * literals); this fuses them: the flat table is BUCKET-MAJOR
  * (`flat[j*k + c]` = class c's weight for bucket j), so each feature
  * touches k CONTIGUOUS longs and the row costs one traversal + k
  * accumulators regardless of k. Returns array<long> of the k exact
  * BIGINT sums (class order = the interleave order) — `element_at`
  * projections of the SAME expression subtree CSE to one evaluation.
  * NULL (loud, never a silent 0) when: any index element is NULL or
  * out of range, or the flat table's length is not a multiple of k.
  * Empty indices yield k zeros — [[LookupSum]]'s fold identity. */
case class LookupSums(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1) TypeCheckResult.TypeCheckFailure(
      s"graft_lookup_sums expects a positive table count k, got $k")
    else (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_lookup_sums expects (array<bigint> indices, array<bigint> " +
          s"bucket-major flat weights, int k), got ${l.sql} / ${r.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_lookup_sums"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val idx = a.asInstanceOf[ArrayData]
    val w = b.asInstanceOf[ArrayData]
    val wn = w.numElements()
    if (wn % k != 0) return null
    // bucket-count bound, not (j + 1) * k: the product form overflows
    // Long for j >= ~2^63/k and would sail past the range check into an
    // unbounded UnsafeArrayData read (ADVICE r15)
    val nBuckets = wn / k
    val acc = new Array[Long](k)
    val n = idx.numElements()
    var i = 0
    while (i < n) {
      if (idx.isNullAt(i)) return null
      val j = idx.getLong(i)
      if (j < 0 || j >= nBuckets) return null
      val base = (j * k).toInt
      var c = 0
      while (c < k) { acc(c) += w.getLong(base + c); c += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val base = ctx.freshName("base")
      val acc = ctx.freshName("acc")
      val wn = ctx.freshName("wn")
      val nb = ctx.freshName("nBuckets")
      s"""
         |int $wn = $b.numElements();
         |int $nb = $wn / $k;
         |long[] $acc = new long[$k];
         |${ev.isNull} = ($wn % $k != 0);
         |for (int $i = 0; $i < $a.numElements() && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $j = $a.getLong($i);
         |  if ($j < 0 || $j >= (long) $nb) { ${ev.isNull} = true; break; }
         |  int $base = (int) ($j * $k);
         |  for (int $c = 0; $c < $k; $c++) {
         |    $acc[$c] += $b.getLong($base + $c);
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LookupSums =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native vector expressions. */
object VectorFunctions {

  /** Native dot product — drop-in replacement for Similarity.dot. */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def normNative(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotNative(a, a))

  def cosineNative(a: Column, b: Column): Column =
    dotNative(a, b) / (normNative(a) * normNative(b))

  /** Native lookup-sum — 0-based indices against an array<long> weight
    * table (usually a `typedLit` of the bounded model artifact). */
  def lookupSumNative(indices: Column, weights: Column): Column =
    ColumnBridge.column(
      LookupSum(ColumnBridge.expression(indices),
        ColumnBridge.expression(weights)))

  /** Native k-table lookup-sum over a BUCKET-MAJOR flat weight literal
    * (`flat[j*k + c]`); returns the k exact sums as array<long>. */
  def lookupSumsNative(indices: Column, flatWeights: Column, k: Int): Column =
    ColumnBridge.column(
      LookupSums(ColumnBridge.expression(indices),
        ColumnBridge.expression(flatWeights), k))
}
