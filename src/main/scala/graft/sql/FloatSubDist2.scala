package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Squared L2 distance between the `m`-th `subDim`-wide subspace slices of
  * two `array<float>` columns — the fused form of
  *
  * {{{ dot(slice(a), slice(a)) + dot(slice(b), slice(b))
  *       - 2.0 * dot(slice(a), slice(b)) }}}
  *
  * with [[FloatVecDot]]'s sequential double folds. The composition it
  * replaces allocates THREE sliced arrays and crosses three codegen
  * boundaries per evaluation; the ADC table builds
  * ([[graft.operators.Clustering]]) evaluate it Q·(nprobe·)√n·numSub times
  * per query batch, so the per-call constant is the hot path. One fused
  * loop reads the slices in place — zero allocation — while keeping the
  * arithmetic BIT-IDENTICAL (three independent left-to-right folds over
  * the same elements, combined as `(da + db) - (2.0 * dab)`, the exact
  * association of the expression tree it replaces), so every
  * oracle-hash-matched estimate is unchanged.
  *
  * Slice semantics mirror `slice(x, m*subDim + 1, subDim)`: a slice
  * starting past the end is empty (folds of empty slices are 0.0 → result
  * 0.0); the two effective slices disagreeing in length, or any element in
  * range being null, nulls the result ([[FloatVecDot]]'s null-poisoning
  * parity). */
case class FloatSubDist2(left: Expression, right: Expression,
    m: Int, subDim: Int) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) if m >= 0 && subDim >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments and m >= 0, subDim >= 1, " +
        s"got ${l.catalogString}, ${r.catalogString}, m=$m, subDim=$subDim")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "float_sub_dist2"

  override def nullSafeEval(a: Any, b: Any): Any =
    FloatSubDist2.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}Tmp = graft.sql.FloatSubDist2.compute($a, $b, $m, $subDim);
      if (${ev.value}Tmp == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}Tmp.doubleValue();
      }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatSubDist2 =
    copy(left = newLeft, right = newRight)
}

object FloatSubDist2 {
  /** `(Σ aᵢ² + Σ bᵢ²) - 2.0·Σ aᵢ·bᵢ` over the m-th subDim-wide slices —
    * three independent left-to-right folds (NOT one fused accumulator:
    * per-iteration `da += a²; dab += a·b` interleaving would change the
    * rounding path), matching the slice+[[FloatVecDot]] composition bit
    * for bit. Null on effective-slice length mismatch or any null element
    * in range. */
  def compute(a: ArrayData, b: ArrayData, m: Int, subDim: Int): java.lang.Double = {
    val start = m * subDim // 0-based; the Column form passes 1-based start
    def effLen(x: ArrayData): Int =
      math.min(subDim, math.max(0, x.numElements() - start))
    val n = effLen(a)
    if (n != effLen(b)) return null
    var da = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(start + i)) return null
      val v = a.getFloat(start + i).toDouble
      da += v * v
      i += 1
    }
    var db = 0.0
    i = 0
    while (i < n) {
      if (b.isNullAt(start + i)) return null
      val v = b.getFloat(start + i).toDouble
      db += v * v
      i += 1
    }
    var dab = 0.0
    i = 0
    while (i < n) {
      dab += a.getFloat(start + i).toDouble * b.getFloat(start + i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(da + db - 2.0 * dab)
  }
}
