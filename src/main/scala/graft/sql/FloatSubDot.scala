package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of the `m`-th `subDim`-wide subspace slices of two
  * `array<float>` columns — the single `dab` fold of [[FloatSubDist2]] on
  * its own: one sequential left-to-right double fold over the slice, zero
  * allocation.
  *
  * This is the kernel of the FACTORED residual-ADC table build
  * ([[graft.operators.Clustering.ivfAdcResidualFromIndex]]): the residual
  * estimate `‖(q−c)−r‖²` decomposes into `‖q−c‖²_m + (‖r‖²_m + 2·c·r_m)
  * − 2·q·r_m`, and the `q·r_m` term — the only one with a (query × code)
  * extent — is probe-independent, so hoisting it out of the per-probe
  * table cuts the dominant fold count by nprobe×. The other terms reuse
  * [[FloatSubDist2]] (q vs c) and this expression (cell/code side, once
  * per batch).
  *
  * Slice semantics mirror `slice(x, m*subDim + 1, subDim)` exactly like
  * [[FloatSubDist2]]: a slice starting past the end is empty (fold of an
  * empty slice is 0.0); effective slices disagreeing in length, or any
  * null element in range, null the result. Bit parity with
  * `FloatVecDot(slice(a), slice(b))` is spec-pinned. */
case class FloatSubDot(left: Expression, right: Expression,
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
  override def prettyName: String = "float_sub_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    FloatSubDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}Tmp = graft.sql.FloatSubDot.compute($a, $b, $m, $subDim);
      if (${ev.value}Tmp == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}Tmp.doubleValue();
      }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatSubDot =
    copy(left = newLeft, right = newRight)
}

object FloatSubDot {
  /** `Σ aᵢ·bᵢ` over the m-th subDim-wide slices — one sequential
    * left-to-right double fold, matching the slice+[[FloatVecDot]]
    * composition bit for bit. Null on effective-slice length mismatch or
    * any null element in range ([[FloatVecDot]]'s null-poisoning parity,
    * checked on BOTH sides like the composition). */
  def compute(a: ArrayData, b: ArrayData, m: Int, subDim: Int): java.lang.Double = {
    val start = m * subDim
    def effLen(x: ArrayData): Int =
      math.min(subDim, math.max(0, x.numElements() - start))
    val n = effLen(a)
    if (n != effLen(b)) return null
    var i = 0
    while (i < n) {
      if (a.isNullAt(start + i) || b.isNullAt(start + i)) return null
      i += 1
    }
    var dab = 0.0
    i = 0
    while (i < n) {
      dab += a.getFloat(start + i).toDouble * b.getFloat(start + i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(dab)
  }
}
