package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert curve index (the xy→d walk of the classic iterative
  * algorithm, cf. the public-domain formulation on the Hilbert-curve
  * Wikipedia page): maps a (x, y) pair on a 2^bits × 2^bits grid to its
  * position along the space-filling curve.
  *
  * Versus the Morton/Z-order code ([[graft.operators.Layout.mortonCode]]):
  * the Hilbert curve has no long diagonal jumps, so consecutive code runs
  * span tighter (x, y) rectangles — row-group min/max envelopes narrow
  * further and statistics pruning skips more. This is why table formats
  * moved their OPTIMIZE clustering from Z-order to Hilbert.
  *
  * The per-level rotation makes the walk inherently stateful, which as a
  * built-in `Column` composition would nest the (x, y) state ~4× per bit
  * level (4^16 expression nodes at 16 bits — CollapseProject re-inlines any
  * aliasing, the d04 lesson) — hence a native expression: one compiled
  * loop, `bits` iterations/row. Inputs are masked to `bits`; the code fits
  * a positive long for bits ≤ 31.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint arguments, got ${l.catalogString}, ${r.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.sql.HilbertIndex.compute($a, $b, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Iterative xy→d: from the top bit level down, accumulate the quadrant
    * offset s²·((3·rx) xor ry), then rotate/reflect the sub-square. */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = x0 & (n - 1)
    var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate/reflect the sub-square; reflection is against the FULL grid
      // (n-1), per the classic formulation
      if (ry == 0) {
        if (rx == 1) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
