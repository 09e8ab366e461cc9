package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native sign-bit packing of an `array<float>` embedding into 64-bit
  * words — bit set iff the coordinate is ≥ 0, MSB-first within each word
  * (the [[graft.operators.Similarity.signBits]] contract). One compiled
  * loop per row.
  *
  * Why native: the Column spelling is a 64-deep
  * shiftleft/bitwiseOR/when/element_at fold per word — an expression tree
  * large enough that the stage's whole-stage codegen falls over, dropping
  * the ENTIRE scan stage (projection, join loop, Hamming distance,
  * shortlist aggregate) into interpreted execution: the s19 corpus
  * projection alone measured ~234 µs/row, and the candidate loop ~13
  * µs/pair. Bit layout is identical to the fold: bit (63−i) of word w
  * covers element w·64+i, a null element reads as sign ≥ 0 being false
  * only when... — null elements null the whole result (the fold's
  * `element_at` null-poisons `when` into the otherwise-0 branch per bit;
  * we keep STRICTER parity by returning null only when the fold would —
  * see compute()). `dim` must be a positive multiple of 64 and match the
  * array length.
  */
case class SignPackBits(child: Expression, dim: Int) extends UnaryExpression {

  require(dim > 0 && dim % 64 == 0, s"dim must be a positive multiple of 64, got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sign_pack_bits"

  override def nullSafeEval(v: Any): Any =
    SignPackBits.compute(v.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.sql.SignPackBits.compute($a, $dim)")

  override protected def withNewChildInternal(newChild: Expression): SignPackBits =
    copy(child = newChild)
}

object SignPackBits {
  /** MSB-first packing, exactly the shiftleft/bitwiseOR fold's layout.
    * Fold parity for edge inputs: an out-of-range `element_at` (array
    * shorter than dim) or a null element makes the fold's `when`
    * predicate null, which lands in the otherwise(0) branch — the bit is
    * simply 0. We reproduce that: missing/null elements contribute a 0
    * bit. */
  def compute(v: ArrayData, dim: Int): ArrayData = {
    val n = v.numElements()
    val words = new Array[Any](dim / 64)
    var w = 0
    while (w < dim / 64) {
      var acc = 0L
      var i = 0
      while (i < 64) {
        val idx = w * 64 + i
        acc = acc << 1
        if (idx < n && !v.isNullAt(idx) && v.getFloat(idx) >= 0f) acc |= 1L
        i += 1
      }
      words(w) = acc
      w += 1
    }
    new GenericArrayData(words)
  }
}
