package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native random-hyperplane LSH bucket keys: for L hash tables of b planes
  * each, computes all L b-bit bucket keys of an `array<float>` embedding in
  * ONE compiled pass (L·b fused dot products against constant plane
  * coefficient rows). Bit j of table t's key is set iff
  * `dot(plane[t·b+j], embedding) >= 0` — the standard sign-random-projection
  * family for cosine similarity (collision probability 1 − θ/π per bit).
  *
  * The coefficient matrix arrives as a flat `(L·b) × dim` constant; plane
  * coefficients are derived integers (see `Similarity.planeCoefficientInt`)
  * so a SQL oracle can restate the identical planes as literals. Dots
  * accumulate left-to-right in doubles — bit-for-bit the order the oracle's
  * `list_aggregate(list_transform(...), 'sum')` uses.
  *
  * Returns null only for a null input; a length-mismatched embedding yields
  * keys from the overlapping prefix (dimension is fixed corpus-wide in
  * practice).
  */
case class SignPlaneKeys(child: Expression, planes: Seq[Seq[Double]], bitsPerTable: Int)
    extends UnaryExpression {

  require(bitsPerTable >= 1 && bitsPerTable <= 63, s"bitsPerTable out of range: $bitsPerTable")
  require(planes.nonEmpty && planes.length % bitsPerTable == 0,
    s"plane count ${planes.length} must be a positive multiple of $bitsPerTable")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_plane_keys"

  @transient private lazy val planeArr: Array[Array[Double]] = planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    SignPlaneKeys.compute(input.asInstanceOf[ArrayData], planeArr, bitsPerTable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("signPlanes", planeArr, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.sql.SignPlaneKeys.compute($c, $pRef, $bitsPerTable)")
  }

  override protected def withNewChildInternal(newChild: Expression): SignPlaneKeys =
    copy(child = newChild)
}

object SignPlaneKeys {
  def compute(vec: ArrayData, planes: Array[Array[Double]], bitsPerTable: Int): ArrayData = {
    val tables = planes.length / bitsPerTable
    val dim = vec.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var j = 0
      while (j < bitsPerTable) {
        val row = planes(t * bitsPerTable + j)
        val n = math.min(dim, row.length)
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += row(i) * vec.getFloat(i).toDouble
          i += 1
        }
        if (acc >= 0.0) key |= 1L << j
        j += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }
}
