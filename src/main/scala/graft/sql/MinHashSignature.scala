package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: k affine-permutation minima over an
  * `array<bigint>` of shingle hashes in ONE compiled pass (k×|set| fused
  * multiply-mod-min, one output allocation). The `functions._` equivalent —
  * k separate `array_min(transform(...))` columns — walks the interpreted
  * HOF path k times per row with a fresh array allocation each.
  *
  * Value-identical to `Dedup.minhashSignatureHof` (min over
  * `(a_j·h + b_j) mod 1e9+7`) on every non-empty input; shingle-hash arrays
  * always carry ≥1 element (even an empty string hashes one empty window),
  * so the empty-input branch below is unreachable in the pipeline. For an
  * empty array (reachable only via the raw SQL registration) this
  * DELIBERATELY returns `[b_j mod P]` — the affine map of the identity
  * minimum — as a total function, where the HOF spelling's
  * `array_min(transform(empty))` would yield nulls; a null-free signature
  * keeps downstream band folds total. */
case class MinHashSignature(child: Expression, a: Seq[Long], b: Seq[Long])
    extends UnaryExpression {

  require(a.nonEmpty && a.length == b.length, "need matching non-empty coefficient vectors")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val aArr: Array[Long] = a.toArray
  @transient private lazy val bArr: Array[Long] = b.toArray

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], aArr, bArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.sql.MinHashSignature.compute($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  final val P = Defaults.P

  def compute(hashes: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val out = new Array[Long](k)
    val n = hashes.numElements()
    var j = 0
    while (j < k) {
      var min = if (n == 0) b(j) % P else Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a(j) * hashes.getLong(i) + b(j)) % P
        if (v < min) min = v
        i += 1
      }
      out(j) = min
      j += 1
    }
    new GenericArrayData(out)
  }
}
