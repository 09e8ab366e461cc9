package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused MinHash → LSH band keys: shingle hashes → k affine minima →
  * `bands` polynomial band folds, all in ONE compiled pass with one output
  * allocation of `bands` longs.
  *
  * The composed spelling — `bandKeys(minhashSignature(hset))` — references
  * the k-element signature array from every one of the k `element_at` calls
  * inside the band folds; whether the signature is computed once then is at
  * the mercy of expression CSE across a Generate input, and any miss
  * multiplies the k×|set| minhash scan. Fusing removes the intermediate
  * array and the CSE question entirely, and halves the posting payload
  * (bands longs out, not k).
  *
  * Value-identical to `Dedup.bandKeys(Dedup.minhashSignatureHof(hset))`
  * (fold acc = (acc·31 + min_j) mod P over each band's rows) — parity spec
  * in ShingleHashesSpec. Empty-array inputs inherit the
  * [[MinHashSignature]] totality contract (min_j = b_j mod P). Like its
  * sibling, the input contract is hash-expression output (element nulls
  * never occur); a null element fed via the raw SQL registration reads as
  * 0 here where the HOF spelling would null-poison — do not feed
  * hand-built arrays with nulls. */
case class MinHashBandKeys(child: Expression, a: Seq[Long], b: Seq[Long], rowsPerBand: Int)
    extends UnaryExpression {

  require(a.nonEmpty && a.length == b.length, "need matching non-empty coefficient vectors")
  require(rowsPerBand > 0 && a.length % rowsPerBand == 0,
    s"k=${a.length} must divide into bands of $rowsPerBand")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_keys"

  @transient private lazy val aArr: Array[Long] = a.toArray
  @transient private lazy val bArr: Array[Long] = b.toArray

  override def nullSafeEval(input: Any): Any =
    MinHashBandKeys.compute(input.asInstanceOf[ArrayData], aArr, bArr, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.sql.MinHashBandKeys.compute($c, $aRef, $bRef, $rowsPerBand)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

object MinHashBandKeys {
  final val P = Defaults.P

  def compute(hashes: ArrayData, a: Array[Long], b: Array[Long], rowsPerBand: Int): ArrayData = {
    val k = a.length
    val bands = k / rowsPerBand
    val out = new Array[Long](bands)
    val n = hashes.numElements()
    var band = 0
    var j = 0
    while (band < bands) {
      var acc = 0L
      var r = 0
      while (r < rowsPerBand) {
        var min = if (n == 0) b(j) % P else Long.MaxValue
        var i = 0
        while (i < n) {
          val v = (a(j) * hashes.getLong(i) + b(j)) % P
          if (v < min) min = v
          i += 1
        }
        acc = (acc * 31L + min) % P
        r += 1
        j += 1
      }
      out(band) = acc
      band += 1
    }
    new GenericArrayData(out)
  }
}
