package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined chunking: rolling `window`-codepoint hash, cut
  * where it ≡ 0 (mod `divisor`), polynomial hash per chunk, sorted distinct
  * output — ONE compiled pass. The `functions._` composition of the same
  * computation (`Dedup.cdcChunkHashesHof`) nests interpreted HOFs
  * (transform → aggregate → transform) and re-derives per-chunk char-code
  * arrays; measured ~200 ms/doc interpreted vs microseconds here.
  *
  * Value-identical to the HOF spelling (same rolling-hash family as
  * [[ShingleHashes]], same 1-based boundary arithmetic), so the d11 DuckDB
  * oracle keeps matching — the speedup changes the plan, not one output
  * bit.
  */
case class CdcChunkHashes(child: Expression, window: Int, divisor: Long)
    extends UnaryExpression {

  require(window >= 1, s"window must be >= 1, got $window")
  require(divisor >= 2, s"divisor must be >= 2, got $divisor")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunk_hashes"

  override def nullSafeEval(input: Any): Any =
    CdcChunkHashes.compute(input.asInstanceOf[UTF8String], window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sql.CdcChunkHashes.compute($c, $window, ${divisor}L)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkHashes =
    copy(child = newChild)
}

object CdcChunkHashes {
  final val P = Defaults.P

  def compute(s: UTF8String, window: Int, divisor: Long): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val len = cps.length
    // rolling window hashes — identical to ShingleHashes.compute
    val nWin = math.max(len - (window - 1), 1)
    val hs = new Array[Long](nWin)
    var i = 0
    while (i < nWin) {
      var acc = 0L
      var j = i
      val end = math.min(i + window, len)
      while (j < end) {
        acc = (acc * 31L + cps(j)) % P
        j += 1
      }
      hs(i) = acc
      i += 1
    }
    // boundaries: 1-based char positions [1, cuts..., len+1]; a cut at hs
    // index i (1-based, i >= 2) splits before char i
    val bounds = scala.collection.mutable.ArrayBuffer(1)
    if (nWin >= 2) {
      var k = 2
      while (k <= nWin) {
        if (hs(k - 1) % divisor == 0) bounds += k
        k += 1
      }
    }
    bounds += len + 1
    // per-chunk polynomial hash, distinct, sorted
    val set = new java.util.TreeSet[java.lang.Long]()
    var c = 0
    while (c < bounds.length - 1) {
      var acc = 0L
      var j = bounds(c) - 1
      val end = bounds(c + 1) - 1
      while (j < end) {
        acc = (acc * 31L + cps(j)) % P
        j += 1
      }
      set.add(acc)
      c += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
