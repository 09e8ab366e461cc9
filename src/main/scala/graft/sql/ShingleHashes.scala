package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the portable polynomial hash of
  * every sliding `n`-codepoint window of a string in ONE compiled pass —
  * step (b) of the custom-operator ladder: the `functions._` composition of
  * the same computation (`transform(sequence(...), i => aggregate(...))`)
  * is three nested higher-order functions, which Catalyst evaluates
  * interpreted (HOFs are CodegenFallback) with per-element closure and
  * array allocation; this expression is a tight codegen'd loop with one
  * output allocation.
  *
  * Value-identical to `Dedup.shingleHashesPortable` (hash of window i =
  * fold `acc = (acc*31 + codepoint) mod 1e9+7` over codepoints i..i+n-1;
  * `max(numChars-n+1, 1)` windows, short strings hash as one short window),
  * so DuckDB oracles keep matching — the speedup changes the plan, not one
  * output bit.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sql.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  final val P = Defaults.P

  /** One-pass windowed polynomial hash; called from both interpreted eval
    * and generated code (a static call keeps the hot loop in compiled Java
    * without inlining hash code into every call site). */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val len = cps.length
    val windows = math.max(len - (n - 1), 1)
    val out = new Array[Long](windows)
    var i = 0
    while (i < windows) {
      var acc = 0L
      var j = i
      val end = math.min(i + n, len)
      while (j < end) {
        acc = (acc * 31L + cps(j)) % P
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }
}
