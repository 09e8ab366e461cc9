package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 32-bit SimHash over an `array<string>` of tokens, fused into ONE
  * compiled pass: per token, the portable polynomial hash (fold
  * `acc = (acc*31 + codepoint) mod 1e9+7`, reference semantics identical to
  * [[ShingleHashes]] over a whole-string window), then each of the 32 bit
  * counters moves ±1 on that hash's bit. Bit j of the result is set iff its
  * counter ends positive — term-frequency weighted (duplicate tokens count).
  *
  * The `functions._` composition of the same computation
  * (`Dedup.simhash32(transform(tokens, polyHashStr))`) evaluates 32 separate
  * interpreted `aggregate` HOF folds per row plus one interpreted
  * `transform`+`aggregate` per token (HOFs are CodegenFallback) — ~32× the
  * token count in interpreted closure calls with array allocations per row.
  * This expression is value-identical (the parity spec asserts it bit for
  * bit) and keeps the whole d05 path inside whole-stage codegen.
  *
  * Counter semantics match the HOF spec exactly: token hashes are in
  * [0, 1e9+7) so only bits 0..29 can be 1; counters for bits 30/31 always
  * end at -|tokens| (never positive), and an empty token array yields 0 —
  * same as the HOF's `aggregate` over an empty array.
  */
case class SimHashFromTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_from_tokens"

  override def nullSafeEval(input: Any): Any =
    SimHashFromTokens.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sql.SimHashFromTokens.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashFromTokens =
    copy(child = newChild)
}

object SimHashFromTokens {
  final val P = Defaults.P

  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Long](32)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      // null array elements are skipped; unreachable from tokenizers
      // (split() arrays carry no nulls), defined only for robustness
      if (!tokens.isNullAt(t)) {
        val cps = tokens.getUTF8String(t).toString.codePoints().toArray
        var acc = 0L
        var i = 0
        while (i < cps.length) {
          acc = (acc * 31L + cps(i)) % P
          i += 1
        }
        var j = 0
        while (j < 32) {
          counts(j) += (((acc >>> j) & 1L) << 1) - 1L
          j += 1
        }
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
}
