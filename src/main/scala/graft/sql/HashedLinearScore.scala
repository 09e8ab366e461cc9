package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native hashed-feature linear score over an `array<string>` of tokens —
  * the scoring kernel of a fastText-style quality classifier (Joulin et al.
  * 2016's "bag of hashed features · weight vector" shape), fused into ONE
  * compiled pass per row.
  *
  * Per token: the portable polynomial hash (same fold as [[ShingleHashes]] /
  * [[SimHashFromTokens]]: `acc = acc*31 + cp mod 1e9+7`), feature bucket
  * `h mod dim`, and an integer milli-weight
  * `w(b) = ((b · 2654435761) mod 1e9+7) mod 2001 − 1000 ∈ [−1000, 1000]`
  * (a fixed pseudo-random projection standing in for trained weights — the
  * plumbing, hashing, and scale behavior are what the engine owns; a real
  * deployment broadcasts a learned weight array of the same shape). The
  * result is `Σ w` as a LONG: integer summation makes the score independent
  * of token order AND of partitioning, so the DuckDB oracle restates it
  * exactly — no float fold-order caveats.
  *
  * The equivalent `functions._` composition (`aggregate(transform(toks, …))`)
  * is two interpreted CodegenFallback HOFs per row; this expression is
  * value-identical (parity spec) and stays inside whole-stage codegen.
  */
case class HashedLinearScore(child: Expression, dim: Int) extends UnaryExpression {

  require(dim > 0, s"dim must be positive, got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_linear_score"

  override def nullSafeEval(input: Any): Any =
    HashedLinearScore.compute(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sql.HashedLinearScore.compute($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashedLinearScore =
    copy(child = newChild)
}

object HashedLinearScore {
  final val P = Defaults.P

  /** Knuth's 2^32·φ multiplicative-mix constant; bucket < dim ≤ 2^30 keeps
    * the product well inside a long. */
  final val Mix = 2654435761L

  /** Milli-weight of feature bucket `b` — restated verbatim in oracles. */
  def weightMilli(b: Long): Long = ((b * Mix) % P) % 2001L - 1000L

  def compute(tokens: ArrayData, dim: Int): Long = {
    val n = tokens.numElements()
    var sum = 0L
    var t = 0
    while (t < n) {
      // null elements skipped for robustness; tokenizer arrays carry none
      if (!tokens.isNullAt(t)) {
        val cps = tokens.getUTF8String(t).toString.codePoints().toArray
        var acc = 0L
        var i = 0
        while (i < cps.length) {
          acc = (acc * 31L + cps(i)) % P
          i += 1
        }
        sum += weightMilli(acc % dim)
      }
      t += 1
    }
    sum
  }
}
