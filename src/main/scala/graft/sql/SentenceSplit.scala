package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst `Generator` (UDTF shape): explode a document into
  * trimmed, non-empty sentences with a 1-based index — one input row fans
  * out to N output rows through the `Generate` physical operator, exactly
  * like `explode`, with no intermediate array column materialized per row
  * (the `split`+`posexplode` composition builds and ships the full array
  * first).
  *
  * Split contract (kept deliberately simple so any engine can restate it):
  * sentences are the `[.!?]+`-separated chunks, trimmed, empties dropped,
  * indexed in original order.
  */
case class SentenceSplit(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("sentence_idx", IntegerType, nullable = false),
    StructField("sentence", StringType, nullable = false)))

  override def prettyName: String = "sentence_split"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      // precompiled pattern: String.split would recompile the regex per ROW
      // (it only fast-paths single-char non-meta patterns)
      val parts = SentenceSplit.Terminators.split(v.asInstanceOf[UTF8String].toString)
      var idx = 0
      parts.iterator.map(_.trim).filter(_.nonEmpty).map { s =>
        idx += 1
        InternalRow(idx, UTF8String.fromString(s))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SentenceSplit =
    copy(child = newChild)
}

object SentenceSplit {
  private val Terminators = java.util.regex.Pattern.compile("[.!?]+")
}
