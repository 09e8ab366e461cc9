package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row term-frequency map: `array<string>` tokens →
  * `map<string,bigint>` counts in ONE compiled pass (insertion-ordered, so
  * output is deterministic).
  *
  * The relational spelling — `explode(tokens)` then
  * `groupBy(doc_id, term).count()` — shuffles every TOKEN occurrence to
  * compute per-doc counts (partial aggregation trims it to distinct
  * (doc, term) pairs per map task, but the exchange still carries the whole
  * per-doc vocabulary). Since a document's tokens are all in its own row,
  * term frequency is a per-row computation: this expression computes it
  * in-place and `explode(map)` yields the same (term, tf) rows with NO
  * shuffle at all. At corpus scale that deletes the largest exchange in the
  * TF-IDF pipeline.
  *
  * Null tokens are skipped (tokenizers emit none; robustness only).
  */
case class TokenCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "token_counts"

  override def nullSafeEval(input: Any): Any =
    TokenCounts.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sql.TokenCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)
}

object TokenCounts {
  def compute(tokens: ArrayData): MapData = {
    val counts = new java.util.LinkedHashMap[UTF8String, java.lang.Long]()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        // clone: the array may be an unsafe view into a reused row buffer
        val t = tokens.getUTF8String(i).clone()
        val prev = counts.get(t)
        counts.put(t, if (prev == null) 1L else prev + 1L)
      }
      i += 1
    }
    val keys = new Array[Any](counts.size)
    val values = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      values(j) = e.getValue.longValue()
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
  }
}
