package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Engine extension wiring (`spark.sql.extensions=graft.sql.GraftExtensions`):
  * registers the native expressions with the function registry so they are
  * first-class in SQL text as well as the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => ShingleHashes(s, 5)
        case Seq(s, Literal(n: Int, _)) => ShingleHashes(s, n)
        case other => throw new IllegalArgumentException(
          s"shingle_hashes(str[, n literal int]); got ${other.size} args")
      }))
  }
}
