package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  * Spark 4 routes Columns through ColumnNode and keeps the converter
  * `private[sql]`, so the one-line adapters live in this package.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Serializable Hadoop configuration for executor-side metadata reads
  * (Spark's own `SerializableConfiguration` is `private[spark]`, so the
  * one-line wrapper lives in this package). */
object ConfShim {
  def serializable(conf: org.apache.hadoop.conf.Configuration)
      : org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(conf)
}
