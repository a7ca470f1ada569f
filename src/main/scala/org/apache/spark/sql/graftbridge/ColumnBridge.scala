package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) bridge; the supported
  * converters live in `org.apache.spark.sql.classic.ExpressionUtils`,
  * which is private[sql]. This shim (compiled into the sql package
  * namespace) re-exposes exactly the two conversions the engine's
  * custom Expressions need. No behavior of Spark is modified. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
