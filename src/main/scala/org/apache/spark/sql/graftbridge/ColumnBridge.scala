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

/** Same shim, for plans: `Dataset.ofRows` (wrap a LogicalPlan as a
  * DataFrame) and the ColumnNode→Expression converter moved behind
  * private[sql] in the classic package. Needed by the engine's
  * whole-operator plans (graft.plans.TopKPerGroup). */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Convert a Column into a REAL Expression tree (ExpressionUtils
    * .expression returns a lazy ColumnNodeExpression wrapper that the
    * analyzer only unwraps inside Spark's own operators — inside a
    * custom LogicalPlan it would survive to execution and fail), then
    * resolve its attribute references against `child`'s output so the
    * custom node is built fully resolved. */
  def resolvedExpression(c: Column,
                         child: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Expression = {
    val converted = org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
    converted.transformUp {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        child.resolve(u.nameParts, org.apache.spark.sql.internal.SQLConf.get.resolver)
          .getOrElse(throw new IllegalArgumentException(
            s"cannot resolve column ${u.name} against [${child.output.map(_.name).mkString(", ")}]"))
    }
  }
}
