package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{DotProduct, HllSketch}

/** Session extension point for the engine's custom Catalyst pieces
  * (enable with `spark.sql.extensions=graft.plans.GraftExtensions`).
  *
  * Currently registers the codegen'd `graft_dot(array<double>,
  * array<double>)` scalar (SURVEY.md §4.3's one benchmark-gated custom
  * Expression); parity for everything else rides on Spark built-ins by
  * design, so no custom Rule/Strategy is injected.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_hll"),
      new ExpressionInfo(classOf[HllSketch].getName, "graft_hll"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HllSketch(exprs.head)))
    // auto-accelerate the aggregate(zip_with(...)) dot-product idiom
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}
