package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeSet, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.PlanBridge

/** Native as-of join (SURVEY.md §2.6's missing general operator): for
  * every left row, attach the LAST right row with the same key that is
  * STRICTLY BEFORE it in the (possibly composite) order — the lookup
  * every event-attribution / latest-version-at-time query needs, which
  * Spark only offers as union tricks (same table), O(n·m) range joins,
  * or pandas-on-Spark merge_asof.
  *
  * Physical shape = the sort-merge family, which is exactly what a
  * purpose-built engine does at scale:
  *  - both children hash-partitioned on their keys and sorted by
  *    (keys, order) — EnsureRequirements inserts the exchanges/sorts,
  *    or elides them when a child is already co-located;
  *  - one streaming merge pass per partition holding ONE buffered right
  *    row as the running "latest before" candidate — O(|L| + |R|) time,
  *    O(1) state, no pair blowup, nothing collected;
  *  - left-outer semantics: unmatched left rows get nulls.
  *
  * Ties among right rows at the same order value resolve to the
  * last-consumed (maximum) one; give both sides a strict total order
  * (e.g. ts + id) for fully deterministic output — the catalog query
  * does, and the DuckDB oracle (LATERAL ... ORDER BY ... DESC LIMIT 1)
  * pins the same choice.
  *
  * Null handling: keys and order values compare per the generated
  * ASC-nulls-first ordering, so two NULL keys are EQUAL here (unlike
  * SQL equi-join semantics, where NULL matches nothing). Filter null
  * keys out beforehand if SQL semantics are wanted; the catalog query
  * joins on non-null ids.
  */
/** Match direction: Backward = last right row STRICTLY BEFORE the left
  * row (the classic as-of); Forward = first right row STRICTLY AFTER. */
sealed trait AsOfDirection
case object AsOfBackward extends AsOfDirection
case object AsOfForward extends AsOfDirection

case class AsOfJoinNode(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftOrder: Seq[Expression], rightOrder: Seq[Expression],
    direction: AsOfDirection, inner: Boolean,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match")
  require(leftOrder.map(_.dataType) == rightOrder.map(_.dataType),
    "as-of join order-column types must match")
  // outer mode null-fills unmatched lefts → right side forced nullable;
  // inner emits matched right rows unchanged → PRESERVE their
  // nullability (forcing non-null would let the optimizer fold
  // IsNotNull over genuinely-nullable payload columns)
  override def output: Seq[Attribute] =
    if (inner) left.output ++ right.output
    else left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(lk, rk, lo, ro, dir, inner, l, r) =>
      AsOfJoinExec(lk, rk, lo, ro, dir, inner, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftOrder: Seq[Expression], rightOrder: Seq[Expression],
    direction: AsOfDirection, inner: Boolean,
    left: SparkPlan, right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    if (inner) left.output ++ right.output
    else left.output ++ right.output.map(_.withNullability(true))
  override def producedAttributes: AttributeSet = AttributeSet.empty
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys ++ leftOrder).map(SortOrder(_, Ascending)),
    (rightKeys ++ rightOrder).map(SortOrder(_, Ascending)))
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering
  override def nodeName: String = "AsOfJoin"
  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    Map("numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))
  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val lo = leftOrder; val ro = rightOrder
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter0) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lOrdProj = UnsafeProjection.create(lo, lOut)
      val rOrdProj = UnsafeProjection.create(ro, rOut)
      // orderings over the projected key/order rows (common schemas)
      val keyAttrs = lk.map(e =>
        org.apache.spark.sql.catalyst.expressions.AttributeReference("k", e.dataType, e.nullable)())
      val keyOrdering = GenerateOrdering.generate(
        keyAttrs.map(SortOrder(_, Ascending)), keyAttrs)
      val ordAttrs = lo.map(e =>
        org.apache.spark.sql.catalyst.expressions.AttributeReference("o", e.dataType, e.nullable)())
      val ordOrdering = GenerateOrdering.generate(
        ordAttrs.map(SortOrder(_, Ascending)), ordAttrs)

      val rIter = rIter0.buffered
      var lastKey: UnsafeRow = null
      var lastRow: InternalRow = null
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val forward = direction == AsOfForward
      lIter.flatMap { l =>
        val lKey = lKeyProj(l)
        val lOrd = lOrdProj(l)
        // advance the right cursor past every row that can no longer
        // match this (or any later) left row; what remains determines
        // the match per direction
        val m: InternalRow =
          if (forward) {
            // consume rows at-or-before (key, ord); the next row, if
            // key-equal, is the FIRST strictly-after match
            var continue = rIter.hasNext
            while (continue) {
              val r = rIter.head
              val c = keyOrdering.compare(rKeyProj(r), lKey)
              if (c < 0 || (c == 0 && ordOrdering.compare(rOrdProj(r), lOrd) <= 0)) {
                rIter.next()
                continue = rIter.hasNext
              } else continue = false
            }
            if (rIter.hasNext && keyOrdering.compare(rKeyProj(rIter.head), lKey) == 0)
              rIter.head
            else null
          } else {
            // consume rows strictly before (key, ord), buffering the
            // last one — the LAST strictly-before match
            var continue = rIter.hasNext
            while (continue) {
              val r = rIter.head
              val c = keyOrdering.compare(rKeyProj(r), lKey)
              if (c < 0 || (c == 0 && ordOrdering.compare(rOrdProj(r), lOrd) < 0)) {
                val consumed = rIter.next()
                lastKey = rKeyProj(consumed).copy()
                lastRow = consumed.copy()
                continue = rIter.hasNext
              } else continue = false
            }
            if (lastRow != null && keyOrdering.compare(lastKey, lKey) == 0) lastRow
            else null
          }
        if (m != null) {
          numOutputRows += 1
          Some(outProj(joined(l, m)))
        } else if (!inner) {
          numOutputRows += 1
          Some(outProj(joined(l, nullRight)))
        } else None
      }
    }
  }
}

/** DataFrame-level entry point: as-of join, strictly-before (Backward,
  * default) or strictly-after (Forward) match on (order columns) within
  * equal (key columns). `inner = false` (default) keeps unmatched left
  * rows with nulls; `inner = true` drops them. */
object AsOfJoin {
  def apply(left: DataFrame, right: DataFrame,
            leftKeys: Seq[Column], rightKeys: Seq[Column],
            leftOrder: Seq[Column], rightOrder: Seq[Column],
            direction: AsOfDirection = AsOfBackward,
            inner: Boolean = false): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    // the merge semantics are ascending by construction: unwrap a
    // harmless .asc, reject .desc loudly instead of mis-executing
    def ord(c: Column, p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Expression =
      PlanBridge.resolvedExpression(c, p) match {
        case so: SortOrder if so.direction == Ascending => so.child
        case _: SortOrder => throw new IllegalArgumentException(
          "as-of join matches the last right row STRICTLY BEFORE in ascending " +
            "order; pass plain columns (or .asc), not .desc")
        case e => e
      }
    // keys are plain equality columns — a SortOrder here would feed an
    // unevaluable expression into the key projection
    def keyExpr(c: Column, p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Expression =
      PlanBridge.resolvedExpression(c, p) match {
        case _: SortOrder => throw new IllegalArgumentException(
          "as-of join keys are plain equality columns; drop the .asc/.desc")
        case e => e
      }
    // children analyzed independently can still share attribute ids
    // (both sides of the same source, un-aliased): downstream column
    // resolution would silently bind right-side names to left-side
    // values, so refuse instead
    val overlap = lp.outputSet.intersect(rp.outputSet)
    require(overlap.isEmpty,
      s"as-of join sides share attributes ${overlap.map(_.name).mkString(", ")}: " +
        "alias one side's columns (.as) before joining")
    PlanBridge.ofRows(left.sparkSession, AsOfJoinNode(
      leftKeys.map(keyExpr(_, lp)),
      rightKeys.map(keyExpr(_, rp)),
      leftOrder.map(ord(_, lp)),
      rightOrder.map(ord(_, rp)),
      direction, inner,
      lp, rp))
  }
}
