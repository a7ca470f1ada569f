package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, Expression,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.IntegerType

/** Whole-operator Catalyst piece (SURVEY.md §4.3 beyond scalar
  * Expressions): native top-k-per-group.
  *
  * The composed form — `row_number().over(Window.partitionBy(keys)
  * .orderBy(ord)) <= k` — plans as Exchange → Sort(keys ++ ord) →
  * WindowGroupLimit → Window → Filter: every surviving row is fully
  * sorted within its partition, and (pre-3.5 semantics) every row is
  * shuffled. This operator replaces the whole pipeline with the shape a
  * purpose-built engine uses:
  *
  *  - map side (partial): one pass per input partition keeping a
  *    bounded k-row heap per group (hash map of heaps, O(n·log k),
  *    memory O(groups·k) — documented envelope, same family as hash
  *    aggregation); only those ≤k survivors per (group, partition) are
  *    shuffled;
  *  - reduce side (final): same bounded-heap pass over the shuffled
  *    survivors, then each group's heap is drained, sorted (k·log k on
  *    ≤k rows — never a full partition sort), and emitted with a
  *    1-based rank column identical to `row_number()`.
  *
  * No Sort, no WindowExec, shuffle volume capped at k rows per group
  * per map partition. With a strict total order (ties broken in the
  * ordering, as every catalog query does) the result is deterministic
  * and exactly equal to the window form — the DuckDB oracle for
  * `q_topk_per_group` is the plain row_number() SQL.
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"topKPerGroup needs k >= 1, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerGroupNode → partial + final exec
  * (EnsureRequirements inserts the key exchange between them, or elides
  * it when the child is already clustered on the keys). */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(keys, order, k, rankAttr, child) =>
      val partial = TopKPerGroupExec(keys, order, k, None, planLater(child))
      TopKPerGroupExec(keys, order, k, Some(rankAttr), partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Option[AttributeReference],  // Some = final (emit rank), None = partial
    child: SparkPlan) extends SparkPlan with UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)
  override def requiredChildDistribution: Seq[Distribution] =
    if (rankAttr.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String =
    if (rankAttr.isEmpty) "TopKPerGroupPartial" else "TopKPerGroup"
  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    Map("numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keys = groupExprs
    val ord = order
    val limit = k
    val emitRank = rankAttr.isDefined
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(keys, childOutput)
      val rowOrdering = GenerateOrdering.generate(ord, childOutput)
      // root of each heap = the WORST kept row under the ordering, so a
      // better incoming row evicts it in O(log k)
      val worstFirst = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = rowOrdering.compare(b, a)
      }
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      val toUnsafe = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
      while (iter.hasNext) {
        val r = iter.next()
        val row = r match {
          case u: UnsafeRow => u
          case other => toUnsafe(other)
        }
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](limit, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) heap.add(row.copy())
        else if (rowOrdering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      val groups = heaps.values().iterator()
      if (!emitRank) {
        // partial: order within the group doesn't matter yet
        new Iterator[InternalRow] {
          private var cur: java.util.Iterator[UnsafeRow] = java.util.Collections.emptyIterator()
          override def hasNext: Boolean = {
            while (!cur.hasNext && groups.hasNext) cur = groups.next().iterator()
            cur.hasNext
          }
          override def next(): InternalRow = { numOutputRows += 1; cur.next() }
        }
      } else {
        val outProj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        new Iterator[InternalRow] {
          private var cur: Array[UnsafeRow] = Array.empty
          private var i = 0
          override def hasNext: Boolean = {
            while (i >= cur.length && groups.hasNext) {
              cur = groups.next().toArray(Array.empty[UnsafeRow])
              java.util.Arrays.sort(cur, rowOrdering)
              i = 0
            }
            i < cur.length
          }
          override def next(): InternalRow = {
            rankRow.setInt(0, i + 1)
            val out = outProj(joined(cur(i), rankRow))
            i += 1
            numOutputRows += 1
            out
          }
        }
      }
    }
  }
}

/** DataFrame-level entry point for the native operator. */
object TopKPerGroup {
  /** Top `k` rows of `df` per `keys` group under `order` (which should
    * be a strict total order for deterministic output), with a 1-based
    * `rankName` int column appended — `row_number()` semantics, native
    * physical execution. */
  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
            rankName: String = "rn"): DataFrame = {
    // case-insensitive: Spark resolves columns case-insensitively by
    // default, so "RN" vs "rn" would still be an ambiguous reference
    require(!df.columns.exists(_.equalsIgnoreCase(rankName)),
      s"input already has a column named '$rankName': pass a different rankName")
    val child = df.queryExecution.analyzed
    val sortOrder = order.map(c => PlanBridge.resolvedExpression(c, child) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    PlanBridge.ofRows(df.sparkSession,
      TopKPerGroupNode(keys.map(PlanBridge.resolvedExpression(_, child)),
        sortOrder, k, rankAttr, child))
  }
}
