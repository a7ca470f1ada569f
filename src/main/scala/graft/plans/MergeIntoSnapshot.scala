package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{
  And, Attribute, AttributeReference, EqualTo, Expression, Literal,
  SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{
  Assignment, InsertAction, LogicalPlan, MergeIntoTable, SubqueryAlias,
  UpdateAction, UpdateTable}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.{
  DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}
import graft.sources.{GraftMergeable, SnapshotTable}

/** SQL `MERGE INTO` for snapshot tables (round-8 verdict item 4 — the
  * one transactional verb SQL users could not reach; INSERT/DELETE/
  * CTAS already route through the DSv2 connector).
  *
  * Spark's analyzer resolves `MergeIntoTable` fully for any v2
  * relation and only the PLANNER rejects it for tables without
  * `SupportsRowLevelOperations` (`BasicOperators` →
  * ddlUnsupportedTemporarilyError — verified empirically on 4.1.2), so
  * an injected strategy that claims the resolved plan first is the
  * minimal, version-stable seam: it validates the canonical
  * copy-on-write upsert shape and routes into the existing
  * [[SnapshotTable.merge]] — zone-map touch detection, file-local
  * rewrite, atomic put-if-absent publish, untouched manifest lines
  * carried by reference (the same one-verb-one-method mapping DELETE
  * FROM uses via `SupportsDelete.deleteWhere`).
  *
  * Supported shape (SQL MERGE's own canonical upsert):
  *
  *   MERGE INTO cat.ns.t t USING src s
  *   ON t.k1 = s.k1 [AND t.k2 = s.k2 ...]
  *   WHEN MATCHED THEN UPDATE SET *            -- or the expansion
  *   WHEN NOT MATCHED THEN INSERT *            --   SET/VALUES by name
  *
  * with the source carrying exactly the table's columns. Conditional
  * actions, DELETE actions, partial-column assignments and NOT MATCHED
  * BY SOURCE are rejected with an explicit error (they have no
  * [[SnapshotTable.merge]] mapping yet); non-graft targets fall
  * through untouched (`Nil`) to Spark's own handling.
  */
object MergeIntoSnapshotStrategy extends SparkStrategy {

  private def unwrap(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, child) => unwrap(child)
    case other => other
  }

  private def fail(why: String): Nothing =
    throw new UnsupportedOperationException(
      "MERGE INTO a graft-snapshot table supports the canonical " +
        "copy-on-write upsert — ON an AND of target.k = source.k " +
        "equi-keys, WHEN MATCHED THEN UPDATE SET *, WHEN NOT MATCHED " +
        "THEN INSERT *, source columns = table columns. Unsupported " +
        s"here: $why")

  /** The connector table behind the target, whether the optimizer has
    * already pushed the relation down to a scan or not. */
  private[plans] def tableOf(p: LogicalPlan): Option[org.apache.spark.sql.connector.catalog.Table] =
    unwrap(p) match {
      case r: DataSourceV2Relation => Some(r.table)
      case r: DataSourceV2ScanRelation => Some(r.relation.table)
      case _ => None
    }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case m: MergeIntoTable =>
      tableOf(m.targetTable) match {
        case Some(gm: GraftMergeable) =>
          val root = gm.mergeRoot
          val tOut = m.targetTable.outputSet
          val sOut = m.sourceTable.outputSet
          if (m.withSchemaEvolution) fail("WITH SCHEMA EVOLUTION")

          def conjuncts(e: Expression): Seq[Expression] = e match {
            case And(l, rr) => conjuncts(l) ++ conjuncts(rr)
            case x => Seq(x)
          }
          val keys = conjuncts(m.mergeCondition).map {
            case EqualTo(a: AttributeReference, b: AttributeReference)
                if tOut.contains(a) && sOut.contains(b) &&
                  a.name.equalsIgnoreCase(b.name) => a.name
            case EqualTo(b: AttributeReference, a: AttributeReference)
                if tOut.contains(a) && sOut.contains(b) &&
                  a.name.equalsIgnoreCase(b.name) => a.name
            case other =>
              fail(s"ON term `${other.sql}` (need target.k = source.k, same name)")
          }

          // what SET * / INSERT * resolve to: one bare source attribute
          // per target column, covering every column
          def checkAssignments(what: String, as: Seq[Assignment]): Unit = {
            val assigned = as.map {
              case Assignment(k: AttributeReference, v: AttributeReference)
                  if tOut.contains(k) && sOut.contains(v) &&
                    k.name.equalsIgnoreCase(v.name) => k.name
              case a =>
                fail(s"$what assignment `${a.sql}` (need target.col = source.col, same name)")
            }
            val missing = m.targetTable.output.map(_.name)
              .filterNot(n => assigned.exists(_.equalsIgnoreCase(n)))
            if (missing.nonEmpty)
              fail(s"$what must cover every table column (missing: ${missing.mkString(", ")})")
          }
          m.matchedActions match {
            case Seq(ua: UpdateAction) if ua.condition.isEmpty =>
              checkAssignments("WHEN MATCHED UPDATE", ua.assignments)
            case other =>
              fail(s"matched actions ${other.map(_.getClass.getSimpleName).mkString(", ")} " +
                "(need exactly one unconditional UPDATE SET *)")
          }
          m.notMatchedActions match {
            case Seq(ia: InsertAction) if ia.condition.isEmpty =>
              checkAssignments("WHEN NOT MATCHED INSERT", ia.assignments)
            case other =>
              fail(s"not-matched actions ${other.map(_.getClass.getSimpleName).mkString(", ")} " +
                "(need exactly one unconditional INSERT *)")
          }
          if (m.notMatchedBySourceActions.nonEmpty)
            fail("WHEN NOT MATCHED BY SOURCE")

          MergeIntoSnapshotExec(root, m.sourceTable, keys) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }
}

/** SQL `UPDATE` for snapshot tables — the same planner seam as MERGE
  * (Spark's analyzer resolves `UpdateTable` for any v2 relation; only
  * the planner rejects it without row-level-operation support), routed
  * into the existing [[SnapshotTable.updateWhere]]: zone-map file
  * classification (only files the predicate can match rewrite),
  * schema-invariant copy-on-write SET, atomic publish. Supports any
  * WHERE predicate and any SET expressions over the table's own
  * top-level columns (`SET v = v + 1` works — assignment values are
  * re-bound by NAME against the rewrite scan); nested-field targets
  * and subqueries are refused explicitly; non-graft targets fall
  * through to Spark's own handling. */
object UpdateSnapshotStrategy extends SparkStrategy {
  private def fail(why: String): Nothing =
    throw new UnsupportedOperationException(
      "UPDATE on a graft-snapshot table supports SET <top-level col> = " +
        "<expression over the table's columns> [WHERE <predicate over " +
        s"the table's columns>] — subquery-free. Unsupported here: $why")

  /** Re-bind a resolved expression by column NAME so it can apply to
    * the rewrite-time scan (whose attribute ids differ from the
    * analyzed plan's). */
  private def unbind(e: Expression, scope: org.apache.spark.sql.catalyst.expressions.AttributeSet,
                     what: String): Expression = {
    if (e.exists(_.isInstanceOf[SubqueryExpression])) fail(s"$what carries a subquery")
    e.transform {
      case a: AttributeReference if scope.contains(a) =>
        UnresolvedAttribute.quoted(a.name)
      case a: AttributeReference =>
        fail(s"$what references `${a.name}` from outside the table")
    }
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case u: UpdateTable =>
      MergeIntoSnapshotStrategy.tableOf(u.table) match {
        case Some(gm: GraftMergeable) =>
          val scope = u.table.outputSet
          val topLevel = u.table.output.map(_.name).toSet
          val set = u.assignments.map {
            case Assignment(k: AttributeReference, v)
                if scope.contains(k) && topLevel.contains(k.name) =>
              k.name -> unbind(v, scope, s"SET ${k.name}")
            case a => fail(s"assignment target `${a.key.sql}` is not a top-level table column")
          }
          val cond = u.condition
            .map(unbind(_, scope, "WHERE"))
            .getOrElse(Literal.TrueLiteral)
          UpdateSnapshotExec(gm.mergeRoot, set, cond) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }
}

/** Driver-side command exec for SQL UPDATE: one transactional
  * [[SnapshotTable.updateWhere]] call (the rewrite itself is the
  * ordinary distributed scan-and-write). */
case class UpdateSnapshotExec(root: String, set: Seq[(String, Expression)],
                              cond: Expression) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil

  @transient private lazy val done: Array[InternalRow] = {
    val spark = SparkSession.active
    SnapshotTable(root).updateWhere(spark, ColumnBridge.column(cond),
      set.map { case (n, e) => n -> ColumnBridge.column(e) }.toMap)
    Array.empty[InternalRow]
  }

  override def executeCollect(): Array[InternalRow] = done

  override protected def doExecute(): RDD[InternalRow] = {
    done
    sparkContext.parallelize(Seq.empty[InternalRow], 1)
  }
}

/** Driver-side command exec: runs the validated upsert through
  * [[SnapshotTable.merge]] once (MergeIntoTable is a BinaryCommand, so
  * `spark.sql` executes this eagerly via executeCollect) and returns
  * no rows. The source logical plan executes as an ordinary
  * distributed DataFrame inside merge — only the verb is driver-side,
  * never the data. */
case class MergeIntoSnapshotExec(root: String, source: LogicalPlan,
                                 keys: Seq[String]) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil

  @transient private lazy val done: Array[InternalRow] = {
    val spark = SparkSession.active
    SnapshotTable(root).merge(spark, PlanBridge.ofRows(spark, source), keys)
    Array.empty[InternalRow]
  }

  override def executeCollect(): Array[InternalRow] = done

  override protected def doExecute(): RDD[InternalRow] = {
    done
    sparkContext.parallelize(Seq.empty[InternalRow], 1)
  }
}
