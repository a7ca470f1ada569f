package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, MergeIntoTable, Project, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.{SnapshotSource, SnapshotTable}

/** DELETION-VECTOR READ REWRITE — the analysis rule that makes SQL
  * reads of a DV-carrying snapshot table correct (injected by
  * [[GraftExtensions]], the same seam Delta uses for its own DV scan
  * planning).
  *
  * A `DataSourceV2Relation` over a snapshot whose manifest carries
  * `#dv=` lines is replaced by the MERGE-ON-READ composition
  * [[SnapshotTable.readAt]] builds: the DV-free files keep the full
  * DSv2 zone-map scan, the DV'd files read through the v1 parquet path
  * and LEFT ANTI join the broadcast deleted-position set. A Project of
  * aliases pins the composition's columns onto the ORIGINAL relation's
  * expression ids, so every reference above the relation keeps
  * resolving.
  *
  * DML targets are exempt: MERGE / UPDATE / DELETE statements must keep
  * the raw relation so the injected row-level strategies can recognize
  * the table marker — their transactional implementations apply DVs
  * inside their own reads ([[SnapshotTable.readMatchable]] et al.).
  * Tables without vectors never match (`dvInfo` is None), so the
  * no-DV path planlessly keeps its existing shape, and the composed
  * plan's own relations resolve DV-free (`excludeDv`), which
  * terminates the rewrite after one application. */
class DvReadRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val exempt = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case m: MergeIntoTable => m.targetTable.foreach(exempt.add(_))
      case d: DeleteFromTable => d.table.foreach(exempt.add(_))
      case u: UpdateTable => u.table.foreach(exempt.add(_))
      case _ =>
    }
    plan.resolveOperators {
      case r: DataSourceV2Relation if !exempt.contains(r) =>
        r.table match {
          case t: SnapshotSource.ReadOnlySnapshotTable if t.dvInfo.isDefined =>
            val (root, v) = t.dvInfo.get
            val composed0 = SnapshotTable(root).readAt(spark, v)
              .queryExecution.analyzed
            // re-attach the ORIGINAL relation's catalog + identifier to
            // the recomposed DSv2 relations: the v2 `bucket` transform a
            // bucketed scan reports resolves through the relation's
            // FunctionCatalog, and a path-built relation carries none —
            // without this, a mapped/composed bucketed table silently
            // loses KeyGroupedPartitioning (and with it the
            // storage-partitioned join)
            val composed = composed0.transform {
              case rel: DataSourceV2Relation if rel.catalog.isEmpty =>
                rel.copy(catalog = r.catalog, identifier = r.identifier)
            }
            val out = r.output.map { a =>
              val src = composed.output
                .find(o => spark.sessionState.analyzer.resolver(o.name, a.name))
                .getOrElse(throw new IllegalStateException(
                  s"deletion-vector rewrite of $root v$v lost column ${a.name}"))
              Alias(src, a.name)(exprId = a.exprId, qualifier = a.qualifier)
            }
            Project(out, composed)
          case _ => r
        }
    }
  }
}
