package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Command, LeafNode, LogicalPlan}
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.{col, floor, least, lit, max, min, when}
import org.apache.spark.sql.types.{LongType, StructType}
import graft.sources.{Bucketing, GraftMergeable, SnapshotTable}

/** SQL MAINTENANCE VERBS for snapshot tables — the operational surface
  * every production table format exposes in SQL, injected through
  * `SparkSessionExtensions.injectParser` (the same seam Delta uses for
  * VACUUM/OPTIMIZE):
  *
  *   VACUUM <table|'path'> [RETAIN <n> VERSIONS] [DRY RUN]
  *   OPTIMIZE <table|'path'> [FULL] [INTO <n> FILES] [ZORDER BY (c1[, c2[, c3]])]
  *     — bare OPTIMIZE is the SELECTIVE bin-pack (small/DV'd files
  *       only, O(touched)); FULL, INTO n FILES, or ZORDER BY each
  *       request a whole-table shape and run the total rewrite
  *   RESTORE TABLE <table|'path'> [TO] VERSION AS OF <v>
  *   RESTORE TABLE <table|'path'> [TO] TIMESTAMP AS OF '<ts>'
  *
  * The parser intercepts ONLY these three statement shapes (first
  * keyword + full-statement regex match) and delegates everything else
  * verbatim to Spark's parser, so the entire SQL language is
  * untouched. Targets resolve either through a v2 catalog (multipart
  * identifier → TableCatalog.loadTable → [[GraftMergeable]] root) or
  * as a quoted filesystem path.
  *
  * Each verb plans into a driver-side command exec around the
  * EXISTING transactional operation — [[SnapshotTable.vacuum]],
  * [[SnapshotTable.compact]] (with a zone-map-friendly Z-order layout
  * key when ZORDER BY is given), [[SnapshotTable.restore]] — and
  * returns its accounting as rows. OPTIMIZE's grid mapping is linear
  * min→max per column (one O(1)-row aggregate, NO global sort): the
  * layout needs locality, not exact ranks, so the cheap map is the
  * 100 TB-safe choice.
  */
object Maintenance {
  private val VacuumRe =
    """(?is)\s*VACUUM\s+(.+?)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?(\s+DRY\s+RUN)?\s*;?\s*""".r
  private val OptimizeRe =
    """(?is)\s*OPTIMIZE\s+(.+?)(\s+FULL)?(?:\s+INTO\s+(\d+)\s+FILES)?(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*""".r
  private val RestoreRe =
    """(?is)\s*RESTORE\s+TABLE\s+(.+?)\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val RestoreTsRe =
    """(?is)\s*RESTORE\s+TABLE\s+(.+?)\s+(?:TO\s+)?TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""".r
  // only the EXACT constraint shapes are intercepted: every other
  // ALTER TABLE statement (add/rename/drop columns, type changes, …)
  // delegates verbatim to Spark's parser and the v2 catalog path
  private val AddConstraintRe =
    """(?is)\s*ALTER\s+TABLE\s+(.+?)\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""".r
  private val DropConstraintRe =
    """(?is)\s*ALTER\s+TABLE\s+(.+?)\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""".r
  // NOT NULL tightening must be intercepted: Spark's own CheckAnalysis
  // refuses nullable→non-nullable ALTERs outright, while this format
  // enforces NOT NULL as a validated CHECK invariant with the manifest
  // schema deliberately kept nullable (the null-fill contract)
  private val SetNotNullRe =
    """(?is)\s*ALTER\s+TABLE\s+(.+?)\s+ALTER\s+COLUMN\s+`?(\w+)`?\s+SET\s+NOT\s+NULL\s*;?\s*""".r
  private val DropNotNullRe =
    """(?is)\s*ALTER\s+TABLE\s+(.+?)\s+ALTER\s+COLUMN\s+`?(\w+)`?\s+DROP\s+NOT\s+NULL\s*;?\s*""".r

  private def firstWord(sql: String): String =
    sql.trim.takeWhile(!_.isWhitespace).toUpperCase

  /** Some(plan) when `sql` is one of the three maintenance verbs. */
  def parse(sql: String, delegate: ParserInterface): Option[LogicalPlan] = {
    def target(raw: String): MaintenanceTarget = {
      val t = raw.trim
      if ((t.startsWith("'") && t.endsWith("'") && t.length >= 2) ||
        (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2))
        PathTarget(t.substring(1, t.length - 1))
      else NameTarget(delegate.parseMultipartIdentifier(t))
    }
    firstWord(sql) match {
      case "VACUUM" => sql match {
        case VacuumRe(t, keep, dry) =>
          Some(VacuumSnapshot(target(t),
            Option(keep).map(_.toInt).getOrElse(3), dryRun = dry != null))
        case _ => None
      }
      case "OPTIMIZE" => sql match {
        case OptimizeRe(t, full, files, zcols) =>
          val cols = Option(zcols).toSeq
            .flatMap(_.split(',').toSeq)
            .map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty)
          if (cols.size > 3) throw new IllegalArgumentException(
            "OPTIMIZE ... ZORDER BY supports at most 3 columns " +
              s"(got ${cols.size}) — beyond 3 dimensions the interleave " +
              "prunes nothing")
          Some(OptimizeSnapshot(target(t), Option(files).map(_.toInt),
            cols, full = full != null))
        case _ => None
      }
      case "RESTORE" => sql match {
        case RestoreRe(t, v) => Some(RestoreSnapshot(target(t), v.toLong))
        case RestoreTsRe(t, ts) =>
          Some(RestoreSnapshot(target(t), -1L, Some(ts)))
        case _ => None
      }
      case "ALTER" => sql match {
        case AddConstraintRe(t, name, expr) =>
          Some(AddCheckConstraint(target(t), name, expr.trim))
        case DropConstraintRe(t, name) =>
          Some(DropCheckConstraint(target(t), name))
        case SetNotNullRe(t, col) => Some(SetNotNull(target(t), col, set = true))
        case DropNotNullRe(t, col) => Some(SetNotNull(target(t), col, set = false))
        case _ => None // every other ALTER delegates to Spark
      }
      case _ => None
    }
  }

  /** Resolve a maintenance target to the snapshot-table root dir. */
  def rootOf(spark: SparkSession, t: MaintenanceTarget): String = t match {
    case PathTarget(p) =>
      require(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(p).resolve("_manifests")),
        s"'$p' is not a graft snapshot table (no _manifests directory)")
      p
    case NameTarget(parts) =>
      val cm = spark.sessionState.catalogManager
      val (cat, ident) = parts match {
        case Seq(c, ns @ _*) if ns.nonEmpty && cm.isCatalogRegistered(c) =>
          (cm.catalog(c), Identifier.of(ns.init.toArray, ns.last))
        case _ =>
          (cm.currentCatalog, Identifier.of(
            if (parts.size > 1) parts.init.toArray else cm.currentNamespace,
            parts.last))
      }
      cat match {
        case tc: TableCatalog => tc.loadTable(ident) match {
          case gm: GraftMergeable => gm.mergeRoot
          case other => throw new UnsupportedOperationException(
            s"${parts.mkString(".")} (${other.getClass.getSimpleName}) is " +
              "not a graft snapshot table — maintenance verbs apply only " +
              "to snapshot tables")
        }
        case _ => throw new UnsupportedOperationException(
          s"catalog ${cat.name()} is not a TableCatalog")
      }
  }

  private[plans] def attrs(fields: (String, org.apache.spark.sql.types.DataType)*)
      : Seq[AttributeReference] =
    fields.map { case (n, dt) => AttributeReference(n, dt, nullable = false)() }
}

sealed trait MaintenanceTarget
case class PathTarget(path: String) extends MaintenanceTarget
case class NameTarget(parts: Seq[String]) extends MaintenanceTarget

case class VacuumSnapshot(target: MaintenanceTarget, keepVersions: Int,
                          dryRun: Boolean = false)
    extends LeafNode with Command {
  override val output: Seq[Attribute] =
    Maintenance.attrs("data_files_deleted" -> LongType,
      "manifests_expired" -> LongType)
}

/** `OPTIMIZE t [FULL] [INTO n FILES] [ZORDER BY (...)]` — plain
  * OPTIMIZE is the SELECTIVE bin-pack ([[graft.sources.SnapshotTable.optimize]]:
  * small + DV-carrying files only, delta commit); FULL or a ZORDER BY
  * clause is the whole-table rewrite (re-clustering needs every file,
  * and a normalizing compact of a mapped table is by definition total). */
case class OptimizeSnapshot(target: MaintenanceTarget, files: Option[Int],
                            zorderBy: Seq[String], full: Boolean = false)
    extends LeafNode with Command {
  override val output: Seq[Attribute] =
    Maintenance.attrs("version" -> LongType, "n_files" -> LongType,
      "dv_rows_reclaimed" -> LongType, "files_rewritten" -> LongType,
      "files_untouched" -> LongType)
}

/** `timestamp` (a SQL string the session parses) resolves through the
  * same commit wall-clock as `TIMESTAMP AS OF` reads; `version` = -1
  * when the timestamp form is used. */
case class RestoreSnapshot(target: MaintenanceTarget, version: Long,
                           timestamp: Option[String] = None)
    extends LeafNode with Command {
  override val output: Seq[Attribute] =
    Maintenance.attrs("version" -> LongType, "n_files" -> LongType)
}

/** `ALTER TABLE t ADD CONSTRAINT name CHECK (expr)` — validates the
  * existing rows (one distributed scan, zero violations or refuse),
  * then a metadata-only commit; later commits of new row versions
  * enforce it before publishing. */
case class AddCheckConstraint(target: MaintenanceTarget, name: String,
                              expr: String)
    extends LeafNode with Command {
  override val output: Seq[Attribute] =
    Maintenance.attrs("version" -> LongType)
}

/** `ALTER TABLE t DROP CONSTRAINT name` — metadata-only. */
case class DropCheckConstraint(target: MaintenanceTarget, name: String)
    extends LeafNode with Command {
  override val output: Seq[Attribute] =
    Maintenance.attrs("version" -> LongType)
}

/** `ALTER TABLE t ALTER COLUMN c SET|DROP NOT NULL` — the invariant
  * rides the CHECK machinery (add validates existing rows). */
case class SetNotNull(target: MaintenanceTarget, col: String, set: Boolean)
    extends LeafNode with Command {
  override val output: Seq[Attribute] =
    Maintenance.attrs("version" -> LongType)
}

/** Plans the three maintenance commands onto their driver-side execs. */
object MaintenanceStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case v: VacuumSnapshot => MaintenanceExec(v.output, { spark =>
      val (d, m) = SnapshotTable(Maintenance.rootOf(spark, v.target))
        .vacuum(v.keepVersions, dryRun = v.dryRun)
      Array(new GenericInternalRow(Array[Any](d.toLong, m.toLong)): InternalRow)
    }) :: Nil
    case o: OptimizeSnapshot
        if !o.full && o.zorderBy.isEmpty && o.files.isEmpty =>
      // selective bin-pack: rewrite only small/DV'd files, O(touched)
      // delta commit, everything else carries by reference — the
      // 100 TB-safe default. `INTO n FILES` is an explicit whole-table
      // shape request, so it implies FULL (the pre-selective
      // semantics); FULL/ZORDER below stay the total rewrite.
      MaintenanceExec(o.output, { spark =>
        val t = SnapshotTable(Maintenance.rootOf(spark, o.target))
        val r = t.optimize(spark, targetFiles = o.files.getOrElse(0))
        Array(new GenericInternalRow(Array[Any](
          r.version, t.fileCount(r.version).toLong, r.dvRowsReclaimed,
          r.filesRewritten.toLong, r.filesUntouched.toLong)): InternalRow)
      }) :: Nil
    case o: OptimizeSnapshot => MaintenanceExec(o.output, { spark =>
      val t = SnapshotTable(Maintenance.rootOf(spark, o.target))
      val sortKey = o.zorderBy match {
        case Nil => None
        case Seq(c) => Some(col(c)) // 1-D: plain range-cluster on the column
        case cols =>
          // linear min→max grid map per column; nulls land on cell 0 —
          // layout quality only, correctness never depends on the key.
          // Bounds come from the MANIFEST zone maps when every file
          // carries the column's stat in a directly-usable domain
          // (plain integral/floating Spark types) — zero I/O, the
          // 100 TB path; anything else (dates, decimals, missing
          // stats) falls back to one tiny min/max aggregate scan.
          val tableSchema = t.read(spark).schema
          val ts = t.tableStats()
          import org.apache.spark.sql.types._
          def manifestBounds(c: String): Option[(Double, Double)] = for {
            f <- tableSchema.fields.find(_.name == c)
            st <- ts.cols.get(c)
            b <- (st.kind, f.dataType) match {
              case ('l', ByteType | ShortType | IntegerType | LongType) =>
                scala.util.Try(
                  (st.min.toLong.toDouble, st.max.toLong.toDouble)).toOption
              case ('d', FloatType | DoubleType) =>
                scala.util.Try((st.min.toDouble, st.max.toDouble)).toOption
              case _ => None
            }
          } yield b
          val fromManifest = cols.map(manifestBounds)
          val bounds: Seq[Option[(Double, Double)]] =
            if (fromManifest.forall(_.isDefined)) fromManifest
            else {
              val df = t.read(spark)
              val aggs = cols.flatMap(c => Seq(
                min(col(c).cast("double")), max(col(c).cast("double"))))
              val row = df.agg(aggs.head, aggs.tail: _*).head()
              cols.indices.map(i =>
                if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) None
                else Some((row.getDouble(2 * i), row.getDouble(2 * i + 1))))
            }
          val gmax = if (cols.size == 2) 65535L else 1023L
          val grids = cols.zip(bounds).map {
            case (_, None) => lit(0L)
            case (_, Some((lo, hi))) if lo == hi => lit(0L)
            case (c, Some((lo, hi))) =>
              val g = floor((col(c).cast("double") - lit(lo)) * gmax / (hi - lo))
              when(col(c).isNull, lit(0L))
                .otherwise(least(lit(gmax), g.cast("long")))
          }
          Some(
            if (cols.size == 2) Bucketing.zorderKey(grids(0), grids(1))
            else Bucketing.zorder3Key(grids(0), grids(1), grids(2)))
      }
      // compaction MATERIALIZES deletion vectors: the rewrite reads the
      // DV-filtered snapshot and the replace commit drops every `#dv=`
      // line. Reclaimed is counted from the version the compaction
      // actually REPLACED (v - 1), not a pre-compact head read — a
      // racing DV delete landing between the read and the publish
      // would otherwise mis-report the count
      val v = t.compact(spark, o.files.getOrElse(8), sortKey)
      val reclaimed = t.dvRelOf(v - 1)
        .valuesIterator.map(_.count).sum
      Array(new GenericInternalRow(
        Array[Any](v, t.fileCount(v).toLong, reclaimed,
          t.fileCount(v - 1).toLong, 0L)): InternalRow)
    }) :: Nil
    case r: RestoreSnapshot => MaintenanceExec(r.output, { spark =>
      val t = SnapshotTable(Maintenance.rootOf(spark, r.target))
      val target = r.timestamp match {
        case None => r.version
        case Some(ts) =>
          // the same commit-wall-clock resolution as TIMESTAMP AS OF
          // reads: parse the literal with the session's own timestamp
          // semantics, resolve to the newest retained version at/before
          val micros = org.apache.spark.sql.catalyst.util.DateTimeUtils
            .stringToTimestampAnsi(
              org.apache.spark.unsafe.types.UTF8String.fromString(ts),
              java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone))
          t.versionAsOf(micros / 1000L)
      }
      val v = t.restore(target)
      Array(new GenericInternalRow(
        Array[Any](v, t.fileCount(v).toLong)): InternalRow)
    }) :: Nil
    case c: AddCheckConstraint => MaintenanceExec(c.output, { spark =>
      val v = SnapshotTable(Maintenance.rootOf(spark, c.target))
        .addCheckConstraint(spark, c.name, c.expr)
      Array(new GenericInternalRow(Array[Any](v)): InternalRow)
    }) :: Nil
    case c: DropCheckConstraint => MaintenanceExec(c.output, { spark =>
      val v = SnapshotTable(Maintenance.rootOf(spark, c.target))
        .dropCheckConstraint(c.name)
      Array(new GenericInternalRow(Array[Any](v)): InternalRow)
    }) :: Nil
    case c: SetNotNull => MaintenanceExec(c.output, { spark =>
      val t = SnapshotTable(Maintenance.rootOf(spark, c.target))
      val v = if (c.set) t.setNotNull(spark, c.col) else t.dropNotNull(c.col)
      Array(new GenericInternalRow(Array[Any](v)): InternalRow)
    }) :: Nil
    case _ => Nil
  }
}

/** Driver-side command exec: `run` does the transactional work once
  * (commands execute eagerly via executeCollect) and returns the
  * accounting rows. */
case class MaintenanceExec(output: Seq[Attribute],
                           run: SparkSession => Array[InternalRow])
    extends LeafExecNode {
  @transient private lazy val done: Array[InternalRow] = run(session)
  override def executeCollect(): Array[InternalRow] = done
  override protected def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(done.toSeq, 1)
}

/** Delegating parser: intercepts the three maintenance verbs, hands
  * every other statement (and every non-plan parse) to Spark's own
  * parser unchanged. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    Maintenance.parse(sqlText, delegate).getOrElse(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
