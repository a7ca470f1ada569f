package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource-v2 `TableCatalog` over a directory warehouse of
  * [[SnapshotTable]]s — the piece that upgrades the snapshot format
  * from path-API access to FIRST-CLASS SQL NAMES:
  *
  *   spark.conf.set("spark.sql.catalog.snap", classOf[SnapshotCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.snap.warehouse", "/lake")
  *   spark.sql("SELECT * FROM snap.db.events")                 -- head
  *   spark.sql("SELECT * FROM snap.db.events VERSION AS OF 3") -- SQL time travel
  *   spark.sql("CREATE TABLE snap.db.t (k BIGINT) USING graft-snapshot")
  *
  * Layout: table `ns.../name` lives at `<warehouse>/ns.../name` (a
  * directory is a table iff it has a `_manifests/` child). Reads
  * resolve through the same manifest logic as [[SnapshotSource]] —
  * pinned listing + manifest schema. HEAD loads carry the SQL DML
  * verbs that map onto the transactional commit protocol: `INSERT
  * INTO` / `INSERT OVERWRITE` / CTAS (connector `SupportsWrite`, the
  * V1Write fallback → [[SnapshotTable.commit]] — staged files +
  * atomic manifest publish, never a bare file write), `DELETE
  * FROM` / `TRUNCATE TABLE` (connector `SupportsDelete` →
  * [[SnapshotTable.deleteWhere]], a versioned commit with
  * metadata-only file drops), and `MERGE INTO` in the canonical
  * upsert shape (planner strategy
  * [[graft.plans.MergeIntoSnapshotStrategy]] →
  * [[SnapshotTable.merge]], copy-on-write with zone-map touch
  * detection). Time-travel loads are pinned history:
  * read-only, non-deletable, non-writable. DDL is supported where it
  * maps cleanly: CREATE TABLE commits an EMPTY v0 carrying the
  * declared schema (the K4/K5 if-absent contract — the table is
  * immediately readable with its schema), DROP deletes the directory,
  * RENAME is a directory move, ALTER TABLE ADD COLUMNS is a
  * metadata-only commit (destructive ALTERs stay rejected: schema
  * narrows only by committing data with the evolved schema,
  * per-snapshot). `SELECT * FROM cat.db.\`t$history\`` serves the
  * commit audit trail as a LocalScan metadata table.
  *
  * `VERSION AS OF` maps to [[SnapshotTable.readAt]] semantics;
  * `TIMESTAMP AS OF` resolves through the commit wall-clock each
  * manifest records in-band (`#ts=`, part of the atomic publish —
  * file mtimes would not be a transactional record). */
class SnapshotCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {
  private var catalogName: String = _
  private var warehouse: Path = _

  /** The one catalog function: the v2 `bucket` transform that
    * bucketed snapshot scans report through KeyGroupedPartitioning —
    * Catalyst resolves the transform here when planning storage-
    * partitioned joins (see [[GraftBucketFunction]]). */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "bucket"))

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket")) GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val wh = Option(options.get("warehouse")).getOrElse(throw new IllegalArgumentException(
      s"spark.sql.catalog.$name.warehouse must point at the warehouse directory"))
    warehouse = Paths.get(wh)
    Files.createDirectories(warehouse)
  }

  override def name(): String = catalogName

  private def dirOf(ident: Identifier): Path =
    (ident.namespace() :+ ident.name()).foldLeft(warehouse)(_ resolve _)

  private def isTable(p: Path): Boolean = Files.isDirectory(p.resolve("_manifests"))

  // declares `CREATE TABLE (c INT DEFAULT 5)` / `ALTER COLUMN ... SET
  // DEFAULT` legal against this catalog — Spark's analyzer then folds
  // and validates default expressions before they ever reach us
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  override def tableExists(ident: Identifier): Boolean = isTable(dirOf(ident))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = namespace.foldLeft(warehouse)(_ resolve _)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace)
    val st = Files.list(dir)
    try st.iterator().asScala
      .filter(isTable)
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally st.close()
  }

  private def resolve(ident: Identifier, version: Option[Long]): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val t = SnapshotTable(dir.toString)
    val v = version.getOrElse(t.currentVersion())
    require(v <= t.currentVersion(),
      s"version $v of ${ident.name()} does not exist (head is ${t.currentVersion()})")
    SnapshotSource.readOnlyTable(dir.toString, v,
      s"$catalogName.${(ident.namespace() :+ ident.name()).mkString(".")}",
      deletable = version.isEmpty)
  }

  override def loadTable(ident: Identifier): Table = {
    // metadata table: `SELECT * FROM cat.db.\`t$history\`` — the commit
    // audit trail (version/ts/op/file accounting) via a driver-side
    // LocalScan; only resolves when the base table exists and no real
    // table shadows the $history name
    if (ident.name().endsWith("$history")) {
      val base = Identifier.of(ident.namespace(),
        ident.name().stripSuffix("$history"))
      if (!tableExists(ident) && tableExists(base))
        return new SnapshotSource.HistoryTable(dirOf(base).toString,
          s"$catalogName.${(ident.namespace() :+ ident.name()).mkString(".")}")
    }
    // `t$files` — the current snapshot's per-file inventory, same
    // LocalScan convention as $history
    if (ident.name().endsWith("$files")) {
      val base = Identifier.of(ident.namespace(),
        ident.name().stripSuffix("$files"))
      if (!tableExists(ident) && tableExists(base))
        return new SnapshotSource.FilesTable(dirOf(base).toString,
          s"$catalogName.${(ident.namespace() :+ ident.name()).mkString(".")}")
    }
    resolve(ident, None)
  }

  /** `VERSION AS OF <v>` — SQL time travel onto the pinned snapshot. */
  override def loadTable(ident: Identifier, version: String): Table =
    resolve(ident, Some(version.toLong))

  /** `TIMESTAMP AS OF <t>` — resolved against the commit wall-clock
    * recorded INSIDE each manifest (part of the atomic publish, so
    * authoritative — unlike file mtimes, which survive neither copies
    * nor restores). Spark hands the timestamp in microseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    resolve(ident,
      Some(SnapshotTable(dir.toString).versionAsOf(timestamp / 1000L)))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table = {
    // `PARTITIONED BY (days(ts), truncate(4, c), c)` maps onto the
    // HIDDEN-partitioning spec (`#part=` — see [[PartitionTransforms]]):
    // no directory layout, no schema pollution; writes cluster by the
    // transform tuple and scans prune on manifest-recorded tuples.
    // bucket(n, c) stays with the storage-partitioned-join machinery
    // ([[SnapshotTable.commitBucketed]]), which owns a different
    // manifest contract — refused here to keep the two explicit.
    val spec = partitions.map(transformToSpec).mkString(",")
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(ident)
    // VALIDATE EVERYTHING BEFORE the v0 commit: a bad PARTITIONED BY
    // transform or an ill-typed DEFAULT must refuse while the table
    // does not exist yet — half-creating it would block the corrected
    // re-CREATE with TableAlreadyExists
    import org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
    if (spec.nonEmpty)
      PartitionTransforms.validate(PartitionTransforms.parse(spec), schema)
    ResolveDefaultColumns
      .constantFoldCurrentDefaultsToExistDefaults(schema, "CREATE TABLE")
    val t = SnapshotTable(dirOf(ident).toString)
    val spark = org.apache.spark.sql.SparkSession.active
    try {
      // commit an empty v0 carrying the declared schema: the if-absent
      // DDL contract — immediately readable, typed, zero data files.
      // The manifest schema is recorded NULLABLE throughout (the
      // null-fill invariant — see doCommit); `NOT NULL` declarations
      // become enforced CHECK invariants below, and DEFAULT metadata
      // moves to the `#defaults=` line (toDDL would drop it anyway).
      val bare = StructType(schema.fields.map(f =>
        f.copy(nullable = true,
          metadata = org.apache.spark.sql.types.Metadata.empty)))
      t.commit(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], bare))
      if (spec.nonEmpty) t.setPartitionSpec(spec)
      schema.fields.foreach { f =>
        if (f.metadata.contains(
            ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY))
          t.setColumnDefault(spark, f.name, f.metadata.getString(
            ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY))
        if (!f.nullable) t.setNotNull(spark, f.name)
      }
    } catch { case e: Throwable =>
      // all-or-nothing CREATE: tear the half-created dir down so a
      // corrected statement can re-run
      SnapshotTable.deleteRecursively(dirOf(ident))
      throw e
    }
    loadTable(ident)
  }

  /** Eager DEFAULT validation (parse, analyze, type-check,
    * constant-fold) against a single-field schema — throws before any
    * commit when the expression is unusable. */
  private def validateDefault(col: String,
      dt: org.apache.spark.sql.types.DataType, sql: String): Unit = {
    import org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
    val one = StructType(Seq(org.apache.spark.sql.types.StructField(col, dt,
      metadata = new org.apache.spark.sql.types.MetadataBuilder()
        .putString(ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY,
          sql).build())))
    ResolveDefaultColumns
      .constantFoldCurrentDefaultsToExistDefaults(one, "ALTER TABLE")
    ()
  }

  private def transformToSpec(tr: Transform): String = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, Literal => CLit}
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): String =
      e match {
        case nr: NamedReference if nr.fieldNames.length == 1 =>
          nr.fieldNames()(0)
        case other => throw new IllegalArgumentException(
          s"PARTITIONED BY: unsupported column reference $other " +
            "(top-level columns only)")
      }
    tr.name() match {
      case "identity" => s"identity(${colOf(tr.arguments()(0))})"
      case "days" => s"days(${colOf(tr.arguments()(0))})"
      case "truncate" => tr.arguments() match {
        case Array(w: CLit[_], c) => s"truncate(${w.value()},${colOf(c)})"
        case Array(c, w: CLit[_]) => s"truncate(${w.value()},${colOf(c)})"
        case other => throw new IllegalArgumentException(
          s"PARTITIONED BY truncate: expected (width, col), got " +
            other.mkString("(", ", ", ")"))
      }
      case other => throw new IllegalArgumentException(
        s"PARTITIONED BY: unsupported transform '$other' — supported: " +
          "identity(col) / bare column, days(ts), truncate(n, col); " +
          "bucket(n, col) lives in commitBucketed (storage-partitioned " +
          "joins), years/months/hours are not implemented")
    }
  }

  /** `ALTER TABLE ... ADD COLUMNS` (round 10): a METADATA-ONLY commit —
    * same file listing and stats, widened `#schema`, zero data I/O
    * ([[SnapshotTable.addColumns]]); old files null-fill on read and
    * time travel keeps pre-evolution shapes. Only top-level nullable
    * adds map onto the manifest contract; every other change kind
    * (drop/rename/retype/nested) keeps the explicit refusal —
    * destructive evolution happens per-commit with the evolved
    * schema, never by mutating history. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val t = SnapshotTable(dir.toString)
    // supported shapes, all metadata-only: ADD COLUMNS, RENAME COLUMN,
    // DROP COLUMN (id-based column mapping — old files resolve their
    // frozen physical names, time travel keeps old shapes) and ALTER
    // COLUMN TYPE for lossless widenings (int→long, float→double, …).
    // The WHOLE change list translates up front (unsupported kinds
    // refuse here) and then applies as ONE atomic commit
    // (SnapshotTable.alterSchema): a concurrent writer landing
    // mid-ALTER can never strand a half-applied change set.
    val spark = org.apache.spark.sql.SparkSession.active
    // DEFAULT / NOT NULL changes are metadata side effects on the
    // `#defaults=` / `#checks=` lines, not schema-shape changes —
    // split them out, apply the shape changes as ONE atomic commit,
    // then the invariant changes (Spark sends ALTER COLUMN SET
    // DEFAULT / [SET|DROP] NOT NULL as single-change lists).
    val effects = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
    val translated: Seq[SnapshotTable.SchemaChange] = changes.flatMap {
      case a: TableChange.AddColumn if a.fieldNames().length == 1 =>
        Option(a.defaultValue()).foreach { dv =>
          val name = a.fieldNames()(0)
          // validate the expression BEFORE the schema commit: the
          // common failure (bad/ill-typed DEFAULT) must refuse while
          // nothing has been applied; publishDefaults then retries
          // transient races, so only a JVM death between the two
          // commits can strand the column default
          validateDefault(name, a.dataType(), dv.getSql)
          effects += (() => t.setColumnDefault(spark, name, dv.getSql))
        }
        Seq(SnapshotTable.AddCol(org.apache.spark.sql.types.StructField(
          a.fieldNames()(0), a.dataType(), a.isNullable())))
      case r: TableChange.RenameColumn if r.fieldNames().length == 1 =>
        Seq(SnapshotTable.RenameCol(r.fieldNames()(0), r.newName()))
      case d: TableChange.DeleteColumn if d.fieldNames().length == 1 =>
        Seq(SnapshotTable.DropCol(d.fieldNames()(0)))
      case u: TableChange.UpdateColumnType if u.fieldNames().length == 1 =>
        Seq(SnapshotTable.WidenCol(u.fieldNames()(0), u.newDataType()))
      case dv: TableChange.UpdateColumnDefaultValue
          if dv.fieldNames().length == 1 =>
        val name = dv.fieldNames()(0)
        val sql = Option(dv.newDefaultValue()).map(_.trim).getOrElse("")
        if (sql.nonEmpty)
          t.readSchemaOf(t.currentVersion())
            .flatMap(_.fields.find(_.name == name))
            .foreach(f => validateDefault(name, f.dataType, sql))
        effects += (() =>
          if (sql.isEmpty) { t.dropColumnDefault(name); () }
          else { t.setColumnDefault(spark, name, sql); () })
        Seq.empty
      case n: TableChange.UpdateColumnNullability
          if n.fieldNames().length == 1 =>
        val name = n.fieldNames()(0)
        effects += (() =>
          if (n.nullable()) { t.dropNotNull(name); () }
          else { t.setNotNull(spark, name); () })
        Seq.empty
      case other =>
        throw new UnsupportedOperationException(
          "snapshot tables support ALTER TABLE ADD COLUMNS (top-level, " +
            "nullable, optionally with DEFAULT), RENAME COLUMN, DROP " +
            "COLUMN, ALTER COLUMN TYPE (lossless widening), ALTER " +
            "COLUMN SET/DROP DEFAULT and SET/DROP NOT NULL only — " +
            s"${other.getClass.getSimpleName} is not supported; evolve " +
            "destructively per-commit with the evolved schema")
    }
    if (translated.nonEmpty) t.alterSchema(translated)
    effects.foreach(_())
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!isTable(dir)) false
    else { SnapshotTable.deleteRecursively(dir); true }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(newIdent)
    Files.createDirectories(dirOf(newIdent).getParent)
    Files.move(dirOf(oldIdent), dirOf(newIdent))
  }
}
