package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Manifest zone-map FILE SKIPPING for the v1 parquet read path — the
  * pruning seam Spark's file-source scans expose: `FileSourceScanExec`
  * hands the query's pushed data filters to its relation's
  * [[FileIndex.listFiles]] at planning time, so an index that answers
  * from the `#zm=` manifest stats drops provably-irrelevant files
  * BEFORE the scan plans, with zero footer I/O.
  *
  * Why it exists: a DV'd snapshot's vectored files read through the v1
  * path (the only path serving `_metadata.row_index` for the position
  * anti-join — v2 FileTables don't expose metadata columns), and a
  * plain `spark.read.parquet` there would lose the manifest-level
  * file skip the clean files keep via the DSv2 ZoneMapScan. With this
  * index both halves of the merge-on-read composition prune on the
  * same stats; a heavily-vectored table no longer degrades to
  * scan-all-DV'd-files between compactions. (Column-mapped tables use
  * the same seam for their physical-schema reads.)
  *
  * Semantics: a file is dropped only when some pushed filter is
  * PROVABLY empty on that file's recorded stats ([[ZoneMaps]]'s
  * conservative provers — stat-less files always read). Row-group
  * pruning inside the surviving files still happens in the parquet
  * reader as usual.
  */
final class ZoneMapFileIndex(
    spark: SparkSession,
    absFiles: Seq[String],
    zm: Map[String, Map[String, ZoneMaps.ColStat]],
    baseDir: String,
    blooms: Map[String, Map[String, (Char, org.apache.spark.util.sketch.BloomFilter)]] = Map.empty)
  extends FileIndex {

  private val hconf = spark.sessionState.newHadoopConf()
  // one stat call per file at construction, exactly what
  // InMemoryFileIndex pays; keyed by scheme-less URI path so the
  // manifest's absolute keys and Hadoop's qualified paths agree
  private val statuses: Seq[(FileStatus, Map[String, ZoneMaps.ColStat],
      Map[String, (Char, org.apache.spark.util.sketch.BloomFilter)])] = {
    val byUriPath = zm.map { case (abs, st) =>
      new Path(abs).toUri.getPath -> st
    }
    val bfByUriPath = blooms.map { case (abs, bf) =>
      new Path(abs).toUri.getPath -> bf
    }
    absFiles.map { f =>
      val p = new Path(f)
      val st = p.getFileSystem(hconf).getFileStatus(p)
      val uri = st.getPath.toUri.getPath
      (st, byUriPath.getOrElse(uri, Map.empty[String, ZoneMaps.ColStat]),
        bfByUriPath.getOrElse(uri,
          Map.empty[String, (Char, org.apache.spark.util.sketch.BloomFilter)]))
    }
  }

  /** (selected, total) of the last `listFiles` — audit/spec hook. */
  @volatile private[graft] var lastSelection: (Int, Int) = (-1, -1)

  // hidden-partitioning tuples recorded in this index's stats — the
  // v1/DV'd read half prunes on them exactly like the DSv2 builder
  private val ptBySource = graft.sources.PartitionTransforms
    .transformsInStats(zm.valuesIterator.flatMap(_.keysIterator).toSet)

  override def toString: String =
    s"ZoneMapFileIndex(${absFiles.size} files, $baseDir)"

  override def rootPaths: Seq[Path] = Seq(new Path(baseDir))
  override def partitionSchema: StructType = StructType(Nil)
  override def sizeInBytes: Long = statuses.map(_._1.getLen).sum
  override def inputFiles: Array[String] = absFiles.toArray
  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // a file drops when some pushed filter is provably empty on its
    // RANGE stats or its per-column BLOOM proves the probed key absent
    // (the DSv2 half's exact pruning rules — the v1/DV'd subset prunes
    // point lookups the same way)
    val withPt = dataFilters ++
      graft.sources.PartitionTransforms.translate(dataFilters, ptBySource)
    val kept = statuses.collect {
      case (st, stats, bf) if (stats.isEmpty && bf.isEmpty) ||
          !withPt.exists(f => ZoneMaps.provablyEmpty(f, stats) ||
            ZoneMaps.bloomEmpty(f, bf)) => st
    }
    lastSelection = (kept.size, statuses.size)
    if (dataFilters.nonEmpty)
      ZoneMapFileIndex.lastFilteredSelection = (kept.size, statuses.size)
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }
}

object ZoneMapFileIndex {
  /** (selected, total) of the most recent FILTERED listFiles on this
    * JVM — the spec/audit hook proving the DV'd subset still skips
    * files (AQE query-stage leaves make executed-plan metric traversal
    * brittle; planning-time accounting is exact). */
  @volatile private[graft] var lastFilteredSelection: (Int, Int) = (-1, -1)

  /** A v1 parquet DataFrame over `absFiles` whose file listing answers
    * pushed filters from the manifest stats (ranges AND per-column
    * blooms). Falls back to the plain path-list read when no stats
    * exist (nothing to prune with). */
  def read(spark: SparkSession, schema: StructType, absFiles: Seq[String],
           zm: Map[String, Map[String, ZoneMaps.ColStat]],
           baseDir: String,
           blooms: Map[String, Map[String, (Char, org.apache.spark.util.sketch.BloomFilter)]] = Map.empty): DataFrame =
    if (zm.isEmpty && blooms.isEmpty)
      spark.read.schema(schema).option("basePath", baseDir)
        .parquet(absFiles: _*)
    else {
      val rel = HadoopFsRelation(
        location = new ZoneMapFileIndex(spark, absFiles, zm, baseDir, blooms),
        partitionSchema = StructType(Nil),
        dataSchema = schema,
        bucketSpec = None,
        fileFormat = new ParquetFileFormat(),
        options = Map("basePath" -> baseDir))(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
      org.apache.spark.sql.graftbridge.PlanBridge.ofRows(
        spark, LogicalRelation(rel, isStreaming = false))
    }
}
