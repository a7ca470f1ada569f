package graft.sources

import java.net.{URLDecoder, URLEncoder}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.{sources => v1}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** MANIFEST ZONE MAPS — file-level data skipping for [[SnapshotTable]],
  * the same idea as Delta's per-file stats / Iceberg's manifest metrics:
  * each commit records min/max per column PER DATA FILE inside the
  * manifest it publishes, and the read path drops whole files whose
  * [min, max] provably cannot satisfy a pushed filter — BEFORE the scan
  * plans, so pruned files are never listed, opened, or footer-read.
  *
  * This is the layer ABOVE parquet row-group pruning (which still
  * applies to the files that survive): row-group stats cost a footer
  * read PER FILE per query, zone maps cost O(pruned decision) driver
  * work on stats already in the manifest. At 100 TB with clustered
  * layouts (see [[SnapshotTable.compact]]'s sortKey, [[Bucketing]]),
  * a selective predicate reads the few files covering its key range
  * instead of opening every footer in the table.
  *
  * Stats collection runs at COMMIT time (one footer read per newly
  * written file, driver-side, O(new files)) — amortized into the write
  * exactly like Delta's stats collection, and carried forward by append
  * commits so a file is footer-read once in its lifetime.
  *
  * SOUNDNESS contract (what makes skipping safe, mirrored from Spark's
  * own parquet filter pushdown):
  *  - only [[provablyEmpty]] predicates drop a file; anything not
  *    understood (casts, UDFs, IsNull, missing stats) keeps it;
  *  - string min/max compare BYTEWISE via [[UTF8String]] — parquet
  *    UTF8 stats are unsigned-byte-lexicographic, and UTF-16
  *    `String.compareTo` disagrees with that order beyond the BMP;
  *  - min/max ignore nulls, which is sound because the comparison
  *    predicates being pruned on are never null-satisfied.
  */
object ZoneMaps {

  /** Per-column file statistics. `kind`: 'l' = integral (INT32/INT64,
    * incl. date days and timestamp micros), 'd' = floating, 's' =
    * UTF-8 string. min/max are string-encoded in the stat domain.
    * `nulls` is the file's null count for the column, or -1 when the
    * footer didn't record one (legacy `#zm=` lines decode as -1 too)
    * — needed because min/max ignore nulls: proving "every row
    * matches predicate P" (metadata-only deletes) additionally
    * requires nulls == 0, since a null row satisfies neither P nor
    * NOT P and must survive a delete either way. */
  final case class ColStat(kind: Char, min: String, max: String,
                           nulls: Long = -1L)

  /** Everything the manifest records about one data file: its exact
    * row count (from the footer's block metadata — parquet always has
    * it; -1 only when decoding a legacy pre-rowcount `#zm=` line) plus
    * the per-column [min, max, nulls] stats. Row counts are what turn
    * the manifest into a statistics catalog: `count(*)` and the DSv2
    * planning `numRows` estimate become O(manifest) driver reads —
    * no file I/O — exactly like Delta/Iceberg `numRecords` metrics. */
  final case class FileStats(rows: Long, cols: Map[String, ColStat],
                             blooms: Map[String, (Char, org.apache.spark.util.sketch.BloomFilter)] = Map.empty)

  // ---- commit-side: footer → stats ----

  /** Read `absPath`'s parquet footer and fold its row-group column
    * statistics into one per-file [min, max] per eligible column.
    * A column missing valid stats in ANY row group is dropped —
    * partial coverage cannot prune soundly. */
  def collect(conf: org.apache.hadoop.conf.Configuration,
              absPath: String): FileStats = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(absPath), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      if (blocks.isEmpty) return FileStats(rows, Map.empty)
      val perBlock: Seq[Map[String, ColStat]] = blocks.map { b =>
        b.getColumns.asScala.iterator.flatMap { c =>
          val pt = c.getPrimitiveType
          if (c.getPath.size != 1) None
          else {
            val st = c.getStatistics
            if (st == null || st.isEmpty || !st.hasNonNullValue) None
            else {
              val isString = pt.getLogicalTypeAnnotation != null &&
                pt.getLogicalTypeAnnotation.isInstanceOf[
                  org.apache.parquet.schema.LogicalTypeAnnotation.StringLogicalTypeAnnotation]
              val nulls = if (st.isNumNullsSet) st.getNumNulls else -1L
              (pt.getPrimitiveTypeName, isString) match {
                case (INT32 | INT64, _) =>
                  Some(c.getPath.toDotString ->
                    ColStat('l', st.genericGetMin.toString, st.genericGetMax.toString, nulls))
                case (FLOAT | DOUBLE, _) =>
                  Some(c.getPath.toDotString ->
                    ColStat('d', st.genericGetMin.toString, st.genericGetMax.toString, nulls))
                case (BINARY, true) =>
                  val mn = st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
                  val mx = st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
                  Some(c.getPath.toDotString ->
                    ColStat('s', mn.toStringUsingUTF8, mx.toStringUsingUTF8, nulls))
                case _ => None // boolean / int96 / decimal-binary: skip
              }
            }
          }
        }.toMap
      }
      // fold: a column survives only if every block has it
      val common = perBlock.map(_.keySet).reduce(_ intersect _)
      val cols = common.iterator.map { col =>
        col -> fold(perBlock.map(_(col)))
      }.toMap
      FileStats(rows, cols)
    } finally r.close()
  }

  /** Fold several same-column stats into one: min of mins, max of
    * maxes, null counts sum (unknown if any input is unknown). Used
    * block→file at commit and file→table in
    * [[SnapshotTable.tableStats]]. */
  def fold(ss: Seq[ColStat]): ColStat = {
    val k = ss.head.kind
    ColStat(k,
      ss.map(_.min).reduce((a, b) => if (cmp(k, a, b) <= 0) a else b),
      ss.map(_.max).reduce((a, b) => if (cmp(k, a, b) >= 0) a else b),
      if (ss.exists(_.nulls < 0)) -1L else ss.map(_.nulls).sum)
  }

  // ---- manifest encoding: one `#zm=` comment line per file ----
  // #zm=<enc path>|<enc col>=<kind>:<enc min>:<enc max>|...
  // URL-encoding covers the delimiter characters in values.

  val Prefix = "#zm="

  /** (selected, total) of the most recent FILTERED DSv2 pushdown on
    * this JVM — the spec/audit hook the partition-pruning proofs pin
    * (planning-time accounting; executed-plan metric traversal is
    * brittle under AQE). */
  @volatile private[graft] var lastBuilderSelection: (Int, Int) = (-1, -1)

  /** PER-FILE BLOOM FILTERS — the point-lookup complement to min/max
    * zone maps (Delta's bloom-filter index / parquet bloom filters at
    * the manifest level): uniform high-cardinality keys give every
    * file the same [min, max], so range stats prune nothing, but a
    * per-file bloom over `xxhash64(key)` rejects files that provably
    * lack an equality probe's value. Lines are
    * `#bfl=<rel>:<col>:<base64(spark BloomFilter)>`, opt-in per
    * commit ([[SnapshotTable.commitWithBlooms]]) because the build
    * reads the key column back (one distributed aggregation per
    * batch) and the bits ride inline in the manifest — right up to a
    * few hundred KB per file; past that (1M+ rows/file at 1% fpp) the
    * honest design moves the bits to sidecar files referenced from
    * the manifest, which this line format was shaped to allow. */
  val BloomPrefix = "#bfl="

  /** `kind` is the hash domain the bloom was BUILT over — 'l' =
    * integral keys hashed as `xxhash64(cast(k as bigint))`, 's' =
    * strings hashed as `xxhash64(k)`. Recording it (instead of
    * trusting probe-literal types) is what makes the skip safe: an
    * int32 column probed with a long literal still hashes into the
    * same canonical domain the build used. */
  def encodeBloomLine(relPath: String, col: String, kind: Char,
                      bytes: Array[Byte]): String =
    BloomPrefix + enc(relPath) + ":" + enc(col) + ":" + kind + ":" +
      java.util.Base64.getEncoder.encodeToString(bytes)

  /** Parse a `#bfl=` line → (relPath, col, kind, parsed bloom);
    * malformed lines yield None (blooms are an optimization, never a
    * read failure). */
  def decodeBloomLine(line: String)
      : Option[(String, String, Char, org.apache.spark.util.sketch.BloomFilter)] =
    if (!line.startsWith(BloomPrefix)) None
    else scala.util.Try {
      val Array(rel, col, kind, b64) = line.stripPrefix(BloomPrefix).split(':')
      (dec(rel), dec(col), kind.charAt(0),
        org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(java.util.Base64.getDecoder.decode(b64))))
    }.toOption

  /** The canonical bloom hash of an equality-probe value in `kind`'s
    * domain, or None when the value does not coerce (no skip). */
  private def bloomHash(kind: Char, value: Any): Option[Long] = (kind, value) match {
    case (_, null) => None
    case ('l', v: java.lang.Number) if !v.isInstanceOf[java.lang.Double] &&
      !v.isInstanceOf[java.lang.Float] =>
      Some(XxHash64(Seq(Literal(v.longValue)), 42L).eval(null).asInstanceOf[Long])
    case ('s', v: UTF8String) =>
      Some(XxHash64(Seq(Literal(v, org.apache.spark.sql.types.StringType)), 42L)
        .eval(null).asInstanceOf[Long])
    case ('s', v: String) =>
      Some(XxHash64(Seq(Literal(UTF8String.fromString(v),
        org.apache.spark.sql.types.StringType)), 42L).eval(null).asInstanceOf[Long])
    case _ => None
  }

  private def bloomMiss(blooms: Map[String, (Char, org.apache.spark.util.sketch.BloomFilter)],
                        col: String, value: Any): Boolean =
    blooms.get(col).exists { case (kind, bf) =>
      bloomHash(kind, value).exists(h => !bf.mightContainLong(h))
    }

  /** True iff equality-shaped conjunct `e` is PROVABLY unsatisfiable
    * on a file whose per-column blooms are `blooms` — no false
    * negatives in the bloom means a miss is a proof of absence. */
  def bloomEmpty(e: Expression,
                 blooms: Map[String, (Char, org.apache.spark.util.sketch.BloomFilter)]): Boolean =
    if (blooms.isEmpty) false
    else e match {
      case EqualTo(a: Attribute, l: Literal) => bloomMiss(blooms, a.name, l.value)
      case EqualTo(l: Literal, a: Attribute) => bloomMiss(blooms, a.name, l.value)
      case EqualNullSafe(a: Attribute, l: Literal) if l.value != null =>
        bloomMiss(blooms, a.name, l.value)
      case EqualNullSafe(l: Literal, a: Attribute) if l.value != null =>
        bloomMiss(blooms, a.name, l.value)
      case In(a: Attribute, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        vs.forall(v => bloomMiss(blooms, a.name, v.asInstanceOf[Literal].value))
      case InSet(a: Attribute, vs) if vs.nonEmpty =>
        vs.forall(v => bloomMiss(blooms, a.name, v))
      case And(x, y) => bloomEmpty(x, blooms) || bloomEmpty(y, blooms)
      case Or(x, y) => bloomEmpty(x, blooms) && bloomEmpty(y, blooms)
      case _ => false
    }

  /** [[bloomEmpty]] for v1 `Filter`s (the runtime-filtering shape). */
  def bloomEmptySource(f: v1.Filter,
                       blooms: Map[String, (Char, org.apache.spark.util.sketch.BloomFilter)]): Boolean =
    if (blooms.isEmpty) false
    else f match {
      case v1.EqualTo(c, value) => bloomMiss(blooms, c, value)
      case v1.EqualNullSafe(c, value) if value != null => bloomMiss(blooms, c, value)
      case v1.In(c, values) => values.nonEmpty && values.forall(bloomMiss(blooms, c, _))
      case v1.And(x, y) => bloomEmptySource(x, blooms) || bloomEmptySource(y, blooms)
      case v1.Or(x, y) => bloomEmptySource(x, blooms) && bloomEmptySource(y, blooms)
      case _ => false
    }

  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String = URLDecoder.decode(s, "UTF-8")

  def encodeLine(relPath: String, fs: FileStats): String =
    Prefix + enc(relPath) +
      (if (fs.rows >= 0) s"|@=${fs.rows}" else "") +
      fs.cols.toSeq.sortBy(_._1).map { case (c, s) =>
        s"|${enc(c)}=${s.kind}:${enc(s.min)}:${enc(s.max)}:${s.nulls}"
      }.mkString

  /** Legacy-shape overload (column stats only, row count unknown). */
  def encodeLine(relPath: String, stats: Map[String, ColStat]): String =
    encodeLine(relPath, FileStats(-1L, stats))

  /** Parse a `#zm=` line back to (relPath, file stats); malformed
    * lines yield None (stats are an optimization, never a read
    * failure). The `@=<rows>` part is the file's exact row count — a
    * RAW `@` key cannot collide with a column name because column
    * names are URL-encoded (a real column `@` encodes as `%40`).
    * Legacy lines decode with rows = -1 (unknown); legacy 3-field
    * column stats decode with nulls = -1. */
  def decodeFull(line: String): Option[(String, FileStats)] =
    if (!line.startsWith(Prefix)) None
    else scala.util.Try {
      val parts = line.stripPrefix(Prefix).split('|')
      var rows = -1L
      val stats = parts.tail.iterator.flatMap { p =>
        if (p.startsWith("@=")) { rows = p.stripPrefix("@=").toLong; None }
        else {
          val eq = p.indexOf('=')
          val st = p.substring(eq + 1).split(':') match {
            case Array(k, mn, mx) => ColStat(k.head, dec(mn), dec(mx))
            case Array(k, mn, mx, nl) => ColStat(k.head, dec(mn), dec(mx), nl.toLong)
          }
          Some(dec(p.substring(0, eq)) -> st)
        }
      }.toMap
      (dec(parts.head), FileStats(rows, stats))
    }.toOption

  def decodeLine(line: String): Option[(String, Map[String, ColStat])] =
    decodeFull(line).map { case (p, fs) => (p, fs.cols) }

  // ---- read-side: predicate vs [min, max] ----

  private def cmp(kind: Char, a: String, b: String): Int = kind match {
    case 'l' => java.lang.Long.compare(a.toLong, b.toLong)
    case 'd' => java.lang.Double.compare(a.toDouble, b.toDouble)
    case _   => UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
  }

  /** The literal rendered into the stat domain of `kind`, or None when
    * the types don't line up (→ conservative keep). Date literals are
    * Int days, timestamp literals Long micros — both already in the
    * int32/int64 stat domain parquet uses for those columns. */
  private def litVal(kind: Char, l: Literal): Option[String] =
    if (l.value == null) None
    else (kind, l.value) match {
      case ('l', v: java.lang.Number) if !v.isInstanceOf[java.lang.Double] &&
        !v.isInstanceOf[java.lang.Float] => Some(v.longValue.toString)
      case ('d', v: java.lang.Number) => Some(v.doubleValue.toString)
      case ('s', v: UTF8String) => Some(v.toString)
      case _ => None
    }

  /** True iff conjunct `e` is PROVABLY unsatisfiable on a file whose
    * column ranges are `stats` — the only license to skip the file. */
  def provablyEmpty(e: Expression, stats: Map[String, ColStat]): Boolean = {
    def rangeCheck(a: Attribute, l: Literal)(
        empty: (ColStat, String) => Boolean): Boolean =
      stats.get(a.name).exists { s =>
        litVal(s.kind, l).exists(v => empty(s, v))
      }
    e match {
      case EqualTo(a: Attribute, l: Literal) => outside(a, l, rangeCheck)
      case EqualTo(l: Literal, a: Attribute) => outside(a, l, rangeCheck)
      case EqualNullSafe(a: Attribute, l: Literal) if l.value != null =>
        outside(a, l, rangeCheck)
      case EqualNullSafe(l: Literal, a: Attribute) if l.value != null =>
        outside(a, l, rangeCheck)
      case GreaterThan(a: Attribute, l: Literal) => // a > v: empty iff max <= v
        rangeCheck(a, l)((s, v) => cmp(s.kind, s.max, v) <= 0)
      case GreaterThan(l: Literal, a: Attribute) => // v > a: empty iff min >= v
        rangeCheck(a, l)((s, v) => cmp(s.kind, s.min, v) >= 0)
      case GreaterThanOrEqual(a: Attribute, l: Literal) =>
        rangeCheck(a, l)((s, v) => cmp(s.kind, s.max, v) < 0)
      case GreaterThanOrEqual(l: Literal, a: Attribute) =>
        rangeCheck(a, l)((s, v) => cmp(s.kind, s.min, v) > 0)
      case LessThan(a: Attribute, l: Literal) =>
        rangeCheck(a, l)((s, v) => cmp(s.kind, s.min, v) >= 0)
      case LessThan(l: Literal, a: Attribute) =>
        rangeCheck(a, l)((s, v) => cmp(s.kind, s.max, v) <= 0)
      case LessThanOrEqual(a: Attribute, l: Literal) =>
        rangeCheck(a, l)((s, v) => cmp(s.kind, s.min, v) > 0)
      case LessThanOrEqual(l: Literal, a: Attribute) =>
        rangeCheck(a, l)((s, v) => cmp(s.kind, s.max, v) < 0)
      case In(a: Attribute, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        vs.forall(v => outside(a, v.asInstanceOf[Literal], rangeCheck))
      case InSet(a: Attribute, vs) if vs.nonEmpty =>
        stats.get(a.name).exists { s =>
          vs.forall { v =>
            litVal(s.kind, Literal(v, a.dataType)).exists(x =>
              cmp(s.kind, x, s.min) < 0 || cmp(s.kind, x, s.max) > 0)
          }
        }
      case Or(x, y) => provablyEmpty(x, stats) && provablyEmpty(y, stats)
      case And(x, y) => provablyEmpty(x, stats) || provablyEmpty(y, stats)
      case _ => false
    }
  }

  private def outside(a: Attribute, l: Literal,
      rc: (Attribute, Literal) => ((ColStat, String) => Boolean) => Boolean): Boolean =
    rc(a, l)((s, v) => cmp(s.kind, v, s.min) < 0 || cmp(s.kind, v, s.max) > 0)

  /** Logical negation of the comparison subset [[provablyEmpty]]
    * understands, or None when the shape isn't safely negatable.
    * Orientation-independent (provablyEmpty matches both (attr, lit)
    * and (lit, attr) orders), so `x` and `y` pass through as-is. */
  private def negated(e: Expression): Option[Expression] = e match {
    case EqualTo(x, y) => Some(Or(LessThan(x, y), GreaterThan(x, y)))
    case GreaterThan(x, y) => Some(LessThanOrEqual(x, y))
    case GreaterThanOrEqual(x, y) => Some(LessThan(x, y))
    case LessThan(x, y) => Some(GreaterThanOrEqual(x, y))
    case LessThanOrEqual(x, y) => Some(GreaterThan(x, y))
    case Not(x) => Some(x)
    case And(x, y) => for (nx <- negated(x); ny <- negated(y)) yield Or(nx, ny)
    case Or(x, y) => for (nx <- negated(x); ny <- negated(y)) yield And(nx, ny)
    case _ => None
  }

  /** True iff EVERY row of a file with stats `stats` provably
    * satisfies `e` — the license for a METADATA-ONLY delete (drop the
    * whole file without reading it). Requires (a) the negation of `e`
    * to be provably unsatisfiable on the file's ranges, and (b) a
    * recorded ZERO null count on every column `e` references — a null
    * row satisfies neither `e` nor its negation, so with any nulls
    * (or unknown null counts, legacy lines) the answer is false and
    * the caller falls back to a rewriting delete. */
  def provablyAllMatch(e: Expression, stats: Map[String, ColStat]): Boolean =
    e.references.nonEmpty &&
      e.references.forall(a => stats.get(a.name).exists(_.nulls == 0L)) &&
      negated(e).exists(n => provablyEmpty(n, stats))

  // ---- runtime (join-driven) pruning: v1 source filters vs [min, max] ----

  /** External-typed value (what v1 filters carry) rendered into the
    * stat domain, or None → conservative keep. */
  private def extVal(kind: Char, value: Any): Option[String] = (kind, value) match {
    case (_, null) => None
    case ('l', v: java.lang.Number) if !v.isInstanceOf[java.lang.Double] &&
      !v.isInstanceOf[java.lang.Float] => Some(v.longValue.toString)
    case ('d', v: java.lang.Number) => Some(v.doubleValue.toString)
    case ('s', v: String) => Some(v)
    case ('s', v: UTF8String) => Some(v.toString)
    case _ => None
  }

  /** [[provablyEmpty]] for `org.apache.spark.sql.sources.Filter`s —
    * the shape runtime filters arrive in (DPP sends `In`). */
  def provablyEmptySource(f: v1.Filter, stats: Map[String, ColStat]): Boolean = {
    def out(col: String, value: Any): Boolean = stats.get(col).exists { s =>
      extVal(s.kind, value).exists(v =>
        cmp(s.kind, v, s.min) < 0 || cmp(s.kind, v, s.max) > 0)
    }
    f match {
      case v1.EqualTo(c, value) => out(c, value)
      case v1.EqualNullSafe(c, value) if value != null => out(c, value)
      case v1.In(c, values) => values.nonEmpty && values.forall(out(c, _))
      case v1.GreaterThan(c, value) => stats.get(c).exists(s =>
        extVal(s.kind, value).exists(v => cmp(s.kind, s.max, v) <= 0))
      case v1.GreaterThanOrEqual(c, value) => stats.get(c).exists(s =>
        extVal(s.kind, value).exists(v => cmp(s.kind, s.max, v) < 0))
      case v1.LessThan(c, value) => stats.get(c).exists(s =>
        extVal(s.kind, value).exists(v => cmp(s.kind, s.min, v) >= 0))
      case v1.LessThanOrEqual(c, value) => stats.get(c).exists(s =>
        extVal(s.kind, value).exists(v => cmp(s.kind, s.min, v) > 0))
      case v1.Or(x, y) =>
        provablyEmptySource(x, stats) && provablyEmptySource(y, stats)
      case v1.And(x, y) =>
        provablyEmptySource(x, stats) || provablyEmptySource(y, stats)
      case _ => false
    }
  }

  /** RUNTIME FILE SKIPPING — the DPP analogue for unpartitioned
    * snapshot files: when this scan's table is the big side of a join
    * whose other side is selectively filtered, Spark's dynamic-pruning
    * rule sees [[filterAttributes]], builds the join-key value set at
    * runtime, and calls [[filter]] with it; provably-empty files are
    * dropped and `BatchScanExec` re-plans partitions from the pruned
    * delegate (it re-calls `toBatch` after `filter`). Iceberg/Delta
    * implement runtime file pruning through exactly this connector
    * hook. Static zone-map pruning has already happened in the
    * builder; this catches what is only knowable at run time. */
  final class ZoneMapScan(
      files: Seq[String],
      statsByFile: Map[String, FileStats],
      rebuildScan: Seq[String] => Scan,
      initial: Scan,
      streamFactory: Option[() => org.apache.spark.sql.connector.read.streaming.MicroBatchStream] = None,
      bucketing: Option[(String, Int, Map[String, Int])] = None)
    extends Scan with SupportsRuntimeFiltering with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

    /** Storage-partitioned-join surface: a bucketed snapshot reports
      * `KeyGroupedPartitioning(bucket(n, key), n)` and serves its rows
      * through [[KeyGroupedBucketBatch]] — one partition per bucket,
      * keyed, ALWAYS all n of them (so both sides of a join stay
      * aligned after this scan's own file pruning). Catalyst resolves
      * the transform against the catalog's [[GraftBucketFunction]];
      * unbucketed snapshots report unknown partitioning and plan
      * exactly as before. Only reported while the key column survives
      * pruning — Spark resolves the transform's reference against the
      * scan OUTPUT, so a key-less projection must degrade to unknown
      * rather than fail analysis. */
    override def outputPartitioning()
        : org.apache.spark.sql.connector.read.partitioning.Partitioning =
      bucketing match {
        case Some((key, n, _)) if readSchema().fieldNames.contains(key) =>
          new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
            Array(Expressions.bucket(n, key)), n)
        case _ =>
          new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
      }

    /** Micro-batch streaming rides the same scan object: the owning
      * snapshot table injects a stream factory (version-offset CDC
      * tailing — see SnapshotMicroBatchStream); non-streamable reads
      * (time travel, CDC ranges) keep the default refusal. */
    override def toMicroBatchStream(checkpointLocation: String)
        : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
      streamFactory.map(_()).getOrElse(
        super.toMicroBatchStream(checkpointLocation))

    private var inner: Scan = initial
    private var current: Seq[String] = files

    override def readSchema(): StructType = inner.readSchema()
    override def toBatch: Batch = bucketing match {
      case Some((key, n, byPath)) if readSchema().fieldNames.contains(key) =>
        new KeyGroupedBucketBatch(inner.toBatch, n, byPath)
      case _ => inner.toBatch
    }
    override def description(): String = s"${inner.description()} (graft-zonemap)"

    /** Planning statistics Catalyst sees for this scan: the delegate
      * FileScan's size estimate plus an EXACT `numRows` summed from
      * the manifest row counts of the files the scan will actually
      * read — O(manifest) driver work, no file I/O. Exact cardinality
      * (vs Spark's bytes/row guess) is what lets the planner pick
      * broadcast sides correctly for snapshot tables. Reported only
      * when every surviving file recorded a count. */
    override def estimateStatistics(): Statistics = {
      val base = inner match {
        case s: SupportsReportStatistics => s.estimateStatistics()
        case _ => null
      }
      val counts = current.map(f => statsByFile.get(f).map(_.rows).getOrElse(-1L))
      val exact =
        if (counts.forall(_ >= 0L)) java.util.OptionalLong.of(counts.sum)
        else if (base != null) base.numRows()
        else java.util.OptionalLong.empty()
      val colStats = columnStatsOf()
      new Statistics {
        override def sizeInBytes(): java.util.OptionalLong =
          if (base != null) base.sizeInBytes() else java.util.OptionalLong.empty()
        override def numRows(): java.util.OptionalLong = exact
        override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = colStats
      }
    }

    /** COLUMN-LEVEL planning statistics from the same manifest zone
      * maps (the connector `columnStats()` surface CBO estimation
      * reads): per surviving column, exact null count (summed) and
      * typed min/max (folded) across the files this scan will read.
      * Honesty contract as everywhere: a column reports only when
      * EVERY surviving file carries its stat, null counts only when
      * every file recorded one; string min/max are omitted (CBO's
      * numeric estimation doesn't consume them and the bytewise order
      * is already exploited by file skipping). O(files × columns)
      * driver arithmetic, zero I/O — at 100 TB this hands the
      * optimizer real value bounds and null fractions for join/filter
      * selectivity without an ANALYZE pass. */
    private def columnStatsOf(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
      val out = new java.util.HashMap[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
      readSchema().fields.foreach { field =>
        val c = field.name
        val per = current.map(f => statsByFile.get(f).flatMap(_.cols.get(c)))
        if (current.nonEmpty && per.forall(_.isDefined)) {
          val stats = per.map(_.get)
          val nulls =
            if (stats.forall(_.nulls >= 0L))
              java.util.OptionalLong.of(stats.map(_.nulls).sum)
            else java.util.OptionalLong.empty()
          // box min/max in the COLUMN'S OWN external type (the stat
          // consumer may cast) — the manifest kind only says which
          // string-parse domain the values live in
          import org.apache.spark.sql.types._
          def boxL(v: Long): Option[AnyRef] = field.dataType match {
            case ByteType    => Some(Byte.box(v.toByte))
            case ShortType   => Some(Short.box(v.toShort))
            case IntegerType => Some(Int.box(v.toInt))
            case LongType    => Some(Long.box(v))
            // kind 'l' also carries date days and timestamp micros —
            // box them in their physical integral domains (Int days /
            // Long micros, the same width the column's parquet stats
            // live in) rather than silently dropping the range
            case DateType    => Some(Int.box(v.toInt))
            case TimestampType | TimestampNTZType => Some(Long.box(v))
            case _           => None
          }
          def boxD(v: Double): Option[AnyRef] = field.dataType match {
            case FloatType  => Some(Float.box(v.toFloat))
            case DoubleType => Some(Double.box(v))
            case _          => None
          }
          val range: Option[(AnyRef, AnyRef)] = stats.head.kind match {
            case 'l' => scala.util.Try((
              stats.map(_.min.toLong).min, stats.map(_.max.toLong).max))
              .toOption.flatMap { case (mn, mx) =>
                boxL(mn).zip(boxL(mx)) }
            case 'd' => scala.util.Try((
              stats.map(_.min.toDouble).min, stats.map(_.max.toDouble).max))
              .toOption.flatMap { case (mn, mx) =>
                boxD(mn).zip(boxD(mx)) }
            case _ => None
          }
          if (nulls.isPresent || range.isDefined)
            out.put(
              org.apache.spark.sql.connector.expressions.Expressions.column(c),
              new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
                override def nullCount(): java.util.OptionalLong = nulls
                override def min(): java.util.Optional[Object] =
                  range.map(r => java.util.Optional.of(r._1: Object))
                    .getOrElse(java.util.Optional.empty[Object]())
                override def max(): java.util.Optional[Object] =
                  range.map(r => java.util.Optional.of(r._2: Object))
                    .getOrElse(java.util.Optional.empty[Object]())
              })
        }
      }
      out
    }

    /** Files the CURRENT (post-pruning) delegate will read — spec
      * observability, mirrors FileScan.fileIndex. */
    def plannedFileCount: Int = inner match {
      case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
        f.fileIndex.inputFiles.length
      case _ => files.size
    }

    // only columns the (pruned) scan still OUTPUTS: the dynamic-pruning
    // rule resolves these against the relation output and throws on
    // anything column pruning removed
    override def filterAttributes(): Array[NamedReference] = {
      val visible = inner.readSchema().fieldNames.toSet
      statsByFile.valuesIterator.flatMap(_.cols.keysIterator)
        .toSet.intersect(visible).toArray.sorted.map(Expressions.column)
    }

    override def filter(filters: Array[v1.Filter]): Unit = {
      val kept = files.filter { f =>
        statsByFile.get(f).forall(fs =>
          !filters.exists(p => provablyEmptySource(p, fs.cols) || bloomEmptySource(p, fs.blooms)))
      }
      if (kept.size != files.size) { current = kept; inner = rebuildScan(kept) }
    }
  }

  /** The connector-side half: a [[ScanBuilder]] that intercepts the
    * pushed data filters, drops provably-empty files from the resolved
    * listing, REBUILDS the delegate parquet scan over the survivors,
    * and forwards every other pushdown capability (column pruning,
    * aggregate pushdown, the pushed-filter report in explain) to it.
    * `rebuild` closes over the provider's table factory so the pruned
    * scan keeps the manifest schema and options of the original. */
  final class ZoneMapScanBuilder(
      allFiles: Seq[String],
      statsByFile: Map[String, FileStats],
      rebuild: Seq[String] => ScanBuilder,
      streamFactory: Option[() => org.apache.spark.sql.connector.read.streaming.MicroBatchStream] = None,
      bucketing: Option[(String, Int, Map[String, Int])] = None)
    extends ScanBuilder with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

    private var delegate: ScanBuilder = rebuild(allFiles)
    // re-applied after a rebuild, in case a future Spark version
    // reorders the pushdown phases (today: filters, then aggregates,
    // then column pruning)
    private var prunedTo: Option[StructType] = None
    private var keptFiles: Seq[String] = allFiles
    private var pushedExprs: Seq[Expression] = Nil
    private var aggPushed = false
    // hidden-partitioning tuples present in this scan's stats (the
    // `__pt$…` synthetic keys), grouped by source column — drives the
    // transform-domain filter translation below
    private lazy val ptBySource = graft.sources.PartitionTransforms
      .transformsInStats(
        statsByFile.valuesIterator.flatMap(_.cols.keysIterator).toSet)

    override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
      pushedExprs = filters
      // PARTITION PRUNING rides the same pass: filters on base columns
      // additionally check the files' recorded transform tuples
      // (translated conjuncts are implied by their sources — they can
      // only drop files the original predicate already excludes)
      val withPt = filters ++
        graft.sources.PartitionTransforms.translate(filters, ptBySource)
      val kept = allFiles.filter { f =>
        statsByFile.get(f).forall(fs =>
          !withPt.exists(p => provablyEmpty(p, fs.cols) || bloomEmpty(p, fs.blooms)))
      }
      if (filters.nonEmpty)
        ZoneMaps.lastBuilderSelection = (kept.size, allFiles.size)
      if (kept.size != allFiles.size) {
        keptFiles = kept
        delegate = rebuild(kept)
        prunedTo.foreach(pruneColumns)
      }
      delegate match {
        case d: SupportsPushDownCatalystFilters => d.pushFilters(filters)
        case _ => filters
      }
    }

    override def pushedFilters: Array[V2Predicate] = delegate match {
      case d: SupportsPushDownCatalystFilters => d.pushedFilters
      case _ => Array.empty
    }

    override def pruneColumns(requiredSchema: StructType): Unit = {
      prunedTo = Some(requiredSchema)
      delegate match {
        case d: SupportsPushDownRequiredColumns => d.pruneColumns(requiredSchema)
        case _ => ()
      }
    }

    override def pushAggregation(agg: Aggregation): Boolean = delegate match {
      case d: SupportsPushDownAggregates =>
        val ok = d.pushAggregation(agg); aggPushed ||= ok; ok
      case _ => false
    }

    override def supportCompletePushDown(agg: Aggregation): Boolean = delegate match {
      case d: SupportsPushDownAggregates => d.supportCompletePushDown(agg)
      case _ => false
    }

    override def build(): Scan = {
      // a pushed aggregate reshapes the scan output; a runtime rebuild
      // would have to replay that pushdown too — not worth the
      // complexity for a scan that already returns O(groups) rows
      if (aggPushed) delegate.build()
      else {
        val replay: Seq[String] => Scan = fs => {
          val b = rebuild(fs)
          b match {
            case d: SupportsPushDownCatalystFilters if pushedExprs.nonEmpty =>
              d.pushFilters(pushedExprs)
            case _ => ()
          }
          b match {
            case d: SupportsPushDownRequiredColumns =>
              prunedTo.foreach(d.pruneColumns)
            case _ => ()
          }
          b.build()
        }
        new ZoneMapScan(keptFiles, statsByFile, replay, delegate.build(),
          streamFactory, bucketing)
      }
    }
  }
}
