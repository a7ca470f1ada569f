package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** A stream position in a [[SnapshotTable]]'s history. The manifest's
  * monotonically increasing version number IS the offset domain —
  * total-ordered, durable, and replayable, exactly the properties a
  * Structured Streaming offset needs (compare Delta's reservoir
  * version / Kafka's partition offsets). -1 = before the first
  * commit (a fresh stream bootstraps the whole table).
  *
  * ADMISSION CONTROL (round 15) extends the domain MID-VERSION:
  * `fi >= 0` means "every unit of versions < v emitted, plus the
  * first `fi` file-units of version v" — the (version, fileIdx) shape
  * that lets maxFilesPerTrigger/maxBytesPerTrigger split one bulk
  * commit across triggers (Delta's maxFilesPerTrigger precedent).
  * `fi = -1` keeps the legacy whole-version meaning ("everything
  * through v"), and frontier offsets SERIALIZE in the legacy bare
  * form, so existing checkpoints restart seamlessly and uncapped
  * streams write byte-identical offsets. */
final case class SnapshotVersionOffset(v: Long, fi: Long = -1L) extends Offset {
  override def json(): String = if (fi < 0) v.toString else s"$v:$fi"
  /** Canonical (nextVersion, unitsAlreadyEmittedOfIt) position. */
  def canonical: (Long, Long) = if (fi < 0) (v + 1, 0L) else (v, fi)
}

object SnapshotVersionOffset {
  def parse(json: String): SnapshotVersionOffset = {
    val i = json.indexOf(':')
    if (i < 0) SnapshotVersionOffset(json.toLong)
    else SnapshotVersionOffset(json.substring(0, i).toLong,
      json.substring(i + 1).toLong)
  }
  /** Render a canonical position as an offset: a full-version frontier
    * collapses to the legacy bare form. */
  def at(v: Long, emitted: Long, unitsOfV: Long): SnapshotVersionOffset =
    if (emitted >= unitsOfV) SnapshotVersionOffset(v)
    else SnapshotVersionOffset(v, emitted)
}

/** The ONE admission-control walk both snapshot streams share:
  * accumulate file-units from `start` toward `frontier` until a cap
  * trips; at least one unit per trigger always admits (a single file
  * above maxBytes must still flow, else the stream wedges). The
  * engine-passed [[ReadLimit]] is honored first: `allAvailable()` —
  * Trigger.Once / AvailableNow semantics — returns the uncapped
  * frontier regardless of the configured caps, and a `maxFiles` limit
  * (the engine echoing [[getDefaultReadLimit]], possibly tightened by
  * a wrapper) bounds the file count. */
/** Bytes-per-trigger as a connector [[ReadLimit]] — the interface has
  * maxFiles/maxRows shapes but no bytes, so the byte cap rides a
  * custom limit exactly as Delta's does; composed with maxFiles via
  * ReadLimit.compositeLimit when both are set. */
private[sources] final case class ReadMaxBytes(bytes: Long)
    extends org.apache.spark.sql.connector.read.streaming.ReadLimit

private[sources] object AdmissionWalk {
  import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadAllAvailable, ReadLimit, ReadMaxFiles}

  /** The streams' default limit: both caps composed, or allAvailable
    * when uncapped. */
  def defaultLimit(maxFiles: Option[Int], maxBytes: Option[Long]): ReadLimit = {
    val ls: Seq[ReadLimit] = maxFiles.map(ReadLimit.maxFiles(_): ReadLimit).toSeq ++
      maxBytes.map(ReadMaxBytes(_): ReadLimit).toSeq
    ls match {
      case Seq() => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  private def limitFiles(limit: ReadLimit): Option[Int] = limit match {
    case m: ReadMaxFiles => Some(m.maxFiles())
    case c: CompositeReadLimit =>
      c.getReadLimits.collectFirst { case m: ReadMaxFiles => m.maxFiles() }
    case _ => None
  }

  private def limitBytes(limit: ReadLimit): Option[Long] = limit match {
    case b: ReadMaxBytes => Some(b.bytes)
    case c: CompositeReadLimit =>
      c.getReadLimits.collectFirst { case b: ReadMaxBytes => b.bytes }
    case _ => None
  }

  def walk(start: SnapshotVersionOffset, frontier: Long,
           unitsOf: Long => Seq[String], sizeOf: String => Long,
           limit: ReadLimit): SnapshotVersionOffset = {
    if (limit.isInstanceOf[ReadAllAvailable]) // Trigger.Once completeness
      return SnapshotVersionOffset(frontier)
    val maxF = limitFiles(limit).getOrElse(Int.MaxValue)
    val maxB = limitBytes(limit).getOrElse(Long.MaxValue)
    var (cv, ck) = start.canonical
    if (cv > frontier) return SnapshotVersionOffset(frontier)
    var files = 0
    var bytes = 0L
    var full = false
    while (!full && cv <= frontier) {
      val units = unitsOf(cv)
      while (!full && ck < units.size) {
        val sz = sizeOf(units(ck.toInt))
        if (files > 0 && (files + 1 > maxF || bytes + sz > maxB)) full = true
        else { files += 1; bytes += sz; ck += 1 }
      }
      if (!full && ck >= units.size) {
        if (cv == frontier) full = true
        else { cv += 1; ck = 0 }
      }
    }
    SnapshotVersionOffset.at(cv, ck, unitsOf(cv).size.toLong)
  }
}

/** STREAMING CDC SOURCE for [[SnapshotTable]] — snapshot tables as a
  * Structured Streaming micro-batch source:
  *
  *   spark.readStream.format("graft-snapshot").load(root)
  *     .writeStream... // each appended commit arrives as a micro-batch
  *
  * Each trigger diffs the manifest between the checkpointed version
  * and the current head ([[SnapshotTable.addedFilesBetween]] — O(two
  * manifest reads) of driver work, zero file I/O) and plans an
  * ordinary distributed parquet batch over exactly the files those
  * commits appended. Offsets are snapshot versions, so the
  * engine's checkpoint gives end-to-end EXACTLY-ONCE when paired
  * with the tagged-commit snapshot sink (StreamingJobs): version
  * ranges are never re-emitted after a restart, and a replayed
  * micro-batch is deduplicated by its batchId tag on the write side.
  *
  * Contract on rewrites: the incremental diff is defined for APPEND
  * lineages. A commit that rewrites or drops files (replace,
  * compaction, merge/deleteWhere/updateWhere) makes "what changed"
  * ill-defined at file granularity, and the stream FAILS with the
  * range-refusal error instead of silently re-emitting rewritten rows
  * (same stance as Delta's streaming source, which requires
  * `ignoreChanges` opt-ins to cross such commits). Restart the stream
  * from a fresh checkpoint to re-bootstrap past a rewrite.
  *
  * The per-range [[Batch]] is built by the owning table's factory with
  * the schema PINNED at stream creation, so a mid-stream schema
  * evolution keeps emitting the stream's declared shape instead of
  * whatever a footer draw would resolve. */
final class SnapshotMicroBatchStream(root: String, mkBatch: Seq[String] => Batch,
                                     pinned: Option[StructType] = None,
                                     maxFilesPerTrigger: Option[Int] = None,
                                     maxBytesPerTrigger: Option[Long] = None)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  private val table = SnapshotTable(root)
  // field ids of the pinned logical names (empty when unmapped) — the
  // mid-stream type-widening refusal resolves renamed columns by id
  private val pinnedIds: Map[String, Int] =
    table.colMapOf(table.currentVersion()).map(m => m._3 -> m._1).toMap

  private def capped: Boolean =
    maxFilesPerTrigger.isDefined || maxBytesPerTrigger.isDefined

  // after a checkpoint restore the engine may hand back a raw
  // SerializedOffset; the json round-trip covers both shapes
  private def off(o: Offset): SnapshotVersionOffset = o match {
    case s: SnapshotVersionOffset => s
    case other => SnapshotVersionOffset.parse(other.json())
  }

  // versions are immutable once committed: one diff per version per
  // stream handle, however many admission walks revisit it
  private val unitCache =
    scala.collection.mutable.HashMap.empty[Long, Seq[String]]
  private def unitsOf(v: Long): Seq[String] = synchronized {
    unitCache.getOrElseUpdate(v, table.addedFilesBetween(v - 1, v))
  }

  override def initialOffset(): Offset = SnapshotVersionOffset(-1L)
  override def latestOffset(): Offset = SnapshotVersionOffset(table.currentVersion())

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    AdmissionWalk.defaultLimit(maxFilesPerTrigger, maxBytesPerTrigger)

  /** Admission-controlled frontier: walk file-units from `start`
    * accumulating until a cap from the engine-passed limit trips;
    * always admits at least one unit per trigger (progress guarantee —
    * Delta's convention), with `allAvailable()` (Trigger.Once) and
    * uncapped streams returning the plain head so legacy whole-version
    * offsets stay byte-identical. */
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val head = table.currentVersion()
    if (!capped) return SnapshotVersionOffset(head)
    AdmissionWalk.walk(off(start), head, unitsOf,
      u => scala.util.Try(
        table.store.size(java.nio.file.Paths.get(u))).getOrElse(0L),
      limit)
  }

  override def deserializeOffset(json: String): Offset =
    SnapshotVersionOffset.parse(json)
  override def commit(end: Offset): Unit = synchronized {
    // the walk never revisits versions below the committed offset —
    // drop their cached unit lists so a weeks-long capped stream
    // doesn't retain every admitted version's file list
    val (cv, _) = off(end).canonical
    unitCache.filterInPlace { case (v, _) => v >= cv }
    ()
  }
  override def stop(): Unit = ()

  // planInputPartitions(start, end) then createReaderFactory() is the
  // engine's per-batch call order (MicroBatchScanExec); the planned
  // delegate batch bridges the two calls
  @volatile private var planned: Batch = _

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (sv, sk) = off(start).canonical
    val (ev0, ek0) = off(end).canonical
    // the version whose bytes this batch actually reads (for the
    // widening refusal below): the end version itself when the end
    // cuts into it, else the one before
    val readThrough = if (ek0 > 0) ev0 else ev0 - 1
    // a mid-stream TYPE WIDENING makes later files wider than the
    // pinned shape; refuse with the restart contract instead of dying
    // in the parquet reader's narrowing conversion
    if (readThrough >= 0)
      pinned.foreach(p => SnapshotTable.refuseIfWidenedPastPinned(
        table, readThrough, p, pinnedIds, s"snapshot stream at $root"))
    val files =
      if (sv == ev0 || (!capped && sk == 0 && ek0 == 0))
        // same version (mid-version slice below) or the uncapped
        // legacy shape: one range diff, exactly as before
        if (sv == ev0) unitsOf(sv).slice(sk.toInt, ek0.toInt)
        else table.addedFilesBetween(sv - 1, ev0 - 1)
      else {
        // cross-version admission slice: per-version units, boundary
        // versions cut at their indices
        val b = Seq.newBuilder[String]
        var v = sv
        while (v <= ev0 && (v < ev0 || ek0 > 0)) {
          val units = unitsOf(v)
          val from = if (v == sv) sk.toInt else 0
          val until = if (v == ev0) ek0.toInt else units.size
          b ++= units.slice(from, until)
          v += 1
        }
        b.result()
      }
    if (files.isEmpty) { planned = null; Array.empty }
    else { planned = mkBatch(files); planned.planInputPartitions() }
  }

  override def createReaderFactory(): PartitionReaderFactory = planned match {
    case null => // zero partitions planned: factory must exist, never runs
      EmptyBatchReaderFactory(root)
    case b => b.createReaderFactory()
  }

  override def toString: String = s"SnapshotMicroBatchStream($root)"
}

/** Stand-in factory for a zero-partition micro-batch: the engine
  * requires a factory object even when no reader will ever be built,
  * and it SERIALIZES it into the scan RDD — so this must be a
  * standalone case class, never a lambda closing over the (non-
  * serializable) stream. */
final case class EmptyBatchReaderFactory(root: String) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    throw new IllegalStateException(
      s"graft-snapshot stream at $root: reader requested for an empty batch")
}

/** A partition of a CDC micro-batch: the delegate parquet partition
  * plus the constant change stamp its rows carry, and the delegate
  * READER FACTORY that built it. Per-partition factories (rather than
  * one per scan) because chunks from different column-mapping ERAS
  * read under different PHYSICAL schemas — a rename → compact → append
  * range mixes frozen-name files with normalized-name files in one
  * micro-batch, and each chunk's factory was planned with exactly its
  * era's names. The physical schemas are positionally identical to
  * the stream's logical shape (names differ, layout doesn't), so the
  * emitted rows need no alias step. */
final case class CdcInputPartition(inner: InputPartition, changeType: String,
                                   version: Long,
                                   factory: PartitionReaderFactory)
    extends InputPartition

/** A CDC partition over ONE WHOLE vectored file: the replay must
  * subtract the file's deletion-vector positions, and the only row
  * domain available without the v1 metadata column is the READ ORDER —
  * exact precisely when the partition is a single unsplit file scanned
  * with no pushed filters (no row-group skipping), which this
  * partition construction guarantees. The vector rides as its
  * descriptor (count + payload token); positions decode in the reader
  * task, where a sidecar read is file-local I/O. */
final case class DvCdcInputPartition(absPath: String, fileLen: Long,
                                     changeType: String, version: Long,
                                     dvCount: Long, dvPayload: String,
                                     root: String, store: LogStore,
                                     factory: PartitionReaderFactory)
    extends InputPartition

/** Wraps the delegate parquet reader factory: every row comes back joined
  * with its partition's constant (_change_type, _commit_version) and
  * re-projected to UnsafeRow so downstream operators can hold
  * references across iterations. Row-based on purpose — the two
  * appended constants don't justify building constant column vectors,
  * and CDC consumers are sink-bound, not scan-bound. */
final class CdcReaderFactory(cdcSchema: StructType)
    extends PartitionReaderFactory {
  override def supportColumnarReads(p: InputPartition): Boolean = false
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = p match {
    case c: CdcInputPartition =>
      stamped(c.factory.createReader(c.inner), c.changeType, c.version)
    case d: DvCdcInputPartition =>
      // one whole-file split, no pushed filters → the delegate reader
      // yields rows in exact file order, so a running counter IS the
      // row index and the sorted vector positions skip by merge-walk
      val pf = new org.apache.spark.sql.execution.datasources.PartitionedFile(
        InternalRow.empty,
        org.apache.spark.paths.SparkPath.fromPathString(d.absPath),
        0L, d.fileLen, Array.empty, 0L, d.fileLen, Map.empty)
      val r = d.factory.createReader(
        org.apache.spark.sql.execution.datasources.FilePartition(0, Array(pf)))
      val skip: Array[Long] =
        if (d.dvPayload == null) Array.empty
        else DeletionVectors.Dv(d.dvCount, d.dvPayload).positions(d.root, d.store)
      val base = new PartitionReader[InternalRow] {
        private var row = -1L
        private var si = 0
        override def next(): Boolean = {
          var found = false
          while (!found && r.next()) {
            row += 1
            while (si < skip.length && skip(si) < row) si += 1
            found = si >= skip.length || skip(si) != row
          }
          found
        }
        override def get(): InternalRow = r.get()
        override def close(): Unit = r.close()
      }
      stamped(base, d.changeType, d.version)
    case other => throw new IllegalStateException(
      s"unexpected CDC partition shape: $other")
  }

  private def stamped(r: PartitionReader[InternalRow], changeType: String,
                      version: Long): PartitionReader[InternalRow] = {
    val meta = new GenericInternalRow(
      Array[Any](UTF8String.fromString(changeType), version))
    val joined = new JoinedRow
    val proj = UnsafeProjection.create(cdcSchema)
    new PartitionReader[InternalRow] {
      override def next(): Boolean = r.next()
      override def get(): InternalRow = proj(joined(r.get(), meta))
      override def close(): Unit = r.close()
    }
  }
}

/** STREAMING CHANGE FEED for [[SnapshotTable]] (round-9 verdict item
  * 7) — the stream a downstream sync follows on an UPSERTING table:
  *
  *   spark.readStream.format("graft-snapshot")
  *     .option("readChangeFeed", "true").load(root)
  *
  * Each micro-batch emits the table's own columns plus `_change_type`
  * ('insert' | 'delete') and `_commit_version`, derived per commit
  * from the manifest's recorded `#op=` kind
  * ([[SnapshotTable.cdcChunksBetween]]): appends stream as inserts
  * (like the plain stream), copy-on-write merge/delete/update commits
  * stream as delete rows for every removed file + insert rows for
  * every added file (file-diff CDC — exactly state-reconstructing,
  * volume proportional to the zone-map-touched data), compactions
  * stream as nothing, and a replace still fails the stream (lineage
  * break). The offset domain is the same monotone snapshot version as
  * the append-only stream, so checkpoints replay exactly-once.
  *
  * A fresh CDC stream starts at the CURRENT head — it follows changes
  * forward; bootstrap state with a batch `read()` (or
  * `readChangesCdc`) first, the same split Delta's CDF makes — or pass
  * `option("startingVersion", v)` to begin the feed at a historical
  * version (inclusive, Delta's convention; the range must not cross a
  * replace). */
final class SnapshotCdcMicroBatchStream(root: String, cdcSchema: StructType,
                                        mkBatch: (Seq[String], StructType) => Batch,
                                        startFrom: Option[Long] = None,
                                        endAt: Option[Long] = None,
                                        pinnedIds: Map[String, Int] = Map.empty,
                                        maxFilesPerTrigger: Option[Int] = None,
                                        maxBytesPerTrigger: Option[Long] = None)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  private val table = SnapshotTable(root)

  private def off(o: Offset): SnapshotVersionOffset = o match {
    case s: SnapshotVersionOffset => s
    case other => SnapshotVersionOffset.parse(other.json())
  }

  private def capped: Boolean =
    maxFilesPerTrigger.isDefined || maxBytesPerTrigger.isDefined

  // one per-version chunk diff per stream handle (versions are
  // immutable); the admission walk and the batch planner share it.
  // Per-version resolution keeps the era-mapping contract: the
  // stream's own pinned-ID join never consults the range-end logical
  // names, and id-domain breaks refuse in whichever single-version
  // range contains them.
  private val chunkCache =
    scala.collection.mutable.HashMap.empty[Long, Seq[table.CdcChunk]]
  private def chunksOf(v: Long): Seq[table.CdcChunk] = synchronized {
    chunkCache.getOrElseUpdate(v, table.cdcChunksBetween(v - 1, v))
  }
  private def unitRelsOf(v: Long): Seq[String] =
    chunksOf(v).flatMap(_.rels)

  // offsets are "last version emitted", so startingVersion v (Delta's
  // inclusive convention) begins at v - 1; default = the current head
  // (follow forward, bootstrap via batch read). Captured ONCE at
  // stream construction: latestOffset's lower clamp reads this too,
  // and a LIVE head read there would lift the offset past
  // endingVersion as soon as the head advances beyond the bound.
  private val initial: Long =
    startFrom.map(_ - 1).getOrElse(table.currentVersion())
  override def initialOffset(): Offset = SnapshotVersionOffset(initial)
  // endingVersion (inclusive) clamps the offset the stream will ever
  // reach: commits past it exist but are never planned — a bounded
  // historical replay that then idles (stop the query when caught up).
  // The lower clamp (never below the construction-time initial) keeps
  // a bound that precedes the start reading as "nothing to emit", not
  // as an inverted range — but the anchor itself is capped at the
  // bound: a forward-following bounded stream RESTARTED from its
  // checkpoint re-captures `initial` from the LIVE head, and an
  // uncapped anchor would lift the offset past endingVersion as soon
  // as the head did, leaking post-bound commits into the replay. The
  // checkpointed start offset (the engine's, not ours) carries the
  // restart position; any inverted range the capped clamp hands the
  // engine plans as an empty batch.
  override def latestOffset(): Offset = {
    val clamped = endAt.fold(table.currentVersion())(
      math.min(_, table.currentVersion()))
    val anchor = endAt.fold(initial)(math.min(initial, _))
    SnapshotVersionOffset(math.max(clamped, anchor))
  }

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    AdmissionWalk.defaultLimit(maxFilesPerTrigger, maxBytesPerTrigger)

  /** Admission-controlled frontier over the CDC unit domain (the
    * flattened per-version chunk files): walk from `start` until a
    * cap from the engine-passed limit trips, never past the
    * endingVersion-clamped frontier; at least one unit per trigger
    * always admits. Uncapped streams keep the legacy whole-version
    * clamp verbatim. */
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val frontier = off(latestOffset()).v // endAt-clamped, legacy form
    if (!capped) return SnapshotVersionOffset(frontier)
    AdmissionWalk.walk(off(start), frontier, unitRelsOf,
      u => scala.util.Try(table.store.size(
        java.nio.file.Paths.get(table.absPath(u)))).getOrElse(0L),
      limit)
  }

  override def deserializeOffset(json: String): Offset =
    SnapshotVersionOffset.parse(json)
  override def commit(end: Offset): Unit = synchronized {
    val (cv, _) = off(end).canonical
    chunkCache.filterInPlace { case (v, _) => v >= cv }
    ()
  }
  override def stop(): Unit = ()

  // the stream's declared DATA shape (cdcSchema minus the two stamps),
  // pinned at LOAD like every snapshot stream's schema — `pinnedIds`
  // are the FIELD IDS those pinned logical names carried at the same
  // load-time version. Chunk era mappings speak range-END logical
  // names, so a rename landing mid-stream would make a by-NAME join
  // silently null-fill (or swap) the renamed column; the id join below
  // stays exact across renames.
  private val dataSchema = StructType(cdcSchema.fields.dropRight(2))

  /** The era-physical schema for the pinned shape: pinned logical name
    * → load-time field id → the chunk era's physical name. An id the
    * era mapping lacks (the column predates the range end's live set —
    * it was since dropped, or the era predates it) maps to a
    * guaranteed-absent name and null-fills.
    *
    * A pinned name with NO id (the table was unmapped at load) IS its
    * frozen physical name — unless a later NORMALIZING compaction
    * moved the physical names, in which case the chunk's era mapping
    * no longer carries that physical name and the stream REFUSES
    * loudly (restart re-pins with ids) instead of silently
    * null-filling a column the batch feed serves correctly. */
  private def eraPhysicalSchema(
      mapping: Seq[(Int, String, String)]): StructType =
    if (mapping.isEmpty) dataSchema
    else {
      val physById = mapping.map(m => m._1 -> m._2).toMap
      val eraPhys = mapping.map(_._2).toSet
      StructType(dataSchema.fields.map { f =>
        pinnedIds.get(f.name) match {
          case Some(id) => f.copy(name =
            physById.getOrElse(id, s"__graft_absent_$id"))
          case None if eraPhys.contains(f.name) => f
          case None => throw new IllegalStateException(
            s"change-feed stream at $root: the stream was pinned before " +
              s"the table was column-mapped and column '${f.name}' no " +
              "longer resolves by its load-time name (a rename, drop, " +
              "or normalizing compaction changed the column layout) — " +
              "restart the stream from a fresh checkpoint to adopt the " +
              "current shape")
        }
      })
    }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (sv, sk) = off(start).canonical
    val (ev, ek) = off(end).canonical
    // a checkpoint restored past a (newly added or tightened)
    // endingVersion can hand an inverted range: nothing to emit
    if (ev < sv || (ev == sv && ek <= sk)) return Array.empty
    // the version whose bytes this batch actually reads (a mid-version
    // end cuts INTO ev; a frontier end stops before it)
    val readThrough = if (ek > 0) ev else ev - 1
    // a TYPE WIDENING landing mid-stream makes files written after it
    // wider than the pinned shape, and a narrowing parquet read dies
    // with an opaque executor conversion error — refuse at planning
    // with the restart contract instead
    SnapshotTable.refuseIfWidenedPastPinned(table, readThrough, dataSchema,
      pinnedIds, s"change-feed stream at $root")
    if (sk == 0 && ek == 0)
      // whole-version range (every uncapped stream): one range diff,
      // exactly the pre-admission shape
      return partitionsFor(table.cdcChunksBetween(sv - 1, ev - 1))
    // admission slice: per-version chunk lists, boundary versions cut
    // at their unit indices; chunk structure (type stamps, era
    // mappings, DV subtraction) is preserved per sliced sub-chunk
    val out = Array.newBuilder[InputPartition]
    var v = sv
    while (v <= ev && (v < ev || ek > 0)) {
      val chunks = chunksOf(v)
      val from = if (v == sv) sk.toInt else 0
      val until = if (v == ev && ek > 0) ek.toInt else Int.MaxValue
      var seen = 0
      val sliced = chunks.flatMap { c =>
        val lo = math.max(from - seen, 0)
        val hi = math.min(math.max(until - seen, 0), c.rels.size)
        seen += c.rels.size
        if (lo >= hi) None else Some(c.copy(rels = c.rels.slice(lo, hi)))
      }
      out ++= partitionsFor(sliced)
      v += 1
    }
    out.result()
  }

  private def partitionsFor(chunks: Seq[table.CdcChunk]): Array[InputPartition] = {
    chunks.flatMap { c =>
      // COLUMN-MAPPED chunks plan their delegate batch under the
      // chunk's ERA-PHYSICAL schema — positionally identical to the
      // stream's logical shape (names only), so the emitted InternalRows
      // need no alias step; each partition carries its own reader
      // factory because eras differ within one range
      val physSch = eraPhysicalSchema(c.mapping)
      val b = mkBatch(c.rels.map(table.absPath), physSch)
      if (c.exclude.isEmpty) {
        val parts = b.planInputPartitions()
        if (parts.isEmpty) Seq.empty[InputPartition]
        else {
          val f = b.createReaderFactory()
          parts.toSeq.map(p => CdcInputPartition(p, c.ctype, c.v, f): InputPartition)
        }
      } else {
        // a file-diff chunk over VECTORED files (a rewrite or restore
        // of a file carrying `#dv=`): replay each file as one whole,
        // unsplit partition whose reader subtracts the vector by row
        // order — exactly the batch feed's semantics, without the v1
        // metadata-column read a streaming Batch cannot express
        val f = b.createReaderFactory()
        c.rels.map { rel =>
          val abs = table.absPath(rel)
          val len = table.store.size(java.nio.file.Paths.get(abs))
          val dv = c.exclude.get(rel)
          DvCdcInputPartition(abs, len, c.ctype, c.v,
            dv.map(_.count).getOrElse(0L), dv.map(_.payload).orNull,
            root, table.store, f): InputPartition
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory(cdcSchema)

  override def toString: String = s"SnapshotCdcMicroBatchStream($root)"
}
