package graft.sources

import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}

/** A stream position in a [[SnapshotTable]]'s history: the last
  * snapshot version whose files have been emitted. The manifest's
  * monotonically increasing version number IS the offset domain —
  * total-ordered, durable, and replayable, exactly the properties a
  * Structured Streaming offset needs (compare Delta's reservoir
  * version / Kafka's partition offsets). -1 = before the first
  * commit (a fresh stream bootstraps the whole table). */
final case class SnapshotVersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
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
final class SnapshotMicroBatchStream(root: String, mkBatch: Seq[String] => Batch)
    extends MicroBatchStream {

  private val table = SnapshotTable(root)

  // after a checkpoint restore the engine may hand back a raw
  // SerializedOffset; the json round-trip covers both shapes
  private def ver(o: Offset): Long = o match {
    case SnapshotVersionOffset(v) => v
    case other => other.json().toLong
  }

  override def initialOffset(): Offset = SnapshotVersionOffset(-1L)
  override def latestOffset(): Offset = SnapshotVersionOffset(table.currentVersion())
  override def deserializeOffset(json: String): Offset = SnapshotVersionOffset(json.toLong)
  override def commit(end: Offset): Unit = () // checkpoint is the engine's
  override def stop(): Unit = ()

  // planInputPartitions(start, end) then createReaderFactory() is the
  // engine's per-batch call order (MicroBatchScanExec); the planned
  // delegate batch bridges the two calls
  @volatile private var planned: Batch = _

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val files = table.addedFilesBetween(ver(start), ver(end))
    if (files.isEmpty) { planned = null; Array.empty }
    else { planned = mkBatch(files); planned.planInputPartitions() }
  }

  override def createReaderFactory(): PartitionReaderFactory = planned match {
    case null => // zero partitions planned: factory must exist, never runs
      (_: InputPartition) => throw new IllegalStateException(
        s"graft-snapshot stream at $root: reader requested for an empty batch")
    case b => b.createReaderFactory()
  }

  override def toString: String = s"SnapshotMicroBatchStream($root)"
}
