package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.{DataType, DataTypes, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** The storage-partitioned-join half of snapshot-table bucketing: a
  * connector `Batch` that RE-GROUPS the delegate parquet scan's
  * planned input into ONE partition per bucket, each tagged with its
  * bucket id through [[HasPartitionKey]]. Paired with the scan
  * reporting `KeyGroupedPartitioning(bucket(n, key), n)`, Spark's
  * EnsureRequirements then plans equi-joins/aggregations on the bucket
  * key between same-spec tables with NO shuffle on either side — the
  * join walks co-located buckets directly (storage-partitioned join,
  * `spark.sql.sources.v2.bucketing.enabled`).
  *
  * The delegate's own partition planning (size-based file packing)
  * would mix buckets inside a partition, so this batch flattens the
  * delegate's [[FilePartition]]s back to their `PartitionedFile`s
  * (preserving any intra-file range splits) and regroups by the
  * manifest's file→bucket map. ALL `n` buckets are always emitted —
  * empty ones as zero-file partitions — so the two sides of a join
  * stay position-aligned even after zone-map or runtime filtering
  * dropped whole files on one side. */
private[sources] final class KeyGroupedBucketBatch(
    delegate: Batch,
    nBuckets: Int,
    bucketOfPath: Map[String, Int]) extends Batch {

  override def planInputPartitions(): Array[InputPartition] = {
    val files = delegate.planInputPartitions().flatMap {
      case fp: FilePartition => fp.files
      case other => throw new IllegalStateException(
        s"bucketed snapshot scan expected FilePartitions, got ${other.getClass}")
    }
    val grouped = files.groupBy { pf =>
      val p = pf.filePath.toPath.toUri.getPath
      bucketOfPath.getOrElse(p, throw new IllegalStateException(
        s"file $p has no bucket assignment in the manifest"))
    }
    Array.tabulate[InputPartition](nBuckets) { b =>
      new KeyedFilePartition(
        FilePartition(b, grouped.getOrElse(b, Array.empty)),
        new GenericInternalRow(Array[Any](b)))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new UnwrapKeyedFactory(delegate.createReaderFactory())
}

/** A [[FilePartition]] carrying its bucket id as the partition key —
  * what KeyGroupedPartitioning groups on. */
private[sources] final class KeyedFilePartition(
    val delegate: FilePartition,
    key: InternalRow) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = key
  override def preferredLocations(): Array[String] = delegate.preferredLocations()
}

/** Forwards reads to the delegate parquet factory, unwrapping the
  * keyed partition back to the [[FilePartition]] it expects. */
private[sources] final class UnwrapKeyedFactory(inner: PartitionReaderFactory)
    extends PartitionReaderFactory {
  private def un(p: InputPartition): InputPartition = p match {
    case k: KeyedFilePartition => k.delegate
    case other => other
  }
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    inner.createReader(un(p))
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    inner.createColumnarReader(un(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(un(p))
}

/** The catalog-registered v2 `bucket` function — what Spark resolves a
  * reported `bucket(n, key)` transform against (and evaluates, if it
  * ever shuffles one join side to match the other's storage
  * partitioning). MUST agree with the write path: commitBucketed
  * places rows via `repartition(n, key)` = `pmod(murmur3(key), n)`
  * with Spark's seed 42, so produceResult computes exactly that. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, key): pmod(murmur3(key), n) — snapshot-table hash bucketing"

  /** Key types commitBucketed supports (the murmur3 cases below). */
  def supported(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | StringType => true
    case _ => false
  }

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets, key), got ${inputType.simpleString}")
    val keyType = inputType.fields(1).dataType
    require(supported(keyType), s"unsupported bucket key type $keyType")
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(DataTypes.IntegerType, keyType)
      override def resultType(): DataType = DataTypes.IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.bucket"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        val h = keyType match {
          case LongType => Murmur3_x86_32.hashLong(input.getLong(1), 42)
          case IntegerType => Murmur3_x86_32.hashInt(input.getInt(1), 42)
          case StringType =>
            val s = input.getUTF8String(1)
            Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
              s.numBytes(), 42)
          case other => throw new IllegalStateException(s"unreachable: $other")
        }
        ((h % n) + n) % n
      }
    }
  }
}
