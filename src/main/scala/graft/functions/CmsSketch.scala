package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** From-scratch Count-Min frequency sketch as a mergeable
  * `TypedImperativeAggregate` (SURVEY.md §4.3's sketch family, beside
  * [[HllSketch]]): `depth` rows of `width` counters; each input value
  * increments one counter per row (`md5("d|value")`-derived bucket);
  * the frequency estimate for a value is the MIN of its counters —
  * never an undercount, overcounts only on hash collisions (Cormode &
  * Muthukrishnan, J. Algorithms 2005).
  *
  * Scale properties:
  *  - the buffer IS the sketch: counters merge by elementwise ADD, so
  *    partial aggregates combine map-side and the shuffle carries
  *    O(depth·width) longs per group regardless of input rows — the
  *    same argument that makes HLL shuffle-friendly;
  *  - unlike HLL (register max) or KLL (order-dependent compaction),
  *    every counter is a plain SUM over a deterministic bucketing, so
  *    the sketch is ORDER-INDEPENDENT: any engine that can hash and
  *    GROUP BY reproduces it bit-for-bit — the catalog query's DuckDB
  *    oracle rebuilds the probed counters exactly;
  *  - md5-derived buckets are portable (no engine-private hash), same
  *    trick as TextOps.minhashBands.
  *
  * Production note: for heavy-hitters at 100 TB you'd pair this with a
  * top-k heap per partition; the sketch answers point frequency
  * queries, the heap remembers WHICH keys were hot.
  */
case class CmsSketch(
    child: Expression,
    depth: Int = 4,
    width: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cms"

  // same string-form hashing contract as HllSketch: atomic types only
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: org.apache.spark.sql.types.NumericType | _: org.apache.spark.sql.types.StringType |
           _: org.apache.spark.sql.types.BooleanType | _: org.apache.spark.sql.types.DateType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a numeric/string/boolean/date " +
          s"column, got ${other.simpleString}")
    }

  // The internal Catalyst value for DateType is days-since-epoch (an
  // Int) whose toString is NOT the SQL rendering — normalize to ISO
  // yyyy-MM-dd so md5(CAST(x AS VARCHAR)) holds cross-engine.
  // TimestampType is rejected above: its rendering depends on the
  // session zone, so the portable-hash contract cannot hold.
  private lazy val render: Any => String = child.dataType match {
    case _: org.apache.spark.sql.types.DateType =>
      v => java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString
    case _ => _.toString
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  /** Bucket = first 4 md5 bytes of "d|value" as an unsigned int, mod
    * width — identical to SQL's
    * `CAST('0x' || substr(md5(d || '|' || v), 1, 8) AS BIGINT) % width`. */
  private def bucket(d: Int, value: String): Int =
    (PortableHash.md5Prefix(s"$d|$value", 8) % width).toInt

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = render(v)
      var d = 0
      while (d < depth) {
        buf(d * width + bucket(d, s)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object CmsSketch {
  /** Column-API aggregate: Count-Min counter array (depth×width longs,
    * row-major) over the column's values. */
  def cms(c: Column, depth: Int = 4, width: Int = 256): Column =
    ColumnBridge.column(
      CmsSketch(ColumnBridge.expression(c), depth, width).toAggregateExpression())
}
