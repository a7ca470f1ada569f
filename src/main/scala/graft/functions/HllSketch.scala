package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** From-scratch HyperLogLog distinct-count sketch as a mergeable
  * `TypedImperativeAggregate` (SURVEY.md §4.3 E2 stretch goal).
  *
  * The buffer IS the sketch: 2^p max-rank registers (one byte each),
  * so partial aggregates merge by bytewise max — the property that
  * makes the sketch shuffle-friendly at any scale (shuffle size is
  * O(2^p) per group regardless of input rows) and persistable as a
  * column for later re-merge. Standard HLL estimator with linear
  * counting for the small range (Flajolet et al., AofA 2007).
  *
  * p = 12 → 4096 registers ≈ 1.6% relative standard error, 4 KiB.
  * Built-in `approx_count_distinct` (HLL++) remains the production
  * default; this demonstrates the custom mergeable-sketch machinery.
  */
case class HllSketch(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val m = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hll"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, 42L)
      val idx = (h >>> (64 - p)).toInt
      val w = h << p
      // rank = leading zeros of the remaining bits + 1, capped
      val rank = (if (w == 0) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
      val r = math.min(rank, 64 - p + 1).toByte
      if (r > buf(idx)) buf(idx) = r
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += math.pow(2.0, -buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    var e = alpha * m * m / sum
    if (e <= 2.5 * m && zeros > 0)
      e = m * math.log(m.toDouble / zeros)  // linear counting small range
    math.round(e)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object HllSketch {
  /** Column-API aggregate: approximate distinct count via graft's HLL. */
  def hllDistinct(c: Column): Column =
    ColumnBridge.column(HllSketch(ColumnBridge.expression(c)).toAggregateExpression())
}
