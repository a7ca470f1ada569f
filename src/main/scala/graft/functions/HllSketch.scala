package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
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
  * The row hash is a PORTABLE 60-bit value (first 15 hex chars of
  * md5 of the value's decimal/string form): max is order-independent,
  * so with a portable hash the whole register state — and therefore
  * the estimate — is reproducible by any engine that can md5 and
  * GROUP BY, which is how q_hll_distinct carries a full DuckDB oracle
  * (same trick as [[CmsSketch]]; only arrival-order-dependent
  * sketches like [[KllSketch]] are inherently un-oracle-able). The
  * production default remains `approx_count_distinct` (HLL++ with
  * xxhash — cheaper per row); this demonstrates the machinery.
  *
  * p = 12 → 4096 registers ≈ 1.6% relative standard error, 4 KiB.
  */
case class HllSketch(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, "p must be in [4, 16]")

  private val m = 1 << p
  private val wBits = 60 - p          // sub-stream bits below the index
  private val maxRank = wBits + 1

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hll"

  // the portable hash goes through the value's STRING form, which is
  // only stable/meaningful for atomic types — BinaryType would hash
  // the JVM identity string, complex types a rendering; reject both
  // at analysis time
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

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      // portable 60-bit hash: first 15 md5 hex chars of the value's
      // string form == SQL CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)
      val h60 = PortableHash.md5Prefix(render(v), 15)
      val idx = (h60 >>> wBits).toInt
      val w = h60 & ((1L << wBits) - 1)
      // rank = maxRank for w == 0, else wBits - bitlength(w) + 1
      val rank =
        if (w == 0) maxRank
        else maxRank - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > buf(idx)) buf(idx) = rank.toByte
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
