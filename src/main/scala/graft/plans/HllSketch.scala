package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch as a TypedImperativeAggregate.
  *
  * The 100 TB path for q7-style distinct counts: a fixed 2^p-byte
  * register buffer per group (p=11 → 2 KB, ~2.3% standard error),
  * map-side partial aggregation, merge = element-wise max — the
  * aggregate shape that makes distinct counting a single cheap
  * shuffle of sketches instead of an expand + two-phase exact agg.
  *
  * Spark ships approx_count_distinct (HLL++); this is the engine-
  * extension demonstration: a catalyst-level imperative aggregate
  * with a binary buffer, registered for SQL as graft_hll.
  */
case class HllSketch(
    child: Expression,
    p: Int = 11,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val m = 1 << p

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  /** fmix64 finalizer (public MurmurHash3 constant mix) over a
    * 64-bit FNV-1a of the value's bytes. */
  private def hash64(v: Any): Long = {
    var h = v match {
      case l: Long => l * 0x9e3779b97f4a7c15L
      case i: Int => i.toLong * 0x9e3779b97f4a7c15L
      case s: UTF8String =>
        var acc = 0xcbf29ce484222325L
        val bytes = s.getBytes
        var k = 0
        while (k < bytes.length) { acc = (acc ^ (bytes(k) & 0xffL)) * 0x100000001b3L; k += 1 }
        acc
      case d: Double => java.lang.Double.doubleToLongBits(d) * 0x9e3779b97f4a7c15L
      case other => other.hashCode().toLong * 0x9e3779b97f4a7c15L
    }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = hash64(v)
      val idx = (h >>> (64 - p)).toInt
      // rank of the first set bit in the remaining 64-p bits (1-based)
      val rest = h << p
      val rank = (if (rest == 0) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rank > (buf(idx) & 0xff)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = buf(i) & 0xff
      sum += 1.0 / (1L << r)
      if (r == 0) zeros += 1
      i += 1
    }
    var e = alpha * m * m / sum
    if (e <= 2.5 * m && zeros > 0) e = m * math.log(m.toDouble / zeros) // linear counting
    math.round(e)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): HllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllSketch =
    copy(child = c.head)
}

object HllSketch {
  /** Column API: approximate distinct count of `c`. */
  def hll(c: Column): Column =
    GraftShims.column(HllSketch(GraftShims.expression(c))
      .toAggregateExpression(isDistinct = false))
}
