package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Mergeable quantile sketch (KLL/MRL-style level compactors) as a
  * TypedImperativeAggregate.
  *
  * The 100 TB path for "percentiles over the corpus": the exact form
  * (e4's `percentile`) buffers every value per group on the final
  * aggregator; this keeps a bounded multi-level sample per partition
  * and shuffles only sketches — fixed memory per group, map-side
  * combine, one tiny merge (Karnin–Lall–Liberty 2016 / the
  * Manku–Rajagopalan–Lindsay collapse scheme).
  *
  * Structure: level i holds items of weight 2^i. Inserts land in
  * level 0; when a level reaches capacity it is sorted and every
  * other element (alternating start parity — deterministic, no RNG,
  * so runs are replayable) is promoted to level i+1. A merge
  * concatenates levels pairwise then re-compacts bottom-up, so the
  * bound is preserved under Spark's partial/final aggregation
  * (mergeable-summaries property).
  *
  * Rank math is pure integer: probes are PERCENT integers and the
  * target rank is `(p*n + 99) / 100` (= ceil(p·n/100)) — no float
  * rank can disagree across engines. When capacity ≥ group size no
  * compaction ever fires, every weight is 1, and the output is the
  * EXACT discrete order statistic — the hash-oracled path (the same
  * capacity≥domain trick ta12 uses for Misra–Gries). QuantileSpec
  * asserts the rank-error bound at small capacity on larger data.
  *
  * Output: array<double> of the value at each probe's target rank
  * (weighted-CDF walk), null only for an all-null/empty group.
  */
case class QuantileSketch(
    child: Expression,
    k: Int = 1024,
    pcts: Seq[Int] = Seq(50, 90, 99),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.Buf] {

  require(k >= 8, s"capacity must be >= 8, got $k")
  require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
    s"probe percents must be in [1,100], got $pcts")

  import QuantileSketch.Buf

  override def createAggregationBuffer(): Buf = new Buf

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double], k)
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = { a.mergeIn(b, k); a }

  override def eval(buf: Buf): Any = {
    if (buf.n == 0L) return null
    // flatten to (value, weight), sort once, answer every probe from
    // the cumulative walk
    val items = ArrayBuffer.empty[(Double, Long)]
    var lvl = 0
    while (lvl < buf.levels.length) {
      val w = 1L << lvl
      buf.levels(lvl).foreach(x => items += ((x, w)))
      lvl += 1
    }
    val sorted = items.sortBy(_._1).toArray
    val out = pcts.map { p =>
      val target = (p.toLong * buf.n + 99L) / 100L // ceil(p*n/100), integer-exact
      var cum = 0L
      var i = 0
      var ans = sorted.last._1
      var found = false
      while (i < sorted.length && !found) {
        cum += sorted(i)._2
        if (cum >= target) { ans = sorted(i)._1; found = true }
        i += 1
      }
      ans
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.parity)
    out.writeInt(buf.levels.length)
    buf.levels.foreach { lv =>
      out.writeInt(lv.length)
      lv.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new Buf
    buf.n = in.readLong()
    buf.parity = in.readInt()
    val nLevels = in.readInt()
    buf.levels.clear()
    var i = 0
    while (i < nLevels) {
      val len = in.readInt()
      val lv = new ArrayBuffer[Double](len)
      var j = 0
      while (j < len) { lv += in.readDouble(); j += 1 }
      buf.levels += lv
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): QuantileSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QuantileSketch =
    copy(child = c.head)
  override def prettyName: String = "graft_quantiles"
}

object QuantileSketch {
  /** Level-compactor buffer. Level i items carry weight 2^i; total
    * retained items ≤ (#levels)·k, with #levels ≈ log2(n/k). */
  final class Buf {
    val levels: ArrayBuffer[ArrayBuffer[Double]] =
      ArrayBuffer(ArrayBuffer.empty[Double])
    var n: Long = 0L
    var parity: Int = 0

    def insert(v: Double, k: Int): Unit = {
      levels(0) += v
      n += 1L
      if (levels(0).length >= k) compact(0, k)
    }

    /** Sort level i, promote alternating survivors to level i+1
      * (each survivor's weight doubles by construction of the level
      * index), cascade if the next level overflows. The alternating
      * start index is the classic unbiased-in-expectation coin,
      * derandomized to a flip-flop so the aggregate is replayable. */
    private def compact(i: Int, k: Int): Unit = {
      val lv = levels(i)
      val sorted = lv.sorted
      val start = parity
      parity ^= 1
      if (levels.length == i + 1) levels += ArrayBuffer.empty[Double]
      val up = levels(i + 1)
      var j = start
      while (j < sorted.length) { up += sorted(j); j += 2 }
      lv.clear()
      if (up.length >= k) compact(i + 1, k)
    }

    def mergeIn(other: Buf, k: Int): Unit = {
      n += other.n
      var i = 0
      while (i < other.levels.length) {
        if (levels.length == i) levels += ArrayBuffer.empty[Double]
        levels(i) ++= other.levels(i)
        i += 1
      }
      i = 0
      while (i < levels.length) {
        if (levels(i).length >= k) compact(i, k)
        i += 1
      }
    }
  }

  /** Column API: quantile estimates of `c` at integer-percent probes. */
  def quantiles(c: Column, k: Int, pcts: Seq[Int]): Column =
    GraftShims.column(QuantileSketch(
        org.apache.spark.sql.catalyst.expressions.Cast(
          GraftShims.expression(c), DoubleType), k, pcts)
      .toAggregateExpression(isDistinct = false))
}
