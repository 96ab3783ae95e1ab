package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a TypedImperativeAggregate.
  *
  * The 100 TB path for "top tokens over the corpus": the exact form
  * (ta5) shuffles every token occurrence; this keeps a bounded
  * k-counter summary per partition and shuffles only sketches —
  * fixed memory per group, map-side combine, one tiny merge.
  *
  * Guarantees (classic Misra–Gries, preserved under the pairwise
  * merge of Agarwal et al.'s mergeable-summaries result): with
  * capacity k over n items, every item with true count > n/k is
  * present, and every reported estimate undercounts its true count
  * by at most n/k. The spec asserts both bounds against the exact
  * aggregation.
  *
  * Output is map<string, long> of item → lower-bound estimate.
  * Engine-extension demonstration alongside HllSketch: imperative
  * buffer, custom serialization, SQL-registered as graft_freq.
  */
case class FreqSketch(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[String, Long]] {

  require(k >= 1, "capacity must be >= 1")

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, Long] =
    mutable.LinkedHashMap.empty[String, Long]

  override def update(buf: mutable.LinkedHashMap[String, Long],
      input: InternalRow): mutable.LinkedHashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      if (buf.contains(item)) buf(item) += 1L
      else if (buf.size < k) buf(item) = 1L
      else {
        // textbook MG: full buffer + unseen item → decrement every
        // counter by one and drop zeros (the item itself goes
        // uncounted this round). O(k) here, amortized O(1)/item —
        // each decrement cancels one earlier increment.
        val dead = buf.iterator.collect { case (i, c) if c == 1L => i }.toList
        dead.foreach(buf.remove)
        buf.mapValuesInPlace((_, c) => c - 1L)
      }
    }
    buf
  }

  override def merge(a: mutable.LinkedHashMap[String, Long],
      b: mutable.LinkedHashMap[String, Long]): mutable.LinkedHashMap[String, Long] = {
    b.foreach { case (i, c) =>
      a.updateWith(i) { case x => Some(x.getOrElse(0L) + c) }
    }
    if (a.size > k) {
      // mergeable-summaries MG merge (Agarwal et al.): subtract the
      // (k+1)-th largest count and drop non-positives — size returns
      // to <= k and the undercount bounds stay additive
      val counts = a.valuesIterator.toArray.sorted(Ordering[Long].reverse)
      val dec = counts(k)
      val dead = a.iterator.collect { case (i, c) if c - dec <= 0L => i }.toList
      dead.foreach(a.remove)
      a.mapValuesInPlace((_, c) => c - dec)
    }
    a
  }

  override def eval(buf: mutable.LinkedHashMap[String, Long]): Any = {
    val entries = buf.toSeq.sortBy { case (i, c) => (-c, i) }
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(entries.map(_._2).toArray[Any]))
  }

  override def serialize(buf: mutable.LinkedHashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, c) =>
      val bytes = i.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LinkedHashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.put(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): FreqSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqSketch =
    copy(child = c.head)
}

object FreqSketch {
  /** Column API: Misra–Gries heavy hitters of `c` with capacity k. */
  def freq(c: Column, k: Int = 64): Column =
    GraftShims.column(FreqSketch(GraftShims.expression(c), k)
      .toAggregateExpression(isDistinct = false))
}
