package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Size-capped EXACT value histogram as ONE aggregate: `map<value,count>`
  * of the child's non-null values, or NULL once the distinct count
  * exceeds `maxEntries` (the buffer "poisons" and stops growing, so
  * memory stays bounded at maxEntries+1 entries per partial regardless
  * of column cardinality — a map-side partial combine like any native
  * agg, never a shuffle of raw values).
  *
  * This feeds the ingest-time layer histograms (the layer-granularity
  * analog of the reference's per-value bitmaps,
  * filter/operators/bitmap_aggregation_node.h:23-50): one aggregation
  * pass computes min/max envelopes, null ledgers, AND the histogram —
  * no second job, no cardinality pre-estimate. A native
  * TypedImperativeAggregate (not a UDAF): partials serialize compactly
  * and the update path is a hash-map upsert.
  */
case class BoundedHistogram(child: Expression, maxEntries: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedHistogram.Buffer]
  with UnaryLike[Expression] {

  require(maxEntries > 0, "boundedHist needs a positive entry cap")

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): BoundedHistogram.Buffer =
    new BoundedHistogram.Buffer()

  override def update(buf: BoundedHistogram.Buffer,
      input: InternalRow): BoundedHistogram.Buffer = {
    if (!buf.poisoned) {
      val v = child.eval(input)
      if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    }
    buf
  }

  override def merge(buf: BoundedHistogram.Buffer,
      other: BoundedHistogram.Buffer): BoundedHistogram.Buffer = {
    if (other.poisoned) buf.poisoned = true
    else if (!buf.poisoned) {
      val it = other.counts.entrySet().iterator()
      while (it.hasNext && !buf.poisoned) {
        val e = it.next()
        add(buf, e.getKey, e.getValue)
      }
    }
    buf
  }

  private def add(buf: BoundedHistogram.Buffer, key: String,
      cnt: Long): Unit = {
    buf.counts.merge(key, cnt, (a: java.lang.Long, b: java.lang.Long) =>
      java.lang.Long.valueOf(a + b))
    if (buf.counts.size() > maxEntries) {
      buf.poisoned = true
      buf.counts.clear() // bounded: never hold past the cap
    }
  }

  override def eval(buf: BoundedHistogram.Buffer): Any = {
    if (buf.poisoned) null
    else {
      val n = buf.counts.size()
      val keys = new Array[Any](n)
      val vals = new Array[Any](n)
      val it = buf.counts.entrySet().iterator()
      var i = 0
      while (it.hasNext) {
        val e = it.next()
        keys(i) = UTF8String.fromString(e.getKey)
        vals(i) = e.getValue.longValue()
        i += 1
      }
      new ArrayBasedMapData(new GenericArrayData(keys),
        new GenericArrayData(vals))
    }
  }

  override def serialize(buf: BoundedHistogram.Buffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBoolean(buf.poisoned)
    out.writeInt(if (buf.poisoned) 0 else buf.counts.size())
    if (!buf.poisoned) {
      val it = buf.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val bytes = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(bytes.length)
        out.write(bytes)
        out.writeLong(e.getValue)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedHistogram.Buffer = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val buf = new BoundedHistogram.Buffer()
    buf.poisoned = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val key = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      buf.counts.put(key, in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): BoundedHistogram =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedHistogram =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BoundedHistogram = copy(child = newChild)
  override def prettyName: String = "bounded_hist"
}

object BoundedHistogram {
  /** Mutable per-partition partial: a plain hash map plus the poison
    * flag. `poisoned` propagates through merge — once any partial saw
    * more than maxEntries distinct values, the final result is null.
    */
  final class Buffer {
    var poisoned: Boolean = false
    val counts: java.util.HashMap[String, java.lang.Long] =
      new java.util.HashMap()
  }

  /** `boundedHist(c, k)` as a Column aggregate. Non-string inputs are
    * cast to their canonical string form (the update path reads
    * UTF8String values).
    */
  def boundedHist(c: Column, maxEntries: Int): Column =
    GraftShims.column(
      BoundedHistogram(GraftShims.expression(c.cast(StringType)), maxEntries)
        .toAggregateExpression())
}
