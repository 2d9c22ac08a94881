package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A layer-sized BLOOM FILTER of a column's non-null values as ONE
  * aggregate, for the `bl:` sidecar line that serves primary-key point
  * lookups (the layer-granularity analog of the reference's per-value
  * StringInSet bitmaps, which answer point predicates regardless of key
  * distribution — src/silo/query_engine/filter/operators/
  * string_in_set.cpp:64, equals.cpp:143-148; a random-uuid pk spans
  * every layer's lexicographic envelope, so envelope pruning alone
  * opens every footer).
  *
  * Design:
  *  - rides the SAME single stats aggregation pass as the envelopes and
  *    histograms (no second job over the batch, no cardinality
  *    pre-estimate);
  *  - each partial builds at a fixed power-of-two width (2^20 bits =
  *    128 KB — bounded memory, compact shuffle), and `eval` FOLDS the
  *    merged filter down to ~[[TargetBitsPerKey]] bits per inserted key
  *    (capped at 2^16 bits = 8 KB written): bit positions are
  *    `hash & (bits−1)`, so OR-ing the upper half onto the lower half
  *    exactly re-addresses every set bit at the smaller width —
  *    membership is preserved, only the false-positive rate grows;
  *  - a filter still more than half-full after folding to the cap
  *    (a layer with far more keys than the cap serves) evals to NULL:
  *    its false-positive rate can no longer exclude anything, so the
  *    sidecar line is not worth its bytes (readers treat a missing line
  *    as conservative keep).
  *
  * Hashing is double-hashing over two [[XxHash64Function]] seeds — the
  * same function the probe side uses, so writer and reader can never
  * disagree on a key's bit positions. Double-typed children hash the
  * IEEE bits via `doubleToLongBits`, which canonicalizes NaN but NOT
  * the zero sign — and zero-sign equality is PATH-DEPENDENT in Spark
  * (codegen's IEEE `==` treats -0.0 = 0.0 as equal; the parquet
  * pushdown comparator's total order does not) — so both [[update]]
  * and [[maybeContainsDouble]] canonicalize -0.0 to +0.0 before
  * hashing: a layer holding -0.0 stays INCLUDABLE for a `pk = 0.0`
  * probe (and vice versa) under whichever semantics the row-wise scan
  * exhibits; the cost is at most one conservatively-read footer.
  * String children hash the UTF-8 bytes verbatim.
  */
case class BloomSketch(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomSketch.Buffer]
  with UnaryLike[Expression] {

  import BloomSketch._

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Buffer = new Buffer()

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v0 = child.eval(input)
    if (v0 != null) {
      // -0.0 = 0.0 row-wise but doubleToLongBits distinguishes them:
      // canonicalize so a sign-flipped zero can never make the probe
      // side wrongly exclude the layer (see class doc)
      val v = v0 match {
        case d: Double if d == 0.0d => 0.0d
        case f: Float if f == 0.0f => 0.0f
        case x => x
      }
      val h1 = XxHash64Function.hash(v, child.dataType, Seed1)
      val h2 = XxHash64Function.hash(v, child.dataType, Seed2) | 1L
      insert(buf.words, h1, h2)
      buf.count += 1
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    var i = 0
    while (i < buf.words.length) { buf.words(i) |= other.words(i); i += 1 }
    buf.count += other.count
    buf
  }

  override def eval(buf: Buffer): Any = {
    if (buf.count == 0) return null
    // smallest power-of-two width giving ~TargetBitsPerKey bits per
    // inserted key, clamped to [2^MinLogBits, 2^MaxLogBits]
    var logBits = MinLogBits
    while (logBits < MaxLogBits &&
        (1L << logBits) < TargetBitsPerKey * buf.count) logBits += 1
    var words = buf.words
    while (words.length * 64L > (1L << logBits)) {
      val half = new Array[Long](words.length / 2)
      var i = 0
      while (i < half.length) { half(i) = words(i) | words(i + half.length); i += 1 }
      words = half
    }
    var ones = 0L
    var i = 0
    while (i < words.length) { ones += java.lang.Long.bitCount(words(i)); i += 1 }
    if (ones * 2 > words.length * 64L) return null // saturated — useless
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    words.foreach(bb.putLong)
    bb.array()
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buf.words.length * 8)
    bb.putLong(buf.count)
    buf.words.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Buffer()
    buf.count = bb.getLong
    var i = 0
    while (i < buf.words.length) { buf.words(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BloomSketch = copy(child = newChild)
  override def prettyName: String = "bloom_sketch"
}

object BloomSketch {
  /** Hash count — with ~[[TargetBitsPerKey]] bits per key this lands
    * the per-layer false-positive rate under ~1% (a false positive
    * only costs one extra footer; the row-wise filter stays exact).
    */
  val NumHashes = 6
  /** Build width (bits, log2): per-partial memory and shuffle payload
    * are 2^BuildLogBits/8 bytes = 128 KB — bounded regardless of batch
    * size, like every other stats aggregate.
    */
  val BuildLogBits = 20
  /** Written width clamp (bits, log2): 2^16 bits = 8 KB folded — the
    * sidecar stays metadata-sized even for large layers (larger layers
    * saturate and write nothing; the newest big snapshot layer is read
    * by a point probe anyway).
    */
  val MinLogBits = 10
  val MaxLogBits = 16
  val TargetBitsPerKey = 10
  private val Seed1 = 0x517cc1b7L
  private val Seed2 = 0x27220a95L

  /** Mutable per-partition partial: fixed-width bit words + the
    * inserted-key count that sizes the fold at eval.
    */
  final class Buffer {
    val words = new Array[Long](1 << (BuildLogBits - 6))
    var count = 0L
  }

  private def insert(words: Array[Long], h1: Long, h2: Long): Unit = {
    val mask = words.length * 64L - 1
    var i = 0
    while (i < NumHashes) {
      val pos = (h1 + i * h2) & mask
      words((pos >>> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Probe a WRITTEN (folded) filter: positions re-derive under the
    * written width's mask — exactly where the fold left every inserted
    * key's bits. `k` rides the sidecar line so a future hash-count
    * change stays readable.
    */
  def maybeContains(words: Array[Long], k: Int, h1: Long, h2: Long): Boolean = {
    val mask = words.length * 64L - 1
    var i = 0
    while (i < k) {
      val pos = (h1 + i * h2) & mask
      if (((words((pos >>> 6).toInt) >>> (pos & 63)) & 1L) == 0L) return false
      i += 1
    }
    true
  }

  def maybeContainsString(words: Array[Long], k: Int, v: String): Boolean = {
    val u = UTF8String.fromString(v)
    maybeContains(words, k, XxHash64Function.hash(u, StringType, Seed1),
      XxHash64Function.hash(u, StringType, Seed2) | 1L)
  }

  def maybeContainsDouble(words: Array[Long], k: Int, v: Double): Boolean = {
    // canonicalize -0.0 like the insert side (class doc): the planner
    // may carry a -0.0 literal whose row-wise equality matches +0.0
    val d = java.lang.Double.valueOf(if (v == 0.0d) 0.0d else v)
    maybeContains(words, k,
      XxHash64Function.hash(d, org.apache.spark.sql.types.DoubleType, Seed1),
      XxHash64Function.hash(d, org.apache.spark.sql.types.DoubleType, Seed2) | 1L)
  }

  /** `bloomSketch(c)` as a Column aggregate (string children hash
    * UTF-8 bytes; numeric/date callers pre-cast to double so writer
    * and probe share one canonical encoding).
    */
  def bloomSketch(c: Column): Column =
    GraftShims.column(
      BloomSketch(GraftShims.expression(c)).toAggregateExpression())
}
