package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass diff of an aligned-sequence string against a reference —
  * the codegen kernel behind [[graft.seq.SequenceModel.diff]] for the
  * dominant literal-zero-offset case. Returns
  * `struct<muts: array<struct<pos:int, sym:string>>, missing: array<int>>`,
  * value-identical to the higher-order-function chain it replaces:
  *
  * {{{
  *   chars   = split(seq, "")                     // one piece per CODE POINT
  *   zipped  = zip_with(chars, sequence(1, size(chars)), (s,p) => (p, s))
  *   muts    = filter(zipped, s != substr(ref, p, 1) && s ∉ missingSyms)
  *   missing = transform(filter(zipped, s ∈ missingSyms), p)
  * }}}
  *
  * Equivalence obligations (each pinned by SeqDiffSpec against the HOF
  * chain on non-ASCII corpus-like text):
  *  - `split(seq, "")` yields one piece per Unicode CODE POINT (combining
  *    marks are their own pieces, astral chars are ONE piece), with NO
  *    trailing empty piece, and `"" -> [""]` (verified against
  *    UTF8String.split on this exact Spark build) — mirrored by byte-wise
  *    UTF-8 lead-byte iteration, with the empty string special-cased to a
  *    single empty symbol;
  *  - `substr(ref, pos, 1)` indexes by code point and yields "" past the
  *    end — mirrored by pre-splitting `ref` into code-point pieces once at
  *    construction;
  *  - UTF8String equality is byte equality; pieces sliced from the input
  *    share its bytes, so comparisons never re-encode. Parquet strings are
  *    valid UTF-8 by contract (invalid lead bytes would advance 1 byte,
  *    matching numBytesForFirstByte);
  *  - null sequence -> null result (the HOF columns are all null), so the
  *    struct's getFields propagate null exactly like the old columns.
  *
  * Why not the HOF chain: zip_with/filter/transform do not participate in
  * whole-stage codegen — every element pays interpreted Expression eval
  * (a regex split, a per-element literal substr, an array_contains), which
  * made the diff derivation the dominant cost of every in-query diffed
  * table. This kernel is one loop over the UTF-8 bytes.
  */
case class SeqDiff(
    child: Expression,
    ref: String,
    missingSyms: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = SeqDiff.outType

  override def nullable: Boolean = true

  @transient private lazy val refPieces: Array[UTF8String] =
    SeqDiff.codePointPieces(ref)
  @transient private lazy val missPieces: Array[UTF8String] =
    missingSyms.map(UTF8String.fromString).toArray

  override def eval(input: InternalRow): Any = {
    val s = child.eval(input)
    if (s == null) null
    else SeqDiff.compute(s.asInstanceOf[UTF8String], refPieces, missPieces)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refsRef = ctx.addReferenceObj("refPieces", refPieces,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val missRef = ctx.addReferenceObj("missPieces", missPieces,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, seq =>
      s"${ev.value} = graft.functions.SeqDiff.compute($seq, $refsRef, $missRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): SeqDiff =
    copy(child = newChild)
}

object SeqDiff {

  val mutType: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = true),
    StructField("sym", StringType, nullable = true)))

  // nullability mirrors the HOF chain exactly (pinned by SeqDiffSpec):
  // filter(zip_with(...)) yields containsNull=false elements whose struct
  // fields are nullable; transform(...)'s int elements are containsNull=true
  val outType: StructType = StructType(Seq(
    StructField("muts", ArrayType(mutType, containsNull = false), nullable = true),
    StructField("missing", ArrayType(IntegerType, containsNull = true),
      nullable = true)))

  /** One UTF8String piece per Unicode code point (the `split(s, "")`
    * pieces for a non-empty string).
    */
  def codePointPieces(s: String): Array[UTF8String] = {
    val u = UTF8String.fromString(s)
    val bytes = u.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < bytes.length) {
      val len = math.min(
        UTF8String.numBytesForFirstByte(bytes(i)), bytes.length - i)
      out += UTF8String.fromBytes(bytes, i, len)
      i += len
    }
    out.toArray
  }

  /** The per-row kernel: iterate the sequence's code points once, emitting
    * (pos, sym) for symbols that differ from the reference and are not
    * missing symbols, and pos for missing symbols. `seq` must be non-null.
    */
  def compute(
      seq: UTF8String,
      refPieces: Array[UTF8String],
      missPieces: Array[UTF8String]): InternalRow = {
    val bytes = seq.getBytes
    val muts = new scala.collection.mutable.ArrayBuffer[Any]
    val missing = new scala.collection.mutable.ArrayBuffer[Any]

    def emit(piece: UTF8String, pos: Int): Unit = {
      var isMissing = false
      var k = 0
      while (k < missPieces.length && !isMissing) {
        if (missPieces(k).equals(piece)) isMissing = true
        k += 1
      }
      if (isMissing) {
        missing += Integer.valueOf(pos)
      } else {
        // substr(ref, pos, 1) yields "" past the reference end; a piece is
        // never empty here except for the empty-sequence special case
        val refPiece =
          if (pos >= 1 && pos <= refPieces.length) refPieces(pos - 1)
          else UTF8String.EMPTY_UTF8
        if (!piece.equals(refPiece)) {
          muts += new GenericInternalRow(
            Array[Any](Integer.valueOf(pos), piece))
        }
      }
    }

    if (bytes.length == 0) {
      // split("", "") == [""]: one empty piece at position 1
      emit(UTF8String.EMPTY_UTF8, 1)
    } else {
      var i = 0
      var pos = 1
      while (i < bytes.length) {
        val len = math.min(
          UTF8String.numBytesForFirstByte(bytes(i)), bytes.length - i)
        emit(UTF8String.fromBytes(bytes, i, len), pos)
        i += len
        pos += 1
      }
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(muts.toArray),
      new GenericArrayData(missing.toArray)))
  }
}
