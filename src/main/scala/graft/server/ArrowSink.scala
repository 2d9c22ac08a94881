package graft.server

import java.io.OutputStream
import scala.jdk.CollectionConverters._
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.{ListVector, StructVector}
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Arrow IPC stream sink (reference: exec_node/arrow_ipc_sink.h,
  * query_handler.cpp:67-83 — results stream as Arrow IPC when the client
  * sends `Accept: application/vnd.apache.arrow.stream`).
  *
  * Uses the public arrow-vector API (ships with Spark) and
  * `toLocalIterator`, so memory stays bounded by the batch size and
  * Spark backpressures the scan (≙ the reference's batched sink +
  * materialization cutoff). Covers scalars plus arbitrarily nested
  * list/struct results (the reference's sink streams every result shape,
  * so `mutations()`/`insertions()`-style nested outputs must too).
  */
object ArrowSink {

  val BatchRows = 4096

  private def scalarType(dt: DataType): ArrowType = dt match {
    case StringType => ArrowType.Utf8.INSTANCE
    case LongType => new ArrowType.Int(64, true)
    case IntegerType => new ArrowType.Int(32, true)
    case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case BooleanType => ArrowType.Bool.INSTANCE
    case DateType => new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY)
    case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
    case other => throw new IllegalArgumentException(
      s"ArrowSink: unsupported type $other")
  }

  private def arrowField(name: String, dt: DataType, nullable: Boolean): Field =
    dt match {
      case ArrayType(et, containsNull) =>
        new Field(name, new FieldType(nullable, ArrowType.List.INSTANCE, null),
          java.util.List.of(arrowField("element", et, containsNull)))
      case StructType(fields) =>
        new Field(name, new FieldType(nullable, ArrowType.Struct.INSTANCE, null),
          fields.toSeq.map(f => arrowField(f.name, f.dataType, f.nullable)).asJava)
      case scalar =>
        new Field(name, new FieldType(nullable, scalarType(scalar), null),
          java.util.List.of())
    }

  def supports(schema: StructType): Boolean = {
    def ok(dt: DataType): Boolean = dt match {
      case StringType | LongType | IntegerType | DoubleType | FloatType |
           BooleanType | DateType | TimestampType => true
      case ArrayType(et, _) => ok(et)
      case StructType(fields) => fields.forall(f => ok(f.dataType))
      case _ => false
    }
    schema.fields.forall(f => ok(f.dataType))
  }

  /** Write `value` (a Spark external-row value) at `i` into `v`. */
  private def setValue(v: FieldVector, i: Int, dt: DataType, value: Any): Unit =
    if (value == null) v.setNull(i)
    else dt match {
      case StringType => v.asInstanceOf[VarCharVector]
        .setSafe(i, value.toString.getBytes("UTF-8"))
      case LongType => v.asInstanceOf[BigIntVector]
        .setSafe(i, value.asInstanceOf[Long])
      case IntegerType => v.asInstanceOf[IntVector]
        .setSafe(i, value.asInstanceOf[Int])
      case DoubleType => v.asInstanceOf[Float8Vector]
        .setSafe(i, value.asInstanceOf[Double])
      case FloatType => v.asInstanceOf[Float4Vector]
        .setSafe(i, value.asInstanceOf[Float])
      case BooleanType => v.asInstanceOf[BitVector]
        .setSafe(i, if (value.asInstanceOf[Boolean]) 1 else 0)
      // rows surface java.sql types by default but java.time types when
      // spark.sql.datetime.java8API.enabled=true — accept both
      case DateType =>
        val days = value match {
          case d: java.sql.Date => d.toLocalDate.toEpochDay
          case d: java.time.LocalDate => d.toEpochDay
        }
        v.asInstanceOf[DateDayVector].setSafe(i, days.toInt)
      case TimestampType =>
        val inst = value match {
          case t: java.sql.Timestamp => t.toInstant
          case t: java.time.Instant => t
        }
        v.asInstanceOf[TimeStampMicroTZVector]
          .setSafe(i, inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
      case ArrayType(et, _) =>
        val lv = v.asInstanceOf[ListVector]
        val start = lv.startNewValue(i)
        val data = lv.getDataVector
        val seq = value.asInstanceOf[scala.collection.Seq[Any]]
        seq.zipWithIndex.foreach { case (e, k) => setValue(data, start + k, et, e) }
        lv.endValue(i, seq.size)
      case st: StructType =>
        val sv = v.asInstanceOf[StructVector]
        sv.setIndexDefined(i)
        val row = value.asInstanceOf[Row]
        st.fields.zipWithIndex.foreach { case (f, k) =>
          setValue(sv.getChild(f.name), i, f.dataType, row.get(k))
        }
      case other => throw new IllegalArgumentException(s"ArrowSink: $other")
    }

  def write(df: DataFrame, out: OutputStream): Unit =
    writeChunked(df, out, () => ())

  def writeChunked(df: DataFrame, out: OutputStream,
      headersReady: () => Unit): Unit =
    writeChunked(df, out, headersReady, BatchRows)

  /** [[write]] with a headers-ready callback for a CHUNKED HTTP response:
    * the first Spark batch is forced BEFORE any byte is written (runtime
    * failures surface while a clean 500 is still possible), then
    * `headersReady()` fires, then the schema message and the batches
    * stream to `out` — which on the server is the bounded-queue chunk
    * stream, so driver memory stays O(batch), never O(result).
    */
  def writeChunked(df: DataFrame, out: OutputStream,
      headersReady: () => Unit, batchRows: Int): Unit = {
    val schema = df.schema
    val arrowSchema = new Schema(
      schema.fields.toSeq.map(f => arrowField(f.name, f.dataType, f.nullable)).asJava)
    val allocator = new RootAllocator()
    val root = VectorSchemaRoot.create(arrowSchema, allocator)
    val writer = new ArrowStreamWriter(root, null, out)
    try {
      val it = df.toLocalIterator()
      val _ = it.hasNext // force the first Spark batch before any byte
      headersReady()
      writer.start()
      val buf = new scala.collection.mutable.ArrayBuffer[Row](batchRows)
      def flush(): Unit = if (buf.nonEmpty) {
        root.allocateNew()
        buf.zipWithIndex.foreach { case (row, i) =>
          schema.fields.zipWithIndex.foreach { case (f, c) =>
            setValue(root.getVector(c), i, f.dataType, row.get(c))
          }
        }
        root.setRowCount(buf.size)
        writer.writeBatch()
        buf.clear()
      }
      while (it.hasNext) {
        buf += it.next()
        if (buf.size >= batchRows) flush()
      }
      flush()
      writer.end()
    } finally {
      // close() re-writes the end marker; on an aborted chunk stream that
      // write throws — swallow it so root/allocator always release their
      // direct buffers (the original failure is already propagating)
      try writer.close() catch { case _: Throwable => () }
      root.close()
      allocator.close()
    }
  }
}
