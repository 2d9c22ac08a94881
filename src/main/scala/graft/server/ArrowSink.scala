package graft.server

import java.io.OutputStream
import scala.jdk.CollectionConverters._
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Arrow IPC stream sink (reference: exec_node/arrow_ipc_sink.h,
  * query_handler.cpp:67-83 — results stream as Arrow IPC when the client
  * sends `Accept: application/vnd.apache.arrow.stream`).
  *
  * Uses the public arrow-vector API (ships with Spark) and
  * `toLocalIterator`, so memory stays bounded by the batch size and
  * Spark backpressures the scan (≙ the reference's batched sink +
  * materialization cutoff). Covers the scalar result types the query
  * surface produces; nested results go through the NDJSON sink.
  */
object ArrowSink {

  val BatchRows = 4096

  private def arrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case StringType => ArrowType.Utf8.INSTANCE
      case LongType => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case BooleanType => ArrowType.Bool.INSTANCE
      case DateType => new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY)
      case other => throw new IllegalArgumentException(
        s"ArrowSink: unsupported type $other for column ${f.name}")
    }
    new Field(f.name, new FieldType(f.nullable, t, null), java.util.List.of())
  }

  def supports(schema: StructType): Boolean =
    schema.fields.forall(f => f.dataType match {
      case StringType | LongType | IntegerType | DoubleType | BooleanType |
           DateType => true
      case _ => false
    })

  def write(df: DataFrame, out: OutputStream): Unit = {
    val schema = df.schema
    val arrowSchema = new Schema(schema.fields.map(arrowField).toList.asJava)
    val allocator = new RootAllocator()
    val root = VectorSchemaRoot.create(arrowSchema, allocator)
    val writer = new ArrowStreamWriter(root, null, out)
    try {
      writer.start()
      val it = df.toLocalIterator()
      val buf = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](BatchRows)
      def flush(): Unit = if (buf.nonEmpty) {
        root.allocateNew()
        buf.zipWithIndex.foreach { case (row, i) =>
          schema.fields.zipWithIndex.foreach { case (f, c) =>
            val v = root.getVector(c)
            if (row.isNullAt(c)) v.asInstanceOf[FieldVector].setNull(i)
            else f.dataType match {
              case StringType => v.asInstanceOf[VarCharVector]
                .setSafe(i, row.getString(c).getBytes("UTF-8"))
              case LongType => v.asInstanceOf[BigIntVector].setSafe(i, row.getLong(c))
              case IntegerType => v.asInstanceOf[IntVector].setSafe(i, row.getInt(c))
              case DoubleType => v.asInstanceOf[Float8Vector].setSafe(i, row.getDouble(c))
              case BooleanType => v.asInstanceOf[BitVector]
                .setSafe(i, if (row.getBoolean(c)) 1 else 0)
              case DateType => v.asInstanceOf[DateDayVector]
                .setSafe(i, row.getDate(c).toLocalDate.toEpochDay.toInt)
              case other => throw new IllegalArgumentException(s"$other")
            }
          }
        }
        root.setRowCount(buf.size)
        writer.writeBatch()
        buf.clear()
      }
      while (it.hasNext) {
        buf += it.next()
        if (buf.size >= BatchRows) flush()
      }
      flush()
      writer.end()
    } finally {
      writer.close()
      root.close()
      allocator.close()
    }
  }
}
