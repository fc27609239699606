package graft.interop

import java.io.OutputStream

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Arrow IPC export — the one interop surface a mixed Scala/Python team
  * asks for in place of the reference's `to_pyarrow`/`to_pandas`
  * (ibis/backends/pyspark/__init__.py:250-320; DIVERGENCES.md §5): the
  * result of any query as an Arrow stream that `pyarrow.ipc.open_stream`
  * / polars / duckdb read directly, with zero Python on this side.
  *
  * This is a CLIENT-EDGE operation by design: rows flow through
  * `toLocalIterator` (one partition pinned at a time, not a full
  * collect), batched into Arrow record batches of `maxRecordsPerBatch`.
  * Use it for query RESULTS — bounded frames, the same contract as
  * to_pandas; a 100 TB intermediate belongs in parquet, not on the
  * driver. */
object ArrowExport {

  /** Arrow schema for a Spark schema. Covers the engine's result-surface
    * types (primitives, decimal, string/binary, date/timestamp, and
    * one-level numeric arrays — embeddings); anything else fails fast
    * with the column name rather than silently re-encoding. */
  def arrowSchema(schema: StructType, timeZoneId: String): Schema = {
    new Schema(schema.fields.map(f => toArrowField(f.name, f.dataType,
      f.nullable, timeZoneId)).toSeq.asJava)
  }

  private def toArrowType(dt: DataType, tz: String): ArrowType = dt match {
    case BooleanType => ArrowType.Bool.INSTANCE
    case ByteType => new ArrowType.Int(8, true)
    case ShortType => new ArrowType.Int(16, true)
    case IntegerType => new ArrowType.Int(32, true)
    case LongType => new ArrowType.Int(64, true)
    case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case StringType => ArrowType.Utf8.INSTANCE
    case BinaryType => ArrowType.Binary.INSTANCE
    case d: DecimalType => new ArrowType.Decimal(d.precision, d.scale, 128)
    case DateType => new ArrowType.Date(DateUnit.DAY)
    case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, tz)
    case TimestampNTZType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, null)
    case other => throw new UnsupportedOperationException(
      s"ArrowExport does not cover $other")
  }

  private def toArrowField(name: String, dt: DataType, nullable: Boolean,
      tz: String): Field = dt match {
    case ArrayType(elem, containsNull) =>
      // reject HERE, before any batch is written: the writer covers only
      // numeric list elements, and failing mid-stream would leave a
      // truncated Arrow file behind without naming the column
      elem match {
        case IntegerType | LongType | FloatType | DoubleType => ()
        case other => throw new UnsupportedOperationException(
          s"ArrowExport: column '$name' is array<$other>; list exports cover numeric elements only")
      }
      new Field(name, new FieldType(nullable, ArrowType.List.INSTANCE, null),
        Seq(toArrowField("element", elem, containsNull, tz)).asJava)
    case other =>
      new Field(name, new FieldType(nullable, toArrowType(other, tz), null),
        java.util.Collections.emptyList[Field]())
  }

  /** Stream `df`'s rows as Arrow IPC record batches into `out`. */
  def writeArrowStream(df: DataFrame, out: OutputStream,
      maxRecordsPerBatch: Int = 10000): Long = {
    require(maxRecordsPerBatch > 0, "maxRecordsPerBatch must be positive")
    val schema = df.schema
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val allocator = new RootAllocator(Long.MaxValue)
    val root = VectorSchemaRoot.create(arrowSchema(schema, tz), allocator)
    val writer = new ArrowStreamWriter(root, null, out)
    var total = 0L
    try {
      writer.start()
      val it = df.toLocalIterator()
      while (it.hasNext) {
        var n = 0
        while (it.hasNext && n < maxRecordsPerBatch) {
          val row = it.next()
          var i = 0
          while (i < schema.length) {
            setValue(root.getVector(i), schema.fields(i).dataType, n, row, i)
            i += 1
          }
          n += 1
        }
        root.setRowCount(n)
        writer.writeBatch()
        total += n
        root.allocateNew() // reset vectors for the next batch
      }
      writer.end()
      total
    } finally {
      writer.close(); root.close(); allocator.close()
    }
  }

  /** The whole result as one in-memory Arrow IPC stream (bounded frames —
    * the to_pyarrow contract). */
  def toArrowStreamBytes(df: DataFrame, maxRecordsPerBatch: Int = 10000): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    writeArrowStream(df, bos, maxRecordsPerBatch)
    bos.toByteArray
  }

  /** Write the result as an Arrow IPC stream file; returns the row count.
    * `pyarrow.ipc.open_stream(path)` reads it as-is. */
  def toArrowFile(df: DataFrame, path: String, maxRecordsPerBatch: Int = 10000): Long = {
    val out = java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path))
    try writeArrowStream(df, out, maxRecordsPerBatch) finally out.close()
  }

  private def setValue(vec: FieldVector, dt: DataType, idx: Int, row: Row,
      col: Int): Unit = {
    if (row.isNullAt(col)) { setNull(vec, dt, idx); return }
    (vec, dt) match {
      case (v: BitVector, BooleanType) => v.setSafe(idx, if (row.getBoolean(col)) 1 else 0)
      case (v: TinyIntVector, ByteType) => v.setSafe(idx, row.getByte(col))
      case (v: SmallIntVector, ShortType) => v.setSafe(idx, row.getShort(col))
      case (v: IntVector, IntegerType) => v.setSafe(idx, row.getInt(col))
      case (v: BigIntVector, LongType) => v.setSafe(idx, row.getLong(col))
      case (v: Float4Vector, FloatType) => v.setSafe(idx, row.getFloat(col))
      case (v: Float8Vector, DoubleType) => v.setSafe(idx, row.getDouble(col))
      case (v: VarCharVector, StringType) =>
        v.setSafe(idx, row.getString(col).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case (v: VarBinaryVector, BinaryType) =>
        v.setSafe(idx, row.getAs[Array[Byte]](col))
      case (v: DecimalVector, _: DecimalType) =>
        v.setSafe(idx, row.getDecimal(col))
      case (v: DateDayVector, DateType) =>
        v.setSafe(idx, row.getDate(col).toLocalDate.toEpochDay.toInt)
      case (v: TimeStampVector, TimestampType) =>
        val ts = row.getTimestamp(col)
        v.setSafe(idx, math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L)
      case (v: TimeStampVector, TimestampNTZType) =>
        val ldt = row.getAs[java.time.LocalDateTime](col)
        v.setSafe(idx, ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L)
      case (v: ListVector, ArrayType(elem, _)) =>
        val seq = row.getSeq[Any](col)
        val start = v.startNewValue(idx)
        val child = v.getDataVector
        var j = 0
        while (j < seq.length) {
          writeListElem(child, elem, start + j, seq(j)); j += 1
        }
        v.endValue(idx, seq.length)
      case (v, t) => throw new UnsupportedOperationException(
        s"ArrowExport: no writer for $t into ${v.getClass.getSimpleName}")
    }
  }

  private def writeListElem(child: FieldVector, elem: DataType, at: Int,
      e: Any): Unit =
    if (e == null) child match {
      case c: BaseFixedWidthVector => c.setNull(at)
      case c => throw new UnsupportedOperationException(
        s"ArrowExport: null element in ${c.getClass.getSimpleName} list")
    } else (child, elem) match {
      case (c: IntVector, IntegerType) => c.setSafe(at, e.asInstanceOf[Int])
      case (c: BigIntVector, LongType) => c.setSafe(at, e.asInstanceOf[Long])
      case (c: Float4Vector, FloatType) => c.setSafe(at, e.asInstanceOf[Float])
      case (c: Float8Vector, DoubleType) => c.setSafe(at, e.asInstanceOf[Double])
      case (_, other) => throw new UnsupportedOperationException(
        s"ArrowExport list element type $other")
    }

  private def setNull(vec: FieldVector, dt: DataType, idx: Int): Unit = vec match {
    case v: ListVector => v.setNull(idx)
    case v: BaseFixedWidthVector => v.setNull(idx)
    case v: BaseVariableWidthVector => v.setNull(idx)
    case v => throw new UnsupportedOperationException(
      s"ArrowExport: cannot null ${v.getClass.getSimpleName}")
  }
}
