package graft.interop

import java.io.OutputStream

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.{ListVector, MapVector, StructVector}
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
    * types (primitives, decimal, string/binary, date/timestamp) plus
    * arbitrarily nested arrays, structs and maps (round 7 — token lists,
    * embeddings metadata, struct results, count maps) and ANSI interval
    * leaves (round 8 — Duration/Interval vectors); the remaining
    * unsupported leaf (legacy CalendarIntervalType) fails fast with the
    * full column path rather than silently re-encoding. */
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
    // interval leaves (round 8): Spark's ANSI intervals map exactly —
    // day-time is a µs count (Arrow Duration), year-month a month count
    // (Arrow Interval). Only legacy CalendarIntervalType (mixed
    // months+days+µs in one value) stays unsupported: Arrow has no
    // lossless single-vector encoding for it pre-MonthDayNano writers.
    case _: DayTimeIntervalType => new ArrowType.Duration(TimeUnit.MICROSECOND)
    case _: YearMonthIntervalType =>
      new ArrowType.Interval(org.apache.arrow.vector.types.IntervalUnit.YEAR_MONTH)
    case other => throw new UnsupportedOperationException(
      s"ArrowExport does not cover $other")
  }

  private def toArrowField(name: String, dt: DataType, nullable: Boolean,
      tz: String, path: String = null): Field = {
    val p = if (path == null) name else path
    dt match {
      case ArrayType(elem, containsNull) =>
        new Field(name, new FieldType(nullable, ArrowType.List.INSTANCE, null),
          Seq(toArrowField("element", elem, containsNull, tz, s"$p.element")).asJava)
      case MapType(kt, vt, valueContainsNull) =>
        // Arrow maps are a list of non-null struct<key!, value> entries
        val entries = new Field("entries",
          new FieldType(false, ArrowType.Struct.INSTANCE, null),
          Seq(toArrowField("key", kt, nullable = false, tz, s"$p.key"),
            toArrowField("value", vt, valueContainsNull, tz, s"$p.value")).asJava)
        new Field(name, new FieldType(nullable, new ArrowType.Map(false), null),
          Seq(entries).asJava)
      case st: StructType =>
        new Field(name, new FieldType(nullable, ArrowType.Struct.INSTANCE, null),
          st.fields.map(f =>
            toArrowField(f.name, f.dataType, f.nullable, tz, s"$p.${f.name}")).toSeq.asJava)
      case other =>
        // unsupported leaves throw HERE, before any batch is written (a
        // mid-stream failure would leave a truncated Arrow file behind),
        // and carry the full column path
        val at = try toArrowType(other, tz) catch {
          case _: UnsupportedOperationException => throw new UnsupportedOperationException(
            s"ArrowExport: column '$p' has unsupported type $other")
        }
        new Field(name, new FieldType(nullable, at, null),
          java.util.Collections.emptyList[Field]())
    }
  }

  /** Stream `df`'s rows as Arrow IPC record batches into `out`. */
  def writeArrowStream(df: DataFrame, out: OutputStream,
      maxRecordsPerBatch: Int = 10000): Long =
    writeBatches(df, root => new ArrowStreamWriter(root, null, out), maxRecordsPerBatch)

  /** Write the result in the random-access Arrow IPC FILE format (the
    * `ARROW1`-magic layout of `pyarrow.ipc.new_file`, a.k.a. Feather v2)
    * — the other interchange layout pyarrow/polars/duckdb produce and
    * consume. Returns the row count. */
  def toArrowIpcFile(df: DataFrame, path: String, maxRecordsPerBatch: Int = 10000): Long = {
    val ch = java.nio.channels.FileChannel.open(java.nio.file.Paths.get(path),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    try writeBatches(df,
      root => new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null, ch),
      maxRecordsPerBatch)
    finally ch.close()
  }

  private def writeBatches(df: DataFrame,
      mkWriter: VectorSchemaRoot => org.apache.arrow.vector.ipc.ArrowWriter,
      maxRecordsPerBatch: Int): Long = {
    require(maxRecordsPerBatch > 0, "maxRecordsPerBatch must be positive")
    val schema = df.schema
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val allocator = new RootAllocator(Long.MaxValue)
    val root = VectorSchemaRoot.create(arrowSchema(schema, tz), allocator)
    val writer = mkWriter(root)
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
      col: Int): Unit =
    writeValue(vec, dt, idx, if (row.isNullAt(col)) null else row.get(col))

  /** One recursive writer for every supported (vector, type, value)
    * combination — top-level columns, list elements at any nesting depth,
    * and struct children all route through here. Values arrive in Spark's
    * external Row representation (BigDecimal, sql/time dates and
    * timestamps, Seq, Row). */
  private def writeValue(vec: FieldVector, dt: DataType, idx: Int, value: Any): Unit = {
    if (value == null) { setNull(vec, idx); return }
    (vec, dt) match {
      case (v: BitVector, BooleanType) =>
        v.setSafe(idx, if (value.asInstanceOf[Boolean]) 1 else 0)
      case (v: TinyIntVector, ByteType) => v.setSafe(idx, value.asInstanceOf[Byte])
      case (v: SmallIntVector, ShortType) => v.setSafe(idx, value.asInstanceOf[Short])
      case (v: IntVector, IntegerType) => v.setSafe(idx, value.asInstanceOf[Int])
      case (v: BigIntVector, LongType) => v.setSafe(idx, value.asInstanceOf[Long])
      case (v: Float4Vector, FloatType) => v.setSafe(idx, value.asInstanceOf[Float])
      case (v: Float8Vector, DoubleType) => v.setSafe(idx, value.asInstanceOf[Double])
      case (v: VarCharVector, StringType) =>
        v.setSafe(idx, value.asInstanceOf[String]
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case (v: VarBinaryVector, BinaryType) =>
        v.setSafe(idx, value.asInstanceOf[Array[Byte]])
      case (v: DecimalVector, _: DecimalType) =>
        val bd = value match {
          case b: java.math.BigDecimal => b
          case b: scala.math.BigDecimal => b.bigDecimal
        }
        v.setSafe(idx, bd)
      case (v: DateDayVector, DateType) =>
        val epochDay = value match {
          case d: java.sql.Date => d.toLocalDate.toEpochDay
          case d: java.time.LocalDate => d.toEpochDay
        }
        v.setSafe(idx, epochDay.toInt)
      case (v: TimeStampVector, TimestampType) =>
        val micros = value match {
          case ts: java.sql.Timestamp =>
            math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
          case i: java.time.Instant =>
            i.getEpochSecond * 1000000L + i.getNano / 1000L
        }
        v.setSafe(idx, micros)
      case (v: TimeStampVector, TimestampNTZType) =>
        val ldt = value.asInstanceOf[java.time.LocalDateTime]
        v.setSafe(idx, ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L)
      case (v: DurationVector, _: DayTimeIntervalType) =>
        val d = value.asInstanceOf[java.time.Duration]
        v.setSafe(idx, d.getSeconds * 1000000L + d.getNano / 1000L)
      case (v: IntervalYearVector, _: YearMonthIntervalType) =>
        v.setSafe(idx, value.asInstanceOf[java.time.Period].toTotalMonths.toInt)
      case (v: MapVector, MapType(kt, vt, _)) => // before ListVector: a MapVector IS one
        val m = value.asInstanceOf[scala.collection.Map[Any, Any]]
        val start = v.startNewValue(idx)
        val entries = v.getDataVector.asInstanceOf[StructVector]
        var j = 0
        m.foreach { case (k, mv) =>
          entries.setIndexDefined(start + j)
          writeValue(entries.getChildByOrdinal(0).asInstanceOf[FieldVector], kt, start + j, k)
          writeValue(entries.getChildByOrdinal(1).asInstanceOf[FieldVector], vt, start + j, mv)
          j += 1
        }
        v.endValue(idx, m.size)
      case (v: ListVector, ArrayType(elem, _)) =>
        val seq = value.asInstanceOf[scala.collection.Seq[Any]]
        val start = v.startNewValue(idx)
        val child = v.getDataVector
        var j = 0
        while (j < seq.length) {
          writeValue(child, elem, start + j, seq(j)); j += 1
        }
        v.endValue(idx, seq.length)
      case (v: StructVector, st: StructType) =>
        val r = value.asInstanceOf[Row]
        v.setIndexDefined(idx)
        var j = 0
        while (j < st.length) {
          writeValue(v.getChildByOrdinal(j).asInstanceOf[FieldVector], st.fields(j).dataType, idx,
            if (r.isNullAt(j)) null else r.get(j))
          j += 1
        }
      case (v, t) => throw new UnsupportedOperationException(
        s"ArrowExport: no writer for $t into ${v.getClass.getSimpleName}")
    }
  }

  private def setNull(vec: FieldVector, idx: Int): Unit = vec match {
    case v: ListVector => v.setNull(idx)
    case v: StructVector =>
      // a null struct must also null its children so variable-width child
      // offsets stay monotonic for downstream validators
      v.setNull(idx)
      var j = 0
      while (j < v.size()) { setNull(v.getChildByOrdinal(j).asInstanceOf[FieldVector], idx); j += 1 }
    case v: BaseFixedWidthVector => v.setNull(idx)
    case v: BaseVariableWidthVector => v.setNull(idx)
    case v => throw new UnsupportedOperationException(
      s"ArrowExport: cannot null ${v.getClass.getSimpleName}")
  }
}
