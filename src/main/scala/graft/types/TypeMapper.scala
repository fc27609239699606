package graft.types

import org.apache.spark.sql.types._

import DType._

/** Bidirectional DType ⇄ Spark Catalyst type mapping, following the
  * reference's own PySpark mapping (/root/reference/ibis/backends/pyspark/
  * datatypes.py:1-123) and the widening policy of SURVEY.md §1.2:
  *
  *   - unsigned ints widen to the next signed type; uint64 → Decimal(20,0)
  *     (the reference backend RAISES there — we widen and document);
  *   - Float16 promotes to FloatType;
  *   - Time emulates as LongType nanos-since-midnight;
  *   - timestamp scale > 6 is lossy (Spark is µs) — capped;
  *   - JSON carries as StringType (+ JSON functions);
  *   - UUID/INET/MACADDR carry as StringType.
  */
object TypeMapper {

  def toSpark(d: DType): DataType = d match {
    case _: DNull => NullType
    case _: DBoolean => BooleanType
    case _: DInt8 => ByteType
    case _: DInt16 => ShortType
    case _: DInt32 => IntegerType
    case _: DInt64 => LongType
    case _: DUInt8 => ShortType
    case _: DUInt16 => IntegerType
    case _: DUInt32 => LongType
    case _: DUInt64 => DecimalType(20, 0)
    case _: DFloat16 => FloatType
    case _: DFloat32 => FloatType
    case _: DFloat64 => DoubleType
    case DDecimal(p, s, _) => DecimalType(p, s)
    case _: DString => StringType
    case _: DBinary => BinaryType
    case _: DDate => DateType
    case _: DTime => LongType // nanos-since-midnight emulation
    case DTimestamp(tz, _, _) => if (tz.isDefined) TimestampType else TimestampNTZType
    case DInterval(unit, _) =>
      if (Set("Y", "M", "year", "month").contains(unit)) YearMonthIntervalType()
      else DayTimeIntervalType()
    case DArray(e, _) => ArrayType(toSpark(e), containsNull = e.nullable)
    case DMap(k, v, _) => MapType(toSpark(k), toSpark(v), valueContainsNull = v.nullable)
    case DStruct(fs, _) => StructType(fs.map { case (n, t) =>
      StructField(n, toSpark(t), nullable = t.nullable) })
    case _: DJson => StringType
    case _: DUuid => StringType
  }

  def fromSpark(dt: DataType, nullable: Boolean = true): DType = dt match {
    case NullType => DNull(nullable)
    case BooleanType => DBoolean(nullable)
    case ByteType => DInt8(nullable)
    case ShortType => DInt16(nullable)
    case IntegerType => DInt32(nullable)
    case LongType => DInt64(nullable)
    case FloatType => DFloat32(nullable)
    case DoubleType => DFloat64(nullable)
    case d: DecimalType => DDecimal(d.precision, d.scale, nullable)
    case StringType => DString(nullable)
    case BinaryType => DBinary(nullable)
    case DateType => DDate(nullable)
    case TimestampType => DTimestamp(Some("UTC"), 6, nullable)
    case TimestampNTZType => DTimestamp(None, 6, nullable)
    case _: YearMonthIntervalType => DInterval("M", nullable)
    case _: DayTimeIntervalType => DInterval("us", nullable)
    case ArrayType(e, cn) => DArray(fromSpark(e, cn), nullable)
    case MapType(k, v, vn) => DMap(fromSpark(k), fromSpark(v, vn), nullable)
    case StructType(fs) => DStruct(fs.toSeq.map(f => f.name -> fromSpark(f.dataType, f.nullable)), nullable)
    case other => throw new IllegalArgumentException(s"unmapped Spark type: $other")
  }

  /** Render a µs-of-day TIME emulation value (the [[toSpark]] mapping for
    * `DTime`, and what `ibisfn.stringToTime` produces) as the string a
    * native TIME type would display: `HH:MM:SS[.ffffff]` with trailing
    * fraction zeros trimmed — byte-identical to DuckDB's TIME→VARCHAR
    * cast, so oracles can state it directly. Values outside [0, 24h) wrap
    * modulo one day (the emulation is a time-of-day, not a duration).
    * All stock codegen expressions; SQL-registered as `time_format`. */
  def timeFormat(usOfDay: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      timeFormatExpr(org.apache.spark.sql.GraftSqlBridge.expression(usOfDay)))

  /** The catalyst tree behind [[timeFormat]] — built from stock codegen
    * expressions directly (not the column DSL) so the SQL-registered
    * `time_format` gets a resolved, evaluable tree. Pure integer
    * arithmetic: no timestamp round trip, so the rendering can never
    * depend on the session time zone. */
  def timeFormatExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    val w = Pmod(Cast(child, LongType), Literal(86400000000L))
    def div(d: Long): Expression = IntegralDivide(w, Literal(d))
    val s = FormatString(Literal("%02d:%02d:%02d.%06d"),
      div(3600000000L), Remainder(div(60000000L), Literal(60L)),
      Remainder(div(1000000L), Literal(60L)), Remainder(w, Literal(1000000L)))
    RegExpReplace(RegExpReplace(s, Literal("0+$"), Literal("")),
      Literal("\\.$"), Literal(""))
  }

  /** Schema = ordered name→DType (ibis/expr/schema.py:27-33). */
  def schemaToSpark(fields: Seq[(String, DType)]): StructType =
    StructType(fields.map { case (n, t) => StructField(n, toSpark(t), t.nullable) })

  def schemaFromSpark(st: StructType): Seq[(String, DType)] =
    st.fields.toSeq.map(f => f.name -> fromSpark(f.dataType, f.nullable))
}
