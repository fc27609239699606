package graft.types

/** The engine's logical type lattice, mirroring the reference's datatype
  * system (/root/reference/ibis/expr/datatypes/core.py) — nullable-by-
  * default (core.py:62), with the types Spark lacks natively (unsigned
  * ints, Float16, Time, sub-microsecond timestamps) represented explicitly
  * so the mapping layer can widen/emulate them deliberately rather than
  * silently (policy table: SURVEY.md §1.2).
  */
sealed trait DType {
  def nullable: Boolean
  def withNullable(n: Boolean): DType
}

object DType {
  final case class DNull(nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(n) }
  final case class DBoolean(nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(n) }
  final case class DInt8(nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(n) }
  final case class DInt16(nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(n) }
  final case class DInt32(nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(n) }
  final case class DInt64(nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(n) }
  // Unsigned: no Spark native (SURVEY §1.2) — widened on mapping.
  final case class DUInt8(nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(n) }
  final case class DUInt16(nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(n) }
  final case class DUInt32(nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(n) }
  final case class DUInt64(nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(n) }
  final case class DFloat16(nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(n) }
  final case class DFloat32(nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(n) }
  final case class DFloat64(nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(n) }
  final case class DDecimal(precision: Int = 38, scale: Int = 18, nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(nullable = n) }
  final case class DString(nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(n) }
  final case class DBinary(nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(n) }
  final case class DDate(nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(n) }
  /** Time-of-day: emulated as nanos-since-midnight int64 on Spark. */
  final case class DTime(nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(n) }
  /** scale 0-9 like the reference (core.py:588-634); Spark caps at µs (6). */
  final case class DTimestamp(timezone: Option[String] = None, scale: Int = 6, nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(nullable = n) }
  final case class DInterval(unit: String, nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(nullable = n) }
  final case class DArray(elem: DType, nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(nullable = n) }
  final case class DMap(key: DType, value: DType, nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(nullable = n) }
  final case class DStruct(fields: Seq[(String, DType)], nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(nullable = n) }
  final case class DJson(nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(n) }
  final case class DUuid(nullable: Boolean = true) extends DType { def withNullable(n: Boolean) = copy(n) }

  /** Implicit-cast lattice (ibis/expr/datatypes/cast.py): can `from` be
    * implicitly widened to `to` without loss? */
  def castable(from: DType, to: DType): Boolean = (from, to) match {
    case (a, b) if a.withNullable(true) == b.withNullable(true) => true
    case (_: DNull, _) => true
    case (a, b) => (intRank(a), intRank(b)) match {
      case (Some(ra), Some(rb)) => ra <= rb
      case _ => (a, b) match {
        case (x, _: DFloat64) if intRank(x).isDefined || x.isInstanceOf[DFloat16] || x.isInstanceOf[DFloat32] => true
        case (x, _: DFloat32) if intRank(x).exists(_ <= 2) || x.isInstanceOf[DFloat16] => true
        case (x, _: DDecimal) if intRank(x).isDefined => true
        case (_: DBoolean, x) if intRank(x).isDefined => true
        case _ => false
      }
    }
  }

  private def intRank(d: DType): Option[Int] = d match {
    case _: DInt8 => Some(1); case _: DUInt8 => Some(1)
    case _: DInt16 => Some(2); case _: DUInt16 => Some(2)
    case _: DInt32 => Some(3); case _: DUInt32 => Some(3)
    case _: DInt64 => Some(4); case _: DUInt64 => Some(4)
    case _ => None
  }

  /** Parse the reference's type-string syntax ("array<!float64>",
    * datatypes/parse.py): `!` prefix = non-nullable. */
  def parse(s: String): DType = {
    val t = s.trim
    if (t.startsWith("!")) parse(t.drop(1)).withNullable(false)
    else if (t.startsWith("array<") && t.endsWith(">")) DArray(parse(t.stripPrefix("array<").stripSuffix(">")))
    else if (t.startsWith("map<") && t.endsWith(">")) {
      val inner = t.stripPrefix("map<").stripSuffix(">")
      val (k, v) = splitTop(inner)
      DMap(parse(k), parse(v))
    } else if (t.startsWith("struct<") && t.endsWith(">")) {
      val inner = t.stripPrefix("struct<").stripSuffix(">")
      DStruct(splitTopAll(inner).map { f =>
        val i = f.indexOf(':'); (f.take(i).trim, parse(f.drop(i + 1)))
      })
    } else if (t.startsWith("decimal(") && t.endsWith(")")) {
      val Array(p, sc) = t.stripPrefix("decimal(").stripSuffix(")").split(",").map(_.trim.toInt)
      DDecimal(p, sc)
    } else if (t.startsWith("timestamp")) {
      // timestamp, timestamp(scale), timestamp('tz'), timestamp('tz', scale)
      val args = if (t == "timestamp") Seq.empty
        else t.stripPrefix("timestamp(").stripSuffix(")").split(",").map(_.trim).toSeq
      val tz = args.find(_.startsWith("'")).map(_.stripPrefix("'").stripSuffix("'"))
      val scale = args.find(a => a.nonEmpty && a.forall(_.isDigit)).map(_.toInt).getOrElse(6)
      DTimestamp(tz, scale)
    } else t match {
      case "null" => DNull()
      case "boolean" | "bool" => DBoolean()
      case "int8" => DInt8(); case "int16" => DInt16(); case "int32" => DInt32(); case "int64" => DInt64()
      case "uint8" => DUInt8(); case "uint16" => DUInt16(); case "uint32" => DUInt32(); case "uint64" => DUInt64()
      case "float16" | "halffloat" => DFloat16()
      case "float32" | "float" => DFloat32()
      case "float64" | "double" => DFloat64()
      case "decimal" => DDecimal()
      case "string" | "varchar" | "text" => DString()
      case "binary" | "bytes" => DBinary()
      case "date" => DDate()
      case "time" => DTime()
      case "json" => DJson()
      case "uuid" => DUuid()
      case other if other.startsWith("interval") =>
        DInterval(other.stripPrefix("interval(").stripSuffix(")").stripPrefix("'").stripSuffix("'"))
      case other => throw new IllegalArgumentException(s"cannot parse dtype: $other")
    }
  }

  private def splitTop(s: String): (String, String) = {
    val parts = splitTopAll(s)
    (parts.head, parts(1))
  }

  private def splitTopAll(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; val cur = new StringBuilder
    s.foreach {
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c =>
        if (c == '<' || c == '(') depth += 1
        if (c == '>' || c == ')') depth -= 1
        cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim)
  }
}
