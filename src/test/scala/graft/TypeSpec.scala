package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.types.DType._
import graft.types.{DType, TypeMapper}

class TypeSpec extends AnyFunSuite {

  test("parse the reference's dtype strings") {
    assert(DType.parse("int64") == DInt64())
    assert(DType.parse("!float64") == DFloat64(nullable = false))
    assert(DType.parse("array<!float64>") == DArray(DFloat64(nullable = false)))
    assert(DType.parse("map<string, int32>") == DMap(DString(), DInt32()))
    assert(DType.parse("struct<a: int64, b: array<string>>") ==
      DStruct(Seq("a" -> DInt64(), "b" -> DArray(DString()))))
    assert(DType.parse("decimal(12, 3)") == DDecimal(12, 3))
    assert(DType.parse("timestamp('UTC', 9)") == DTimestamp(Some("UTC"), 9))
    assert(DType.parse("uint64") == DUInt64())
  }

  test("spark mapping follows the widening policy") {
    assert(TypeMapper.toSpark(DUInt8()) == ShortType)
    assert(TypeMapper.toSpark(DUInt64()) == DecimalType(20, 0))
    assert(TypeMapper.toSpark(DFloat16()) == FloatType)
    assert(TypeMapper.toSpark(DTime()) == LongType)
    assert(TypeMapper.toSpark(DTimestamp(Some("UTC"))) == TimestampType)
    assert(TypeMapper.toSpark(DTimestamp(None)) == TimestampNTZType)
    assert(TypeMapper.toSpark(DJson()) == StringType)
  }

  test("roundtrip through Spark preserves signed/nested types") {
    val nested = DStruct(Seq(
      "xs" -> DArray(DFloat64()),
      "m" -> DMap(DString(), DInt64()),
      "t" -> DTimestamp(None)))
    assert(TypeMapper.fromSpark(TypeMapper.toSpark(nested)) == nested)
  }

  test("implicit-cast lattice: ints widen, bool→int, int→decimal, no narrowing") {
    assert(DType.castable(DInt8(), DInt64()))
    assert(!DType.castable(DInt64(), DInt8()))
    assert(DType.castable(DInt32(), DFloat64()))
    assert(DType.castable(DBoolean(), DInt32()))
    assert(DType.castable(DInt64(), DDecimal(38, 9)))
    assert(DType.castable(DNull(), DString()))
    assert(!DType.castable(DString(), DInt64()))
  }
}
