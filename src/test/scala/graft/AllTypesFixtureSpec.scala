package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.{Selectors, Table}
import graft.functions.ibisfn

/** The reference's primary behavioral fixture, `functional_alltypes`
  * (FIXTURES.md; ibis/backends/conftest.py:30-46): one column per primitive
  * type, swept through casts, selectors, per-type aggregates and the
  * 0-index semantics in one place. */
class AllTypesFixtureSpec extends SparkSpec {

  private lazy val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("bool_col", BooleanType),
    StructField("tinyint_col", ByteType), StructField("smallint_col", ShortType),
    StructField("int_col", IntegerType), StructField("bigint_col", LongType),
    StructField("float_col", FloatType), StructField("double_col", DoubleType),
    StructField("date_string_col", StringType), StructField("string_col", StringType),
    StructField("timestamp_col", TimestampType),
    StructField("year", IntegerType), StructField("month", IntegerType)))

  private lazy val rows = (0 until 10).map { i =>
    Row(i, i % 2 == 0, i.toByte, i.toShort, i, i.toLong * 10,
      i.toFloat / 2, i.toDouble * 1.5, f"2024/0${i % 9 + 1}%d/15", s"s$i",
      Timestamp.valueOf(f"2024-01-${i + 1}%02d 10:30:00"), 2024, i % 12 + 1)
  }

  private lazy val t = Table(spark.createDataFrame(
    spark.sparkContext.parallelize(rows), schema))

  test("selectors partition the columns by type family") {
    assert(Selectors.numeric(t.schema).toSet ==
      Set("id", "tinyint_col", "smallint_col", "int_col", "bigint_col",
        "float_col", "double_col", "year", "month"))
    assert(Selectors.string(t.schema).toSet == Set("date_string_col", "string_col"))
    assert(Selectors.temporal(t.schema) == Seq("timestamp_col"))
    assert(Selectors.endsWith("_col")(t.schema).size == 10)
    assert(Selectors.contains("int")(t.schema).toSet ==
      Set("tinyint_col", "smallint_col", "int_col", "bigint_col"))
  }

  test("per-type aggregate sweep via across") {
    val aggs = Selectors.across(t.df, Selectors.numeric, c => sum(c))
    val r = t.aggregate(aggs: _*).df.head()
    assert(r.getAs[Long]("int_col") == 45L)
    assert(r.getAs[Long]("bigint_col") == 450L)
    assert(math.abs(r.getAs[Double]("double_col") - 67.5) < 1e-9)
  }

  test("casts across the lattice: narrow int -> long -> double -> string") {
    val out = t.castColumns(Map(
      "tinyint_col" -> "bigint", "int_col" -> "double", "bool_col" -> "int")).df
    assert(out.schema("tinyint_col").dataType == LongType)
    assert(out.schema("int_col").dataType == DoubleType)
    assert(out.agg(sum("bool_col")).head().getLong(0) == 5L)
  }

  test("date parsing + extracts on the string/timestamp pair") {
    val out = t.mutate(
      "d" -> to_date(col("date_string_col"), "yyyy/M/dd"),
      "dow0" -> ibisfn.dayOfWeekIndex(col("timestamp_col")),
      "epoch" -> ibisfn.epochSeconds(col("timestamp_col"))).df
    assert(out.filter(col("d").isNull).count() == 0)
    val dows = out.select("dow0").collect().map(_.getInt(0))
    assert(dows.forall(d => d >= 0 && d <= 6)) // Monday=0 index range
    assert(out.filter(col("id") === 0).select("epoch").head().getLong(0) ==
      Timestamp.valueOf("2024-01-01 10:30:00").getTime / 1000)
  }

  test("grouped window over the fixture (batting-style grouped rank)") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bool_col")).orderBy(col("double_col").desc)
    val out = t.mutate("rk0" -> ibisfn.rank0(w)).df
    assert(out.filter(col("rk0") === 0).count() == 2) // one top row per bool group
  }
}
