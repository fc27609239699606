package graft

import org.apache.spark.sql.functions._

import graft.functions.geo

class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("WKB point roundtrip: point → x/y, both byte orders, EWKB srid") {
    val df = Seq((1.5, -2.25), (0.0, 0.0), (1e12, -1e-9)).toDF("px", "py")
    val out = df.select(
      geo.x(geo.point(col("px"), col("py"))).as("rx"),
      geo.y(geo.point(col("px"), col("py"))).as("ry"),
      col("px"), col("py")).collect()
    out.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(2) && r.getDouble(1) == r.getDouble(3))
    }
    // layout is real OGC WKB: 21 bytes, LE flag, type 1
    val bytes = df.limit(1).select(geo.point(lit(3.0), lit(4.0))).collect()
      .head.getAs[Array[Byte]](0)
    assert(bytes.length == 21 && bytes(0) == 1 && bytes(1) == 1)
    // big-endian WKB is decoded too
    val be = java.nio.ByteBuffer.allocate(21)
    be.put(0.toByte).putInt(1).putDouble(7.5).putDouble(8.5)
    val beDf = Seq(be.array()).toDF("w")
    assert(beDf.select(geo.x(col("w"))).collect().head.getDouble(0) == 7.5)
    // EWKB with SRID flag: 25 bytes, type | 0x20000000, srid then coords
    val ew = java.nio.ByteBuffer.allocate(25).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ew.put(1.toByte).putInt(1 | 0x20000000).putInt(4326).putDouble(-1.25).putDouble(2.5)
    val ewDf = Seq(ew.array()).toDF("w")
    val ewRow = ewDf.select(geo.x(col("w")), geo.y(col("w"))).collect().head
    assert(ewRow.getDouble(0) == -1.25 && ewRow.getDouble(1) == 2.5)
  }

  test("malformed / non-point WKB decodes to null, nulls propagate") {
    val bad = Seq(
      Array[Byte](1, 2, 0, 0, 0),                    // linestring type, truncated
      Array.fill[Byte](21)(9),                       // garbage byte-order flag... type mismatch
      Array[Byte]()).toDF("w")                       // empty
    assert(bad.select(geo.x(col("w"))).collect().forall(_.isNullAt(0)))
    val nulls = Seq((Some(1.0), None: Option[Double])).toDF("a", "b")
    assert(nulls.select(geo.point(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("distance / dwithin / containsBox / asText semantics") {
    val df = Seq((3.0, 4.0)).toDF("px", "py")
    val p = geo.point(col("px"), col("py"))
    val o = geo.point(lit(0.0), lit(0.0))
    val r = df.select(
      geo.distance(p, o).as("d"),
      geo.dwithin(p, o, lit(5.0)).as("w5"),       // boundary inclusive
      geo.dwithin(p, o, lit(4.99)).as("w499"),
      geo.containsBox(lit(0.0), lit(0.0), lit(3.0), lit(4.0), p).as("inb"),
      geo.containsBox(lit(0.0), lit(0.0), lit(2.9), lit(4.0), p).as("outb"),
      geo.asText(p).as("txt"),
      geo.nPoints(p).as("np")).collect().head
    assert(r.getDouble(0) == 5.0)
    assert(r.getBoolean(1) && !r.getBoolean(2))
    assert(r.getBoolean(3) && !r.getBoolean(4))
    assert(r.getString(5) == "POINT (3 4)")
    assert(r.getInt(6) == 1)
  }

  test("geo functions are SQL-registered (same builders the extension injects)") {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
    import org.apache.spark.sql.types.DoubleType
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "geo_point",
      (ch: Seq[Expression]) =>
        graft.exts.GeoPointWkb(Cast(ch(0), DoubleType), Cast(ch(1), DoubleType)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "geo_x", (ch: Seq[Expression]) => graft.exts.GeoCoord(ch.head, 0), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "geo_y", (ch: Seq[Expression]) => graft.exts.GeoCoord(ch.head, 1), "built-in")
    Seq((10.0, 20.0)).toDF("a", "b").createOrReplaceTempView("geo_t")
    val r = spark.sql(
      "SELECT geo_x(geo_point(a, b)) AS gx, geo_y(geo_point(a, b)) AS gy FROM geo_t")
      .collect().head
    assert(r.getDouble(0) == 10.0 && r.getDouble(1) == 20.0)
  }
}
