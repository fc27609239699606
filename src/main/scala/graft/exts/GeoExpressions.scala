package graft.exts

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Native WKB POINT subset (SURVEY.md §2.4 geospatial; round-2 verdict #6).
  *
  * The reference's geospatial family (ibis/expr/operations/geospatial.py:
  * 28-497, 57 ops) is implemented only by its duckdb/postgres backends via
  * GEOS-backed extensions. Neither Sedona nor DuckDB-spatial exists in this
  * environment, so graft ships the POINT core natively — the encode /
  * decode / measure ops that cover most large-scale point-data work
  * (geocoded events, store locations, lat/lon telemetry):
  *
  *   - GeoPoint(x, y)            → 21-byte little-endian WKB (geospatial.py:397)
  *   - GeoX / GeoY (wkb)         → coordinate extraction (geospatial.py:423,430)
  *   - distance/dwithin/contains → composed from X/Y in graft.functions.geo
  *
  * planar/Euclidean semantics, matching PostGIS geometry (not geography)
  * and the reference's default. Remaining geo ops are documented as a
  * divergence in COVERAGE.md.
  *
  * WKB layout (OGC 99-049): byte 0 = byte order (1 = LE), bytes 1-4 =
  * geometry type (1 = Point, uint32), then x, y as IEEE754 doubles.
  * GeoX/GeoY accept both byte orders and reject (→ null) non-point input,
  * EWKB SRID-flagged points included — a 25-byte EWKB point (type has the
  * 0x20000000 SRID bit) is accepted and its SRID skipped, matching how the
  * reference reads PostGIS output.
  */
object GeoWkb {
  final val PointType = 1

  def readPoint(bytes: Array[Byte]): Array[Double] = {
    if (bytes == null || bytes.length < 21) return null
    val le = bytes(0) == 1.toByte
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.order(if (le) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
    bb.position(1)
    var gtype = bb.getInt()
    var off = 5
    if ((gtype & 0x20000000) != 0) { // EWKB SRID flag: skip the 4-byte SRID
      gtype &= ~0x20000000
      if (bytes.length < 25) return null
      bb.getInt(); off += 4
    }
    gtype &= 0xFFFF // strip Z/M flags space (unsupported dims rejected below)
    if (gtype != PointType || bytes.length < off + 16) return null
    Array(bb.getDouble(), bb.getDouble())
  }

  def writePoint(x: Double, y: Double): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(PointType).putDouble(x).putDouble(y)
    bb.array()
  }
}

/** `geo_point(x, y)` → WKB POINT binary; null in → null out. */
case class GeoPointWkb(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "geo_point"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, double), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def nullSafeEval(x: Any, y: Any): Any =
    GeoWkb.writePoint(x.asInstanceOf[Double], y.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.exts.GeoWkb.writePoint($x, $y)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `geo_coord(wkb, 0|1)` → x or y of a WKB/EWKB point; null for non-point
  * or malformed input (the ibis-style "undefined" answer). */
case class GeoCoord(child: Expression, idx: Int) extends UnaryExpression {
  override def prettyName: String = if (idx == 0) "geo_x" else "geo_y"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary WKB input, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any = {
    val pt = GeoWkb.readPoint(v.asInstanceOf[Array[Byte]])
    if (pt == null) null else pt(idx)
  }

  // not defineCodeGen: the helper can return null for malformed input, so
  // the generated code re-checks and forwards nullability
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val pt = ctx.freshName("pt")
      s"""
        double[] $pt = graft.exts.GeoWkb.readPoint($b);
        if ($pt == null) { ${ev.isNull} = true; } else { ${ev.value} = $pt[$idx]; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
