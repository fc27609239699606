package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.exts.{GeoCoord, GeoPointWkb}

/** Geospatial POINT subset over WKB binary columns (SURVEY.md §2.4;
  * reference ops in ibis/expr/operations/geospatial.py). Euclidean planar
  * semantics — the reference's default geometry behavior. The non-point
  * families (lines, polygons, set ops, 49 remaining ops) are a documented
  * divergence (COVERAGE.md): no GEOS-backed library exists in this
  * environment, and point encode/decode/measure covers the dominant
  * large-scale uses (geocoded events, locations, lat/lon telemetry).
  */
object geo {
  private def ex(c: Column) = org.apache.spark.sql.GraftSqlBridge.expression(c)
  private def co(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.GraftSqlBridge.column(e)

  /** GeoPoint (geospatial.py:397): (x, y) → WKB POINT binary. */
  def point(x: Column, y: Column): Column =
    co(GeoPointWkb(ex(x.cast("double")), ex(y.cast("double"))))

  /** GeoX / GeoY (geospatial.py:423,430): null for non-point WKB. */
  def x(wkb: Column): Column = co(GeoCoord(ex(wkb), 0))
  def y(wkb: Column): Column = co(GeoCoord(ex(wkb), 1))

  /** GeoDistance (geospatial.py:202): Euclidean distance between points. */
  def distance(a: Column, b: Column): Column = {
    val dx = x(a) - x(b); val dy = y(a) - y(b)
    sqrt(dx * dx + dy * dy)
  }

  /** GeoDWithin (geospatial.py:211): within distance d (inclusive, like
    * ST_DWithin). */
  def dwithin(a: Column, b: Column, d: Column): Column = distance(a, b) <= d

  /** GeoContains (geospatial.py:76) for the rectangle-contains-point case:
    * envelope given as (xmin, ymin, xmax, ymax), boundary inclusive. */
  def containsBox(xmin: Column, ymin: Column, xmax: Column, ymax: Column,
      pt: Column): Column =
    x(pt).between(xmin, xmax) && y(pt).between(ymin, ymax)

  /** GeoAsText (geospatial.py:44): 'POINT (x y)' — PostGIS-style shortest
    * repr for the doubles. */
  def asText(wkb: Column): Column =
    concat(lit("POINT ("),
      regexp_replace(x(wkb).cast("string"), "\\.0$", ""), lit(" "),
      regexp_replace(y(wkb).cast("string"), "\\.0$", ""), lit(")"))

  /** GeoNPoints (geospatial.py:373): 1 for a valid point, null otherwise. */
  def nPoints(wkb: Column): Column = when(x(wkb).isNotNull, lit(1))
}
