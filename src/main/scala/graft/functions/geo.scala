package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.exts.{GeoCoord, GeoMake, GeoMeasure, GeoNPointsExpr, GeoPointN,
  GeoPointWkb, GeoRelate, GeoText, GeoTransform}

/** Geospatial subset over WKB binary columns (SURVEY.md §2.4; reference
  * ops in ibis/expr/operations/geospatial.py). Euclidean planar semantics
  * — the reference's default geometry behavior.
  *
  * POINT encode/decode/measure plus native LINESTRING/POLYGON
  * construction, measures (area/length/perimeter/centroid/envelope/
  * bounds), relates (contains/within/intersects/disjoint/distance/
  * dwithin) and accessors (n_points/point_n/start/end/WKT) — all pure
  * planar math over OGC WKB in [[graft.exts.GeoGeom]], no GEOS library.
  * Still out of scope (documented divergence in COVERAGE.md): Buffer,
  * ConvexHull, Simplify, SRID reprojection, geometric set-op outputs,
  * Multi* collections.
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

  /** GeoLineString (geospatial.py:337): array<WKB point> → LINESTRING. */
  def makeLine(points: Column): Column = co(GeoMake(ex(points), "make_line"))

  /** GeoPolygon (geospatial.py:480): array<WKB point> → single-ring
    * POLYGON, auto-closed. */
  def makePolygon(points: Column): Column = co(GeoMake(ex(points), "make_polygon"))

  /** GeoDistance (geospatial.py:202): Euclidean min distance between any
    * two of point/linestring/polygon (0 on touch/overlap/containment). */
  def distance(a: Column, b: Column): Column = co(GeoRelate(ex(a), ex(b), "distance"))

  /** GeoDWithin (geospatial.py:211): within distance d (inclusive, like
    * ST_DWithin). */
  def dwithin(a: Column, b: Column, d: Column): Column = distance(a, b) <= d

  /** GeoContains / GeoWithin / GeoIntersects / GeoDisjoint
    * (geospatial.py:76,472,296,194). */
  def contains(a: Column, b: Column): Column = co(GeoRelate(ex(a), ex(b), "contains"))
  def within(a: Column, b: Column): Column = co(GeoRelate(ex(a), ex(b), "within"))
  def intersects(a: Column, b: Column): Column = co(GeoRelate(ex(a), ex(b), "intersects"))
  def disjoint(a: Column, b: Column): Column = co(GeoRelate(ex(a), ex(b), "disjoint"))

  /** GeoContains (geospatial.py:76) for the rectangle-contains-point case:
    * envelope given as (xmin, ymin, xmax, ymax), boundary inclusive. */
  def containsBox(xmin: Column, ymin: Column, xmax: Column, ymax: Column,
      pt: Column): Column =
    x(pt).between(xmin, xmax) && y(pt).between(ymin, ymax)

  /** GeoArea :28 / GeoLength :318 / GeoPerimeter :381 — ST semantics:
    * area/perimeter are 0 for non-polygons, length is 0 for non-lines. */
  def area(g: Column): Column = co(GeoMeasure(ex(g), "area"))
  def length(g: Column): Column = co(GeoMeasure(ex(g), "length"))
  def perimeter(g: Column): Column = co(GeoMeasure(ex(g), "perimeter"))

  /** GeoXMin/XMax/YMin/YMax (geospatial.py:437-465). */
  def xMin(g: Column): Column = co(GeoMeasure(ex(g), "xmin"))
  def yMin(g: Column): Column = co(GeoMeasure(ex(g), "ymin"))
  def xMax(g: Column): Column = co(GeoMeasure(ex(g), "xmax"))
  def yMax(g: Column): Column = co(GeoMeasure(ex(g), "ymax"))

  /** GeoCentroid :102 / GeoEnvelope :242 / GeoFlipCoordinates :272. */
  def centroid(g: Column): Column = co(GeoTransform(ex(g), "centroid"))
  def envelope(g: Column): Column = co(GeoTransform(ex(g), "envelope"))
  def flipCoordinates(g: Column): Column = co(GeoTransform(ex(g), "flip"))

  /** GeoStartPoint :405 / GeoEndPoint :226 / GeoPointN :389 — n is
    * 0-indexed (ibis convention; negative counts from the end). */
  def startPoint(line: Column): Column = co(GeoTransform(ex(line), "start_point"))
  def endPoint(line: Column): Column = co(GeoTransform(ex(line), "end_point"))
  def pointN(line: Column, n: Int): Column = co(GeoPointN(ex(line), n))

  /** GeoNPoints (geospatial.py:373): total vertex count. */
  def nPoints(wkb: Column): Column = co(GeoNPointsExpr(ex(wkb)))

  /** GeoGeometryType (geospatial.py:287): 'POINT'/'LINESTRING'/'POLYGON'. */
  def geometryType(g: Column): Column = co(GeoText(ex(g), "geometry_type"))

  /** GeoAsText (geospatial.py:44): WKT for point/linestring/polygon —
    * integral coordinates print without a trailing '.0' (PostGIS style). */
  def asText(wkb: Column): Column = co(GeoText(ex(wkb), "as_text"))
}
