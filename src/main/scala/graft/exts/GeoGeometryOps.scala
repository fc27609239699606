package graft.exts

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The second half of the native WKB geospatial family (SURVEY.md §2.4) —
  * everything the round-2 verdict's "remaining 29" list contains that is
  * expressible as exact planar / closed-form math, with no GEOS library:
  *
  * Reference ops (ibis/expr/operations/geospatial.py): GeoAzimuth :405,
  * GeoMaxDistance :223, GeoDFullyWithin :380, GeoLineLocatePoint :116,
  * GeoLineSubstring :144, GeoSimplify :440 (Douglas-Peucker),
  * GeoIsValid :109, GeoOrderingEquals :161, GeoEquals :77,
  * GeoCovers :49, GeoCoveredBy :56, GeoContainsProperly :42,
  * GeoTouches :179, GeoCrosses :63, GeoOverlaps :172, GeoBuffer :362
  * (points, n-gon approximation), GeoSRID :346, GeoSetSRID :353,
  * GeoAsBinary :469, GeoAsEWKB :476, GeoAsEWKT :483, GeoNRings :336,
  * GeoGeometryN :84, GeoTransform :450 / GeoConvert :459.
  *
  * Scope has grown every round well past this file's original remit —
  * to avoid this header going stale again, the CURRENT support matrix
  * (what each op accepts, what returns null) lives in DIVERGENCES.md §1
  * and COVERAGE.md, which are updated with every scope change. The
  * standing contract is the only stable statement: every op either
  * computes an exact closed-form planar answer or returns null — never
  * a wrong geometry.
  *
  * DE-9IM-style predicates (touches/crosses/overlaps) are implemented
  * through interior-intersection tests: proper segment crossings plus
  * strict-interior probes of vertices and edge midpoints. Exact for
  * points, polygons, and lines that don't graze polygon vertices between
  * two consecutive probe points — same precision contract as
  * [[GeoGeom.contains]].
  */
object GeoGeomOps {
  import GeoGeom.{Geom, parse}

  // ---- srid / encodings ----------------------------------------------

  /** EWKB SRID, 0 when the flag is absent (PostGIS ST_SRID convention). */
  def srid(bytes: Array[Byte]): java.lang.Integer = {
    if (bytes == null || bytes.length < 9) return null
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.order(if (bytes(0) == 1.toByte) java.nio.ByteOrder.LITTLE_ENDIAN
             else java.nio.ByteOrder.BIG_ENDIAN)
    bb.position(1)
    val gtype = bb.getInt()
    if ((gtype & 0x20000000) != 0) bb.getInt() else 0
  }

  /** Re-encode with an EWKB SRID header (srid <= 0 strips back to WKB). */
  def setSrid(bytes: Array[Byte], sridV: Int): Array[Byte] = {
    val plain = asBinary(bytes)
    if (plain == null) return null
    if (sridV <= 0) return plain
    val bb = java.nio.ByteBuffer.allocate(plain.length + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val gtype = java.nio.ByteBuffer.wrap(plain)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(1)
    bb.put(1.toByte).putInt(gtype | 0x20000000).putInt(sridV)
    bb.put(plain, 5, plain.length - 5)
    bb.array()
  }

  /** Canonical little-endian WKB with any EWKB SRID stripped (ST_AsBinary).
    * GeoGeom.write covers every kind incl. Multi* / collections (a Multi
    * input used to MatchError here before round 4). */
  def asBinary(bytes: Array[Byte]): Array[Byte] = {
    val g = parse(bytes)
    if (g == null) return null
    GeoGeom.write(g)
  }

  /** ST_AsEWKB: the stored bytes already carry the SRID when set. */
  def asEwkb(bytes: Array[Byte]): Array[Byte] =
    if (parse(bytes) == null) null else bytes

  /** ST_AsEWKT: 'SRID=n;WKT' when an SRID is set, plain WKT otherwise. */
  def asEwkt(bytes: Array[Byte]): String = {
    val t = GeoGeom.asText(bytes)
    if (t == null) return null
    val s = srid(bytes)
    if (s != null && s.intValue() != 0) s"SRID=${s.intValue()};$t" else t
  }

  def nRings(bytes: Array[Byte]): java.lang.Integer = {
    val g = parse(bytes)
    if (g == null) null else if (g.kind == 3) g.rings.length else 0
  }

  /** GeometryN, 0-indexed: single geometries are their own only element
    * (multi-geometry collections are out of scope for the WKB model). */
  def geometryN(bytes: Array[Byte], n: Int): Array[Byte] =
    if (n == 0) asBinary(bytes) else null

  // ---- point measures --------------------------------------------------

  /** PostGIS ST_Azimuth: north-based clockwise radians in [0, 2π); null
    * for coincident points or non-point input. */
  def azimuth(aB: Array[Byte], bB: Array[Byte]): java.lang.Double = {
    val a = GeoWkb.readPoint(aB); val b = GeoWkb.readPoint(bB)
    if (a == null || b == null) return null
    val dx = b(0) - a(0); val dy = b(1) - a(1)
    if (dx == 0.0 && dy == 0.0) return null
    val az = math.atan2(dx, dy)
    if (az < 0.0) az + 2.0 * math.Pi else az
  }

  /** ST_MaxDistance: largest vertex-to-vertex distance (attained at
    * vertices for point/line/polygon operands). */
  def maxDistance(aB: Array[Byte], bB: Array[Byte]): java.lang.Double = {
    val a = parse(aB); val b = parse(bB)
    if (a == null || b == null) return null
    var best = 0.0
    a.rings.foreach { ra =>
      var i = 0
      while (i < ra.length) {
        b.rings.foreach { rb =>
          var j = 0
          while (j < rb.length) {
            val dx = ra(i) - rb(j); val dy = ra(i + 1) - rb(j + 1)
            best = math.max(best, math.sqrt(dx * dx + dy * dy))
            j += 2
          }
        }
        i += 2
      }
    }
    best
  }

  // ---- linear referencing ----------------------------------------------

  /** ST_LineLocatePoint: fraction in [0,1] along the line of the closest
    * point to pt. */
  def lineLocatePoint(lineB: Array[Byte], ptB: Array[Byte]): java.lang.Double = {
    val l = parse(lineB); val p = GeoWkb.readPoint(ptB)
    if (l == null || l.kind != 2 || p == null) return null
    val r = l.rings(0)
    val n = r.length / 2
    if (n < 2) return null
    val total = GeoGeom.ringLength(r)
    if (total == 0.0) return 0.0
    var bestDist = Double.MaxValue; var bestAt = 0.0; var cum = 0.0
    var i = 0
    while (i < n - 1) {
      val ax = r(i * 2); val ay = r(i * 2 + 1)
      val bx = r(i * 2 + 2); val by = r(i * 2 + 3)
      val dx = bx - ax; val dy = by - ay
      val len2 = dx * dx + dy * dy
      val seg = math.sqrt(len2)
      val t = if (len2 == 0.0) 0.0
        else math.max(0.0, math.min(1.0, ((p(0) - ax) * dx + (p(1) - ay) * dy) / len2))
      val qx = ax + t * dx; val qy = ay + t * dy
      val d = math.sqrt((p(0) - qx) * (p(0) - qx) + (p(1) - qy) * (p(1) - qy))
      if (d < bestDist) { bestDist = d; bestAt = cum + t * seg }
      cum += seg
      i += 1
    }
    math.max(0.0, math.min(1.0, bestAt / total))
  }

  /** ST_LineSubstring: the sub-linestring between start/end fractions
    * (0 <= f0 < f1 <= 1; degenerate or non-line input → null). */
  def lineSubstring(lineB: Array[Byte], f0: Double, f1: Double): Array[Byte] = {
    val l = parse(lineB)
    if (l == null || l.kind != 2) return null
    if (!(f0 >= 0.0 && f1 <= 1.0 && f0 < f1)) return null
    val r = l.rings(0)
    val n = r.length / 2
    if (n < 2) return null
    val total = GeoGeom.ringLength(r)
    if (total == 0.0) return null
    val s0 = f0 * total; val s1 = f1 * total
    val out = scala.collection.mutable.ArrayBuffer[Double]()
    def interp(i: Int, t: Double): (Double, Double) = (
      r(i * 2) + t * (r(i * 2 + 2) - r(i * 2)),
      r(i * 2 + 1) + t * (r(i * 2 + 3) - r(i * 2 + 1)))
    var cum = 0.0
    var i = 0
    while (i < n - 1) {
      val dx = r(i * 2 + 2) - r(i * 2); val dy = r(i * 2 + 3) - r(i * 2 + 1)
      val seg = math.sqrt(dx * dx + dy * dy)
      val a = cum; val b = cum + seg
      if (seg > 0.0 && b >= s0 && a <= s1) {
        if (out.isEmpty) {
          val t = math.max(0.0, (s0 - a) / seg)
          val (x, y) = interp(i, t); out += x; out += y
        }
        if (b <= s1) { out += r(i * 2 + 2); out += r(i * 2 + 3) }
        else {
          val t = math.min(1.0, (s1 - a) / seg)
          val (x, y) = interp(i, t); out += x; out += y
        }
      }
      cum = b
      i += 1
    }
    if (out.length < 4) null else GeoGeom.writeLine(out.toArray)
  }

  // ---- simplify (Douglas-Peucker) --------------------------------------

  private def dpKeep(r: Array[Double], from: Int, to: Int, tol: Double,
      keep: Array[Boolean]): Unit = {
    if (to <= from + 1) return
    var worst = -1.0; var worstIdx = -1
    val ax = r(from * 2); val ay = r(from * 2 + 1)
    val bx = r(to * 2); val by = r(to * 2 + 1)
    var i = from + 1
    while (i < to) {
      val d = GeoGeom.pointSegDist(r(i * 2), r(i * 2 + 1), ax, ay, bx, by)
      if (d > worst) { worst = d; worstIdx = i }
      i += 1
    }
    if (worst > tol) {
      keep(worstIdx) = true
      dpKeep(r, from, worstIdx, tol, keep)
      dpKeep(r, worstIdx, to, tol, keep)
    }
  }

  private def dpRing(r: Array[Double], tol: Double, closed: Boolean): Array[Double] = {
    val n = r.length / 2
    if (n <= 2) return r
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    if (closed && n > 3) {
      // anchor the midpoint too so a closed ring can't collapse to a segment
      val mid = n / 2
      keep(mid) = true
      dpKeep(r, 0, mid, tol, keep)
      dpKeep(r, mid, n - 1, tol, keep)
    } else dpKeep(r, 0, n - 1, tol, keep)
    val out = scala.collection.mutable.ArrayBuffer[Double]()
    var i = 0
    while (i < n) {
      if (keep(i)) { out += r(i * 2); out += r(i * 2 + 1) }
      i += 1
    }
    out.toArray
  }

  /** ST_Simplify (Douglas-Peucker). Points pass through; polygon rings
    * that would collapse below 4 vertices are kept unsimplified. */
  def simplify(bytes: Array[Byte], tol: Double): Array[Byte] = {
    val g = parse(bytes)
    if (g == null || tol < 0.0) return null
    g.kind match {
      case 1 => asBinary(bytes)
      case 2 => GeoGeom.writeLine(dpRing(g.rings(0), tol, closed = false))
      case 3 => GeoGeom.writePolygon(g.rings.map { r =>
        val s = dpRing(r, tol, closed = true)
        if (s.length / 2 < 4) r else s
      })
    }
  }

  // ---- validity / equality ---------------------------------------------

  /** ST_IsValid: finite coordinates; lines need >= 2 points; polygon rings
    * must be closed, >= 4 points, non-self-intersecting, non-degenerate. */
  def isValid(bytes: Array[Byte]): java.lang.Boolean = {
    val g = parse(bytes)
    if (g == null) return false
    val finite = g.rings.forall(_.forall(v => !v.isNaN && !v.isInfinite))
    if (!finite) return false
    g.kind match {
      case 1 => true
      case 2 => g.rings(0).length >= 4
      case 3 => g.rings.forall { r =>
        val n = r.length / 2
        if (n < 4) return false
        if (r(0) != r(n * 2 - 2) || r(1) != r(n * 2 - 1)) return false
        // non-adjacent segment pairs must not intersect; adjacent pairs
        // share exactly their common endpoint
        var i = 0
        while (i < n - 1) {
          var j = i + 1
          while (j < n - 1) {
            val adjacent = j == i + 1 || (i == 0 && j == n - 2)
            if (!adjacent && GeoGeom.segsIntersect(
                r(i * 2), r(i * 2 + 1), r(i * 2 + 2), r(i * 2 + 3),
                r(j * 2), r(j * 2 + 1), r(j * 2 + 2), r(j * 2 + 3))) return false
            j += 1
          }
          i += 1
        }
        val a = GeoGeom.area(GeoGeom.writePolygon(Array(r)))
        a != null && a.doubleValue() > 0.0
      }
    }
  }

  /** GeoOrderingEquals: same type AND identical coordinate sequences
    * (byte-order/SRID-insensitive — compares parsed coordinates). */
  def orderingEquals(aB: Array[Byte], bB: Array[Byte]): java.lang.Boolean = {
    val a = parse(aB); val b = parse(bB)
    if (a == null || b == null) return null
    a.kind == b.kind && a.rings.length == b.rings.length &&
      a.rings.indices.forall(i => java.util.Arrays.equals(a.rings(i), b.rings(i)))
  }

  private def cyclicEqual(a: Array[Double], b: Array[Double]): Boolean = {
    // rings closed (first == last): compare the open cycles under rotation
    // and reversal
    val na = a.length / 2 - 1; val nb = b.length / 2 - 1
    if (na != nb || na < 1) return java.util.Arrays.equals(a, b)
    def eqAt(shift: Int, reversed: Boolean): Boolean = {
      var i = 0
      while (i < na) {
        val j = if (reversed) (shift - i % na + na) % na else (shift + i) % na
        if (a(i * 2) != b(j * 2) || a(i * 2 + 1) != b(j * 2 + 1)) return false
        i += 1
      }
      true
    }
    (0 until na).exists(s => eqAt(s, reversed = false) || eqAt(s, reversed = true))
  }

  /** GeoEquals (spatial equality): points by value; lines under reversal;
    * polygon rings under rotation + reversal, holes matched in any order. */
  def geoEquals(aB: Array[Byte], bB: Array[Byte]): java.lang.Boolean = {
    val a = parse(aB); val b = parse(bB)
    if (a == null || b == null) return null
    if (a.kind != b.kind) return false
    a.kind match {
      case 1 => java.util.Arrays.equals(a.rings(0), b.rings(0))
      case 2 =>
        val ra = a.rings(0); val rb = b.rings(0)
        java.util.Arrays.equals(ra, rb) || {
          val rev = new Array[Double](rb.length)
          val n = rb.length / 2
          var i = 0
          while (i < n) {
            rev(i * 2) = rb((n - 1 - i) * 2); rev(i * 2 + 1) = rb((n - 1 - i) * 2 + 1)
            i += 1
          }
          java.util.Arrays.equals(ra, rev)
        }
      case 3 =>
        if (a.rings.length != b.rings.length) return false
        if (!cyclicEqual(a.rings(0), b.rings(0))) return false
        val used = new Array[Boolean](b.rings.length)
        used(0) = true
        (1 until a.rings.length).forall { i =>
          val m = (1 until b.rings.length).find(j => !used(j) && cyclicEqual(a.rings(i), b.rings(j)))
          m.foreach(used(_) = true)
          m.isDefined
        }
    }
  }

  // ---- DE-9IM-style predicates ------------------------------------------

  private def onAnyBoundary(px: Double, py: Double, rings: Array[Array[Double]]): Boolean = {
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      val n = ring.length / 2
      var i = 0
      while (i < n - 1) {
        if (GeoGeom.onSegment(px, py, ring(i * 2), ring(i * 2 + 1),
            ring(i * 2 + 2), ring(i * 2 + 3))) return true
        i += 1
      }
      r += 1
    }
    false
  }

  private def strictlyInside(px: Double, py: Double, rings: Array[Array[Double]]): Boolean =
    !onAnyBoundary(px, py, rings) && GeoGeom.pointInRings(px, py, rings)

  /** Point strictly in the 1-dim interior of a linestring (on a segment,
    * not at the linestring's first/last vertex). */
  private def inLineInterior(px: Double, py: Double, line: Geom): Boolean = {
    val r = line.rings(0)
    val n = r.length / 2
    if (n < 2) return false
    if (px == r(0) && py == r(1)) return false
    if (px == r((n - 1) * 2) && py == r((n - 1) * 2 + 1)) return false
    var i = 0
    while (i < n - 1) {
      if (GeoGeom.onSegment(px, py, r(i * 2), r(i * 2 + 1), r(i * 2 + 2), r(i * 2 + 3)))
        return true
      i += 1
    }
    false
  }

  /** Probe points of a geometry's interior candidates: vertices plus edge
    * midpoints (the same sampling contract as GeoGeom.contains). */
  private def probes(g: Geom): Iterator[(Double, Double)] = g.rings.iterator.flatMap { r =>
    val n = r.length / 2
    val vs = (0 until n).iterator.map(i => (r(i * 2), r(i * 2 + 1)))
    val mids = (0 until n - 1).iterator.map(i =>
      ((r(i * 2) + r(i * 2 + 2)) / 2.0, (r(i * 2 + 1) + r(i * 2 + 3)) / 2.0))
    vs ++ mids
  }

  private def anyProperCross(a: Geom, b: Geom): Boolean =
    a.rings.exists { ra =>
      val na = ra.length / 2
      b.rings.exists { rb =>
        val nb = rb.length / 2
        (0 until na - 1).exists { i =>
          (0 until nb - 1).exists { j =>
            GeoGeom.properCross(ra(i * 2), ra(i * 2 + 1), ra(i * 2 + 2), ra(i * 2 + 3),
              rb(j * 2), rb(j * 2 + 1), rb(j * 2 + 2), rb(j * 2 + 3))
          }
        }
      }
    }

  /** Do the interiors of a and b share a point? (The I(a)∩I(b) ≠ ∅ cell of
    * DE-9IM, evaluated with crossings + probe sampling.) */
  private def interiorsIntersect(a: Geom, b: Geom): Boolean = (a.kind, b.kind) match {
    case (1, 1) => java.util.Arrays.equals(a.rings(0), b.rings(0))
    case (1, 2) => inLineInterior(a.rings(0)(0), a.rings(0)(1), b)
    case (2, 1) => inLineInterior(b.rings(0)(0), b.rings(0)(1), a)
    case (1, 3) => strictlyInside(a.rings(0)(0), a.rings(0)(1), b.rings)
    case (3, 1) => strictlyInside(b.rings(0)(0), b.rings(0)(1), a.rings)
    case (2, 2) =>
      anyProperCross(a, b) ||
        probes(a).exists { case (x, y) => inLineInterior(x, y, b) && inLineInterior(x, y, a) }
    case (2, 3) =>
      anyProperCross(a, b) ||
        probes(a).exists { case (x, y) => strictlyInside(x, y, b.rings) }
    case (3, 2) =>
      anyProperCross(a, b) ||
        probes(b).exists { case (x, y) => strictlyInside(x, y, a.rings) }
    case (3, 3) =>
      // vertices + midpoints all sit ON the boundary when the polygons
      // coincide (or share a containing boundary) — the shell centroid is
      // the interior witness those probes can't provide
      anyProperCross(a, b) ||
        (probes(a) ++ shellCentroid(a)).exists { case (x, y) => strictlyInside(x, y, b.rings) } ||
        (probes(b) ++ shellCentroid(b)).exists { case (x, y) => strictlyInside(x, y, a.rings) }
    case _ => false
  }

  /** Shoelace centroid of the shell ring — an interior point for convex
    * (and most concave) shells; within the probe-sampling contract. */
  private def shellCentroid(g: Geom): Iterator[(Double, Double)] = {
    val c = GeoGeom.centroid(GeoGeom.writePolygon(g.rings))
    val p = GeoWkb.readPoint(c)
    if (p == null) Iterator.empty else Iterator((p(0), p(1)))
  }

  /** ST_Touches: geometries intersect but only at their boundaries. */
  def touches(aB: Array[Byte], bB: Array[Byte]): java.lang.Boolean = {
    val a = parse(aB); val b = parse(bB)
    if (a == null || b == null) return null
    val d = GeoGeom.distance(aB, bB)
    if (d == null || d.doubleValue() != 0.0) return false
    !interiorsIntersect(a, b)
  }

  /** ST_Crosses: interiors intersect in a lower dimension than the inputs
    * (line/line at points; line/polygon passing through). Point operands
    * and polygon/polygon pairs never cross. */
  def crosses(aB: Array[Byte], bB: Array[Byte]): java.lang.Boolean = {
    val a = parse(aB); val b = parse(bB)
    if (a == null || b == null) return null
    (a.kind, b.kind) match {
      case (2, 2) => anyProperCross(a, b)
      case (2, 3) | (3, 2) =>
        val (line, poly) = if (a.kind == 2) (a, b) else (b, a)
        val someIn = probes(line).exists { case (x, y) => strictlyInside(x, y, poly.rings) }
        val someOut = probes(line).exists { case (x, y) => !GeoGeom.pointInRings(x, y, poly.rings) }
        someIn && someOut
      case _ => false
    }
  }

  /** ST_Overlaps: same dimension, interiors intersect, neither covers the
    * other. (Line/line overlap requires a shared collinear stretch, which
    * surfaces through the midpoint probes of interiorsIntersect.) */
  def overlaps(aB: Array[Byte], bB: Array[Byte]): java.lang.Boolean = {
    val a = parse(aB); val b = parse(bB)
    if (a == null || b == null) return null
    if (a.kind != b.kind || a.kind == 1) return false
    if (a.kind == 2 && anyProperCross(a, b)) return false // dim-0 intersection = crosses
    interiorsIntersect(a, b) &&
      !GeoGeom.contains(aB, bB).booleanValue() &&
      !GeoGeom.contains(bB, aB).booleanValue()
  }

  /** ST_Covers — boundary-inclusive containment. [[GeoGeom.contains]] is
    * already boundary-inclusive (its documented deviation from strict
    * ST_Contains), so covers IS that relation; containsProperly is the
    * strict-interior one. */
  def covers(aB: Array[Byte], bB: Array[Byte]): java.lang.Boolean =
    GeoGeom.contains(aB, bB)

  /** ST_ContainsProperly: b intersects a's interior only — every probe of
    * b strictly inside a, no boundary contact, no crossing. */
  def containsProperly(aB: Array[Byte], bB: Array[Byte]): java.lang.Boolean = {
    val a = parse(aB); val b = parse(bB)
    if (a == null || b == null) return null
    if (a.kind != 3) return false
    probes(b).forall { case (x, y) => strictlyInside(x, y, a.rings) } &&
      !anyProperCross(a, b)
  }

  // ---- intersection (convex clip, Sutherland-Hodgman) -------------------

  /** All non-zero consecutive-edge cross products share a sign. */
  private def isConvexRing(r: Array[Double]): Boolean = {
    val n = r.length / 2 - 1 // closed ring
    if (n < 3) return false
    var sign = 0.0
    var i = 0
    while (i < n) {
      val ax = r(i * 2); val ay = r(i * 2 + 1)
      val bx = r(((i + 1) % n) * 2); val by = r(((i + 1) % n) * 2 + 1)
      val cx = r(((i + 2) % n) * 2); val cy = r(((i + 2) % n) * 2 + 1)
      val cross = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
      if (cross != 0.0) {
        if (sign == 0.0) sign = math.signum(cross)
        else if (math.signum(cross) != sign) return false
      }
      i += 1
    }
    true
  }

  private def signedArea(r: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = r.length / 2
    while (i < n - 1) {
      s += r(i * 2) * r(i * 2 + 3) - r(i * 2 + 2) * r(i * 2 + 1)
      i += 1
    }
    s / 2.0
  }

  /** Sutherland-Hodgman: clip an (arbitrary, closed) subject ring against
    * a convex closed clip ring. Returns the open output ring. */
  private def clipRing(subject: Array[Double], clip: Array[Double]): Array[Double] = {
    val inSign = if (signedArea(clip) >= 0.0) 1.0 else -1.0
    var poly = subject.dropRight(2) // open
    val nc = clip.length / 2 - 1
    var e = 0
    while (e < nc && poly.length >= 2) {
      val x1 = clip(e * 2); val y1 = clip(e * 2 + 1)
      val x2 = clip(e * 2 + 2); val y2 = clip(e * 2 + 3)
      def inside(px: Double, py: Double): Boolean =
        inSign * ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) >= 0.0
      def cut(ax: Double, ay: Double, bx: Double, by: Double): (Double, Double) = {
        val d1 = (x2 - x1) * (ay - y1) - (y2 - y1) * (ax - x1)
        val d2 = (x2 - x1) * (by - y1) - (y2 - y1) * (bx - x1)
        val t = d1 / (d1 - d2)
        (ax + t * (bx - ax), ay + t * (by - ay))
      }
      val out = scala.collection.mutable.ArrayBuffer[Double]()
      val n = poly.length / 2
      var i = 0
      while (i < n) {
        val sx = poly(i * 2); val sy = poly(i * 2 + 1)
        val ex = poly(((i + 1) % n) * 2); val ey = poly(((i + 1) % n) * 2 + 1)
        val sIn = inside(sx, sy); val eIn = inside(ex, ey)
        if (eIn) {
          if (!sIn) { val (cx, cy) = cut(sx, sy, ex, ey); out += cx; out += cy }
          out += ex; out += ey
        } else if (sIn) { val (cx, cy) = cut(sx, sy, ex, ey); out += cx; out += cy }
        i += 1
      }
      poly = out.toArray
      e += 1
    }
    poly
  }

  /** GeoIntersection (geospatial.py:426): polygon ∩ polygon for ALL
    * pairings since round 7 — polygon ∩ CONVEX hole-free polygon keeps
    * the tangency-robust Sutherland-Hodgman fast path; concave-concave
    * and holed pairs route through the same boundary-walk machinery as
    * union/difference (keep A sub-edges strictly inside B + symmetric,
    * collinear overlaps kept from the A side when interiors agree).
    * Round 9: line ∩ ARBITRARY polygon/multi via the general boundary
    * split ([[splitLineByRings]]), line ∩ line via exact collinear
    * intervals + crossing points ([[lineLineIntersection]]), point
    * ∩ anything, and polygon-touch-only pairs returning their boundary
    * CONTACT SET (edge stretches and isolated points,
    * [[chainsContact]]). Empty results and the DIVERGENCES §1 remainder
    * → null, never wrong. */
  def intersection(aB: Array[Byte], bB: Array[Byte]): Array[Byte] = {
    val a = parse(aB); val b = parse(bB)
    if (a == null || b == null) return null
    (a.kind, b.kind) match {
      case (1, _) =>
        val d = GeoGeom.distance(aB, bB)
        if (d != null && d.doubleValue() == 0.0) asBinary(aB) else null
      case (_, 1) => intersection(bB, aB)
      case (2, 3) | (2, 6) =>
        // general clip (round 9 second pass): split at every boundary
        // crossing, keep the closed-region side — concave, holed and
        // multi polygons included; empty / point-touch-only → null
        writeChains(splitLineByRings(a.rings(0), b.rings)._1)
      case (3, 2) | (6, 2) => intersection(bB, aB)
      case (ka, kb) if (ka != 3 || kb != 3) &&
          polyParts(a) != null && polyParts(b) != null =>
        // multi-part sides: pairwise part intersections (parts of one
        // side have disjoint interiors, so the pieces are disjoint). A
        // null pair is only acceptable when provably EMPTY (disjoint) —
        // touch-only pairs contribute their boundary contact set (round
        // 9); anything ambiguous aborts the whole op.
        val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
        val cLines = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
        val cPts = scala.collection.mutable.LinkedHashSet[(Double, Double)]()
        for (ap <- polyParts(a); bp <- polyParts(b)) {
          val apB = GeoGeom.write(ap); val bpB = GeoGeom.write(bp)
          val r = intersection(apB, bpB)
          if (r == null) {
            val d = GeoGeom.distance(apB, bpB)
            if (!(d != null && d.doubleValue() > 0.0)) return null
          } else parse(r) match {
            case g if g != null && g.kind == 3 => out += r
            case g if g != null && g.kind == 6 => g.parts.foreach(pt => out += GeoGeom.write(pt))
            case g if g != null && g.kind != 7 && mixedMembers(g) != null =>
              val (ps, ls, qs) = mixedMembers(g)
              if (ps.nonEmpty) return null // a touch contact is never areal
              ls.foreach(l => cLines += GeoGeom.write(l))
              qs.foreach(q => cPts += ((q.rings(0)(0), q.rings(0)(1))))
            case g if g != null && g.kind == 7 && mixedMembers(g) != null &&
                mixedMembers(g)._1.isEmpty =>
              val (_, ls, qs) = mixedMembers(g)
              ls.foreach(l => cLines += GeoGeom.write(l))
              qs.foreach(q => cPts += ((q.rings(0)(0), q.rings(0)(1))))
            case _ => return null
          }
        }
        if (cLines.isEmpty && cPts.isEmpty) assembleParts(out.toSeq)
        else {
          // contact points on another pair's contact line or on an areal
          // piece's closure are not separate components
          val lineChains = cLines.flatMap(lb => Option(parse(lb)).map(_.rings(0))).toSeq
          val keptPts = cPts.toSeq.filterNot { case (px, py) =>
            lineChains.exists { ch =>
              var i = 0; var hit = false
              while (i + 3 < ch.length && !hit) {
                if (GeoGeom.onSegment(px, py, ch(i), ch(i + 1), ch(i + 2), ch(i + 3))) hit = true
                i += 2
              }
              hit
            } || out.exists { pb =>
              val dd = GeoGeom.distance(GeoWkb.writePoint(px, py), pb)
              dd != null && dd.doubleValue() == 0.0
            }
          }
          val mergedLines: Seq[Array[Byte]] =
            if (cLines.isEmpty) Nil
            else parse(lineUnion(lineChains)) match {
              case g if g != null && g.kind == 2 => Seq(GeoGeom.write(g))
              case g if g != null && g.kind == 5 => g.rings.map(GeoGeom.writeLine).toSeq
              case _ => return null
            }
          assembleMixed(assembleParts(out.toSeq), mergedLines,
            keptPts.map { case (px, py) => GeoWkb.writePoint(px, py) })
        }
      case (3, 3) =>
        // convex hole-free clip + hole-free subject: Sutherland-Hodgman;
        // everything else walks boundaries like union/difference
        val aOk = a.rings.length == 1 && isConvexRing(a.rings(0))
        val bOk = b.rings.length == 1 && isConvexRing(b.rings(0))
        if ((!aOk && !bOk) || (bOk && a.rings.length > 1) || (aOk && !bOk && b.rings.length > 1))
          return generalIntersection(aB, bB, a, b)
        val (subj, clip) = if (bOk) (a, b) else (b, a)
        if (subj.rings.length > 1) return generalIntersection(aB, bB, a, b)
        val out = clipRing(subj.rings(0), clip.rings(0))
        // drop consecutive duplicates, require a real (non-degenerate) ring
        val ded = scala.collection.mutable.ArrayBuffer[Double]()
        var i = 0
        while (i < out.length) {
          val n = ded.length
          if (n < 2 || ded(n - 2) != out(i) || ded(n - 1) != out(i + 1)) {
            ded += out(i); ded += out(i + 1)
          }
          i += 2
        }
        if (ded.length >= 4 && ded(0) == ded(ded.length - 2) && ded(1) == ded(ded.length - 1)) {
          ded.remove(ded.length - 1); ded.remove(ded.length - 1)
        }
        // degenerate clip output = no areal overlap: touch-only pairs
        // yield their boundary contact set (round 9), disjoint → null
        if (ded.length < 6) return chainsContact(a.rings.toSeq, b.rings.toSeq)
        val ring = (ded ++ Seq(ded(0), ded(1))).toArray
        if (math.abs(signedArea(ring)) == 0.0)
          return chainsContact(a.rings.toSeq, b.rings.toSeq)
        GeoGeom.writePolygon(Array(ring))
      case (2, 2) => lineLineIntersection(a.rings(0), b.rings(0))
      // multi/collection operands beyond the all-polygon branch — incl.
      // mixed dimensions (round 9) — intersect member-wise
      case (ka, kb) if ka >= 4 || kb >= 4 => mixedIntersection(a, b)
      case _ => null
    }
  }

  /** Boundary-walk polygon ∩ polygon for the pairs Sutherland-Hodgman
    * cannot take (concave-concave, holed operands): keep A sub-edges
    * strictly inside B, B sub-edges strictly inside A, collinear overlaps
    * from the A side when the interiors locally agree; stitch + assemble.
    * Empty interior or failed stitch → null. */
  private def generalIntersection(aB: Array[Byte], bB: Array[Byte],
      a: Geom, b: Geom): Array[Byte] = {
    val ra = orientedRings(a); val rb = orientedRings(b)
    if (ra == null || rb == null) return null
    val d = GeoGeom.distance(aB, bB)
    if (d != null && d.doubleValue() > 0.0) return null // disjoint: empty
    val abIn = GeoGeom.contains(aB, bB)
    if (abIn != null && abIn.booleanValue()) return GeoGeom.writePolygon(rb) // B ⊆ A
    val baIn = GeoGeom.contains(bB, aB)
    if (baIn != null && baIn.booleanValue()) return GeoGeom.writePolygon(ra) // A ⊆ B
    val keep = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    ra.foreach(ring => splitEdges(ring, rb).foreach { s =>
      val mx = (s(0) + s(2)) / 2.0; val my = (s(1) + s(3)) / 2.0
      if (onAnyBoundary(mx, my, rb)) {
        // collinear overlap: part of A∩B's boundary iff both interiors
        // sit locally on the edge's left — kept from the A side only
        if (interiorSide(s, ra, rb)) keep += s
      } else if (strictlyInside(mx, my, rb)) keep += s
    })
    rb.foreach(ring => splitEdges(ring, ra).foreach { s =>
      val mx = (s(0) + s(2)) / 2.0; val my = (s(1) + s(3)) / 2.0
      if (!onAnyBoundary(mx, my, ra) && strictlyInside(mx, my, ra)) keep += s
    })
    if (keep.isEmpty) // touch-only: the boundary contact set (round 9)
      return chainsContact(ra.toSeq, rb.toSeq)
    stitchRings(keep.toSeq).map(assemblePolys).orNull
  }

  /** Clip a linestring to a convex ring; null unless exactly one connected
    * piece survives. */
  private def clipLineToConvex(line: Array[Double], clip: Array[Double]): Array[Byte] = {
    val inSign = if (signedArea(clip) >= 0.0) 1.0 else -1.0
    val nc = clip.length / 2 - 1
    def clipSeg(ax: Double, ay: Double, bx: Double, by: Double): Array[Double] = {
      var t0 = 0.0; var t1 = 1.0
      var e = 0
      while (e < nc) {
        val x1 = clip(e * 2); val y1 = clip(e * 2 + 1)
        val x2 = clip(e * 2 + 2); val y2 = clip(e * 2 + 3)
        val d1 = inSign * ((x2 - x1) * (ay - y1) - (y2 - y1) * (ax - x1))
        val d2 = inSign * ((x2 - x1) * (by - y1) - (y2 - y1) * (bx - x1))
        if (d1 < 0.0 && d2 < 0.0) return null
        if (d1 < 0.0 || d2 < 0.0) {
          val t = d1 / (d1 - d2)
          if (d1 < 0.0) t0 = math.max(t0, t) else t1 = math.min(t1, t)
          if (t0 > t1) return null
        }
        e += 1
      }
      Array(ax + t0 * (bx - ax), ay + t0 * (by - ay),
            ax + t1 * (bx - ax), ay + t1 * (by - ay))
    }
    val pieces = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val n = line.length / 2
    var i = 0
    while (i < n - 1) {
      val c = clipSeg(line(i * 2), line(i * 2 + 1), line(i * 2 + 2), line(i * 2 + 3))
      if (c != null && (c(0) != c(2) || c(1) != c(3))) {
        // merge with the previous piece when contiguous
        if (pieces.nonEmpty && pieces.last(pieces.last.length - 2) == c(0) &&
            pieces.last(pieces.last.length - 1) == c(1))
          pieces(pieces.length - 1) = pieces.last ++ Array(c(2), c(3))
        else pieces += c
      }
      i += 1
    }
    if (pieces.length != 1) null else GeoGeom.writeLine(pieces.head)
  }

  // ---- polygon boolean ops: union / difference --------------------------
  //
  // GeoUnion (geospatial.py:195) / GeoDifference (:433) geometry OUTPUTS.
  // Shortcut paths are exact for ALL polygon pairs: disjoint →
  // MULTIPOLYGON / identity, containment → identity / shell+hole. The
  // general path splits every edge at boundary crossings, classifies each
  // sub-edge by its midpoint (strictly inside / outside / on the other
  // boundary — collinear shared stretches classify by which side each
  // interior sits on, [[interiorSide]]), keeps the op's side set, and
  // stitches directed sub-edges back into rings — concave, holed and
  // exact collinear-overlap tangent pairs included (GeoTangencySpec is
  // the battery). Inputs are normalized CCW so kept edges stitch
  // orientation-consistently; a failed stitch returns null, never a
  // wrong geometry. Current scope and the remaining null classes live in
  // DIVERGENCES.md §1 — not here, where they'd go stale.

  private def reverseRing(r: Array[Double]): Array[Double] = {
    val n = r.length / 2
    val o = new Array[Double](r.length)
    var i = 0
    while (i < n) {
      o(i * 2) = r((n - 1 - i) * 2); o(i * 2 + 1) = r((n - 1 - i) * 2 + 1)
      i += 1
    }
    o
  }

  private def ccw(r: Array[Double]): Array[Double] =
    if (signedArea(r) >= 0.0) r else reverseRing(r)

  private def cw(r: Array[Double]): Array[Double] =
    if (signedArea(r) <= 0.0) r else reverseRing(r)

  /** Polygon operand rings normalized to the interior-on-left invariant:
    * shell (WKB ring 0) CCW, holes CW — so every boundary-walk keep/flip
    * rule below holds uniformly for shells AND holes. Null otherwise. */
  private def orientedRings(g: Geom): Array[Array[Double]] =
    if (g == null || g.kind != 3 || g.rings.length == 0) null
    else g.rings.zipWithIndex.map { case (r, i) => if (i == 0) ccw(r) else cw(r) }

  /** Directed sub-edges of `subj` (closed ring) split at every proper or
    * endpoint crossing with any of `others`' edges; collinear pairs
    * contribute no split (their sub-edges classify by midpoint instead).
    * Each element is [x1,y1,x2,y2]. */
  private def splitEdges(subj: Array[Double], others: Array[Array[Double]])
      : scala.collection.mutable.ArrayBuffer[Array[Double]] = {
    val out = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val ns = subj.length / 2 - 1
    var i = 0
    while (i < ns) {
      val ax = subj(i * 2); val ay = subj(i * 2 + 1)
      val bx = subj(i * 2 + 2); val by = subj(i * 2 + 3)
      val ts = scala.collection.mutable.ArrayBuffer[Double](0.0, 1.0)
      var r = 0
      while (r < others.length) {
        val other = others(r)
        val no = other.length / 2 - 1
        var j = 0
        while (j < no) {
          val cx = other(j * 2); val cy = other(j * 2 + 1)
          val dx = other(j * 2 + 2); val dy = other(j * 2 + 3)
          val d = (bx - ax) * (dy - cy) - (by - ay) * (dx - cx)
          if (d != 0.0) {
            val t = ((cx - ax) * (dy - cy) - (cy - ay) * (dx - cx)) / d
            val s = ((cx - ax) * (by - ay) - (cy - ay) * (bx - ax)) / d
            if (t > 0.0 && t < 1.0 && s >= 0.0 && s <= 1.0) ts += t
          }
          j += 1
        }
        r += 1
      }
      val st = ts.distinct.sorted
      var k = 0
      while (k < st.length - 1) {
        val t0 = st(k); val t1 = st(k + 1)
        val x1 = ax + t0 * (bx - ax); val y1 = ay + t0 * (by - ay)
        val x2 = ax + t1 * (bx - ax); val y2 = ay + t1 * (by - ay)
        if (x1 != x2 || y1 != y2) out += Array(x1, y1, x2, y2)
        k += 1
      }
      i += 1
    }
    out
  }

  /** Stitch directed segments into closed rings by endpoint-following
    * (1e-9-quantized keys absorb the last-ulp asymmetry between the two
    * sides' intersection-point arithmetic). None on any dead end. */
  private def stitchRings(segs: Seq[Array[Double]]): Option[Array[Array[Double]]] = {
    def key(x: Double, y: Double): (Long, Long) =
      (math.rint(x * 1e9).toLong, math.rint(y * 1e9).toLong)
    val bySrc = scala.collection.mutable.Map[(Long, Long),
      scala.collection.mutable.Queue[Array[Double]]]()
    segs.foreach { s =>
      bySrc.getOrElseUpdate(key(s(0), s(1)),
        scala.collection.mutable.Queue[Array[Double]]()) += s
    }
    val rings = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    var remaining = segs.size
    while (remaining > 0) {
      val q0 = bySrc.values.find(_.nonEmpty).get
      val first = q0.dequeue(); remaining -= 1
      val pts = scala.collection.mutable.ArrayBuffer[Double](
        first(0), first(1), first(2), first(3))
      val startK = key(first(0), first(1))
      var curK = key(first(2), first(3))
      var guard = segs.size + 1
      while (curK != startK && guard > 0) {
        bySrc.get(curK).filter(_.nonEmpty) match {
          case Some(q) =>
            val nxt = q.dequeue(); remaining -= 1
            pts += nxt(2); pts += nxt(3)
            curK = key(nxt(2), nxt(3))
          case None => return None
        }
        guard -= 1
      }
      if (curK != startK) return None
      pts(pts.length - 2) = pts(0); pts(pts.length - 1) = pts(1) // exact closure
      // decompose at repeated (pinch) vertices into SIMPLE rings (round
      // 9): a degree-4 vertex lets the endpoint-follow jump between what
      // are really two distinct rings (corner-touching squares) or a
      // shell and an inscribed hole, producing an invalid self-touching
      // figure-8; splitting the trace at each revisit restores the
      // simple components with their orientations intact
      val path = scala.collection.mutable.ArrayBuffer[Double]()
      val at = scala.collection.mutable.Map[(Long, Long), Int]()
      var pi = 0
      while (pi < pts.length - 2) {
        val x = pts(pi); val y = pts(pi + 1)
        val k = key(x, y)
        at.get(k) match {
          case Some(s) =>
            val cyc = scala.collection.mutable.ArrayBuffer[Double]()
            var j = s * 2
            while (j < path.length) { cyc += path(j); j += 1 }
            cyc += path(s * 2); cyc += path(s * 2 + 1) // exact closure
            if (cyc.length >= 8 && math.abs(signedArea(cyc.toArray)) > 1e-12)
              rings += cyc.toArray
            var r = s
            while (r < path.length / 2) { at.remove(key(path(r * 2), path(r * 2 + 1))); r += 1 }
            path.remove(s * 2, path.length - s * 2)
            at(k) = path.length / 2
            path += x; path += y
          case None =>
            at(k) = path.length / 2
            path += x; path += y
        }
        pi += 2
      }
      if (path.length >= 6) {
        path += path(0); path += path(1)
        if (math.abs(signedArea(path.toArray)) > 1e-12) rings += path.toArray
      }
    }
    Some(rings.toArray)
  }

  /** Group stitched rings into POLYGON / MULTIPOLYGON WKB: CCW rings are
    * shells, CW rings become holes of the shell containing them. */
  private def assemblePolys(rings: Array[Array[Double]]): Array[Byte] = {
    if (rings.isEmpty) return null
    val shells = scala.collection.mutable.ArrayBuffer[
      (Array[Double], scala.collection.mutable.ArrayBuffer[Array[Double]])]()
    val holes = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    rings.foreach { r =>
      if (signedArea(r) >= 0.0) shells += ((r, scala.collection.mutable.ArrayBuffer()))
      else holes += r
    }
    if (shells.isEmpty) return null
    holes.foreach { h =>
      shells.find { case (s, _) => GeoGeom.pointInRings(h(0), h(1), Array(s)) } match {
        case Some((_, hs)) => hs += h
        case None          => return null
      }
    }
    if (shells.length == 1)
      GeoGeom.writePolygon((shells(0)._1 +: shells(0)._2).toArray)
    else GeoGeom.writeMulti(GeoGeom.MultiPolygonType,
      shells.map { case (s, hs) => GeoGeom.writePolygon((s +: hs).toArray) }.toArray)
  }

  /** Polygon parts of a polygonal operand: a POLYGON is its own single
    * part; MULTIPOLYGON / all-polygon GEOMETRYCOLLECTION contribute each
    * member. Null for anything else. */
  private def polyParts(g: Geom): Array[Geom] = g.kind match {
    case 3 => Array(g)
    case 6 => g.parts
    case 7 if g.parts != null && g.parts.nonEmpty && g.parts.forall(_.kind == 3) => g.parts
    case _ => null
  }

  private def assembleParts(pieces: Seq[Array[Byte]]): Array[Byte] =
    if (pieces.isEmpty) null
    else if (pieces.length == 1) pieces.head
    else GeoGeom.writeMulti(GeoGeom.MultiPolygonType, pieces.toArray)

  /** Union over a part worklist: merge any pair whose regions meet until
    * no pair does (each merge of intersecting simple/holed polygons
    * yields ONE polygon, possibly holed, so the list only shrinks).
    * A pairwise union the stitcher refuses aborts the whole op — null,
    * never a wrong multi. */
  private def unionParts(parts0: Seq[Array[Byte]]): Array[Byte] = {
    val work = scala.collection.mutable.ArrayBuffer[Array[Byte]](parts0: _*)
    var merged = true
    var guard = parts0.length * parts0.length + 8
    while (merged && guard > 0) {
      merged = false; guard -= 1
      var i = 0
      while (i < work.length && !merged) {
        var j = i + 1
        while (j < work.length && !merged) {
          val d = GeoGeom.distance(work(i), work(j))
          if (d != null && d.doubleValue() == 0.0) {
            val u = union(work(i), work(j))
            if (u == null) return null
            val g = parse(u)
            if (g != null && g.kind == 3) {
              work(i) = u; work.remove(j); merged = true
            } // point-touch pairs legitimately stay two members: skip
          }
          j += 1
        }
        i += 1
      }
    }
    assembleParts(work.toSeq)
  }

  /** Members of a set-op operand grouped by dimension: (polygonal,
    * line, point). Multi* members expand one level; nested collections
    * and curves → null. Single geometries are their own one-member
    * group, so the mixed paths accept any operand pairing. */
  private def mixedMembers(g: Geom): (Array[Geom], Array[Geom], Array[Geom]) = {
    val polys = scala.collection.mutable.ArrayBuffer[Geom]()
    val lines = scala.collection.mutable.ArrayBuffer[Geom]()
    val pts = scala.collection.mutable.ArrayBuffer[Geom]()
    def add(m: Geom): Boolean = m != null && (m.kind match {
      case 1 => pts += m; true
      case 2 => lines += m; true
      case 3 => polys += m; true
      case 4 | 5 | 6 => m.parts != null && m.parts.forall(add)
      case _ => false
    })
    val ok = g.kind match {
      case 1 | 2 | 3 => add(g)
      case 4 | 5 | 6 | 7 => g.parts != null && g.parts.nonEmpty && g.parts.forall(add)
      case _ => false
    }
    if (!ok) null else (polys.toArray, lines.toArray, pts.toArray)
  }

  /** Assemble a set-op result from an areal part plus surviving line and
    * point members, in the GEOS output convention: a single surviving
    * dimension class keeps its natural kind (POLYGON/MULTIPOLYGON,
    * LINESTRING/MULTILINESTRING, POINT/MULTIPOINT); mixed dimensions
    * become a GEOMETRYCOLLECTION with the areal part's polygons as
    * individual members. All-empty → null (empty-result convention). */
  private def assembleMixed(arealB: Array[Byte], lines: Seq[Array[Byte]],
      pts: Seq[Array[Byte]]): Array[Byte] = {
    val arealMembers: Seq[Array[Byte]] =
      if (arealB == null) Nil
      else parse(arealB) match {
        case g if g != null && g.kind == 6 => g.parts.map(GeoGeom.write).toSeq
        case _ => Seq(arealB)
      }
    (arealMembers.nonEmpty, lines.nonEmpty, pts.nonEmpty) match {
      case (true, false, false) => arealB
      case (false, true, false) =>
        if (lines.length == 1) lines.head
        else GeoGeom.writeMulti(GeoGeom.MultiLineType, lines.toArray)
      case (false, false, true) =>
        if (pts.length == 1) pts.head
        else GeoGeom.writeMulti(GeoGeom.MultiPointType, pts.toArray)
      case (false, false, false) => null
      case _ => GeoGeom.writeMulti(GeoGeom.CollectionType,
        (arealMembers ++ lines ++ pts).toArray)
    }
  }

  /** Split a polyline at every crossing with a ring set and bucket the
    * sub-pieces by side (round 9 second pass — closes line/areal
    * partial-overlap set-ops for ARBITRARY polygons, superseding the
    * convex-only clip): each segment collects intersection parameters
    * against every ring edge (crossings; collinear edge-overlaps
    * contribute the edge's projected endpoints, and those boundary-
    * riding midpoints classify as inside the CLOSED region), splits at
    * the sorted parameters, and each sub-piece lands inside or outside
    * by its midpoint's even-odd test. Consecutive same-side pieces
    * re-chain, so clean LINESTRING runs come back out. */
  private def splitLineByRings(line: Array[Double], rings: Array[Array[Double]])
      : (Seq[Array[Double]], Seq[Array[Double]]) = {
    val inB = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val outB = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    def push(buf: scala.collection.mutable.ArrayBuffer[Array[Double]],
        x0: Double, y0: Double, x1: Double, y1: Double): Unit =
      if (buf.nonEmpty && buf.last(buf.last.length - 2) == x0 && buf.last.last == y0)
        buf(buf.length - 1) = buf.last ++ Array(x1, y1) // extend the run
      else buf += Array(x0, y0, x1, y1)
    var i = 0
    while (i + 3 < line.length) {
      val ax = line(i); val ay = line(i + 1); val bx = line(i + 2); val by = line(i + 3)
      if (!(ax == bx && ay == by)) {
        val d1x = bx - ax; val d1y = by - ay
        val ts = scala.collection.mutable.ArrayBuffer[Double](0.0, 1.0)
        for (ring <- rings) {
          val m = ring.length / 2
          var j = 0
          while (j < m - 1) {
            val cx = ring(j * 2); val cy = ring(j * 2 + 1)
            val dx2 = ring(j * 2 + 2) - cx; val dy2 = ring(j * 2 + 3) - cy
            val den = d1x * dy2 - d1y * dx2
            if (den != 0.0) {
              val t = ((cx - ax) * dy2 - (cy - ay) * dx2) / den
              val u = ((cx - ax) * d1y - (cy - ay) * d1x) / den
              if (t > 0 && t < 1 && u >= 0 && u <= 1) ts += t
            } else {
              // parallel; if collinear, the edge endpoints bound a
              // boundary-riding stretch of the line
              val cross = (cx - ax) * d1y - (cy - ay) * d1x
              if (cross == 0.0) {
                val len2 = d1x * d1x + d1y * d1y
                for ((ex, ey) <- Seq((cx, cy), (ring(j * 2 + 2), ring(j * 2 + 3)))) {
                  val t = ((ex - ax) * d1x + (ey - ay) * d1y) / len2
                  if (t > 0 && t < 1) ts += t
                }
              }
            }
            j += 1
          }
        }
        val st = ts.distinct.sorted
        var s2 = 0
        while (s2 < st.length - 1) {
          val t0 = st(s2); val t1 = st(s2 + 1)
          if (t1 > t0) {
            val x0 = ax + t0 * d1x; val y0 = ay + t0 * d1y
            val x1 = ax + t1 * d1x; val y1 = ay + t1 * d1y
            val mx = ax + (t0 + t1) / 2 * d1x; val my = ay + (t0 + t1) / 2 * d1y
            if (GeoGeom.pointInRings(mx, my, rings)) push(inB, x0, y0, x1, y1)
            else push(outB, x0, y0, x1, y1)
          }
          s2 += 1
        }
      }
      i += 2
    }
    (inB.toSeq, outB.toSeq)
  }

  /** line ∩ line (round 9 second pass): collinear overlap intervals
    * merge and chain into the 1-dim portion; isolated crossing /
    * touch points not subsumed by an overlap piece come back as the
    * 0-dim portion (POINT / MULTIPOINT, or a GEOMETRYCOLLECTION when
    * both dimensions survive — the GEOS convention). No contact →
    * null (empty-result convention). */
  private def lineLineIntersection(la: Array[Double], lb: Array[Double]): Array[Byte] =
    chainsContact(Seq(la), Seq(lb))

  /** Contact set of two chain families (polylines or polygon ring
    * boundaries): the same interval/crossing arithmetic as line ∩ line,
    * run over every chain pair. This is also polygon ∩ polygon for
    * TOUCH-ONLY pairs (round 9 third pass — shared edges come back as
    * noded lines, corner contacts as points, instead of null). */
  private def chainsContact(las: Seq[Array[Double]], lbs: Seq[Array[Double]]): Array[Byte] = {
    val pieces = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val touches = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    for (la <- las; lb <- lbs) {
    var i = 0
    while (i + 3 < la.length) {
      val ax = la(i); val ay = la(i + 1); val bx = la(i + 2); val by = la(i + 3)
      val d1x = bx - ax; val d1y = by - ay
      if (!(d1x == 0 && d1y == 0)) {
        var j = 0
        while (j + 3 < lb.length) {
          val cx = lb(j); val cy = lb(j + 1); val dx = lb(j + 2); val dy = lb(j + 3)
          val d2x = dx - cx; val d2y = dy - cy
          val den = d1x * d2y - d1y * d2x
          if (den != 0.0) {
            val t = ((cx - ax) * d2y - (cy - ay) * d2x) / den
            val u = ((cx - ax) * d1y - (cy - ay) * d1x) / den
            if (t >= 0 && t <= 1 && u >= 0 && u <= 1)
              touches += ((ax + t * d1x, ay + t * d1y))
          } else if ((cx - ax) * d1y - (cy - ay) * d1x == 0.0) {
            // collinear: overlap interval on a's parameter
            val len2 = d1x * d1x + d1y * d1y
            val tc = ((cx - ax) * d1x + (cy - ay) * d1y) / len2
            val td = ((dx - ax) * d1x + (dy - ay) * d1y) / len2
            val t0 = math.max(0.0, math.min(tc, td))
            val t1 = math.min(1.0, math.max(tc, td))
            if (t1 > t0)
              pieces += Array(ax + t0 * d1x, ay + t0 * d1y, ax + t1 * d1x, ay + t1 * d1y)
            else if (t1 == t0) touches += ((ax + t0 * d1x, ay + t0 * d1y))
          }
          j += 2
        }
      }
      i += 2
    }
    }
    // point contacts subsumed by an overlap piece are not separate
    // components; the isolated ones are the 0-dim portion
    val isolated = scala.collection.mutable.LinkedHashSet[(Double, Double)]()
    for ((px, py) <- touches)
      if (!pieces.exists(p => GeoGeom.onSegment(px, py, p(0), p(1), p(2), p(3))))
        isolated += ((px, py))
    val ptBytes = isolated.toSeq.map { case (px, py) => GeoWkb.writePoint(px, py) }
    if (pieces.isEmpty) {
      if (ptBytes.isEmpty) null // truly empty
      else if (ptBytes.length == 1) ptBytes.head
      else GeoGeom.writeMulti(GeoGeom.MultiPointType, ptBytes.toArray)
    } else {
      val u = lineUnion(pieces.toSeq)
      if (u == null) null
      else if (ptBytes.isEmpty) u
      else {
        val lineMembers = parse(u) match {
          case g if g != null && g.kind == 2 => Seq(u)
          case g if g != null && g.kind == 5 => g.rings.map(GeoGeom.writeLine).toSeq
          case _ => return null
        }
        GeoGeom.writeMulti(GeoGeom.CollectionType, (lineMembers ++ ptBytes).toArray)
      }
    }
  }

  /** line − lines (round 9 second pass): subtract the collinear-overlap
    * intervals of every subtrahend segment from each minuend segment —
    * crossings and touches are measure-zero and vanish under closure,
    * so only 1-dim overlaps cut. Exact interval arithmetic on the
    * segment parameter; fully-covered → null (empty). */
  private def lineLineDifference(la: Array[Double],
      lbs: Seq[Array[Double]]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    def push(x0: Double, y0: Double, x1: Double, y1: Double): Unit =
      if (out.nonEmpty && out.last(out.last.length - 2) == x0 && out.last.last == y0)
        out(out.length - 1) = out.last ++ Array(x1, y1)
      else out += Array(x0, y0, x1, y1)
    var i = 0
    while (i + 3 < la.length) {
      val ax = la(i); val ay = la(i + 1); val bx = la(i + 2); val by = la(i + 3)
      val d1x = bx - ax; val d1y = by - ay
      if (!(d1x == 0 && d1y == 0)) {
        val len2 = d1x * d1x + d1y * d1y
        val cuts = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
        for (lb <- lbs) {
          var j = 0
          while (j + 3 < lb.length) {
            val cx = lb(j); val cy = lb(j + 1); val dx = lb(j + 2); val dy = lb(j + 3)
            val d2x = dx - cx; val d2y = dy - cy
            if (d1x * d2y - d1y * d2x == 0.0 &&
                (cx - ax) * d1y - (cy - ay) * d1x == 0.0) {
              val tc = ((cx - ax) * d1x + (cy - ay) * d1y) / len2
              val td = ((dx - ax) * d1x + (dy - ay) * d1y) / len2
              val t0 = math.max(0.0, math.min(tc, td))
              val t1 = math.min(1.0, math.max(tc, td))
              if (t1 > t0) cuts += ((t0, t1))
            }
            j += 2
          }
        }
        // merge cut intervals, emit the complement within [0,1]
        val sorted = cuts.sortBy(_._1)
        var pos = 0.0
        for ((c0, c1) <- sorted) {
          if (c0 > pos) push(ax + pos * d1x, ay + pos * d1y, ax + c0 * d1x, ay + c0 * d1y)
          pos = math.max(pos, c1)
        }
        if (pos < 1.0) push(ax + pos * d1x, ay + pos * d1y, bx, by)
      }
      i += 2
    }
    writeChains(out.toSeq) // empty (fully covered) → null
  }

  private def writeChains(chains: Seq[Array[Double]]): Array[Byte] =
    if (chains.isEmpty) null
    else if (chains.length == 1) GeoGeom.writeLine(chains.head)
    else GeoGeom.writeMulti(GeoGeom.MultiLineType, chains.map(GeoGeom.writeLine).toArray)

  /** Union of LINE members with NODING (round 9 second pass — closes
    * the "overlapping/crossing line pairs → null" class): every segment
    * splits at its intersections with every other — proper crossings
    * and T-junctions (the split point is computed ONCE per pair, so
    * both sides share the identical coordinates), and collinear
    * overlaps (split at each other's endpoint values, so the duplicated
    * overlap sub-segments collapse exactly) — then the noded pieces
    * re-join only through degree-2 vertices, the GEOS union convention
    * (crossings stay 4 arms; a polyline's own interior vertices merge
    * back). Output LINESTRING when one chain remains, MULTILINESTRING
    * otherwise; empty input → null. */
  private def lineUnion(lines0: Seq[Array[Double]]): Array[Byte] = {
    val segs = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    for (l <- lines0) {
      var i = 0
      while (i + 3 < l.length) {
        if (!(l(i) == l(i + 2) && l(i + 1) == l(i + 3)))
          segs += Array(l(i), l(i + 1), l(i + 2), l(i + 3))
        i += 2
      }
    }
    if (segs.isEmpty) return null
    val splits = Array.fill(segs.length)(
      scala.collection.mutable.ArrayBuffer[(Double, Double, Double)]())
    var i = 0
    while (i < segs.length) {
      var j = i + 1
      while (j < segs.length) {
        val a = segs(i); val b = segs(j)
        val d1x = a(2) - a(0); val d1y = a(3) - a(1)
        val d2x = b(2) - b(0); val d2y = b(3) - b(1)
        val den = d1x * d2y - d1y * d2x
        if (den != 0.0) {
          val t = ((b(0) - a(0)) * d2y - (b(1) - a(1)) * d2x) / den
          val u = ((b(0) - a(0)) * d1y - (b(1) - a(1)) * d1x) / den
          if (t >= 0 && t <= 1 && u >= 0 && u <= 1) {
            // one canonical point for the pair — both sides node HERE
            val px = a(0) + t * d1x; val py = a(1) + t * d1y
            if (t > 0 && t < 1) splits(i) += ((t, px, py))
            if (u > 0 && u < 1) splits(j) += ((u, px, py))
          }
        } else {
          val cx = (b(0) - a(0)) * d1y - (b(1) - a(1)) * d1x
          if (cx == 0.0) { // collinear: split each at the other's endpoints
            val len1 = d1x * d1x + d1y * d1y
            val len2 = d2x * d2x + d2y * d2y
            for ((bx, by) <- Seq((b(0), b(1)), (b(2), b(3)))) {
              val t = ((bx - a(0)) * d1x + (by - a(1)) * d1y) / len1
              if (t > 0 && t < 1) splits(i) += ((t, bx, by))
            }
            for ((ax, ay) <- Seq((a(0), a(1)), (a(2), a(3)))) {
              val u = ((ax - b(0)) * d2x + (ay - b(1)) * d2y) / len2
              if (u > 0 && u < 1) splits(j) += ((u, ax, ay))
            }
          }
        }
        j += 1
      }
      i += 1
    }
    // cut each segment at its sorted split points; drop empty slivers
    val pieces = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    i = 0
    while (i < segs.length) {
      val a = segs(i)
      var cx = a(0); var cy = a(1)
      for ((_, px, py) <- splits(i).sortBy(_._1)) {
        if (!(px == cx && py == cy)) { pieces += Array(cx, cy, px, py); cx = px; cy = py }
      }
      if (!(a(2) == cx && a(3) == cy)) pieces += Array(cx, cy, a(2), a(3))
      i += 1
    }
    // orientation-normalized dedupe collapses collinear-overlap copies
    val seen = scala.collection.mutable.HashSet[(Double, Double, Double, Double)]()
    val uniq = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    for (p <- pieces) {
      val fwd = (p(0), p(1)) // lexicographic endpoint order
      val rev = (p(2), p(3))
      val k = if (fwd._1 < rev._1 || (fwd._1 == rev._1 && fwd._2 <= rev._2))
        (p(0), p(1), p(2), p(3)) else (p(2), p(3), p(0), p(1))
      if (seen.add(k)) uniq += p
    }
    // chain pieces back through DEGREE-2 vertices only
    val adj = scala.collection.mutable.Map[(Double, Double),
      scala.collection.mutable.ArrayBuffer[Int]]()
    for (pi <- uniq.indices; e <- Seq((uniq(pi)(0), uniq(pi)(1)), (uniq(pi)(2), uniq(pi)(3))))
      adj.getOrElseUpdate(e, scala.collection.mutable.ArrayBuffer()) += pi
    val used = Array.fill(uniq.length)(false)
    val out = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    for (start <- uniq.indices if !used(start)) {
      used(start) = true
      val chain = scala.collection.mutable.ArrayBuffer[Double](
        uniq(start)(0), uniq(start)(1), uniq(start)(2), uniq(start)(3))
      def grow(fromEnd: Boolean): Unit = {
        var go = true
        while (go) {
          go = false
          val (ex, ey) = if (fromEnd) (chain(chain.length - 2), chain.last)
            else (chain(0), chain(1))
          val here = adj((ex, ey))
          if (here.length == 2) {
            val next = here.find(pi => !used(pi))
            next.foreach { pi =>
              used(pi) = true
              val p = uniq(pi)
              val (nx, ny) = if (p(0) == ex && p(1) == ey) (p(2), p(3)) else (p(0), p(1))
              if (fromEnd) { chain += nx; chain += ny }
              else { chain.insert(0, ny); chain.insert(0, nx) }
              go = true
            }
          }
        }
      }
      grow(fromEnd = true); grow(fromEnd = false)
      out += chain.toArray
    }
    if (out.length == 1) GeoGeom.writeLine(out(0))
    else GeoGeom.writeMulti(GeoGeom.MultiLineType, out.map(GeoGeom.writeLine).toArray)
  }

  /** Mixed-dimension union (round 9): polygonal members union through
    * the part-merge worklist; line members are absorbed when the closed
    * areal region covers them, pass through when disjoint from it and
    * from each other (overlapping/crossing line pairs need noding →
    * null); point members are absorbed by any member at distance 0
    * (exact for points) and deduplicate exactly. OGC dimension rules,
    * null-never-wrong outside them. */
  private def mixedUnion(a: Geom, b: Geom): Array[Byte] = {
    val ma = mixedMembers(a); val mb = mixedMembers(b)
    if (ma == null || mb == null) return null
    val polys = ma._1 ++ mb._1
    val arealB: Array[Byte] =
      if (polys.isEmpty) null
      else if (polys.length == 1) GeoGeom.write(polys(0))
      else {
        val u = unionParts(polys.map(GeoGeom.write).toSeq)
        if (u == null) return null
        u
      }
    val survivors = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val arealRings = if (arealB == null) null else parse(arealB).rings
    for (l0 <- ma._2 ++ mb._2) {
      if (arealRings == null) survivors += l0.rings(0)
      else
        // covered stretches absorb into the closed areal region; the
        // outside stretches ride on (round 9 second pass — partial
        // overlap splits instead of nulling)
        survivors ++= splitLineByRings(l0.rings(0), arealRings)._2
    }
    // line/line interactions NODE (round 9 second pass): crossings,
    // T-junctions and collinear overlaps union through [[lineUnion]]
    val keptL: Seq[Array[Byte]] =
      if (survivors.isEmpty) Nil
      else if (survivors.length == 1) Seq(GeoGeom.writeLine(survivors(0)))
      else {
        val u = lineUnion(survivors.toSeq)
        if (u == null) return null
        parse(u) match {
          case g if g != null && g.kind == 2 => Seq(u)
          case g if g != null && g.kind == 5 => g.rings.map(GeoGeom.writeLine).toSeq
          case _ => return null
        }
      }
    val keptP = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    for (p0 <- ma._3 ++ mb._3) {
      val p = GeoGeom.write(p0)
      var absorbed = false
      if (arealB != null) {
        val d = GeoGeom.distance(arealB, p)
        if (d != null && d.doubleValue() == 0.0) absorbed = true
      }
      for (l <- keptL; if !absorbed) {
        val d = GeoGeom.distance(l, p)
        if (d != null && d.doubleValue() == 0.0) absorbed = true
      }
      if (!absorbed && !keptP.exists(o => java.util.Arrays.equals(o, p))) keptP += p
    }
    assembleMixed(arealB, keptL.toSeq, keptP.toSeq)
  }

  /** Mixed-dimension difference (round 9). The subtrahend's interior is
    * its polygonal part alone, so that region subtracts from polygonal
    * minuend pieces through the existing machinery; minuend lines keep
    * (disjoint) / drop (covered by the closed region — a boundary-lying
    * line is removed exactly) / null (partial); minuend points drop at
    * distance 0 to ANY subtrahend member (closed-set semantics, exact)
    * and keep otherwise. Zero-measure subtrahend members never change
    * line or areal minuend pieces (closure restores removed interior
    * points) — except collinear line-on-line overlap, which nulls. */
  private def mixedDifference(a: Geom, b: Geom): Array[Byte] = {
    val ma = mixedMembers(a); val mb = mixedMembers(b)
    if (ma == null || mb == null) return null
    // dissolve each side's polygonal members first: COLLECTION members
    // carry no disjoint-interior guarantee, and the piecewise subtract
    // below assumes one (a stitcher-refused merge aborts — null, never
    // a double-counted remainder)
    val bPolyB: Array[Byte] =
      if (mb._1.isEmpty) null
      else if (mb._1.length == 1) GeoGeom.write(mb._1(0))
      else {
        val u = unionParts(mb._1.map(GeoGeom.write).toSeq)
        if (u == null) return null
        u
      }
    val arealB: Array[Byte] =
      if (ma._1.isEmpty) null
      else {
        val aPolyB =
          if (ma._1.length == 1) GeoGeom.write(ma._1(0))
          else {
            val u = unionParts(ma._1.map(GeoGeom.write).toSeq)
            if (u == null) return null
            u
          }
        if (bPolyB == null) aPolyB
        else {
          val r = difference(aPolyB, bPolyB)
          if (r == null) {
            // null is only acceptable when provably consumed (empty)
            val c = GeoGeom.contains(bPolyB, aPolyB)
            if (c == null || !c.booleanValue()) return null
          }
          r
        }
      }
    val keptL = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val bPolyRings = if (bPolyB == null) null else parse(bPolyB).rings
    for (l0 <- ma._2) {
      // the polygonal subtrahend cuts away the covered stretches (round
      // 9 second pass — partial overlap splits instead of nulling)
      val base: Seq[Array[Double]] =
        if (bPolyRings == null) Seq(l0.rings(0))
        else splitLineByRings(l0.rings(0), bPolyRings)._2
      for (p <- base) {
        if (mb._2.isEmpty) keptL += GeoGeom.writeLine(p)
        else {
          // subtrahend line members cut their collinear overlaps
          // exactly; crossings are measure-zero and vanish under
          // closure — null here means fully covered (dropped)
          val r = lineLineDifference(p, mb._2.map(_.rings(0)).toSeq)
          if (r != null) parse(r) match {
            case g if g != null && g.kind == 2 => keptL += r
            case g if g != null && g.kind == 5 =>
              g.rings.foreach(rr => keptL += GeoGeom.writeLine(rr))
            case _ => return null
          }
        }
      }
    }
    val bMembersB = (mb._1 ++ mb._2 ++ mb._3).map(GeoGeom.write)
    val keptP = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    for (p0 <- ma._3) {
      val p = GeoGeom.write(p0)
      var dropped = false
      for (bm <- bMembersB; if !dropped) {
        val d = GeoGeom.distance(bm, p)
        if (d != null && d.doubleValue() == 0.0) dropped = true
      }
      if (!dropped && !keptP.exists(o => java.util.Arrays.equals(o, p))) keptP += p
    }
    assembleMixed(arealB, keptL.toSeq, keptP.toSeq)
  }

  /** Mixed-dimension intersection (round 9): member-wise over the cross
    * product (collection members carry the same interior-disjoint
    * convention the all-polygon branch already assumes); every pair must
    * intersect exactly computably or be provably empty — poly-poly
    * touch-only pairs contribute nothing, matching the all-polygon
    * branch's convention; any other ambiguous contact aborts. Surviving
    * pieces regroup by dimension through [[assembleMixed]]. */
  private def mixedIntersection(a: Geom, b: Geom): Array[Byte] = {
    val ma = mixedMembers(a); val mb = mixedMembers(b)
    if (ma == null || mb == null) return null
    val polysOut = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val linesOut = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val ptsOut = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val aKinds = ma._1 ++ ma._2 ++ ma._3
    val aBytes = aKinds.map(GeoGeom.write)
    val bKinds = mb._1 ++ mb._2 ++ mb._3
    val bBytes = bKinds.map(GeoGeom.write)
    for (xi <- aKinds.indices; yi <- bKinds.indices) {
      val x = aKinds(xi); val y = bKinds(yi)
      val xB = aBytes(xi); val yB = bBytes(yi)
      val r = intersection(xB, yB)
      if (r == null) {
        val d = GeoGeom.distance(xB, yB)
        if (d == null) return null
        if (d.doubleValue() == 0.0) {
          val t = if (x.kind == 3 && y.kind == 3) touches(xB, yB) else null
          if (t == null || !t.booleanValue()) return null
        }
      } else parse(r) match {
        case g if g != null && g.kind == 3 => polysOut += r
        case g if g != null && g.kind == 6 =>
          g.parts.foreach(p => polysOut += GeoGeom.write(p))
        case g if g != null && g.kind == 2 => linesOut += r
        case g if g != null && g.kind == 1 =>
          if (!ptsOut.exists(o => java.util.Arrays.equals(o, r))) ptsOut += r
        case g if g != null && (g.kind == 4 || g.kind == 5 || g.kind == 7) =>
          // multi / mixed pair result (line∩line 0/1-dim portions):
          // decompose into the dimension buckets
          g.parts.foreach { m =>
            val mB = GeoGeom.write(m)
            m.kind match {
              case 1 => if (!ptsOut.exists(o => java.util.Arrays.equals(o, mB))) ptsOut += mB
              case 2 => linesOut += mB
              case 3 => polysOut += mB
              case _ => return null
            }
          }
        case _ => return null
      }
    }
    // dissolve the polygonal pieces through the union worklist: members
    // of a COLLECTION operand carry no OGC disjoint-interior guarantee
    // (unlike MULTIPOLYGON), so pieces from overlapping members must
    // merge — assembling them raw would double-count area
    assembleMixed(
      if (polysOut.isEmpty) null
      else { val u = unionParts(polysOut.toSeq); if (u == null) return null; u },
      linesOut.toSeq, ptsOut.toSeq)
  }

  /** GeoUnion (geospatial.py:195). Polygon ∪ polygon — holed operands
    * included since round 7 (the even-odd classifiers and the stitcher
    * were already ring-set-general; orientation normalization makes the
    * keep rules uniform: a B piece plugging A's hole drops the covered
    * hole edges and the hole shrinks or fills exactly); MULTIPOLYGON /
    * polygonal-collection operands decompose into a part-merge worklist.
    * Plus point ∪ point → MULTIPOINT. Unsupported shapes → null. */
  def union(aB: Array[Byte], bB: Array[Byte]): Array[Byte] = {
    val a = parse(aB); val b = parse(bB)
    if (a == null || b == null) return null
    if (a.kind == 1 && b.kind == 1) {
      return if (java.util.Arrays.equals(asBinary(aB), asBinary(bB))) asBinary(aB)
      else GeoGeom.writeMulti(GeoGeom.MultiPointType, Array(asBinary(aB), asBinary(bB)))
    }
    if (a.kind != 3 || b.kind != 3) {
      val pa = polyParts(a); val pb = polyParts(b)
      // non-polygonal / mixed-dimension members (round 9) take the
      // dimension-grouped path
      if (pa == null || pb == null) return mixedUnion(a, b)
      return unionParts((pa ++ pb).map(GeoGeom.write).toSeq)
    }
    val ra = orientedRings(a); val rb = orientedRings(b)
    if (ra == null || rb == null) return null
    val d = GeoGeom.distance(aB, bB)
    if (d != null && d.doubleValue() > 0.0) // disjoint: exact multipolygon
      return GeoGeom.writeMulti(GeoGeom.MultiPolygonType,
        Array(GeoGeom.writePolygon(ra), GeoGeom.writePolygon(rb)))
    val abIn = GeoGeom.contains(aB, bB); val baIn = GeoGeom.contains(bB, aB)
    if (abIn != null && abIn.booleanValue()) return GeoGeom.writePolygon(ra)
    if (baIn != null && baIn.booleanValue()) return GeoGeom.writePolygon(rb)
    val keep = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    ra.foreach(ring => splitEdges(ring, rb).foreach { s =>
      val mx = (s(0) + s(2)) / 2.0; val my = (s(1) + s(3)) / 2.0
      if (onAnyBoundary(mx, my, rb)) {
        // collinear overlap: A's interior is left of the directed edge
        // (interior-on-left normalization). Same-side interiors (bottom
        // edges of two overlapping rectangles) → the edge stays union
        // boundary, kept from the A side only; opposite sides (touching
        // faces) → interior, drop.
        if (interiorSide(s, ra, rb)) keep += s
      } else if (!strictlyInside(mx, my, rb)) keep += s
    })
    rb.foreach(ring => splitEdges(ring, ra).foreach { s =>
      val mx = (s(0) + s(2)) / 2.0; val my = (s(1) + s(3)) / 2.0
      if (!strictlyInside(mx, my, ra) && !onAnyBoundary(mx, my, ra)) keep += s
    })
    stitchRings(keep.toSeq).map(assemblePolys).orNull
  }

  /** For a directed sub-edge with interior-on-left lying ON `other`'s
    * boundary: true iff `other`'s interior is locally on the edge's left
    * (interior) side too — probed by nudging the midpoint toward the left
    * normal (even-odd over the full ring set, so holes classify). */
  private def interiorSide(s: Array[Double], self: Array[Array[Double]],
      other: Array[Array[Double]]): Boolean = {
    val dx = s(2) - s(0); val dy = s(3) - s(1)
    val len = math.sqrt(dx * dx + dy * dy)
    if (len == 0.0) return false
    val mx = (s(0) + s(2)) / 2.0; val my = (s(1) + s(3)) / 2.0
    val eps = 1e-7 * math.max(1.0, math.max(math.abs(mx), math.abs(my)))
    val px = mx - dy / len * eps; val py = my + dx / len * eps
    GeoGeom.pointInRings(px, py, other)
  }

  /** GeoDifference (geospatial.py:433): A − B. Polygon − polygon — holed
    * operands included since round 7: a fully-interior B shell becomes a
    * hole, B's own holes resurface as ISLANDS (the orientation flip turns
    * a CW hole ring into a CCW shell), a splitting B yields a
    * MULTIPOLYGON. A − lower-dimension geometry = A (area unchanged);
    * point/line minuends only when disjoint from B. Empty result or
    * unsupported shape → null. */
  def difference(aB: Array[Byte], bB: Array[Byte]): Array[Byte] = {
    val a = parse(aB); val b = parse(bB)
    if (a == null || b == null) return null
    if (a.kind != 3 && polyParts(a) == null) {
      // multi/collection minuends (incl. mixed dimensions, round 9)
      // subtract member-wise
      if (a.kind >= 4) return mixedDifference(a, b)
      // line minus a polygonal subtrahend: keep the outside stretches
      // (round 9 second pass — partial overlap no longer nulls)
      if (a.kind == 2 && (b.kind == 3 || b.kind == 6))
        return writeChains(splitLineByRings(a.rings(0), b.rings)._2)
      // line minus line(s): collinear overlaps cut exactly; crossings
      // are measure-zero and vanish under closure
      if (a.kind == 2 && b.kind == 2)
        return lineLineDifference(a.rings(0), Seq(b.rings(0)))
      if (a.kind == 2 && b.kind == 5)
        return lineLineDifference(a.rings(0), b.rings.toSeq)
      // single point/line minuend vs anything else: identity when
      // disjoint, else GEOS territory
      val d = GeoGeom.distance(aB, bB)
      return if (d != null && d.doubleValue() > 0.0) asBinary(aB)
      else if (a.kind == 1) null // point inside/on b: empty
      else null
    }
    if (b.kind == 1 || b.kind == 2) return asBinary(aB) // zero-area subtrahend
    if (a.kind != 3 || b.kind != 3) {
      // multi-part sides: subtract every B part from every surviving A
      // piece; a null step is only acceptable when provably EMPTY
      // (contains), otherwise the whole op aborts — null, never wrong
      val pa = polyParts(a); val pb = polyParts(b)
      // mixed-dimension subtrahend (round 9): only its polygonal part
      // has interior — the grouped path handles it
      if (pa == null || pb == null) return mixedDifference(a, b)
      var pieces = pa.map(GeoGeom.write).toSeq
      var bi = 0
      while (bi < pb.length) {
        val bpB = GeoGeom.write(pb(bi))
        val next = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
        var pi = 0
        while (pi < pieces.length) {
          val p = pieces(pi)
          val r = difference(p, bpB)
          if (r == null) {
            val consumed = GeoGeom.contains(bpB, p)
            if (consumed == null || !consumed.booleanValue()) return null
          } else parse(r) match {
            case g if g != null && g.kind == 3 => next += r
            case g if g != null && g.kind == 6 => g.parts.foreach(pt => next += GeoGeom.write(pt))
            case _ => return null
          }
          pi += 1
        }
        pieces = next.toSeq
        bi += 1
      }
      return assembleParts(pieces)
    }
    val ra = orientedRings(a); val rb = orientedRings(b)
    if (ra == null || rb == null) return null
    val d = GeoGeom.distance(aB, bB)
    if (d != null && d.doubleValue() > 0.0) return GeoGeom.writePolygon(ra)
    val baIn = GeoGeom.contains(bB, aB)
    if (baIn != null && baIn.booleanValue()) return null // A ⊆ B: empty
    val abIn = GeoGeom.contains(aB, bB)
    val bTouchesABoundary =
      ra.exists(_.grouped(2).exists(p => onAnyBoundary(p(0), p(1), rb))) ||
      rb.exists(_.grouped(2).exists(p => onAnyBoundary(p(0), p(1), ra)))
    if (abIn != null && abIn.booleanValue() && !bTouchesABoundary)
      // interior bite: B's shell becomes a hole, B's holes become islands
      return assemblePolys(ra ++ rb.map(reverseRing))
    val keep = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    ra.foreach(ring => splitEdges(ring, rb).foreach { s =>
      val mx = (s(0) + s(2)) / 2.0; val my = (s(1) + s(3)) / 2.0
      if (onAnyBoundary(mx, my, rb)) {
        // collinear overlap: kept iff the interiors sit on OPPOSITE sides
        // (B pokes outward there, so the A boundary survives subtraction)
        if (!interiorSide(s, ra, rb)) keep += s
      } else if (!strictlyInside(mx, my, rb)) keep += s
    })
    rb.foreach(ring => splitEdges(ring, ra).foreach { s =>
      val mx = (s(0) + s(2)) / 2.0; val my = (s(1) + s(3)) / 2.0
      if (strictlyInside(mx, my, ra)) keep += Array(s(2), s(3), s(0), s(1)) // reversed
    })
    stitchRings(keep.toSeq).map(assemblePolys).orNull
  }

  /** GeoConvexHull: Andrew's monotone chain over every vertex of any
    * geometry kind (Multi* included — the flattened ring set is exactly
    * the point cloud). Degenerate outputs follow PostGIS: a single point
    * → POINT, collinear points → LINESTRING between the extremes,
    * otherwise a CCW closed POLYGON ring. */
  def convexHull(bytes: Array[Byte]): Array[Byte] = {
    val g = parse(bytes)
    if (g == null) return null
    val pts = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    g.rings.foreach { r =>
      var i = 0
      while (i < r.length) { pts += ((r(i), r(i + 1))); i += 2 }
    }
    val u = pts.distinct.sortBy(p => (p._1, p._2)).toSeq
    if (u.isEmpty) return null
    if (u.length == 1) return GeoWkb.writePoint(u(0)._1, u(0)._2)
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)) =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def chain(ps: Seq[(Double, Double)]): Seq[(Double, Double)] = {
      val h = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
      ps.foreach { p =>
        while (h.length >= 2 && cross(h(h.length - 2), h(h.length - 1), p) <= 0.0)
          h.remove(h.length - 1)
        h += p
      }
      h.toSeq
    }
    val lower = chain(u)
    val upper = chain(u.reverse)
    val hull = (lower.dropRight(1) ++ upper.dropRight(1))
    if (hull.length < 3) { // collinear: extreme-to-extreme line
      return GeoGeom.writeLine(Array(u.head._1, u.head._2, u.last._1, u.last._2))
    }
    val flat = new Array[Double]((hull.length + 1) * 2)
    hull.zipWithIndex.foreach { case ((x, y), i) => flat(i * 2) = x; flat(i * 2 + 1) = y }
    flat(hull.length * 2) = hull.head._1; flat(hull.length * 2 + 1) = hull.head._2
    GeoGeom.writePolygon(Array(flat))
  }

  /** GeoUnaryUnion (geospatial.py:186): left fold of [[union]] over a
    * collection's members (or the geometry itself if not a collection).
    * Null as soon as any pairwise union is outside the supported subset. */
  def unaryUnion(bytes: Array[Byte]): Array[Byte] = {
    val g = parse(bytes)
    if (g == null) return null
    if (g.parts == null || g.parts.length == 0) return asBinary(bytes)
    var acc = GeoGeom.write(g.parts(0))
    var i = 1
    while (i < g.parts.length) {
      acc = union(acc, GeoGeom.write(g.parts(i)))
      if (acc == null) return null
      i += 1
    }
    acc
  }

  /** GeoLineMerge (geospatial.py:131): join MULTILINESTRING members at
    * shared endpoints (degree-2 nodes, either orientation) into maximal
    * linestrings — LINESTRING when one piece remains, MULTILINESTRING
    * otherwise. Non-line input → null. */
  def lineMerge(bytes: Array[Byte]): Array[Byte] = {
    val g = parse(bytes)
    if (g == null) return null
    if (g.kind == 2) return GeoGeom.writeLine(g.rings(0))
    if (g.kind != 5) return null
    val pieces = scala.collection.mutable.ArrayBuffer[Array[Double]](g.rings: _*)
    def key(x: Double, y: Double): (Long, Long) =
      (math.rint(x * 1e9).toLong, math.rint(y * 1e9).toLong)
    var merged = true
    while (merged) {
      merged = false
      var i = 0
      while (i < pieces.length && !merged) {
        var j = i + 1
        while (j < pieces.length && !merged) {
          val p = pieces(i); val q = pieces(j)
          val pEnd = key(p(p.length - 2), p(p.length - 1)); val pStart = key(p(0), p(1))
          val qStart = key(q(0), q(1)); val qEnd = key(q(q.length - 2), q(q.length - 1))
          val joined =
            if (pEnd == qStart) p ++ q.drop(2)
            else if (pEnd == qEnd) p ++ reverseLine(q).drop(2)
            else if (pStart == qEnd) q ++ p.drop(2)
            else if (pStart == qStart) reverseLine(q) ++ p.drop(2)
            else null
          if (joined != null) {
            pieces(i) = joined; pieces.remove(j); merged = true
          }
          j += 1
        }
        i += 1
      }
    }
    if (pieces.length == 1) GeoGeom.writeLine(pieces(0))
    else GeoGeom.writeMulti(GeoGeom.MultiLineType, pieces.map(GeoGeom.writeLine).toArray)
  }

  private def reverseLine(l: Array[Double]): Array[Double] = reverseRing(l)

  // ---- buffer / reprojection --------------------------------------------

  final val BufferSegs = 32

  /** ST_Buffer (geospatial.py:362). POINT → 32-gon disk (the quadrant
    * default of GEOS at quad_segs=8). LINESTRING / single-ring POLYGON
    * (round 7) → planar Minkowski offsetting with round joins: every
    * directed edge offsets r to its right, convex turns join with
    * circular arcs stepped at the same 32-gon pitch (so right-angle and
    * cap arcs keep closed-form areas), reflex turns trim to the
    * offset-line intersection — the Minkowski boundary's exact local
    * form. Multi-part / collection inputs buffer per part and union-fold.
    * The construction is exact while the offset boundary stays simple; a
    * global simplicity check rejects the rest (r beyond the local
    * feature size, loops that self-touch) with null, never a wrong
    * geometry. r <= 0, holed polygons → null. */
  def buffer(bytes: Array[Byte], r: Double): Array[Byte] = {
    if (r <= 0.0) return null
    val g = parse(bytes)
    if (g == null) return null
    g.kind match {
      case 1 => bufferDisk(g.rings(0)(0), g.rings(0)(1), r)
      case 2 => bufferLine(g.rings(0), r)
      case 3 => if (g.rings.length != 1) null else offsetWalk(ringSegs(ccw(g.rings(0))), r)
      case 4 | 5 | 6 | 7 =>
        if (g.parts == null || g.parts.length == 0) return null
        var acc: Array[Byte] = null
        var i = 0
        while (i < g.parts.length) {
          val b = buffer(GeoGeom.write(g.parts(i)), r)
          if (b == null) return null
          acc = if (acc == null) b else union(acc, b)
          if (acc == null) return null
          i += 1
        }
        acc
      case _ => null
    }
  }

  private def bufferDisk(x: Double, y: Double, r: Double): Array[Byte] = {
    val flat = new Array[Double]((BufferSegs + 1) * 2)
    var k = 0
    while (k < BufferSegs) {
      val th = 2.0 * math.Pi * k / BufferSegs
      flat(k * 2) = x + r * math.cos(th)
      flat(k * 2 + 1) = y + r * math.sin(th)
      k += 1
    }
    flat(BufferSegs * 2) = flat(0); flat(BufferSegs * 2 + 1) = flat(1)
    GeoGeom.writePolygon(Array(flat))
  }

  /** Drop consecutive duplicate vertices (they would produce zero-length
    * directions the offset math cannot orient). */
  private def dedupVerts(flat: Array[Double]): Array[Double] = {
    val out = scala.collection.mutable.ArrayBuffer[Double](flat(0), flat(1))
    var i = 2
    while (i < flat.length) {
      if (flat(i) != out(out.length - 2) || flat(i + 1) != out(out.length - 1)) {
        out += flat(i); out += flat(i + 1)
      }
      i += 2
    }
    out.toArray
  }

  private def bufferLine(flat0: Array[Double], r: Double): Array[Byte] = {
    val flat = dedupVerts(flat0)
    val n = flat.length / 2
    if (n == 1) return bufferDisk(flat(0), flat(1), r)
    // closed walk: forward right side, U-turn cap, backward right side,
    // U-turn cap — one uniform junction rule covers sides AND caps
    val segs = new Array[Array[Double]]((n - 1) * 2)
    var i = 0
    while (i < n - 1) {
      segs(i) = Array(flat(i * 2), flat(i * 2 + 1), flat(i * 2 + 2), flat(i * 2 + 3))
      segs(2 * (n - 1) - 1 - i) =
        Array(flat(i * 2 + 2), flat(i * 2 + 3), flat(i * 2), flat(i * 2 + 1))
      i += 1
    }
    offsetWalk(segs, r)
  }

  /** Closed CCW ring (first pair == last) → directed segment cycle. */
  private def ringSegs(ring0: Array[Double]): Array[Array[Double]] = {
    val ring = dedupVerts(ring0)
    val n = ring.length / 2 - 1
    if (n < 3) return Array.empty
    Array.tabulate(n)(i =>
      Array(ring(i * 2), ring(i * 2 + 1), ring(i * 2 + 2), ring(i * 2 + 3)))
  }

  /** Offset boundary of a closed directed walk: the Minkowski-sum shell.
    * Null when the walk is degenerate or the resulting ring is not
    * simple. */
  private def offsetWalk(segs: Array[Array[Double]], r: Double): Array[Byte] = {
    val nSeg = segs.length
    if (nSeg == 0) return null
    // per-segment right-offset endpoints (mutable: reflex trims move them)
    val offs = new Array[Array[Double]](nSeg)
    val dirs = new Array[Array[Double]](nSeg)
    var k = 0
    while (k < nSeg) {
      val s = segs(k)
      val dx = s(2) - s(0); val dy = s(3) - s(1)
      val len = math.sqrt(dx * dx + dy * dy)
      if (len == 0.0) return null
      val ux = dy / len; val uy = -dx / len // right normal
      offs(k) = Array(s(0) + r * ux, s(1) + r * uy, s(2) + r * ux, s(3) + r * uy)
      dirs(k) = Array(dx / len, dy / len)
      k += 1
    }
    val step = 2.0 * math.Pi / BufferSegs
    val arcs = new Array[Array[Double]](nSeg) // points inserted AFTER seg k
    k = 0
    while (k < nSeg) {
      val nk = (k + 1) % nSeg
      val cross = dirs(k)(0) * dirs(nk)(1) - dirs(k)(1) * dirs(nk)(0)
      val dot = dirs(k)(0) * dirs(nk)(0) + dirs(k)(1) * dirs(nk)(1)
      if (math.abs(cross) <= 1e-12 && dot >= 0.0) {
        // straight-through: offsets already coincide
      } else if (cross > 1e-12 || (math.abs(cross) <= 1e-12 && dot < 0.0)) {
        // convex turn (or U-turn cap): arc around the shared vertex from
        // seg k's right normal to seg nk's, equal steps at 32-gon pitch
        val vx = segs(k)(2); val vy = segs(k)(3)
        val th0 = math.atan2(offs(k)(3) - vy, offs(k)(2) - vx)
        var sweep = math.atan2(cross, dot)
        if (sweep <= 0.0) sweep = math.Pi // U-turn
        val steps = math.max(1, math.ceil(sweep / step - 1e-9).toInt)
        val d = sweep / steps
        val pts = new Array[Double]((steps - 1) * 2)
        var a = 1
        while (a < steps) {
          pts((a - 1) * 2) = vx + r * math.cos(th0 + a * d)
          pts((a - 1) * 2 + 1) = vy + r * math.sin(th0 + a * d)
          a += 1
        }
        arcs(k) = pts
      } else {
        // reflex turn: both offset lines bound the sum locally — trim to
        // their intersection (guaranteed |cross| > 1e-12 here)
        val a1x = offs(k)(0); val a1y = offs(k)(1)
        val a2x = offs(nk)(0); val a2y = offs(nk)(1)
        val t = ((a2x - a1x) * dirs(nk)(1) - (a2y - a1y) * dirs(nk)(0)) / cross
        val px = a1x + t * dirs(k)(0); val py = a1y + t * dirs(k)(1)
        offs(k)(2) = px; offs(k)(3) = py
        offs(nk)(0) = px; offs(nk)(1) = py
      }
      k += 1
    }
    val pts = scala.collection.mutable.ArrayBuffer[Double]()
    def push(x: Double, y: Double): Unit = {
      val m = pts.length
      if (m < 2 || math.abs(pts(m - 2) - x) > 1e-12 || math.abs(pts(m - 1) - y) > 1e-12) {
        pts += x; pts += y
      }
    }
    k = 0
    while (k < nSeg) {
      push(offs(k)(0), offs(k)(1))
      push(offs(k)(2), offs(k)(3))
      if (arcs(k) != null) {
        var a = 0
        while (a < arcs(k).length) { push(arcs(k)(a), arcs(k)(a + 1)); a += 2 }
      }
      k += 1
    }
    if (pts.length < 8) return null
    // exact closure (drop a duplicated start point first if present)
    if (math.abs(pts(0) - pts(pts.length - 2)) <= 1e-12 &&
        math.abs(pts(1) - pts(pts.length - 1)) <= 1e-12) {
      pts.remove(pts.length - 2, 2)
    }
    pts += pts(0); pts += pts(1)
    val ring = pts.toArray
    if (signedArea(ring) <= 0.0 || !ringIsSimple(ring)) return null
    GeoGeom.writePolygon(Array(ring))
  }

  /** No two non-adjacent boundary segments may touch — the global guard
    * that keeps offsetting honest (an offset radius past the local
    * feature size self-intersects; GEOS resolves those, we refuse). */
  private def ringIsSimple(f: Array[Double]): Boolean = {
    val n = f.length / 2 - 1
    if (n > 4096) return false // bound the quadratic check
    def orient(px: Double, py: Double, qx: Double, qy: Double,
        rx: Double, ry: Double, tol: Double): Int = {
      val v = (qx - px) * (ry - py) - (qy - py) * (rx - px)
      if (v > tol) 1 else if (v < -tol) -1 else 0
    }
    var i = 0
    while (i < n) {
      val ax = f(i * 2); val ay = f(i * 2 + 1)
      val bx = f(i * 2 + 2); val by = f(i * 2 + 3)
      var j = i + 2
      while (j < n) {
        if (!(i == 0 && j == n - 1)) {
          val cx = f(j * 2); val cy = f(j * 2 + 1)
          val dx = f(j * 2 + 2); val dy = f(j * 2 + 3)
          val scale = math.max(1.0, Seq(ax, ay, bx, by, cx, cy, dx, dy)
            .map(math.abs).max)
          val tol = 1e-12 * scale * scale
          val o1 = orient(ax, ay, bx, by, cx, cy, tol)
          val o2 = orient(ax, ay, bx, by, dx, dy, tol)
          val o3 = orient(cx, cy, dx, dy, ax, ay, tol)
          val o4 = orient(cx, cy, dx, dy, bx, by, tol)
          val touches =
            if (o1 != o2 && o3 != o4) true
            else if (o1 == 0 && within(cx, ax, bx) && within(cy, ay, by)) true
            else if (o2 == 0 && within(dx, ax, bx) && within(dy, ay, by)) true
            else if (o3 == 0 && within(ax, cx, dx) && within(ay, cy, dy)) true
            else if (o4 == 0 && within(bx, cx, dx) && within(by, cy, dy)) true
            else false
          if (touches) return false
        }
        j += 1
      }
      i += 1
    }
    true
  }

  private def within(v: Double, a: Double, b: Double): Boolean =
    v >= math.min(a, b) - 1e-12 && v <= math.max(a, b) + 1e-12

  private final val EarthR = 6378137.0

  /** Is this SRID one geo_transform can reproject? The closed-form
    * legacy set (4326, 3857 web mercator, UTM 326zz/327zz, and the
    * [[GeoProjections]] trio 3035/5070/2154) plus everything in
    * [[ProjEngine]]'s curated EPSG table (state planes, OSGB, polar
    * stereographic, ED50/ETRS89/NAD83 UTM, ...). */
  def supportedSrid(srid: Int): Boolean =
    legacySrid(srid) || ProjEngine.knownEpsg(srid)

  private def legacySrid(srid: Int): Boolean =
    srid == 4326 || srid == 3857 ||
      (srid >= 32601 && srid <= 32660) || (srid >= 32701 && srid <= 32760) ||
      GeoProjections.Srids.contains(srid)

  /** srid → 4326 lon/lat. */
  private def toGeo(srid: Int): (Double, Double) => (Double, Double) = srid match {
    case 4326 => (x, y) => (x, y)
    case 3857 => (x, y) =>
      (math.toDegrees(x / EarthR),
       math.toDegrees(2.0 * math.atan(math.exp(y / EarthR)) - math.Pi / 2.0))
    case s if GeoProjections.Srids.contains(s) => GeoProjections.inverse(s)
    case utm => TransverseMercator.utmInverse(utm)
  }

  /** 4326 lon/lat → srid. */
  private def fromGeo(srid: Int): (Double, Double) => (Double, Double) = srid match {
    case 4326 => (x, y) => (x, y)
    case 3857 => (lon, lat) =>
      (EarthR * math.toRadians(lon),
       EarthR * math.log(math.tan(math.Pi / 4.0 + math.toRadians(lat) / 2.0)))
    case s if GeoProjections.Srids.contains(s) => GeoProjections.forward(s)
    case utm => TransverseMercator.utmForward(utm)
  }

  /** Reproject every coordinate between supported CRSs (4326 ↔ 3857 ↔ any
    * UTM zone ↔ LAEA/Albers/Lambert-93 — non-4326 pairs hop through
    * lon/lat); output carries the target SRID as EWKB. Multi* /
    * GeometryCollection inputs reproject each member. Unsupported
    * (from, to) → IllegalArgumentException (caught at plan time by
    * GeoProject's type check). */
  def transform(bytes: Array[Byte], fromSrid: Int, toSrid: Int): Array[Byte] = {
    val g = parse(bytes)
    if (g == null) return null
    if (fromSrid == toSrid) return setSrid(GeoGeom.write(g), toSrid)
    require(supportedSrid(fromSrid) && supportedSrid(toSrid),
      s"geo_transform supports EPSG 4326/3857/UTM(326zz,327zz)/3035/5070/2154 " +
        s"and the ProjEngine EPSG table, got ($fromSrid, $toSrid)")
    // SRIDs outside the closed-form legacy set route through the
    // parameter-driven engine (identical math family, datum shifts incl.)
    if (!legacySrid(fromSrid) || !legacySrid(toSrid))
      return convertCrs(bytes, s"EPSG:$fromSrid", s"EPSG:$toSrid")
    val to4326 = toGeo(fromSrid)
    val from4326 = fromGeo(toSrid)
    val fn: (Double, Double) => (Double, Double) =
      if (fromSrid == 4326) from4326
      else if (toSrid == 4326) to4326
      else (x, y) => { val (lon, lat) = to4326(x, y); from4326(lon, lat) }
    setSrid(GeoGeom.write(mapCoords(g, fn)), toSrid)
  }

  /** GeoConvert (geospatial.py:459): reproject between ANY two CRSs
    * [[ProjEngine]] can parse — "EPSG:n" from the curated table or a
    * "+proj=..." published-parameter string — including Helmert datum
    * shifts (+towgs84) and non-meter units. Output carries the target
    * EPSG code as EWKB SRID when the target was given as a code. */
  def convertCrs(bytes: Array[Byte], source: String, target: String): Array[Byte] = {
    val g = parse(bytes)
    if (g == null) return null
    val fn = ProjEngine.transformerFor(source, target)
    val out = GeoGeom.write(mapCoords(g, fn))
    val dstSrid = ProjEngine.crs(target).srid
    if (dstSrid > 0) setSrid(out, dstSrid) else out
  }

  /** Apply a coordinate map to every vertex, recursing into Multi* parts
    * (GeoGeom.write reads `parts` for kinds 4-7, `rings` for 1-3). */
  private def mapCoords(g: GeoGeom.Geom,
      fn: (Double, Double) => (Double, Double)): GeoGeom.Geom = {
    val rings = g.rings.map { r =>
      val o = new Array[Double](r.length)
      var i = 0
      while (i < r.length) {
        val (x, y) = fn(r(i), r(i + 1)); o(i) = x; o(i + 1) = y
        i += 2
      }
      o
    }
    if (g.parts == null) new GeoGeom.Geom(g.kind, rings)
    else new GeoGeom.Geom(g.kind, rings, g.parts.map(mapCoords(_, fn)))
  }
}

/** WGS84 transverse mercator via the Krüger flattening series (Karney 2011
  * arXiv:1002.1417 / OGP guidance note 7-2 — public formulas), 4th order in
  * n: error well under a millimeter anywhere inside a UTM zone (the spec
  * cross-checks against an independent Snyder-formula computation). */
private[graft] object TransverseMercator {
  private final val A0 = 6378137.0
  private final val F = 1.0 / 298.257223563
  private final val N = F / (2.0 - F)
  private final val K0 = 0.9996
  private final val FalseE = 500000.0
  private final val FalseNSouth = 10000000.0
  // rectifying radius
  private final val A = A0 / (1.0 + N) * (1.0 + N * N / 4.0 + math.pow(N, 4) / 64.0)
  // Krüger series coefficients (α forward, β inverse-to-conformal,
  // δ conformal-to-geodetic), 4th order in n
  private final val Al = Array(
    N / 2.0 - 2.0 / 3.0 * N * N + 5.0 / 16.0 * pow3 + 41.0 / 180.0 * pow4,
    13.0 / 48.0 * N * N - 3.0 / 5.0 * pow3 + 557.0 / 1440.0 * pow4,
    61.0 / 240.0 * pow3 - 103.0 / 140.0 * pow4,
    49561.0 / 161280.0 * pow4)
  private final val Be = Array(
    N / 2.0 - 2.0 / 3.0 * N * N + 37.0 / 96.0 * pow3 - 1.0 / 360.0 * pow4,
    1.0 / 48.0 * N * N + 1.0 / 15.0 * pow3 - 437.0 / 1440.0 * pow4,
    17.0 / 480.0 * pow3 - 37.0 / 840.0 * pow4,
    4397.0 / 161280.0 * pow4)
  private final val De = Array(
    2.0 * N - 2.0 / 3.0 * N * N - 2.0 * pow3 + 116.0 / 45.0 * pow4,
    7.0 / 3.0 * N * N - 8.0 / 5.0 * pow3 - 227.0 / 45.0 * pow4,
    56.0 / 15.0 * pow3 - 136.0 / 35.0 * pow4,
    4279.0 / 630.0 * pow4)
  private def pow3 = N * N * N
  private def pow4 = N * N * N * N
  private final val TwoSqrtN = 2.0 * math.sqrt(N) / (1.0 + N)

  /** (zone central meridian degrees, southern false northing) of a UTM SRID. */
  private def zoneOf(srid: Int): (Double, Double) = {
    val south = srid >= 32701
    val zone = srid - (if (south) 32700 else 32600)
    (zone * 6.0 - 183.0, if (south) FalseNSouth else 0.0)
  }

  def utmForward(srid: Int): (Double, Double) => (Double, Double) = {
    val (lon0, n0) = zoneOf(srid)
    (lon, lat) => {
      val phi = math.toRadians(lat)
      val lam = math.toRadians(lon - lon0)
      val s = math.sin(phi)
      val t = math.sinh(atanh(s) - TwoSqrtN * atanh(TwoSqrtN * s))
      val xiP = math.atan2(t, math.cos(lam))
      val etaP = atanh(math.sin(lam) / math.sqrt(1.0 + t * t))
      var xi = xiP; var eta = etaP
      var j = 1
      while (j <= 4) {
        xi += Al(j - 1) * math.sin(2.0 * j * xiP) * math.cosh(2.0 * j * etaP)
        eta += Al(j - 1) * math.cos(2.0 * j * xiP) * math.sinh(2.0 * j * etaP)
        j += 1
      }
      (FalseE + K0 * A * eta, n0 + K0 * A * xi)
    }
  }

  def utmInverse(srid: Int): (Double, Double) => (Double, Double) = {
    val (lon0, n0) = zoneOf(srid)
    (e, nn) => {
      val xi = (nn - n0) / (K0 * A)
      val eta = (e - FalseE) / (K0 * A)
      var xiP = xi; var etaP = eta
      var j = 1
      while (j <= 4) {
        xiP -= Be(j - 1) * math.sin(2.0 * j * xi) * math.cosh(2.0 * j * eta)
        etaP -= Be(j - 1) * math.cos(2.0 * j * xi) * math.sinh(2.0 * j * eta)
        j += 1
      }
      val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
      var phi = chi
      j = 1
      while (j <= 4) {
        phi += De(j - 1) * math.sin(2.0 * j * chi)
        j += 1
      }
      val lam = math.atan2(math.sinh(etaP), math.cos(xiP))
      (lon0 + math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))
}

// ---- Catalyst expressions ------------------------------------------------

/** Binary geometry predicate/measure over the GeoGeomOps table: op →
  * (static method, flip args, negate, result type). Shares the null-safe
  * static-call codegen shape with [[GeoRelate]]. */
case class GeoRelate2(left: Expression, right: Expression, op: String)
    extends BinaryExpression {
  import GeoRelate2.ops
  override def prettyName: String = s"geo_$op"
  private val spec = ops(op)
  override def dataType: DataType = if (spec._2) DoubleType else BooleanType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary WKB inputs")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (m, isDouble, flip) = spec
    val (x, y) = if (flip) (b, a) else (a, b)
    val xB = x.asInstanceOf[Array[Byte]]; val yB = y.asInstanceOf[Array[Byte]]
    if (isDouble) {
      val r = m match {
        case "azimuth" => GeoGeomOps.azimuth(xB, yB)
        case "maxDistance" => GeoGeomOps.maxDistance(xB, yB)
        case "lineLocatePoint" => GeoGeomOps.lineLocatePoint(xB, yB)
      }
      if (r == null) null else r.doubleValue()
    } else {
      val r = m match {
        case "orderingEquals" => GeoGeomOps.orderingEquals(xB, yB)
        case "geoEquals" => GeoGeomOps.geoEquals(xB, yB)
        case "covers" => GeoGeomOps.covers(xB, yB)
        case "containsProperly" => GeoGeomOps.containsProperly(xB, yB)
        case "touches" => GeoGeomOps.touches(xB, yB)
        case "crosses" => GeoGeomOps.crosses(xB, yB)
        case "overlaps" => GeoGeomOps.overlaps(xB, yB)
      }
      if (r == null) null else r.booleanValue()
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (m, isDouble, flip) = spec
      val (x, y) = if (flip) (b, a) else (a, b)
      val r = ctx.freshName("r")
      if (isDouble) s"""
        java.lang.Double $r = graft.exts.GeoGeomOps.$m($x, $y);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
      """ else s"""
        java.lang.Boolean $r = graft.exts.GeoGeomOps.$m($x, $y);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.booleanValue(); }
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object GeoRelate2 {
  /** op → (static method, returns double, flip args). */
  val ops: Map[String, (String, Boolean, Boolean)] = Map(
    "azimuth" -> (("azimuth", true, false)),
    "max_distance" -> (("maxDistance", true, false)),
    "line_locate_point" -> (("lineLocatePoint", true, false)),
    "ordering_equals" -> (("orderingEquals", false, false)),
    "equals" -> (("geoEquals", false, false)),
    "covers" -> (("covers", false, false)),
    "covered_by" -> (("covers", false, true)),
    "contains_properly" -> (("containsProperly", false, false)),
    "touches" -> (("touches", false, false)),
    "crosses" -> (("crosses", false, false)),
    "overlaps" -> (("overlaps", false, false)))
}

/** `geo_union(a, b)` / `geo_difference(a, b)` — polygon boolean set ops
  * (see [[GeoGeomOps.union]]/[[GeoGeomOps.difference]] for the supported
  * operand classes; unsupported shapes evaluate to null, never wrong). */
case class GeoSetOpExpr(left: Expression, right: Expression, op: String)
    extends BinaryExpression {
  override def prettyName: String = s"geo_$op"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary WKB inputs")
  override def nullSafeEval(a: Any, b: Any): Any = op match {
    case "union" => GeoGeomOps.union(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    case "difference" => GeoGeomOps.difference(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
        byte[] $r = graft.exts.GeoGeomOps.$op($a, $b);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `geo_intersection(a, b)` — planar-exact intersection geometry
  * (see [[GeoGeomOps.intersection]] for the supported operand classes). */
case class GeoIntersectionExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "geo_intersection"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary WKB inputs")
  override def nullSafeEval(a: Any, b: Any): Any =
    GeoGeomOps.intersection(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
        byte[] $r = graft.exts.GeoGeomOps.intersection($a, $b);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Unary geometry + one scalar parameter → WKB: set_srid(int),
  * geometry_n(int), buffer(double), simplify(double). */
case class GeoParam(left: Expression, right: Expression, op: String)
    extends BinaryExpression {
  override def prettyName: String = s"geo_$op"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  private def intParam = op == "set_srid" || op == "geometry_n"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary WKB input")
    else if (intParam && right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires an int parameter")
    else if (!intParam && right.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a double parameter")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(g: Any, p: Any): Any = {
    val b = g.asInstanceOf[Array[Byte]]
    op match {
      case "set_srid" => GeoGeomOps.setSrid(b, p.asInstanceOf[Int])
      case "geometry_n" => GeoGeomOps.geometryN(b, p.asInstanceOf[Int])
      case "buffer" => GeoGeomOps.buffer(b, p.asInstanceOf[Double])
      case "simplify" => GeoGeomOps.simplify(b, p.asInstanceOf[Double])
    }
  }
  private def staticName = op match {
    case "set_srid" => "setSrid"
    case "geometry_n" => "geometryN"
    case other => other
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, p) => {
      val r = ctx.freshName("r")
      s"""
        byte[] $r = graft.exts.GeoGeomOps.$staticName($g, $p);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Unary geometry metadata: srid → int, nrings → int, is_valid → boolean,
  * plus WKB re-encoders as_binary / as_ewkb (binary out). */
case class GeoUnaryMeta(child: Expression, op: String) extends UnaryExpression {
  override def prettyName: String = s"geo_$op"
  override def dataType: DataType = op match {
    case "srid" | "nrings" => IntegerType
    case "is_valid" => BooleanType
    case _ => BinaryType
  }
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary WKB input")

  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    op match {
      case "srid" => val r = GeoGeomOps.srid(b); if (r == null) null else r.intValue()
      case "nrings" => val r = GeoGeomOps.nRings(b); if (r == null) null else r.intValue()
      case "is_valid" =>
        val r = GeoGeomOps.isValid(b); if (r == null) null else r.booleanValue()
      case "as_binary" => GeoGeomOps.asBinary(b)
      case "as_ewkb" => GeoGeomOps.asEwkb(b)
    }
  }
  private def staticName = op match {
    case "srid" => "srid"
    case "nrings" => "nRings"
    case "is_valid" => "isValid"
    case "as_binary" => "asBinary"
    case "as_ewkb" => "asEwkb"
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("r")
      op match {
        case "srid" | "nrings" => s"""
          java.lang.Integer $r = graft.exts.GeoGeomOps.$staticName($b);
          if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.intValue(); }
        """
        case "is_valid" => s"""
          java.lang.Boolean $r = graft.exts.GeoGeomOps.$staticName($b);
          if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.booleanValue(); }
        """
        case _ => s"""
          byte[] $r = graft.exts.GeoGeomOps.$staticName($b);
          if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
        """
      }
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `geo_line_substring(line, f0, f1)` — ST_LineSubstring fractions. */
case class GeoLineSubstring(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def prettyName: String = "geo_line_substring"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == BinaryType && second.dataType == DoubleType &&
        third.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, double, double)")
  override def nullSafeEval(l: Any, f0: Any, f1: Any): Any =
    GeoGeomOps.lineSubstring(l.asInstanceOf[Array[Byte]],
      f0.asInstanceOf[Double], f1.asInstanceOf[Double])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, f0, f1) => {
      val r = ctx.freshName("r")
      s"""
        byte[] $r = graft.exts.GeoGeomOps.lineSubstring($l, $f0, $f1);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
      """
    })
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** `geo_transform(g, fromSrid, toSrid)` — closed-form 4326 ↔ 3857 ↔ any
  * UTM zone (EPSG:326zz/327zz, Krüger series); non-4326 pairs hop through
  * lon/lat. */
case class GeoProject(child: Expression, fromSrid: Int, toSrid: Int)
    extends UnaryExpression {
  override def prettyName: String = "geo_transform"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary WKB input")
    else if (fromSrid == toSrid ||
        (GeoGeomOps.supportedSrid(fromSrid) && GeoGeomOps.supportedSrid(toSrid)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName supports EPSG 4326/3857/UTM(326zz,327zz), got ($fromSrid, $toSrid)")
  override def nullSafeEval(v: Any): Any =
    GeoGeomOps.transform(v.asInstanceOf[Array[Byte]], fromSrid, toSrid)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("r")
      s"""
        byte[] $r = graft.exts.GeoGeomOps.transform($b, $fromSrid, $toSrid);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
      """
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `geo_convert(g, source, target)` — GeoConvert (geospatial.py:459)
  * between ANY two CRS specs [[ProjEngine]] parses: "EPSG:n" (curated
  * table) or a "+proj=..." published-parameter string (tmerc/utm/lcc/
  * aea/laea/merc/polar-stere on any registry ellipsoid, +towgs84 Helmert
  * datum shifts, +units). Bad specs fail at PLAN time via the type
  * check, never per-row. */
case class GeoConvertCrs(child: Expression, source: String, target: String)
    extends UnaryExpression {
  override def prettyName: String = "geo_convert"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary WKB input")
    else try {
      ProjEngine.crs(source); ProjEngine.crs(target)
      TypeCheckResult.TypeCheckSuccess
    } catch {
      case e: IllegalArgumentException =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName: ${e.getMessage}")
    }
  override def nullSafeEval(v: Any): Any =
    GeoGeomOps.convertCrs(v.asInstanceOf[Array[Byte]], source, target)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val srcRef = ctx.addReferenceObj("src", source, "java.lang.String")
    val dstRef = ctx.addReferenceObj("dst", target, "java.lang.String")
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("r")
      s"""
        byte[] $r = graft.exts.GeoGeomOps.convertCrs($b, $srcRef, $dstRef);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
      """
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
