package graft

import graft.exts.{GeoGeom, GeoGeomOps}

/** 2000-pair seeded property test for the polygon set-op stitcher over
  * random INTEGER rectangles — every predicate in the pipeline is exact
  * double arithmetic on integer coordinates, and a rectangle pair's
  * union/intersection/difference areas have closed forms:
  *
  *   i = overlap_x * overlap_y        (interval arithmetic)
  *   area(A ∪ B) = a + b − i
  *   area(A − B) = a − i
  *
  * Small ranges force every configuration: disjoint, corner-touch,
  * partial edge-tangency (the round-9 battery class), subset spans,
  * containment, identity, crossing overlaps. ~29% of generated pairs
  * are touch-only or tangency-adjacent. The dimension of each output is
  * asserted too: overlap → area, edge-touch → line contact, corner-touch
  * → point contact, disjoint → null intersection / MULTIPOLYGON union. */
class GeoRectPropertySpec extends org.scalatest.funsuite.AnyFunSuite {

  private def rect(x0: Int, y0: Int, x1: Int, y1: Int): Array[Byte] =
    GeoGeom.writePolygon(Array(Array[Double](
      x0, y0, x1, y0, x1, y1, x0, y1, x0, y0)))

  private def area(b: Array[Byte]): Double =
    if (b == null) 0.0 else {
      val a = GeoGeom.area(b)
      if (a == null) 0.0 else a.doubleValue()
    }

  test("inclusion-exclusion holds over 2000 random integer rectangle pairs") {
    val rnd = new scala.util.Random(20260815L)
    var touchCases = 0; var overlapCases = 0; var disjointCases = 0
    for (caseNo <- 1 to 2000) {
      // small coordinate range → dense tangency/touch coverage
      val ax0 = rnd.nextInt(7); val ay0 = rnd.nextInt(7)
      val ax1 = ax0 + 1 + rnd.nextInt(6); val ay1 = ay0 + 1 + rnd.nextInt(6)
      val bx0 = rnd.nextInt(7); val by0 = rnd.nextInt(7)
      val bx1 = bx0 + 1 + rnd.nextInt(6); val by1 = by0 + 1 + rnd.nextInt(6)
      val A = rect(ax0, ay0, ax1, ay1); val B = rect(bx0, by0, bx1, by1)
      val aArea = ((ax1 - ax0) * (ay1 - ay0)).toDouble
      val bArea = ((bx1 - bx0) * (by1 - by0)).toDouble
      val ox = math.min(ax1, bx1) - math.max(ax0, bx0) // may be negative
      val oy = math.min(ay1, by1) - math.max(ay0, by0)
      val ctx = s"case $caseNo: A=($ax0,$ay0,$ax1,$ay1) B=($bx0,$by0,$bx1,$by1)"

      val u = GeoGeomOps.union(A, B)
      val i = GeoGeomOps.intersection(A, B)
      val d = GeoGeomOps.difference(A, B)

      if (ox > 0 && oy > 0) {
        overlapCases += 1
        val iArea = (ox * oy).toDouble
        assert(area(u) == aArea + bArea - iArea, s"$ctx union area ${area(u)}")
        assert(area(i) == iArea, s"$ctx intersection area ${area(i)}")
        if (iArea == aArea) // A ⊆ B: empty difference → null
          assert(d == null, s"$ctx expected empty difference")
        else
          assert(area(d) == aArea - iArea, s"$ctx difference area ${area(d)}")
        assert(GeoGeom.geometryType(i) == "POLYGON", ctx)
      } else if (ox >= 0 && oy >= 0) {
        touchCases += 1
        // touch-only: union keeps both areas, difference is identity
        assert(area(u) == aArea + bArea, s"$ctx touch union ${area(u)}")
        assert(area(d) == aArea, s"$ctx touch difference")
        assert(i != null, s"$ctx touch contact set missing")
        val it = GeoGeom.geometryType(i)
        if (ox == 0 && oy == 0) { // corner touch → single point
          assert(it == "POINT", s"$ctx corner contact was $it")
        } else { // edge tangency → the shared stretch
          assert(it == "LINESTRING", s"$ctx edge contact was $it")
          assert(GeoGeom.length(i).doubleValue() == math.max(ox, oy).toDouble, ctx)
        }
        // edge-touch merges into one polygon; corner-touch stays MULTI
        val ut = GeoGeom.geometryType(u)
        if (ox == 0 && oy == 0) assert(ut == "MULTIPOLYGON", s"$ctx corner union $ut")
        else assert(ut == "POLYGON", s"$ctx tangent union $ut")
      } else {
        disjointCases += 1
        assert(i == null, s"$ctx disjoint intersection")
        assert(area(u) == aArea + bArea, s"$ctx disjoint union")
        assert(GeoGeom.geometryType(u) == "MULTIPOLYGON", ctx)
        assert(area(d) == aArea, s"$ctx disjoint difference")
      }
    }
    // the generator must actually exercise all three regimes
    assert(touchCases > 100, s"only $touchCases touch cases")
    assert(overlapCases > 500, s"only $overlapCases overlap cases")
    assert(disjointCases > 100, s"only $disjointCases disjoint cases")
  }
}
