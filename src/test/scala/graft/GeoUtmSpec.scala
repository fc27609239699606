package graft

import org.apache.spark.sql.functions._

import graft.functions.geo

/** UTM reprojection (geo_transform with EPSG:326zz/327zz): the Krüger
  * n-series implementation cross-checked against reference eastings/
  * northings computed with the INDEPENDENT Snyder (USGS Working Manual)
  * formulation — two unrelated series agreeing to centimeters implies both
  * are correct (Snyder's own truncation is ~cm inside a zone; the Krüger
  * 4th-order truncation is sub-millimeter). */
class GeoUtmSpec extends SparkSpec {
  import spark.implicits._

  private val one = Seq(1).toDF("i")

  // (lat, lon, srid, snyderE, snyderN) — Snyder values precomputed offline
  private val RefPoints = Seq(
    (40.5, -73.5, 32618, 627103.0873, 4484335.4018),     // zone 18N
    (48.8584, 2.2945, 32631, 448252.0014, 5411954.9103), // zone 31N (Paris)
    (-33.8568, 151.2153, 32756, 334900.5697, 6252288.7528), // 56S (Sydney)
    (63.0, 9.0, 32632, 500000.0000, 6985589.2159),       // on central meridian
    (0.0017, -0.3, 32630, 800554.4091, 188.1113),        // near equator, zone edge
    (-45.87, 170.5, 32759, 461193.2873, 4920274.6967))   // 59S

  test("forward UTM matches independent Snyder computation to <2 cm") {
    RefPoints.foreach { case (lat, lon, srid, se, sn) =>
      val p = geo.point(lit(lon), lit(lat))
      val r = one.select(
        geo.x(geo.transform(p, 4326, srid)).as("e"),
        geo.y(geo.transform(p, 4326, srid)).as("n"),
        geo.srid(geo.transform(p, 4326, srid)).as("srid")).head()
      assert(math.abs(r.getDouble(0) - se) < 0.02,
        s"easting $srid: ${r.getDouble(0)} vs $se")
      assert(math.abs(r.getDouble(1) - sn) < 0.02,
        s"northing $srid: ${r.getDouble(1)} vs $sn")
      assert(r.getInt(2) == srid)
    }
  }

  test("round-trip 4326→UTM→4326 is identity to ~nanometers") {
    RefPoints.foreach { case (lat, lon, srid, _, _) =>
      val p = geo.point(lit(lon), lit(lat))
      val r = one.select(
        geo.x(geo.transform(geo.transform(p, 4326, srid), srid, 4326)).as("lon"),
        geo.y(geo.transform(geo.transform(p, 4326, srid), srid, 4326)).as("lat")).head()
      assert(math.abs(r.getDouble(0) - lon) < 1e-9)
      assert(math.abs(r.getDouble(1) - lat) < 1e-9)
    }
  }

  test("UTM→UTM and UTM→3857 hop through lon/lat") {
    // same physical point expressed in the neighbor zone's coordinates
    val p = geo.point(lit(2.2945), lit(48.8584))
    val r = one.select(
      geo.x(geo.transform(geo.transform(p, 4326, 32631), 32631, 32632)).as("e32"),
      geo.x(geo.transform(geo.transform(p, 4326, 32631), 32631, 3857)).as("mx")).head()
    // zone 32 (cm 9°E): Paris sits far west → easting well under 500 km
    assert(r.getDouble(0) < 250000.0)
    assert(math.abs(r.getDouble(1) - 6378137.0 * math.toRadians(2.2945)) < 1e-6)
  }

  test("multi-geometry inputs reproject every member (round-4 fix)") {
    val mp = geo.collectGeoms(array(
      geo.point(lit(2.2945), lit(48.8584)), geo.point(lit(2.3), lit(48.9))))
    val r = one.select(
      geo.asText(geo.transform(mp, 4326, 32631)).as("wkt"),
      geo.nPoints(geo.transform(mp, 4326, 32631)).as("np")).head()
    assert(r.getString(0).startsWith("MULTIPOINT"))
    assert(r.getInt(1) == 2)
    assert(r.getString(0).contains("448252.")) // Paris easting present
  }

  test("line and polygon coordinates all move; unsupported SRID fails at plan time") {
    val line = geo.makeLine(array(
      geo.point(lit(2.0), lit(48.0)), geo.point(lit(2.5), lit(48.5))))
    val len = one.select(geo.length(geo.transform(line, 4326, 32631)).as("l")).head()
    // ~0.5° diagonal ≈ 66 km in meters — sanity: meters, not degrees
    assert(len.getDouble(0) > 60000.0 && len.getDouble(0) < 80000.0)
    // 27700 routes through the round-9 ProjEngine table (tmerc on Airy
    // with the OSGB datum shift) — Greenwich Observatory lands on the
    // National Grid near (538890, 177320)
    val os = one.select(
      geo.x(geo.transform(geo.point(lit(0.0), lit(51.4769)), 4326, 27700)).as("e"),
      geo.y(geo.transform(geo.point(lit(0.0), lit(51.4769)), 4326, 27700)).as("n")).head()
    assert(math.abs(os.getDouble(0) - 538890.0) < 2000.0)
    assert(math.abs(os.getDouble(1) - 177320.0) < 2000.0)
    // a code outside the curated EPSG table errors at plan time with
    // guidance to pass the published +proj parameters. 27572 (NTF Paris /
    // Lambert II) is defined on the PARIS prime meridian, which the
    // engine refuses by design — a permanently out-of-table example.
    val err = intercept[Exception] {
      one.select(geo.transform(geo.point(lit(0.0), lit(0.0)), 4326, 27572)).head()
    }
    assert(err.getMessage.contains("geo_transform"))
  }
}
