package graft.exts

/** Published-parameter projected CRSs for `geo_transform` beyond the
  * web-mercator/UTM set: ETRS89-LAEA Europe (EPSG:3035), NAD83 Conus
  * Albers (EPSG:5070), and RGF93 Lambert-93 (EPSG:2154). All three are
  * defined on GRS80 with parameters published in the EPSG registry, and
  * the math is the standard Snyder ellipsoidal treatment (Map
  * Projections — A Working Manual: LAEA pp. 187-190, Albers pp. 98-103,
  * LCC-2SP pp. 104-110). Datum shift ETRS89/NAD83/RGF93 ↔ WGS84 is
  * centimeter-level and ignored, the same convention the rest of
  * geo_transform uses.
  *
  * Inverse latitudes iterate Snyder eq. 3-16 (authalic, LAEA/Albers) or
  * the conformal fixpoint (LCC) to 1e-12 rad — double-precision
  * convergence in ≤ 6 rounds. */
private[graft] object GeoProjections {
  // GRS80
  private final val A = 6378137.0
  private final val F = 1.0 / 298.257222101
  private final val E2 = F * (2.0 - F)
  private final val E = math.sqrt(E2)

  private def q(phi: Double): Double = {
    val s = math.sin(phi)
    (1.0 - E2) * (s / (1.0 - E2 * s * s) -
      (1.0 / (2.0 * E)) * math.log((1.0 - E * s) / (1.0 + E * s)))
  }
  private def m(phi: Double): Double = {
    val s = math.sin(phi)
    math.cos(phi) / math.sqrt(1.0 - E2 * s * s)
  }
  private def t(phi: Double): Double = {
    val s = math.sin(phi)
    math.tan(math.Pi / 4.0 - phi / 2.0) /
      math.pow((1.0 - E * s) / (1.0 + E * s), E / 2.0)
  }

  /** φ from the authalic q (Snyder 3-16), Newton-style iteration. */
  private def phiFromQ(qv: Double): Double = {
    var phi = math.asin(math.max(-1.0, math.min(1.0, qv / 2.0)))
    var i = 0
    while (i < 12) {
      val s = math.sin(phi)
      val d = 1.0 - E2 * s * s
      val delta = d * d / (2.0 * math.cos(phi)) *
        (qv / (1.0 - E2) - s / d +
          (1.0 / (2.0 * E)) * math.log((1.0 - E * s) / (1.0 + E * s)))
      phi += delta
      if (math.abs(delta) < 1e-12) i = 12 else i += 1
    }
    phi
  }

  /** φ from the conformal t (LCC inverse), fixpoint iteration. */
  private def phiFromT(tv: Double): Double = {
    var phi = math.Pi / 2.0 - 2.0 * math.atan(tv)
    var i = 0
    while (i < 12) {
      val s = math.sin(phi)
      val next = math.Pi / 2.0 - 2.0 * math.atan(
        tv * math.pow((1.0 - E * s) / (1.0 + E * s), E / 2.0))
      val delta = next - phi
      phi = next
      if (math.abs(delta) < 1e-12) i = 12 else i += 1
    }
    phi
  }

  // ---------------------------------------------------------- LAEA (3035)
  private object Laea {
    val lat0 = math.toRadians(52.0); val lon0 = math.toRadians(10.0)
    val fe = 4321000.0; val fn = 3210000.0
    val qp = q(math.Pi / 2.0)
    val beta0 = math.asin(q(lat0) / qp)
    val rq = A * math.sqrt(qp / 2.0)
    val d = A * m(lat0) / (rq * math.cos(beta0))
  }

  def laeaForward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    import Laea._
    val phi = math.toRadians(latDeg); val dl = math.toRadians(lonDeg) - lon0
    val beta = math.asin(math.max(-1.0, math.min(1.0, q(phi) / qp)))
    val b = rq * math.sqrt(2.0 / (1.0 + math.sin(beta0) * math.sin(beta) +
      math.cos(beta0) * math.cos(beta) * math.cos(dl)))
    (fe + b * d * math.cos(beta) * math.sin(dl),
     fn + (b / d) * (math.cos(beta0) * math.sin(beta) -
       math.sin(beta0) * math.cos(beta) * math.cos(dl)))
  }

  def laeaInverse(x0: Double, y0: Double): (Double, Double) = {
    import Laea._
    val x = x0 - fe; val y = y0 - fn
    val rho = math.sqrt((x / d) * (x / d) + (d * y) * (d * y))
    if (rho < 1e-9) return (math.toDegrees(lon0), math.toDegrees(lat0))
    val ce = 2.0 * math.asin(math.max(-1.0, math.min(1.0, rho / (2.0 * rq))))
    val qv = qp * (math.cos(ce) * math.sin(beta0) +
      (d * y * math.sin(ce) * math.cos(beta0)) / rho)
    val lam = lon0 + math.atan2(x * math.sin(ce),
      d * rho * math.cos(beta0) * math.cos(ce) -
        d * d * y * math.sin(beta0) * math.sin(ce))
    (math.toDegrees(lam), math.toDegrees(phiFromQ(qv)))
  }

  // -------------------------------------------------------- Albers (5070)
  private object Albers {
    val lat1 = math.toRadians(29.5); val lat2 = math.toRadians(45.5)
    val lat0 = math.toRadians(23.0); val lon0 = math.toRadians(-96.0)
    val fe = 0.0; val fn = 0.0
    val m1 = m(lat1); val m2 = m(lat2)
    val q1 = q(lat1); val q2 = q(lat2)
    val n = (m1 * m1 - m2 * m2) / (q2 - q1)
    val c = m1 * m1 + n * q1
    def rho(qv: Double): Double = A * math.sqrt(c - n * qv) / n
    val rho0 = rho(q(lat0))
  }

  def albersForward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    import Albers._
    val phi = math.toRadians(latDeg)
    val theta = n * (math.toRadians(lonDeg) - lon0)
    val r = rho(q(phi))
    (fe + r * math.sin(theta), fn + rho0 - r * math.cos(theta))
  }

  def albersInverse(x0: Double, y0: Double): (Double, Double) = {
    import Albers._
    val x = x0 - fe; val y = rho0 - (y0 - fn)
    val r = math.sqrt(x * x + y * y)
    val theta = math.atan2(x, y) // n > 0
    val qv = (c - (r * n / A) * (r * n / A)) / n
    (math.toDegrees(lon0 + theta / n), math.toDegrees(phiFromQ(qv)))
  }

  // ---------------------------------------------------- LCC 2SP (2154)
  private object Lcc93 {
    val lat1 = math.toRadians(49.0); val lat2 = math.toRadians(44.0)
    val lat0 = math.toRadians(46.5); val lon0 = math.toRadians(3.0)
    val fe = 700000.0; val fn = 6600000.0
    val n = (math.log(m(lat1)) - math.log(m(lat2))) /
      (math.log(t(lat1)) - math.log(t(lat2)))
    val f = m(lat1) / (n * math.pow(t(lat1), n))
    def rho(tv: Double): Double = A * f * math.pow(tv, n)
    val rho0 = rho(t(lat0))
  }

  def lcc93Forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    import Lcc93._
    val phi = math.toRadians(latDeg)
    val theta = n * (math.toRadians(lonDeg) - lon0)
    val r = rho(t(phi))
    (fe + r * math.sin(theta), fn + rho0 - r * math.cos(theta))
  }

  def lcc93Inverse(x0: Double, y0: Double): (Double, Double) = {
    import Lcc93._
    val x = x0 - fe; val y = rho0 - (y0 - fn)
    val r = math.sqrt(x * x + y * y) * math.signum(n)
    val tv = math.pow(r / (A * f), 1.0 / n)
    val theta = math.atan2(x, y)
    (math.toDegrees(lon0 + theta / n), math.toDegrees(phiFromT(tv)))
  }

  final val Srids = Set(3035, 5070, 2154)

  def forward(srid: Int): (Double, Double) => (Double, Double) = srid match {
    case 3035 => laeaForward
    case 5070 => albersForward
    case 2154 => lcc93Forward
  }

  def inverse(srid: Int): (Double, Double) => (Double, Double) = srid match {
    case 3035 => laeaInverse
    case 5070 => albersInverse
    case 2154 => lcc93Inverse
  }
}
