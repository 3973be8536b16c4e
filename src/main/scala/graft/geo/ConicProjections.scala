package graft.geo

import org.locationtech.jts.geom.Coordinate

/** Lambert Conformal Conic (2SP, EPSG method 9802) and Albers Equal-Area
  * Conic (2SP, EPSG method 9822) on the ellipsoid, with a small registry
  * of common projected CRSs — the "state plane / national grid" half of
  * the ST_Transform surface (the UTM half is
  * [[graft.geo.TransverseMercator]]).
  *
  * Formulation follows EPSG Guidance Note 7-2 (identical to Snyder 1987
  * pp. 101-109); `tools/conic_snyder.py` is an independently transcribed
  * Snyder implementation whose pinned outputs the spec compares against
  * to ~1e-4 CRS units, catching transcription errors in either copy.
  * Inverses recover latitude by the standard fixed-point (LCC) / Newton
  * (Albers) iteration to double precision, so round trips reproduce
  * inputs to ~1e-9 degrees.
  *
  * Datum note (documented, deliberate): the registry CRSs are on
  * NAD83 / ETRS89 / RGF93, all realized on GRS80. Like PROJ's default
  * ballpark behavior, the geographic pivot treats these as coincident
  * with WGS84 — the physical offset is at the 1-2 m level (plate drift
  * since the realization epochs) and applying a silent datum shift grid
  * is out of scope; the conic MATH uses each CRS's own GRS80 ellipsoid
  * constants exactly.
  */
object ConicProjections {

  /** One projected CRS: conic kind, ellipsoid, 2SP parameters (degrees),
    * false origin in METERS, and meters-per-CRS-unit (1200/3937 for US
    * survey foot CRSs like EPSG:2229). */
  final case class ConicCrs(srid: Int, kind: String, a: Double, f: Double,
      lat0: Double, lon0: Double, lat1: Double, lat2: Double,
      fe: Double, fn: Double, unit: Double)

  private val GrsA = 6378137.0
  private val GrsF = 1.0 / 298.257222101 // GRS80

  /** Common conic CRSs. Parameters from the EPSG registry entries. */
  val registry: Map[Int, ConicCrs] = Seq(
    // RGF93 / Lambert-93 (France national grid)
    ConicCrs(2154, "lcc", GrsA, GrsF, 46.5, 3.0, 49.0, 44.0,
      700000.0, 6600000.0, 1.0),
    // ETRS89 / LCC Europe
    ConicCrs(3034, "lcc", GrsA, GrsF, 52.0, 10.0, 35.0, 65.0,
      4000000.0, 2800000.0, 1.0),
    // NAD83 / New York Long Island (meters)
    ConicCrs(32118, "lcc", GrsA, GrsF, 40.0 + 10.0 / 60, -74.0,
      41.0 + 2.0 / 60, 40.0 + 40.0 / 60, 300000.0, 0.0, 1.0),
    // NAD83 / California zone 5 (US survey feet)
    ConicCrs(2229, "lcc", GrsA, GrsF, 33.5, -118.0,
      35.0 + 28.0 / 60, 34.0 + 2.0 / 60, 2000000.0, 500000.0, 1200.0 / 3937.0),
    // NAD83 / Conus Albers (the standard US analysis CRS)
    ConicCrs(5070, "albers", GrsA, GrsF, 23.0, -96.0, 29.5, 45.5,
      0.0, 0.0, 1.0),
    // GDA94 / Australian Albers (the national analysis CRS; GDA94 is
    // a GRS80 realization — same WGS84-coincident pivot as the rest)
    ConicCrs(3577, "albers", GrsA, GrsF, 0.0, 132.0, -18.0, -36.0,
      0.0, 0.0, 1.0),
    // NAD83 / California Albers
    ConicCrs(3310, "albers", GrsA, GrsF, 0.0, -120.0, 34.0, 40.5,
      0.0, -4000000.0, 1.0)
  ).map(c => c.srid -> c).toMap

  def supports(srid: Int): Boolean = registry.contains(srid)

  // ---- LCC 2SP (EPSG 9802) ------------------------------------------------

  private final class LccConsts(crs: ConicCrs) {
    val e: Double = math.sqrt(crs.f * (2.0 - crs.f))
    private def tOf(phi: Double): Double =
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2)
    private def mOf(phi: Double): Double =
      math.cos(phi) / math.sqrt(1 - math.pow(e * math.sin(phi), 2))
    private val p1 = math.toRadians(crs.lat1)
    private val p2 = math.toRadians(crs.lat2)
    private val m1 = mOf(p1)
    private val m2 = mOf(p2)
    private val t1 = tOf(p1)
    private val t2 = tOf(p2)
    val n: Double = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    val bigF: Double = m1 / (n * math.pow(t1, n))
    val rho0: Double = crs.a * bigF * math.pow(tOf(math.toRadians(crs.lat0)), n)
    def t(phi: Double): Double = tOf(phi)
  }

  private def lccForward(crs: ConicCrs, k: LccConsts, c: Coordinate): Unit = {
    val phi = math.toRadians(c.y)
    val dLam = math.toRadians(c.x - crs.lon0)
    val rho = crs.a * k.bigF * math.pow(k.t(phi), k.n)
    val th = k.n * dLam
    c.x = (crs.fe + rho * math.sin(th)) / crs.unit
    c.y = (crs.fn + k.rho0 - rho * math.cos(th)) / crs.unit
  }

  private def lccInverse(crs: ConicCrs, k: LccConsts, c: Coordinate): Unit = {
    val x = c.x * crs.unit - crs.fe
    val y = k.rho0 - (c.y * crs.unit - crs.fn)
    val sgn = if (k.n >= 0) 1.0 else -1.0
    val rho = sgn * math.sqrt(x * x + y * y)
    val tP = math.pow(rho / (crs.a * k.bigF), 1.0 / k.n)
    val th = math.atan2(sgn * x, sgn * y)
    // fixed-point for phi: phi = pi/2 - 2 atan(t * ((1-e sin)/(1+e sin))^(e/2))
    var phi = math.Pi / 2 - 2 * math.atan(tP)
    var i = 0
    var delta = 1.0
    while (i < 15 && delta > 1e-14) {
      val es = k.e * math.sin(phi)
      val next = math.Pi / 2 - 2 * math.atan(
        tP * math.pow((1 - es) / (1 + es), k.e / 2))
      delta = math.abs(next - phi)
      phi = next
      i += 1
    }
    c.x = crs.lon0 + math.toDegrees(th / k.n)
    c.y = math.toDegrees(phi)
  }

  // ---- Albers 2SP (EPSG 9822) --------------------------------------------

  private final class AlbersConsts(crs: ConicCrs) {
    val e2: Double = crs.f * (2.0 - crs.f)
    val e: Double = math.sqrt(e2)
    def qOf(phi: Double): Double = {
      val s = math.sin(phi)
      (1 - e2) * (s / (1 - e2 * s * s) -
        (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    private def mOf(phi: Double): Double =
      math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    private val m1 = mOf(math.toRadians(crs.lat1))
    private val m2 = mOf(math.toRadians(crs.lat2))
    private val q1 = qOf(math.toRadians(crs.lat1))
    private val q2 = qOf(math.toRadians(crs.lat2))
    val n: Double = (m1 * m1 - m2 * m2) / (q2 - q1)
    val bigC: Double = m1 * m1 + n * q1
    val rho0: Double = crs.a * math.sqrt(bigC - n * qOf(math.toRadians(crs.lat0))) / n
  }

  private def albersForward(crs: ConicCrs, k: AlbersConsts, c: Coordinate): Unit = {
    val phi = math.toRadians(c.y)
    val th = k.n * math.toRadians(c.x - crs.lon0)
    val rho = crs.a * math.sqrt(k.bigC - k.n * k.qOf(phi)) / k.n
    c.x = (crs.fe + rho * math.sin(th)) / crs.unit
    c.y = (crs.fn + k.rho0 - rho * math.cos(th)) / crs.unit
  }

  private def albersInverse(crs: ConicCrs, k: AlbersConsts, c: Coordinate): Unit = {
    val x = c.x * crs.unit - crs.fe
    val y = k.rho0 - (c.y * crs.unit - crs.fn)
    // Snyder p.102: with a negative cone constant (southern standard
    // parallels — Australian Albers), ρ carries n's sign and θ comes
    // from the reflected coordinates, else the azimuth lands a full
    // cone revolution off
    val rho = (if (k.n < 0) -1 else 1) * math.sqrt(x * x + y * y)
    val q = (k.bigC - math.pow(rho * k.n / crs.a, 2)) / k.n
    val th = if (k.n < 0) math.atan2(-x, -y) else math.atan2(x, y)
    // Newton for phi (Snyder 3-16); seed with the spherical arcsin
    var phi = math.asin(math.max(-1.0, math.min(1.0, q / 2)))
    var i = 0
    var delta = 1.0
    while (i < 15 && delta > 1e-14) {
      val s = math.sin(phi)
      val one = 1 - k.e2 * s * s
      val corr = one * one / (2 * math.cos(phi)) * (
        q / (1 - k.e2) - s / one +
          (1 / (2 * k.e)) * math.log((1 - k.e * s) / (1 + k.e * s)))
      phi += corr
      delta = math.abs(corr)
      i += 1
    }
    c.x = crs.lon0 + math.toDegrees(th / k.n)
    c.y = math.toDegrees(phi)
  }

  // ---- dispatch (consts cached per SRID — they depend only on the CRS) ----

  private val lccCache = new java.util.concurrent.ConcurrentHashMap[Int, LccConsts]()
  private val albersCache = new java.util.concurrent.ConcurrentHashMap[Int, AlbersConsts]()

  /** In-place (lon°, lat°) → (easting, northing) in the CRS's units. */
  def geographicToConic(srid: Int, c: Coordinate): Unit = {
    val crs = registry(srid)
    if (crs.kind == "lcc")
      lccForward(crs, lccCache.computeIfAbsent(srid, _ => new LccConsts(crs)), c)
    else
      albersForward(crs, albersCache.computeIfAbsent(srid, _ => new AlbersConsts(crs)), c)
  }

  /** In-place (easting, northing) → (lon°, lat°). */
  def conicToGeographic(srid: Int, c: Coordinate): Unit = {
    val crs = registry(srid)
    if (crs.kind == "lcc")
      lccInverse(crs, lccCache.computeIfAbsent(srid, _ => new LccConsts(crs)), c)
    else
      albersInverse(crs, albersCache.computeIfAbsent(srid, _ => new AlbersConsts(crs)), c)
  }
}
