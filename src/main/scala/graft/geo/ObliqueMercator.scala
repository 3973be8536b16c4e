package graft.geo

import org.locationtech.jts.geom.Coordinate

/** Hotine Oblique Mercator, variant B (EPSG method 9815) — the fourth
  * `ST_Transform` tier: projections whose central line runs oblique to
  * the meridians. Formulation follows EPSG Guidance Note 7-2 §3.2.7
  * (equivalently Snyder 1987 pp. 74-76); `tools/hotine_check.py` is an
  * independently transcribed implementation that reproduces the GN7-2
  * worked example to the mm and generates the spec's pinned probes.
  *
  * Registry members:
  *  - **EPSG 29873 Timbalai 1948 / RSO Borneo (m)** — the CRS of the
  *    EPSG worked example itself (Everest 1830 1967-definition
  *    ellipsoid), so the implementation is anchored to published
  *    authoritative numbers: test point 5°23'14.1129"N
  *    115°48'19.8196"E → 679245.73 E, 596562.78 N, and the projection
  *    centre → exactly (Ec, Nc) in variant B. Datum shift EPSG 1616
  *    (translations −679, 669, −48).
  *  - **EPSG 2056 CH1903+ / LV95** — the Swiss national grid: the
  *    special case α_c = γ_c = 90° (the skew axis runs east at the
  *    centre — Bern), Bessel 1841, false origin 2 600 000 / 1 200 000
  *    at the centre. Datum shift EPSG 1676 (translations 674.374,
  *    15.056, 405.346); the authoritative cm-level CHENyx06 grid
  *    correction stays out of scope, documented, like RDNAPTRANS for
  *    28992.
  *
  * Inverse latitude recovery iterates the isometric-latitude equation
  * to double precision, so round trips reproduce inputs to ~1e-9°.
  */
object ObliqueMercator {

  import NationalGrids.{Ellipsoid, Helmert, Wgs84}

  private val Bessel1841 = Ellipsoid(6377397.155, 299.1528128)
  private val Everest1967 = Ellipsoid(6377298.556, 300.8017)

  /** One 9815 CRS: ellipsoid, projection centre (degrees), azimuth of
    * the initial line α_c and rectified-grid angle γ_c (degrees), scale
    * on the initial line, false easting/northing AT THE CENTRE
    * (variant B), source→WGS84 Helmert. */
  final case class HomCrs(srid: Int, ell: Ellipsoid, latc: Double,
      lonc: Double, alphac: Double, gammac: Double, kc: Double,
      ec: Double, nc: Double, toWgs84: Option[Helmert])

  private def dms(d: Int, m: Int, s: Double): Double = d + m / 60.0 + s / 3600.0

  val registry: Map[Int, HomCrs] = Seq(
    HomCrs(29873, Everest1967, 4.0, 115.0,
      dms(53, 18, 56.9537), dms(53, 7, 48.3685), 0.99984,
      590476.87, 442857.65,
      Some(Helmert(-679.0, 669.0, -48.0, 0.0, 0.0, 0.0, 0.0))),
    HomCrs(2056, Bessel1841, dms(46, 57, 8.66), dms(7, 26, 22.5),
      90.0, 90.0, 1.0, 2600000.0, 1200000.0,
      Some(Helmert(674.374, 15.056, 405.346, 0.0, 0.0, 0.0, 0.0)))
  ).map(c => c.srid -> c).toMap

  def supports(srid: Int): Boolean = registry.contains(srid)

  private final class HomConsts(crs: HomCrs) {
    private val ell = crs.ell
    val e: Double = ell.e
    val e2: Double = ell.e2
    private val phic = math.toRadians(crs.latc)
    private val lamc = math.toRadians(crs.lonc)
    private val alphac = math.toRadians(crs.alphac)
    val gammac: Double = math.toRadians(crs.gammac)

    val bigB: Double =
      math.sqrt(1 + e2 * math.pow(math.cos(phic), 4) / (1 - e2))
    val bigA: Double = ell.a * bigB * crs.kc * math.sqrt(1 - e2) /
      (1 - e2 * math.sin(phic) * math.sin(phic))

    def tOf(phi: Double): Double = {
      val s = math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - e * s) / (1 + e * s), e / 2)
    }

    private val t0 = tOf(phic)
    private val bigD = bigB * math.sqrt(1 - e2) /
      (math.cos(phic) * math.sqrt(1 - e2 * math.sin(phic) * math.sin(phic)))
    private val bigD2 = math.max(bigD * bigD, 1.0)
    private val bigF = bigD + math.copySign(math.sqrt(bigD2 - 1), phic)
    val bigH: Double = bigF * math.pow(t0, bigB)
    private val bigG = (bigF - 1 / bigF) / 2
    val gamma0: Double = math.asin(math.sin(alphac) / bigD)
    val lam0: Double = lamc - math.asin(bigG * math.tan(gamma0)) / bigB

    /** |u| at the projection centre; variant B's offset. */
    val ucAbs: Double =
      if (math.abs(crs.alphac - 90.0) < 1e-12) math.abs(bigA * (lamc - lam0))
      else math.abs((bigA / bigB) *
        math.atan2(math.sqrt(bigD2 - 1), math.cos(alphac)))
    val ucSigned: Double = math.copySign(ucAbs, phic)
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, HomConsts]()
  private def consts(srid: Int): HomConsts =
    cache.computeIfAbsent(srid, _ => new HomConsts(registry(srid)))

  /** Projection-only forward on the CRS's own datum: (lon°, lat°) →
    * (E, N). Exposed for the spec's worked-example pins. */
  def homForward(srid: Int, c: Coordinate): Unit = {
    val crs = registry(srid)
    val k = consts(srid)
    val phi = math.toRadians(c.y)
    val lam = math.toRadians(c.x)
    val t = k.tOf(phi)
    val q = k.bigH / math.pow(t, k.bigB)
    val s = (q - 1 / q) / 2
    val bigT = (q + 1 / q) / 2
    val v0 = math.sin(k.bigB * (lam - k.lam0))
    val u0 = (-v0 * math.cos(k.gamma0) + s * math.sin(k.gamma0)) / bigT
    val v = k.bigA * math.log((1 - u0) / (1 + u0)) / (2 * k.bigB)
    val u = k.bigA * math.atan2(
      s * math.cos(k.gamma0) + v0 * math.sin(k.gamma0),
      math.cos(k.bigB * (lam - k.lam0))) / k.bigB - k.ucSigned
    c.x = v * math.cos(k.gammac) + u * math.sin(k.gammac) + crs.ec
    c.y = u * math.cos(k.gammac) - v * math.sin(k.gammac) + crs.nc
  }

  /** Projection-only inverse to the CRS's own datum: (E, N) →
    * (lon°, lat°). */
  def homInverse(srid: Int, c: Coordinate): Unit = {
    val crs = registry(srid)
    val k = consts(srid)
    val vP = (c.x - crs.ec) * math.cos(k.gammac) -
      (c.y - crs.nc) * math.sin(k.gammac)
    val uP = (c.y - crs.nc) * math.cos(k.gammac) +
      (c.x - crs.ec) * math.sin(k.gammac) + k.ucSigned
    val q = math.exp(-k.bigB * vP / k.bigA)
    val s = (q - 1 / q) / 2
    val bigT = (q + 1 / q) / 2
    val vv = math.sin(k.bigB * uP / k.bigA)
    val uu = (vv * math.cos(k.gamma0) + s * math.sin(k.gamma0)) / bigT
    val t = math.pow(k.bigH / math.sqrt((1 + uu) / (1 - uu)), 1 / k.bigB)
    // iterate the isometric-latitude equation to convergence
    var phi = math.Pi / 2 - 2 * math.atan(t)
    var i = 0
    var delta = 1.0
    while (i < 15 && delta > 1e-14) {
      val es = k.e * math.sin(phi)
      val next = math.Pi / 2 - 2 * math.atan(
        t * math.pow((1 - es) / (1 + es), k.e / 2))
      delta = math.abs(next - phi)
      phi = next
      i += 1
    }
    val lam = k.lam0 - math.atan2(
      s * math.cos(k.gamma0) - vv * math.sin(k.gamma0),
      math.cos(k.bigB * uP / k.bigA)) / k.bigB
    c.x = math.toDegrees(lam)
    c.y = math.toDegrees(phi)
  }

  /** In-place WGS84 geographic (lon°, lat°) → CRS (E, N), datum-shifted. */
  def geographicToHom(srid: Int, c: Coordinate): Unit = {
    val crs = registry(srid)
    crs.toWgs84.foreach { h =>
      val (x, y, z) = NationalGrids.toGeocentric(Wgs84, c.x, c.y)
      val (xs, ys, zs) = NationalGrids.helmertShift(h, reverse = true, x, y, z)
      val (lon, lat) = NationalGrids.toGeodetic(crs.ell, xs, ys, zs)
      c.x = lon; c.y = lat
    }
    homForward(srid, c)
  }

  /** In-place CRS (E, N) → WGS84 geographic (lon°, lat°). */
  def homToGeographic(srid: Int, c: Coordinate): Unit = {
    val crs = registry(srid)
    homInverse(srid, c)
    crs.toWgs84.foreach { h =>
      val (x, y, z) = NationalGrids.toGeocentric(crs.ell, c.x, c.y)
      val (xw, yw, zw) = NationalGrids.helmertShift(h, reverse = false, x, y, z)
      val (lon, lat) = NationalGrids.toGeodetic(Wgs84, xw, yw, zw)
      c.x = lon; c.y = lat
    }
  }
}
