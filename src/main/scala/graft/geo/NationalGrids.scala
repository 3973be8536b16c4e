package graft.geo

import org.locationtech.jts.geom.Coordinate

/** National-grid transverse Mercator CRSs on non-WGS84 datums: the
  * generalized Krüger-series TM (any ellipsoid, any 1SP natural origin /
  * scale factor) composed with a Helmert 7-parameter datum shift through
  * geocentric coordinates. This is the tier the WGS84-family
  * `ST_Transform` ([[graft.functions]] transform kernel) could not reach:
  * CRSs whose datum is NOT coincident with WGS84 at the meter level —
  * OSGB36 (≈120 m shift over Britain), TM65 (Ireland), ED50 (≈200 m over
  * Europe).
  *
  * Projection math: the same Karney 2011 n-series used by
  * [[TransverseMercator]] for WGS84 UTM, with the coefficient polynomials
  * evaluated per-ellipsoid (Airy 1830, Airy Modified, International 1924,
  * GRS80) and the natural-origin meridian arc subtracted for grids whose
  * latitude of origin is not the equator. Truncation error is below a
  * millimeter anywhere these grids are defined.
  *
  * Datum math: geodetic (h = 0) → geocentric XYZ on the source ellipsoid,
  * position-vector 7-parameter Helmert (EPSG method 9606), geocentric →
  * geodetic on the target ellipsoid (fixed-point latitude recovery).
  * The reverse shift inverts the forward operator exactly (closed-form
  * 3×3 inverse — see [[helmert]]) instead of the EPSG
  * negate-the-parameters approximation, so round trips are identity to
  * floating point. Heights are projected to the ellipsoid (2-D GIS
  * semantics, same as PROJ's 2-D pipelines).
  *
  * Accuracy note (documented, deliberate): the published single-Helmert
  * parameters ARE the datum realization only to a few meters — OSGB36's
  * national 7-parameter fit is quoted by Ordnance Survey at ~3.5 m
  * (the authoritative transformation is the OSTN grid, out of scope);
  * ED50's 3-parameter mean fit is ~5-10 m regionally. The MATH here is
  * exact for the quoted parameters; the parameters themselves carry the
  * survey-grade caveat. Round trips through this code reproduce inputs
  * to ~1e-9 degrees regardless, because forward and inverse use the same
  * parameters.
  */
object NationalGrids {

  /** Reference ellipsoid: semi-major axis (m) and inverse flattening. */
  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = 1.0 / invF
    val n: Double = f / (2.0 - f) // third flattening
    val e2: Double = f * (2.0 - f)
    val e: Double = math.sqrt(e2)
  }

  val Airy1830 = Ellipsoid(6377563.396, 299.3249646)
  val AiryModified = Ellipsoid(6377340.189, 299.3249646)
  val International1924 = Ellipsoid(6378388.0, 297.0)
  val Grs80 = Ellipsoid(6378137.0, 298.257222101)
  val Wgs84 = Ellipsoid(6378137.0, 298.257223563)

  /** Position-vector 7-parameter Helmert, SOURCE datum → WGS84:
    * translations in meters, rotations in arc-seconds, scale in ppm. */
  final case class Helmert(tx: Double, ty: Double, tz: Double,
      rxSec: Double, rySec: Double, rzSec: Double, dsPpm: Double)

  /** One TM-1SP national grid: ellipsoid, natural origin (degrees),
    * scale at natural origin, false easting/northing (m), and the
    * source→WGS84 Helmert (None when the datum is WGS84-coincident,
    * e.g. ETRS89 grids). */
  final case class TmCrs(srid: Int, ell: Ellipsoid, lat0: Double,
      lon0: Double, k0: Double, fe: Double, fn: Double,
      toWgs84: Option[Helmert])

  /** Parameters from the EPSG registry entries; Helmerts are the
    * published national single-transform fits (EPSG 1314 for OSGB36,
    * EPSG 1641 for TM65→ETRS89, the ED50 European mean translations). */
  val registry: Map[Int, TmCrs] = Seq(
    // OSGB36 / British National Grid
    TmCrs(27700, Airy1830, 49.0, -2.0, 0.9996012717, 400000.0, -100000.0,
      Some(Helmert(446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894))),
    // TM65 / Irish Grid
    TmCrs(29902, AiryModified, 53.5, -8.0, 1.000035, 200000.0, 250000.0,
      Some(Helmert(482.5, -130.6, 564.6, -1.042, -0.214, -0.631, 8.15))),
    // IRENET95 / Irish Transverse Mercator (ETRS89 — WGS84-coincident)
    TmCrs(2157, Grs80, 53.5, -8.0, 0.99982, 600000.0, 750000.0, None),
    // ED50 / UTM zone 31N (European 3-parameter mean shift)
    TmCrs(23031, International1924, 0.0, 3.0, 0.9996, 500000.0, 0.0,
      Some(Helmert(-87.0, -96.0, -120.0, 0.0, 0.0, 0.0, 0.0)))
  ).map(c => c.srid -> c).toMap

  def supports(srid: Int): Boolean = registry.contains(srid)

  // ---- Krüger series, per-ellipsoid (Karney 2011 eqs. 35/36) -------------

  private final class TmConsts(crs: TmCrs) {
    private val n = crs.ell.n
    private val n2 = n * n; private val n3 = n2 * n; private val n4 = n2 * n2
    private val n5 = n4 * n; private val n6 = n4 * n2
    val rectA: Double =
      crs.ell.a / (1.0 + n) * (1.0 + n2 / 4.0 + n4 / 64.0 + n6 / 256.0)
    val alpha: Array[Double] = Array(
      n / 2.0 - 2.0 / 3.0 * n2 + 5.0 / 16.0 * n3 + 41.0 / 180.0 * n4
        - 127.0 / 288.0 * n5 + 7891.0 / 37800.0 * n6,
      13.0 / 48.0 * n2 - 3.0 / 5.0 * n3 + 557.0 / 1440.0 * n4
        + 281.0 / 630.0 * n5 - 1983433.0 / 1935360.0 * n6,
      61.0 / 240.0 * n3 - 103.0 / 140.0 * n4 + 15061.0 / 26880.0 * n5
        + 167603.0 / 181440.0 * n6,
      49561.0 / 161280.0 * n4 - 179.0 / 168.0 * n5 + 6601661.0 / 7257600.0 * n6,
      34729.0 / 80640.0 * n5 - 3418889.0 / 1995840.0 * n6,
      212378941.0 / 319334400.0 * n6)
    val beta: Array[Double] = Array(
      n / 2.0 - 2.0 / 3.0 * n2 + 37.0 / 96.0 * n3 - 1.0 / 360.0 * n4
        - 81.0 / 512.0 * n5 + 96199.0 / 604800.0 * n6,
      1.0 / 48.0 * n2 + 1.0 / 15.0 * n3 - 437.0 / 1440.0 * n4
        + 46.0 / 105.0 * n5 - 1118711.0 / 3870720.0 * n6,
      17.0 / 480.0 * n3 - 37.0 / 840.0 * n4 - 209.0 / 4480.0 * n5
        + 5569.0 / 90720.0 * n6,
      4397.0 / 161280.0 * n4 - 11.0 / 504.0 * n5 - 830251.0 / 7257600.0 * n6,
      4583.0 / 161280.0 * n5 - 108847.0 / 3991680.0 * n6,
      20648693.0 / 638668800.0 * n6)
    /** Meridian arc from the equator to the natural-origin latitude:
      * rectA · ξ(lat0) with ξ evaluated on the central meridian. */
    val m0: Double = rectA * xiEta(crs.ell, alpha, math.toRadians(crs.lat0), 0.0)._1
  }

  /** (ξ, η) of a geodetic (lat, dLon) in radians on the given ellipsoid. */
  private def xiEta(ell: Ellipsoid, alpha: Array[Double],
      lat: Double, dLon: Double): (Double, Double) = {
    val sinLat = math.sin(lat)
    val c = 2.0 * math.sqrt(ell.n) / (1.0 + ell.n)
    val t = math.sinh(atanh(sinLat) - c * atanh(c * sinLat))
    val xiP = math.atan2(t, math.cos(dLon))
    val etaP = asinh(math.sin(dLon) / math.hypot(t, math.cos(dLon)))
    var xi = xiP
    var eta = etaP
    var j = 1
    while (j <= 6) {
      xi += alpha(j - 1) * math.sin(2.0 * j * xiP) * math.cosh(2.0 * j * etaP)
      eta += alpha(j - 1) * math.cos(2.0 * j * xiP) * math.sinh(2.0 * j * etaP)
      j += 1
    }
    (xi, eta)
  }

  /** Per-SRID series constants, keyed by `crs.srid` — callers projecting
    * ad-hoc [[TmCrs]] instances (the WGS84 UTM wrapper in
    * [[TransverseMercator]]) must therefore use SRIDs disjoint from the
    * registry's, which EPSG numbering guarantees. */
  private val tmCache = new java.util.concurrent.ConcurrentHashMap[Int, TmConsts]()
  private def consts(crs: TmCrs): TmConsts =
    tmCache.computeIfAbsent(crs.srid, _ => new TmConsts(crs))

  /** In-place (lon°, lat°) ON THE GRID'S OWN DATUM → (easting, northing).
    * Exposed (not private) so the spec can pin the published
    * projection-only worked examples, which are quoted in native-datum
    * geodetic coordinates. */
  def tmForward(srid: Int, c: Coordinate): Unit = project(registry(srid), c)

  /** Projection-only forward for an explicit CRS — the generalized
    * Krüger core [[TransverseMercator]] delegates to for WGS84 UTM. */
  def project(crs: TmCrs, c: Coordinate): Unit = {
    val k = consts(crs)
    val (xi, eta) = xiEta(crs.ell, k.alpha,
      math.toRadians(c.y), math.toRadians(c.x - crs.lon0))
    c.x = crs.fe + crs.k0 * k.rectA * eta
    c.y = crs.fn + crs.k0 * (k.rectA * xi - k.m0)
  }

  /** In-place (easting, northing) → (lon°, lat°) on the grid's own datum. */
  def tmInverse(srid: Int, c: Coordinate): Unit = unproject(registry(srid), c)

  /** Projection-only inverse for an explicit CRS. */
  def unproject(crs: TmCrs, c: Coordinate): Unit = {
    val k = consts(crs)
    val ell = crs.ell
    val xi0 = (c.y - crs.fn + crs.k0 * k.m0) / (crs.k0 * k.rectA)
    val eta0 = (c.x - crs.fe) / (crs.k0 * k.rectA)
    var xiP = xi0
    var etaP = eta0
    var j = 1
    while (j <= 6) {
      xiP -= k.beta(j - 1) * math.sin(2.0 * j * xi0) * math.cosh(2.0 * j * eta0)
      etaP -= k.beta(j - 1) * math.cos(2.0 * j * xi0) * math.sinh(2.0 * j * eta0)
      j += 1
    }
    val sinhEta = math.sinh(etaP)
    val cosXi = math.cos(xiP)
    val tauP = math.sin(xiP) / math.hypot(sinhEta, cosXi)
    var tau = tauP / math.sqrt(1.0 - ell.e2)
    var i = 0
    while (i < 5) {
      val sig = math.sinh(ell.e * atanh(ell.e * tau / math.hypot(1.0, tau)))
      val fTau = tau * math.hypot(1.0, sig) - sig * math.hypot(1.0, tau) - tauP
      val dTau = (math.hypot(1.0, sig) * math.hypot(1.0, tau) - sig * tau) *
        (1.0 - ell.e2) * math.hypot(1.0, tau) / (1.0 + (1.0 - ell.e2) * tau * tau)
      val step = fTau / dTau
      tau -= step
      i += 1
      if (math.abs(step) < 1e-16 * math.max(1.0, math.abs(tau))) i = 5
    }
    c.y = math.toDegrees(math.atan(tau))
    c.x = crs.lon0 + math.toDegrees(math.atan2(sinhEta, cosXi))
  }

  // ---- Helmert through geocentric coordinates ----------------------------

  private final val SecToRad = math.Pi / (180.0 * 3600.0)

  /** Geodetic (lon°, lat°, h=0) → geocentric (X, Y, Z) meters.
    * `private[geo]`: the azimuthal registry ([[AzimuthalProjections]])
    * routes its Amersfoort Helmert through the same geocentric path. */
  private[geo] def toGeocentric(ell: Ellipsoid, lonDeg: Double, latDeg: Double): (Double, Double, Double) = {
    val lat = math.toRadians(latDeg)
    val lon = math.toRadians(lonDeg)
    val s = math.sin(lat)
    val nu = ell.a / math.sqrt(1.0 - ell.e2 * s * s)
    (nu * math.cos(lat) * math.cos(lon),
      nu * math.cos(lat) * math.sin(lon),
      nu * (1.0 - ell.e2) * s)
  }

  /** Geocentric → geodetic (lon°, lat°) on the ellipsoid, height dropped.
    * Fixed-point on latitude (converges to double precision in a few
    * steps at crustal heights). */
  private[geo] def toGeodetic(ell: Ellipsoid, x: Double, y: Double, z: Double): (Double, Double) = {
    val p = math.hypot(x, y)
    var lat = math.atan2(z, p * (1.0 - ell.e2))
    var i = 0
    while (i < 10) {
      val s = math.sin(lat)
      val nu = ell.a / math.sqrt(1.0 - ell.e2 * s * s)
      val next = math.atan2(z + ell.e2 * nu * s, p)
      if (math.abs(next - lat) < 1e-15) i = 10
      lat = next
      i += 1
    }
    (math.toDegrees(math.atan2(y, x)), math.toDegrees(lat))
  }

  /** Position-vector 7-parameter (EPSG 9606): X' = T + m·(I + S)·X with
    * S the skew matrix of the rotations. The reverse direction inverts
    * the forward operator EXACTLY — X = (I + S)⁻¹·(X' − T)/m with the
    * closed form (I + S)⁻¹ = (I − S + r·rᵀ)/(1 + |r|²) — rather than the
    * EPSG negate-the-parameters approximation, so forward∘reverse is
    * identity to floating point and grid↔grid round trips carry no
    * millimeter-level negation residue. */
  private[geo] def helmertShift(h: Helmert, reverse: Boolean,
      x: Double, y: Double, z: Double): (Double, Double, Double) = {
    val rx = h.rxSec * SecToRad
    val ry = h.rySec * SecToRad
    val rz = h.rzSec * SecToRad
    val m = 1.0 + h.dsPpm * 1e-6
    if (!reverse) {
      (h.tx + m * (x - rz * y + ry * z),
        h.ty + m * (rz * x + y - rx * z),
        h.tz + m * (-ry * x + rx * y + z))
    } else {
      val ux = (x - h.tx) / m
      val uy = (y - h.ty) / m
      val uz = (z - h.tz) / m
      val r2 = rx * rx + ry * ry + rz * rz
      val dot = rx * ux + ry * uy + rz * uz
      // (I − S + r·rᵀ)·u = u − r×u + r·(r·u), all over 1 + |r|²
      ((ux - (ry * uz - rz * uy) + rx * dot) / (1.0 + r2),
        (uy - (rz * ux - rx * uz) + ry * dot) / (1.0 + r2),
        (uz - (rx * uy - ry * ux) + rz * dot) / (1.0 + r2))
    }
  }

  /** In-place WGS84 geographic (lon°, lat°) → grid (easting, northing),
    * shifting datum when the grid's datum is not WGS84-coincident. */
  def geographicToGrid(srid: Int, c: Coordinate): Unit = {
    val crs = registry(srid)
    crs.toWgs84.foreach { h =>
      val (x, y, z) = toGeocentric(Wgs84, c.x, c.y)
      val (xs, ys, zs) = helmertShift(h, reverse = true, x, y, z)
      val (lon, lat) = toGeodetic(crs.ell, xs, ys, zs)
      c.x = lon; c.y = lat
    }
    tmForward(srid, c)
  }

  /** In-place grid (easting, northing) → WGS84 geographic (lon°, lat°). */
  def gridToGeographic(srid: Int, c: Coordinate): Unit = {
    val crs = registry(srid)
    tmInverse(srid, c)
    crs.toWgs84.foreach { h =>
      val (x, y, z) = toGeocentric(crs.ell, c.x, c.y)
      val (xw, yw, zw) = helmertShift(h, reverse = false, x, y, z)
      val (lon, lat) = toGeodetic(Wgs84, xw, yw, zw)
      c.x = lon; c.y = lat
    }
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))
  private def asinh(x: Double): Double = math.log(x + math.hypot(1.0, x))
}
