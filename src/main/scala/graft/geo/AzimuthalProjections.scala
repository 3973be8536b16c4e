package graft.geo

import org.locationtech.jts.geom.Coordinate

/** Azimuthal projected CRSs: Oblique ("double") Stereographic (EPSG
  * method 9809) and Lambert Azimuthal Equal Area (EPSG method 9820) on
  * the ellipsoid — the third tier of the `ST_Transform` surface after
  * the transverse-Mercator families ([[TransverseMercator]],
  * [[NationalGrids]]) and the conics ([[ConicProjections]]).
  *
  * Registry members:
  *  - **EPSG 28992 Amersfoort / RD New** — the Dutch national grid and
  *    the canonical 9809 CRS. Projection goes through a conformal
  *    sphere ("double projection": ellipsoid → conformal sphere →
  *    plane), which is NOT the same surface as Snyder's one-step
  *    ellipsoidal oblique stereographic — PROJ ships them as distinct
  *    methods (`sterea` vs `stere`) and only `sterea` reproduces RD.
  *    Datum: Bessel 1841 with the EPSG 15934 position-vector Helmert
  *    (Amersfoort → ETRS89, treated WGS84-coincident like the other
  *    ETRS89 members; the fit itself is quoted at the sub-meter level
  *    over the Netherlands, the authoritative RDNAPTRANS grid
  *    correction — decimeter scale — stays out of scope, documented).
  *  - **EPSG 3035 ETRS89-extended / LAEA Europe** — the EU's standard
  *    equal-area statistical grid (INSPIRE, Eurostat, Copernicus).
  *    GRS80, no datum shift.
  *
  * Formulation follows EPSG Guidance Note 7-2 §3.2.4 (9809) and §3.2.2
  * (9820). `tools/sterea_laea_check.py` is an independently transcribed
  * implementation whose pinned outputs [[NationalGridSpec]] compares
  * against to catch transcription errors in either copy; the spec also
  * pins the EPSG worked examples (9809: 53°N 6°E → 196105.283 E
  * 557057.739 N; 9820: 50°N 5°E → 3962799.45 E 2999718.85 N) and the
  * exact natural-origin anchors (origin → false easting/northing).
  * Inverse latitude recovery iterates to double precision, so round
  * trips reproduce inputs to ~1e-9 degrees.
  */
object AzimuthalProjections {

  import NationalGrids.{Ellipsoid, Helmert, Wgs84}

  private val Bessel1841 = Ellipsoid(6377397.155, 299.1528128)
  private val Grs80 = NationalGrids.Grs80

  /** One azimuthal CRS: kind ("sterea" | "laea"), ellipsoid, natural
    * origin (degrees), scale at origin (unused by laea), false
    * easting/northing (m), source→WGS84 Helmert (None when the datum is
    * WGS84-coincident). */
  final case class AzCrs(srid: Int, kind: String, ell: Ellipsoid,
      lat0: Double, lon0: Double, k0: Double, fe: Double, fn: Double,
      toWgs84: Option[Helmert])

  /** Parameters from the EPSG registry entries; the Amersfoort Helmert
    * is EPSG 15934 (position vector, the current national fit). */
  val registry: Map[Int, AzCrs] = Seq(
    // Amersfoort / RD New (lat0 52°09'22.178"N, lon0 5°23'15.500"E)
    AzCrs(28992, "sterea", Bessel1841,
      52.0 + 9.0 / 60 + 22.178 / 3600, 5.0 + 23.0 / 60 + 15.5 / 3600,
      0.9999079, 155000.0, 463000.0,
      Some(Helmert(565.417, 50.3319, 465.552, -0.398957, 0.343988, -1.8774, 4.0772))),
    // ETRS89-extended / LAEA Europe
    AzCrs(3035, "laea", Grs80, 52.0, 10.0, 1.0, 4321000.0, 3210000.0, None)
  ).map(c => c.srid -> c).toMap

  def supports(srid: Int): Boolean = registry.contains(srid)

  // ---- Oblique (double) stereographic, EPSG 9809 -------------------------

  private final class StereaConsts(crs: AzCrs) {
    private val ell = crs.ell
    private val e = ell.e
    private val phi0 = math.toRadians(crs.lat0)
    private val s0 = math.sin(phi0)
    // radius of the conformal sphere at the origin: R = sqrt(rho0 * nu0)
    val bigR: Double = {
      val w = 1.0 - ell.e2 * s0 * s0
      val rho0 = ell.a * (1.0 - ell.e2) / (w * math.sqrt(w))
      val nu0 = ell.a / math.sqrt(w)
      math.sqrt(rho0 * nu0)
    }
    val n: Double = math.sqrt(
      1.0 + ell.e2 * math.pow(math.cos(phi0), 4) / (1.0 - ell.e2))
    val c: Double = {
      val s1 = (1.0 + s0) / (1.0 - s0)
      val s2 = (1.0 - e * s0) / (1.0 + e * s0)
      val w1 = math.pow(s1 * math.pow(s2, e), n)
      val sinChi00 = (w1 - 1.0) / (w1 + 1.0)
      (n + s0) * (1.0 - sinChi00) / ((n - s0) * (1.0 + sinChi00))
    }
    val chi0: Double = {
      val s1 = (1.0 + s0) / (1.0 - s0)
      val s2 = (1.0 - e * s0) / (1.0 + e * s0)
      val w2 = c * math.pow(s1 * math.pow(s2, e), n)
      math.asin((w2 - 1.0) / (w2 + 1.0))
    }
    val lam0: Double = math.toRadians(crs.lon0)
  }

  /** Geodetic latitude → conformal-sphere latitude χ. */
  private def chiOf(k: StereaConsts, ell: Ellipsoid, phi: Double): Double = {
    val s = math.sin(phi)
    val sa = (1.0 + s) / (1.0 - s)
    val sb = (1.0 - ell.e * s) / (1.0 + ell.e * s)
    val w = k.c * math.pow(sa * math.pow(sb, ell.e), k.n)
    math.asin((w - 1.0) / (w + 1.0))
  }

  private def stereaForward(crs: AzCrs, k: StereaConsts, c: Coordinate): Unit = {
    val lam = k.n * (math.toRadians(c.x) - k.lam0) + k.lam0
    val chi = chiOf(k, crs.ell, math.toRadians(c.y))
    val dl = lam - k.lam0
    val b = 1.0 + math.sin(chi) * math.sin(k.chi0) +
      math.cos(chi) * math.cos(k.chi0) * math.cos(dl)
    c.x = crs.fe + 2.0 * k.bigR * crs.k0 * math.cos(chi) * math.sin(dl) / b
    c.y = crs.fn + 2.0 * k.bigR * crs.k0 *
      (math.sin(chi) * math.cos(k.chi0) - math.cos(chi) * math.sin(k.chi0) * math.cos(dl)) / b
  }

  private def stereaInverse(crs: AzCrs, k: StereaConsts, c: Coordinate): Unit = {
    val ell = crs.ell
    val eP = c.x - crs.fe
    val nP = c.y - crs.fn
    val rk = 2.0 * k.bigR * crs.k0
    val g = rk * math.tan(math.Pi / 4 - k.chi0 / 2)
    val h = 2.0 * rk * math.tan(k.chi0) + g
    val ii = math.atan2(eP, h + nP)
    val jj = math.atan2(eP, g - nP) - ii
    val chi = k.chi0 + 2.0 * math.atan((nP - eP * math.tan(jj / 2)) / rk)
    val lam = jj + 2.0 * ii + k.lam0
    c.x = math.toDegrees((lam - k.lam0) / k.n + k.lam0)
    // isometric latitude on the conformal sphere back to the ellipsoid
    val psi = 0.5 * math.log(
      (1.0 + math.sin(chi)) / (k.c * (1.0 - math.sin(chi)))) / k.n
    var phi = 2.0 * math.atan(math.exp(psi)) - math.Pi / 2
    var i = 0
    var delta = 1.0
    while (i < 15 && delta > 1e-14) {
      val s = ell.e * math.sin(phi)
      val psiI = math.log(math.tan(phi / 2 + math.Pi / 4) *
        math.pow((1.0 - s) / (1.0 + s), ell.e / 2))
      val corr = (psiI - psi) * math.cos(phi) *
        (1.0 - s * s) / (1.0 - ell.e2)
      phi -= corr
      delta = math.abs(corr)
      i += 1
    }
    c.y = math.toDegrees(phi)
  }

  // ---- Lambert Azimuthal Equal Area, EPSG 9820 ---------------------------

  private final class LaeaConsts(crs: AzCrs) {
    private val ell = crs.ell
    val e2: Double = ell.e2
    val e: Double = ell.e
    def qOf(phi: Double): Double = {
      val s = math.sin(phi)
      (1.0 - e2) * (s / (1.0 - e2 * s * s) -
        (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s)))
    }
    val qp: Double = qOf(math.Pi / 2)
    private val phi0 = math.toRadians(crs.lat0)
    val beta0: Double = math.asin(qOf(phi0) / qp)
    val rq: Double = ell.a * math.sqrt(qp / 2.0)
    val d: Double = {
      val m0 = math.cos(phi0) / math.sqrt(1.0 - e2 * math.sin(phi0) * math.sin(phi0))
      ell.a * m0 / (rq * math.cos(beta0))
    }
    val lam0: Double = math.toRadians(crs.lon0)
    // authalic → geodetic latitude series coefficients
    val c1: Double = e2 / 3.0 + 31.0 * e2 * e2 / 180.0 + 517.0 * e2 * e2 * e2 / 5040.0
    val c2: Double = 23.0 * e2 * e2 / 360.0 + 251.0 * e2 * e2 * e2 / 3780.0
    val c3: Double = 761.0 * e2 * e2 * e2 / 45360.0
  }

  private def laeaForward(crs: AzCrs, k: LaeaConsts, c: Coordinate): Unit = {
    val lam = math.toRadians(c.x) - k.lam0
    val beta = math.asin(math.max(-1.0, math.min(1.0,
      k.qOf(math.toRadians(c.y)) / k.qp)))
    val b = k.rq * math.sqrt(2.0 /
      (1.0 + math.sin(k.beta0) * math.sin(beta) +
        math.cos(k.beta0) * math.cos(beta) * math.cos(lam)))
    c.x = crs.fe + b * k.d * math.cos(beta) * math.sin(lam)
    c.y = crs.fn + (b / k.d) * (math.cos(k.beta0) * math.sin(beta) -
      math.sin(k.beta0) * math.cos(beta) * math.cos(lam))
  }

  private def laeaInverse(crs: AzCrs, k: LaeaConsts, c: Coordinate): Unit = {
    val eP = (c.x - crs.fe) / k.d
    val nP = (c.y - crs.fn) * k.d
    val rho = math.hypot(eP, nP)
    if (rho < 1e-12) { c.x = math.toDegrees(k.lam0); c.y = crs.lat0; return }
    val cc = 2.0 * math.asin(math.max(-1.0, math.min(1.0, rho / (2.0 * k.rq))))
    val betaP = math.asin(math.max(-1.0, math.min(1.0,
      math.cos(cc) * math.sin(k.beta0) + nP * math.sin(cc) * math.cos(k.beta0) / rho)))
    val lam = k.lam0 + math.atan2(eP * math.sin(cc),
      rho * math.cos(k.beta0) * math.cos(cc) - nP * math.sin(k.beta0) * math.sin(cc))
    val phi = betaP + k.c1 * math.sin(2.0 * betaP) +
      k.c2 * math.sin(4.0 * betaP) + k.c3 * math.sin(6.0 * betaP)
    c.x = math.toDegrees(lam)
    c.y = math.toDegrees(phi)
  }

  // ---- dispatch (consts cached per SRID) ---------------------------------

  private val stereaCache = new java.util.concurrent.ConcurrentHashMap[Int, StereaConsts]()
  private val laeaCache = new java.util.concurrent.ConcurrentHashMap[Int, LaeaConsts]()

  /** In-place projection-only forward on the CRS's OWN datum — exposed
    * so the spec can pin the EPSG worked examples, which are quoted in
    * native-datum geodetic coordinates. */
  def azForward(srid: Int, c: Coordinate): Unit = {
    val crs = registry(srid)
    if (crs.kind == "sterea")
      stereaForward(crs, stereaCache.computeIfAbsent(srid, _ => new StereaConsts(crs)), c)
    else
      laeaForward(crs, laeaCache.computeIfAbsent(srid, _ => new LaeaConsts(crs)), c)
  }

  /** In-place projection-only inverse to the CRS's own datum. */
  def azInverse(srid: Int, c: Coordinate): Unit = {
    val crs = registry(srid)
    if (crs.kind == "sterea")
      stereaInverse(crs, stereaCache.computeIfAbsent(srid, _ => new StereaConsts(crs)), c)
    else
      laeaInverse(crs, laeaCache.computeIfAbsent(srid, _ => new LaeaConsts(crs)), c)
  }

  /** In-place WGS84 geographic (lon°, lat°) → CRS (easting, northing),
    * shifting datum when the CRS's datum is not WGS84-coincident. */
  def geographicToAz(srid: Int, c: Coordinate): Unit = {
    val crs = registry(srid)
    crs.toWgs84.foreach { h =>
      val (x, y, z) = NationalGrids.toGeocentric(Wgs84, c.x, c.y)
      val (xs, ys, zs) = NationalGrids.helmertShift(h, reverse = true, x, y, z)
      val (lon, lat) = NationalGrids.toGeodetic(crs.ell, xs, ys, zs)
      c.x = lon; c.y = lat
    }
    azForward(srid, c)
  }

  /** In-place CRS (easting, northing) → WGS84 geographic (lon°, lat°). */
  def azToGeographic(srid: Int, c: Coordinate): Unit = {
    val crs = registry(srid)
    azInverse(srid, c)
    crs.toWgs84.foreach { h =>
      val (x, y, z) = NationalGrids.toGeocentric(crs.ell, c.x, c.y)
      val (xw, yw, zw) = NationalGrids.helmertShift(h, reverse = false, x, y, z)
      val (lon, lat) = NationalGrids.toGeodetic(Wgs84, xw, yw, zw)
      c.x = lon; c.y = lat
    }
  }
}
