package graft.geo

import org.locationtech.jts.geom.Coordinate

/** WGS84 UTM (EPSG 326zz / 327zz) via the Krüger n-series transverse
  * Mercator — the exact-series formulation PROJ and GeographicLib use
  * (Karney 2011, "Transverse Mercator with an accuracy of a few
  * nanometers"; series coefficients to n⁶ as published there and in the
  * standard references). Closed-form both ways: no grids, no PROJ
  * dependency, truncation error far below a millimeter anywhere a UTM
  * zone is legitimately used (and micrometers even several zones from
  * the central meridian).
  *
  * The reverse direction recovers geodetic latitude from the conformal
  * latitude with Karney's Newton iteration on τ = tanφ, which converges
  * to double precision in 2–3 steps — so a forward/backward round trip
  * reproduces the input to ~1e-9 degrees.
  *
  * Conventions: EPSG 326zz = zone zz north (false northing 0),
  * 327zz = zone zz south (false northing 10 000 000 m); false easting
  * 500 000 m; scale k0 = 0.9996; central meridian = 6·zz − 183 degrees.
  */
object TransverseMercator {

  private val A_axis = 6378137.0                 // WGS84 semi-major
  private val Flat = 1.0 / 298.257223563         // WGS84 flattening
  private val N3 = Flat / (2.0 - Flat)           // third flattening n
  private val E2 = Flat * (2.0 - Flat)           // eccentricity²
  private val Ecc = math.sqrt(E2)
  private val K0 = 0.9996
  private val FalseEasting = 500000.0
  private val FalseNorthingSouth = 10000000.0

  // rectifying radius A = a/(1+n)·(1 + n²/4 + n⁴/64 + n⁶/256)
  private val RectA = {
    val n2 = N3 * N3
    A_axis / (1.0 + N3) * (1.0 + n2 / 4.0 + n2 * n2 / 64.0 + n2 * n2 * n2 / 256.0)
  }

  // Krüger series coefficients to n⁶ (Karney 2011, eqs. 35/36)
  private val Alpha: Array[Double] = {
    val n = N3; val n2 = n * n; val n3 = n2 * n; val n4 = n2 * n2
    val n5 = n4 * n; val n6 = n4 * n2
    Array(
      n / 2.0 - 2.0 / 3.0 * n2 + 5.0 / 16.0 * n3 + 41.0 / 180.0 * n4
        - 127.0 / 288.0 * n5 + 7891.0 / 37800.0 * n6,
      13.0 / 48.0 * n2 - 3.0 / 5.0 * n3 + 557.0 / 1440.0 * n4
        + 281.0 / 630.0 * n5 - 1983433.0 / 1935360.0 * n6,
      61.0 / 240.0 * n3 - 103.0 / 140.0 * n4 + 15061.0 / 26880.0 * n5
        + 167603.0 / 181440.0 * n6,
      49561.0 / 161280.0 * n4 - 179.0 / 168.0 * n5 + 6601661.0 / 7257600.0 * n6,
      34729.0 / 80640.0 * n5 - 3418889.0 / 1995840.0 * n6,
      212378941.0 / 319334400.0 * n6)
  }

  private val Beta: Array[Double] = {
    val n = N3; val n2 = n * n; val n3 = n2 * n; val n4 = n2 * n2
    val n5 = n4 * n; val n6 = n4 * n2
    Array(
      n / 2.0 - 2.0 / 3.0 * n2 + 37.0 / 96.0 * n3 - 1.0 / 360.0 * n4
        - 81.0 / 512.0 * n5 + 96199.0 / 604800.0 * n6,
      1.0 / 48.0 * n2 + 1.0 / 15.0 * n3 - 437.0 / 1440.0 * n4
        + 46.0 / 105.0 * n5 - 1118711.0 / 3870720.0 * n6,
      17.0 / 480.0 * n3 - 37.0 / 840.0 * n4 - 209.0 / 4480.0 * n5
        + 5569.0 / 90720.0 * n6,
      4397.0 / 161280.0 * n4 - 11.0 / 504.0 * n5 - 830251.0 / 7257600.0 * n6,
      4583.0 / 161280.0 * n5 - 108847.0 / 3991680.0 * n6,
      20648693.0 / 638668800.0 * n6)
  }

  /** Central meridian of a UTM zone, degrees. */
  def centralMeridianDeg(zone: Int): Double = 6.0 * zone - 183.0

  def zoneOf(srid: Int): Int = srid % 100

  def isSouth(srid: Int): Boolean = srid >= 32701 && srid <= 32760

  /** In-place (lon°, lat°) → (easting m, northing m) for the UTM SRID. */
  def geographicToUtm(srid: Int, c: Coordinate): Unit = {
    val lat = math.toRadians(c.y)
    val dLon = math.toRadians(c.x - centralMeridianDeg(zoneOf(srid)))
    // conformal latitude via τ' (Karney eq. 7-9)
    val sinLat = math.sin(lat)
    val t = math.sinh(atanh(sinLat) - (2.0 * math.sqrt(N3) / (1.0 + N3)) *
      atanh((2.0 * math.sqrt(N3) / (1.0 + N3)) * sinLat))
    val xiP = math.atan2(t, math.cos(dLon))
    val etaP = asinh(math.sin(dLon) / math.hypot(t, math.cos(dLon)))
    var xi = xiP
    var eta = etaP
    var j = 1
    while (j <= 6) {
      xi += Alpha(j - 1) * math.sin(2.0 * j * xiP) * math.cosh(2.0 * j * etaP)
      eta += Alpha(j - 1) * math.cos(2.0 * j * xiP) * math.sinh(2.0 * j * etaP)
      j += 1
    }
    c.x = FalseEasting + K0 * RectA * eta
    c.y = (if (isSouth(srid)) FalseNorthingSouth else 0.0) + K0 * RectA * xi
  }

  /** In-place (easting m, northing m) → (lon°, lat°) for the UTM SRID. */
  def utmToGeographic(srid: Int, c: Coordinate): Unit = {
    val xi0 = (c.y - (if (isSouth(srid)) FalseNorthingSouth else 0.0)) / (K0 * RectA)
    val eta0 = (c.x - FalseEasting) / (K0 * RectA)
    var xiP = xi0
    var etaP = eta0
    var j = 1
    while (j <= 6) {
      xiP -= Beta(j - 1) * math.sin(2.0 * j * xi0) * math.cosh(2.0 * j * eta0)
      etaP -= Beta(j - 1) * math.cos(2.0 * j * xi0) * math.sinh(2.0 * j * eta0)
      j += 1
    }
    val sinhEta = math.sinh(etaP)
    val cosXi = math.cos(xiP)
    // τ' on the conformal sphere, then Newton back to geodetic τ = tanφ
    val tauP = math.sin(xiP) / math.hypot(sinhEta, cosXi)
    var tau = tauP / math.sqrt(1.0 - E2) // first-order seed
    var i = 0
    while (i < 5) {
      val sig = math.sinh(Ecc * atanh(Ecc * tau / math.hypot(1.0, tau)))
      val fTau = tau * math.hypot(1.0, sig) - sig * math.hypot(1.0, tau) - tauP
      val dTau = (math.hypot(1.0, sig) * math.hypot(1.0, tau) - sig * tau) *
        (1.0 - E2) * math.hypot(1.0, tau) / (1.0 + (1.0 - E2) * tau * tau)
      val step = fTau / dTau
      tau -= step
      i += 1
      if (math.abs(step) < 1e-16 * math.max(1.0, math.abs(tau))) i = 5
    }
    c.y = math.toDegrees(math.atan(tau))
    c.x = centralMeridianDeg(zoneOf(srid)) +
      math.toDegrees(math.atan2(sinhEta, cosXi))
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))
  private def asinh(x: Double): Double = math.log(x + math.hypot(1.0, x))
}
