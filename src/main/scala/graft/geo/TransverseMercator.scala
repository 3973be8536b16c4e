package graft.geo

import org.locationtech.jts.geom.Coordinate

/** WGS84 UTM (EPSG 326zz / 327zz) as instances of the generalized
  * Krüger n-series transverse Mercator in [[NationalGrids]] — the
  * exact-series formulation PROJ and GeographicLib use (Karney 2011,
  * "Transverse Mercator with an accuracy of a few nanometers").
  * Closed-form both ways: no grids, no PROJ dependency, truncation
  * error far below a millimeter anywhere a UTM zone is legitimately
  * used. The series machinery used to live here with WGS84 constants
  * baked in; it now lives once, parameterized over the ellipsoid, in
  * `NationalGrids` — a coefficient or inverse-iteration fix lands in
  * one place for both the UTM and national-grid paths.
  *
  * Conventions: EPSG 326zz = zone zz north (false northing 0),
  * 327zz = zone zz south (false northing 10 000 000 m); false easting
  * 500 000 m; scale k0 = 0.9996; central meridian = 6·zz − 183 degrees.
  */
object TransverseMercator {

  /** Central meridian of a UTM zone, degrees. */
  def centralMeridianDeg(zone: Int): Double = 6.0 * zone - 183.0

  def zoneOf(srid: Int): Int = srid % 100

  def isSouth(srid: Int): Boolean = srid >= 32701 && srid <= 32760

  private val crsCache =
    new java.util.concurrent.ConcurrentHashMap[Int, NationalGrids.TmCrs]()
  private def utmCrs(srid: Int): NationalGrids.TmCrs =
    crsCache.computeIfAbsent(srid, s =>
      NationalGrids.TmCrs(s, NationalGrids.Wgs84, 0.0,
        centralMeridianDeg(zoneOf(s)), 0.9996, 500000.0,
        if (isSouth(s)) 10000000.0 else 0.0, None))

  /** In-place (lon°, lat°) → (easting m, northing m) for the UTM SRID. */
  def geographicToUtm(srid: Int, c: Coordinate): Unit =
    NationalGrids.project(utmCrs(srid), c)

  /** In-place (easting m, northing m) → (lon°, lat°) for the UTM SRID. */
  def utmToGeographic(srid: Int, c: Coordinate): Unit =
    NationalGrids.unproject(utmCrs(srid), c)
}
