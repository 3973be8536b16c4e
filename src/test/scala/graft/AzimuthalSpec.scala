package graft

import graft.geo.AzimuthalProjections
import org.locationtech.jts.geom.Coordinate
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM tests for the azimuthal ST_Transform tier (EPSG 9809 double
  * stereographic / 28992 RD New, EPSG 9820 LAEA / 3035 Europe). Truth
  * sources, same pattern as [[NationalGridSpec]]:
  *
  *  1. The EPSG Guidance Note 7-2 worked examples — external truth for
  *     the projection math: 9809 on Amersfoort/Bessel, 53°N 6°E →
  *     E 196105.283 N 557057.739; 9820 on ETRS89/GRS80, 50°N 5°E →
  *     E 3962799.45 N 2999718.85.
  *  2. `tools/sterea_laea_check.py` — an independently transcribed
  *     implementation of the same published formulas; pinned probe
  *     outputs below, agreement asserted to 1 mm.
  *  3. Exact anchors: the natural origin maps to the false
  *     easting/northing exactly (both methods place the origin at the
  *     tangent/projection center, so k0 scales nothing there).
  *  4. Physics: the Amersfoort↔WGS84 datum shift over the Netherlands
  *     is ~110-130 m planar (computed from the EPSG 15934 parameters;
  *     the RD origin tower's WGS84 position is the commonly cited
  *     ~52.15517°N 5.38720°E, ≈115 m from its native-datum origin).
  */
class AzimuthalSpec extends AnyFunSuite {

  private val Lat0Rd = 52.0 + 9.0 / 60 + 22.178 / 3600
  private val Lon0Rd = 5.0 + 23.0 / 60 + 15.5 / 3600

  private def projOnly(srid: Int, lon: Double, lat: Double): Coordinate = {
    val c = new Coordinate(lon, lat)
    AzimuthalProjections.azForward(srid, c)
    c
  }

  test("EPSG 9809 worked example: 53N 6E (Amersfoort datum) -> RD mm-exact") {
    val c = projOnly(28992, 6.0, 53.0)
    assert(math.abs(c.x - 196105.283) < 1e-3, s"E=${c.x}")
    assert(math.abs(c.y - 557057.739) < 1e-3, s"N=${c.y}")
  }

  test("EPSG 9820 worked example: 50N 5E -> LAEA Europe cm-exact") {
    val c = projOnly(3035, 5.0, 50.0)
    assert(math.abs(c.x - 3962799.451) < 1e-2, s"E=${c.x}")
    assert(math.abs(c.y - 2999718.853) < 1e-2, s"N=${c.y}")
  }

  test("natural origins map to the false origin exactly") {
    val rd = projOnly(28992, Lon0Rd, Lat0Rd)
    assert(math.abs(rd.x - 155000.0) < 1e-6 && math.abs(rd.y - 463000.0) < 1e-6)
    val la = projOnly(3035, 10.0, 52.0)
    assert(math.abs(la.x - 4321000.0) < 1e-6 && math.abs(la.y - 3210000.0) < 1e-6)
  }

  test("pinned cross-check vs the independent transcription (1 mm)") {
    // (srid, lat, lon, E, N) from tools/sterea_laea_check.py
    val pinned = Seq(
      (28992, 51.0, 4.0, 57605.9460, 335312.6622),
      (28992, 53.4, 6.9, 255579.8205, 602450.9571),
      (28992, 50.75, 5.7, 177043.1925, 306626.3520),
      (3035, 40.0, -9.0, 2709134.1234, 2081705.7021),
      (3035, 60.0, 25.0, 5152827.2539, 4188383.6111),
      (3035, 35.0, 33.0, 6408292.7223, 1641973.1917))
    pinned.foreach { case (srid, lat, lon, e, n) =>
      val c = projOnly(srid, lon, lat)
      assert(math.abs(c.x - e) < 1e-3, s"$srid E: ${c.x} vs $e")
      assert(math.abs(c.y - n) < 1e-3, s"$srid N: ${c.y} vs $n")
    }
  }

  test("round trips reproduce WGS84 inputs to 1e-7 degrees") {
    def steps(lo: Double, hi: Double, n: Int): Seq[Double] =
      (0 to n).map(i => lo + (hi - lo) * i / n)
    val domains = Seq(
      (28992, steps(3.3, 7.2, 5), steps(50.75, 53.6, 4)),
      (3035, steps(-10.0, 30.0, 6), steps(35.0, 68.0, 5)))
    domains.foreach { case (srid, lons, lats) =>
      for (lon <- lons; lat <- lats) {
        val c = new Coordinate(lon, lat)
        AzimuthalProjections.geographicToAz(srid, c)
        AzimuthalProjections.azToGeographic(srid, c)
        assert(math.abs(c.x - lon) < 1e-7, s"$srid lon rt: ${c.x} vs $lon")
        assert(math.abs(c.y - lat) < 1e-7, s"$srid lat rt: ${c.y} vs $lat")
      }
    }
  }

  test("Amersfoort datum shift is real: ~110-130 m over the Netherlands") {
    // WGS84 in, datum-shifted grid out; projection-only inverse then
    // reads the grid coords back on the NATIVE datum — the residual vs
    // the WGS84 input is the planar datum offset
    val c = new Coordinate(4.8926, 52.3731) // Amsterdam
    AzimuthalProjections.geographicToAz(28992, c)
    AzimuthalProjections.azInverse(28992, c)
    val offM = math.hypot((c.x - 4.8926) * 68000, (c.y - 52.3731) * 111000)
    assert(offM > 80 && offM < 160, s"Amersfoort datum offset ${offM}m")
    // LAEA is ETRS89: no shift, projection-only round trip is exact
    val d = new Coordinate(10.0, 52.0)
    AzimuthalProjections.geographicToAz(3035, d)
    AzimuthalProjections.azInverse(3035, d)
    assert(math.abs(d.x - 10.0) < 1e-9 && math.abs(d.y - 52.0) < 1e-9)
  }

  test("LAEA is equal-area: cell areas are preserved across the map") {
    // quarter-degree quads at very different latitudes/longitudes must
    // project to (ellipsoidal-area-proportional) planar areas; compare
    // planar area against the ellipsoid-authalic area ratio ~ 1
    import org.locationtech.jts.geom.GeometryFactory
    val f = new GeometryFactory()
    def planarArea(lon: Double, lat: Double): Double = {
      val d = 0.25
      val ring = Seq((lon, lat), (lon + d, lat), (lon + d, lat + d), (lon, lat + d), (lon, lat))
        .map { case (x, y) =>
          val c = new Coordinate(x, y)
          AzimuthalProjections.geographicToAz(3035, c)
          c
        }
      f.createPolygon((ring :+ ring.head).toArray).getArea
    }
    // exact ellipsoidal authalic measure: the area of a [lat, lat+d]
    // band is proportional to q(lat+d) - q(lat) (GRS80 q, same function
    // the projection itself is built on)
    val e2 = 6.69438002290e-3 // GRS80 first eccentricity squared
    val e = math.sqrt(e2)
    def q(latDeg: Double): Double = {
      val s = math.sin(math.toRadians(latDeg))
      (1 - e2) * (s / (1 - e2 * s * s) - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    def bandArea(lat: Double): Double = q(lat + 0.25) - q(lat)
    val a1 = planarArea(-8.0, 38.0) / bandArea(38.0)
    val a2 = planarArea(24.0, 65.0) / bandArea(65.0)
    // 1e-5: the quad is polygonized with straight edges, but projected
    // edges curve slightly — the residual is discretization, not the map
    assert(math.abs(a1 / a2 - 1.0) < 1e-5, s"area ratio ${a1 / a2}")
  }

  test("kernel dispatch: 4326 -> 28992 -> 3035 -> 4326 via the pivot") {
    import graft.functions.GeoKernels
    val g = GeomCodecHelper.point(5.2913, 52.1326, 4326) // NL centroid-ish
    val rd = GeoKernels.transformGeom(g, 28992)
    val la = GeoKernels.transformGeom(rd, 3035)
    val back = GeoKernels.transformGeom(la, 4326)
    val b = graft.geo.GeomCodec.decode(back).getCoordinate
    assert(math.abs(b.x - 5.2913) < 1e-6 && math.abs(b.y - 52.1326) < 1e-6)
    assert(graft.geo.GeomCodec.decode(la).getSRID == 3035)
    // RD easting/northing of a mid-NL point lands in the plausible band
    val r = graft.geo.GeomCodec.decode(rd).getCoordinate
    assert(r.x > 0 && r.x < 300000 && r.y > 280000 && r.y < 640000,
      s"RD coords ${r.x}, ${r.y}")
  }
}
