package graft

import graft.geo.NationalGrids
import org.locationtech.jts.geom.Coordinate
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM tests for the national-grid ST_Transform tier (TM on
  * non-WGS84 datums + Helmert 7-parameter shifts). Three independent
  * truth sources:
  *
  *  1. The Ordnance Survey's published projection worked example
  *     ("A guide to coordinate systems in Great Britain", annexe):
  *     OSGB36 geodetic 52°39′27.2531″N 1°43′4.5177″E →
  *     E 651409.903 N 313177.270 — projection math only, no datum
  *     ambiguity.
  *  2. `tools/tm_datum_check.py` — an independently transcribed Snyder
  *     1987 TM series (different formulation from the Scala Karney
  *     n-series) + the same Helmert parameters; pinned outputs below,
  *     agreement asserted to 2 mm.
  *  3. Physics: the OSGB36→WGS84 shift at Greenwich is the well-known
  *     ≈100 m westward longitude offset (the WGS84 zero meridian lies
  *     ~102 m east of the Airy transit circle).
  */
class NationalGridSpec extends AnyFunSuite {

  private def fwd(srid: Int, lon: Double, lat: Double): Coordinate = {
    val c = new Coordinate(lon, lat)
    NationalGrids.geographicToGrid(srid, c)
    c
  }

  test("OS worked example: projection-only TM on Airy 1830 (sub-mm)") {
    val c = new Coordinate(1.0 + 43.0 / 60 + 4.5177 / 3600,
      52.0 + 39.0 / 60 + 27.2531 / 3600)
    NationalGrids.tmForward(27700, c)
    assert(math.abs(c.x - 651409.903) < 1e-3, s"E=${c.x}")
    assert(math.abs(c.y - 313177.270) < 1e-3, s"N=${c.y}")
    // and back
    NationalGrids.tmInverse(27700, c)
    assert(math.abs(c.x - (1.0 + 43.0 / 60 + 4.5177 / 3600)) < 1e-9)
    assert(math.abs(c.y - (52.0 + 39.0 / 60 + 27.2531 / 3600)) < 1e-9)
  }

  test("pinned cross-check vs the independent Snyder transcription (2 mm)") {
    // (lat, lon, srid, E, N) from tools/tm_datum_check.py
    val pinned = Seq(
      (51.5074, -0.1278, 27700, 530028.7499, 180380.0945),
      (55.9533, -3.1883, 27700, 325897.2215, 674001.2022),
      (51.4816, -3.1791, 27700, 318217.9972, 176508.9206),
      (53.34979, -6.26031, 29902, 315899.9231, 234670.2299),
      (53.34979, -6.26031, 2157, 715825.8680, 734696.4638),
      (41.3874, 2.1686, 23031, 430579.2760, 4582297.2299))
    pinned.foreach { case (lat, lon, srid, e, n) =>
      val c = fwd(srid, lon, lat)
      assert(math.abs(c.x - e) < 2e-3, s"$srid E: ${c.x} vs $e")
      assert(math.abs(c.y - n) < 2e-3, s"$srid N: ${c.y} vs $n")
    }
  }

  // the Helmert reverse is the exact operator inverse, so the only
  // round-trip residue is the 2-D height drop: after a datum shift the
  // point is NOT on the target ellipsoid, and projecting h→0 along the
  // target normal (which differs slightly from the source normal) moves
  // the geodetic position by ~h·Δnormal ≈ a millimeter. 1e-7 deg ≈ 1 cm.
  test("round trips reproduce WGS84 inputs to 1e-7 degrees") {
    def steps(lo: Double, hi: Double, n: Int): Seq[Double] =
      (0 to n).map(i => lo + (hi - lo) * i / n)
    val domains = Seq(
      (27700, steps(-6.0, 1.5, 5), steps(50.0, 58.0, 4)),
      (29902, steps(-10.0, -6.0, 4), steps(51.5, 55.0, 4)),
      (2157, steps(-10.0, -6.0, 4), steps(51.5, 55.0, 4)),
      (23031, steps(0.0, 6.0, 4), steps(36.0, 48.0, 4)))
    domains.foreach { case (srid, lons, lats) =>
      for (lon <- lons; lat <- lats) {
        val c = fwd(srid, lon, lat)
        NationalGrids.gridToGeographic(srid, c)
        assert(math.abs(c.x - lon) < 1e-7, s"$srid lon rt: ${c.x} vs $lon")
        assert(math.abs(c.y - lat) < 1e-7, s"$srid lat rt: ${c.y} vs $lat")
      }
    }
  }

  test("Greenwich datum shift: OSGB36 lon 0 sits ~0.0015 deg east of WGS84 lon 0") {
    // project OSGB36 geodetic (51.4779 N, 0 E) to grid, then read it
    // back as WGS84: the recovered longitude must be ≈ −0.0015°
    val c = new Coordinate(0.0, 51.4779)
    NationalGrids.tmForward(27700, c)
    NationalGrids.gridToGeographic(27700, c)
    assert(c.x < -0.0010 && c.x > -0.0020, s"Greenwich WGS84 lon = ${c.x}")
    // latitude shift magnitude is small (< 0.001 deg)
    assert(math.abs(c.y - 51.4779) < 1e-3)
  }

  test("ITM (ETRS89) applies no datum shift; Irish Grid (TM65) does") {
    val itm = fwd(2157, -6.26031, 53.34979)
    // no Helmert: inverse-projecting ITM must reproduce the input exactly
    NationalGrids.tmInverse(2157, itm)
    assert(math.abs(itm.x - -6.26031) < 1e-9)
    // TM65: projection-only inverse of the shifted grid coords must NOT
    // reproduce the WGS84 input (the datum shift is real, tens of meters)
    val ig = fwd(29902, -6.26031, 53.34979)
    NationalGrids.tmInverse(29902, ig)
    val offM = math.hypot((ig.x - -6.26031) * 66000, (ig.y - 53.34979) * 111000)
    assert(offM > 20 && offM < 300, s"TM65 datum offset ${offM}m")
  }

  test("kernel dispatch: ST_Transform pivots 27700 -> 2157 through WGS84") {
    import graft.functions.GeoKernels
    val g = GeomCodecHelper.point(-6.26031, 53.34979, 4326)
    val toIg = GeoKernels.transformGeom(g, 29902)
    val toItm = GeoKernels.transformGeom(toIg, 2157)
    val direct = GeoKernels.transformGeom(g, 2157)
    val a = graft.geo.GeomCodec.decode(toItm).getCoordinate
    val b = graft.geo.GeomCodec.decode(direct).getCoordinate
    // the extra TM65 datum round trip costs two height drops (~mm each)
    assert(math.abs(a.x - b.x) < 5e-3 && math.abs(a.y - b.y) < 5e-3)
    assert(graft.geo.GeomCodec.decode(toItm).getSRID == 2157)
  }
}

private object GeomCodecHelper {
  def point(x: Double, y: Double, srid: Int): Array[Byte] = {
    val g = graft.geo.GeomCodec.parseWkt(s"POINT($x $y)")
    g.setSRID(srid)
    graft.geo.GeomCodec.encodeEwkb(g)
  }
}
