package graft

import graft.functions.GeoKernels
import graft.geo.GeomCodec
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM kernel tests for st_split_exact — TRUE PostGIS ST_Split
  * semantics, vs the reference-faithful st_split that carries the
  * reference's own polygonize-everything FIXME (split.rs:148). The
  * contract row q168 pins the arithmetic measures; these tests pin the
  * piece GEOMETRY and the behaviors the oracle cannot see (exterior /
  * hole faces dropped, off-line points as no-ops, SRID, errors). */
class SplitExactSpec extends AnyFunSuite {

  private def enc(wkt: String, srid: Int = 0): Array[Byte] = {
    val g = GeomCodec.parseWkt(wkt)
    g.setSRID(srid)
    GeomCodec.encodeEwkb(g)
  }
  private def split(a: String, b: String) =
    GeomCodec.decode(GeoKernels.splitExact(enc(a), enc(b)))

  test("polygon by through-line: interior faces only, exterior dropped") {
    // the blade extends well past the square; the reference's FIXME
    // semantics would also emit nothing for the unbounded exterior but
    // DOES emit any face the blade closes outside — here the exact
    // version must return exactly the two half-squares
    val out = split("POLYGON((0 0,2 0,2 2,0 2,0 0))",
      "LINESTRING(1 -5,1 5)")
    assert(out.getNumGeometries == 2)
    val areas = (0 until 2).map(out.getGeometryN(_).getArea).sorted
    assert(areas == Seq(2.0, 2.0))
    assert(out.getArea == 4.0)
  }

  test("blade missing the polygon returns the input as a 1-collection") {
    val out = split("POLYGON((0 0,1 0,1 1,0 1,0 0))", "LINESTRING(5 0,5 1)")
    assert(out.getNumGeometries == 1)
    assert(out.getGeometryN(0).getArea == 1.0)
  }

  test("donut: faces inside the hole are dropped") {
    val donut = "POLYGON((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4))"
    val out = split(donut, "LINESTRING(5 -1,5 11)")
    assert(out.getNumGeometries == 2)
    // two C-shapes of 48 each; the 4 sq of hole never appears
    assert(out.getArea == 96.0)
    (0 until 2).foreach(i => assert(out.getGeometryN(i).getArea == 48.0))
  }

  test("line by crossing line: split at the node") {
    val out = split("LINESTRING(0 0,4 0)", "LINESTRING(1 -1,1 1)")
    assert(out.getNumGeometries == 2)
    val lens = (0 until 2).map(out.getGeometryN(_).getLength).sorted
    assert(lens == Seq(1.0, 3.0))
  }

  test("line by multi-crossing line: one piece per gap") {
    val out = split("LINESTRING(0 0,4 0)", "LINESTRING(1 -1,1 1,2 -1,3 1)")
    // blade crosses at x=1, x=1.5 (between 1,1 and 2,-1 crossing y=0),
    // and x=2.5 — four pieces
    assert(out.getNumGeometries == 4)
    assert(math.abs(out.getLength - 4.0) < 1e-12)
  }

  test("line by on-line point: exact cut; off-line point is a no-op") {
    val cut = split("LINESTRING(0 0,4 0)", "POINT(1 0)")
    assert(cut.getNumGeometries == 2)
    assert((0 until 2).map(cut.getGeometryN(_).getLength).sorted == Seq(1.0, 3.0))
    val miss = split("LINESTRING(0 0,4 0)", "POINT(1 0.5)")
    assert(miss.getNumGeometries == 1)
    assert(miss.getGeometryN(0).getLength == 4.0)
    // endpoint cut is also a no-op (PostGIS: boundary does not split)
    val endp = split("LINESTRING(0 0,4 0)", "POINT(0 0)")
    assert(endp.getNumGeometries == 1)
  }

  test("multipoint blade cuts at every on-line point") {
    val out = split("LINESTRING(0 0,4 0)", "MULTIPOINT(1 0,3 0,9 9)")
    assert(out.getNumGeometries == 3)
    assert((0 until 3).map(out.getGeometryN(_).getLength).sorted ==
      Seq(1.0, 1.0, 2.0))
  }

  test("srid is preserved on the collection") {
    val a = enc("POLYGON((0 0,2 0,2 2,0 2,0 0))", srid = 4326)
    val out = GeomCodec.decode(GeoKernels.splitExact(a, enc("LINESTRING(1 -5,1 5)")))
    assert(out.getSRID == 4326)
  }

  test("unsupported dimension combinations throw, as PostGIS errors") {
    intercept[IllegalArgumentException] {
      split("POLYGON((0 0,1 0,1 1,0 1,0 0))", "POINT(0.5 0.5)")
    }
    intercept[IllegalArgumentException] {
      split("POLYGON((0 0,1 0,1 1,0 1,0 0))", "POLYGON((0 0,1 0,1 1,0 1,0 0))")
    }
    intercept[IllegalArgumentException] {
      split("POINT(0 0)", "LINESTRING(0 0,1 1)")
    }
  }

  test("exact vs reference-faithful split disagree exactly where the FIXME is") {
    // blade closes a face OUTSIDE the polygon: old split (polygonize
    // of boundary ∪ blade) emits it, split_exact must not
    val poly = "POLYGON((0 0,2 0,2 2,0 2,0 0))"
    val blade = "LINESTRING(1 0,1 -2,3 -2,3 1,2 1)" // hooks around outside
    val exact = GeomCodec.decode(GeoKernels.splitExact(enc(poly), enc(blade)))
    assert(exact.getArea == 4.0, "exact split preserves total input area")
    val old = GeomCodec.decode(GeoKernels.split(enc(poly), enc(blade)))
    assert(old.getArea > 4.0, "reference FIXME keeps the exterior face")
  }
}
