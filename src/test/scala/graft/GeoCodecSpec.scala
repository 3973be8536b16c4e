package graft

import graft.geo._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Prop
import org.scalacheck.Test.{check => scCheck, Parameters}

/** Pure-JVM codec tests — no SparkSession. Mirrors the reference's
  * array-level unit tests (src/geo/array.rs:57-269, src/geo/box.rs:163-191)
  * plus property tests the reference lacks (SURVEY.md §5). */
class GeoCodecSpec extends AnyFunSuite {

  private def roundtrip(wkt: String): String =
    WktWriter.write(GeomCodec.decode(GeomCodec.encodeEwkb(GeomCodec.parseWkt(wkt))))

  test("wkb roundtrip per geometry kind") {
    val cases = Seq(
      "POINT(-71.064544 42.28787)",
      "LINESTRING(1 2,3 4,5 6)",
      "POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,3 2,3 3,2 3,2 2))",
      "MULTIPOINT(0 0,1 2)",
      "MULTILINESTRING((0 0,1 1),(2 2,3 3))",
      "MULTIPOLYGON(((0 0,1 0,1 1,0 0)),((5 5,6 5,6 6,5 5)))",
      "GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,1 1))")
    cases.foreach { wkt => assert(roundtrip(wkt) == wkt) }
  }

  test("ewkb srid roundtrip") {
    val g = GeomCodec.parseWkt("POINT(1 2)")
    g.setSRID(4269)
    val bytes = GeomCodec.encodeEwkb(g)
    assert(bytes(0) == WkbDialect.Ewkb)
    val back = GeomCodec.decode(bytes)
    assert(back.getSRID == 4269)
    // without srid, no flag — byte layouts differ
    val g2 = GeomCodec.parseWkt("POINT(1 2)")
    assert(GeomCodec.decode(GeomCodec.encodeEwkb(g2)).getSRID == 0)
  }

  test("unknown dialect tag errors, like the reference (src/geo/dialect.rs:15-29)") {
    val bad = Array[Byte](9, 1, 1)
    intercept[IllegalArgumentException](GeomCodec.decode(bad))
  }

  test("mysql + geopackage dialect decode") {
    // MySQL framing: 4-byte LE srid ++ WKB
    val g = GeomCodec.parseWkt("POINT(3 4)")
    val wkb = GeomCodec.encodeWkb(g).drop(1)
    val mysql = Array[Byte](WkbDialect.MySQL, -75, 16, 0, 0) ++ wkb // srid 4277
    val dm = GeomCodec.decode(mysql)
    assert(dm.getSRID == 4277 && WktWriter.write(dm) == "POINT(3 4)")
    // GeoPackage: GP magic, version 0, flags LE no-envelope, srid 4326
    val gpkg = Array[Byte](WkbDialect.Geopackage, 'G', 'P', 0, 1,
      -26, 16, 0, 0) ++ wkb
    val dg = GeomCodec.decode(gpkg)
    assert(dg.getSRID == 4326 && WktWriter.write(dg) == "POINT(3 4)")
  }

  test("spatialite (tag 5) blob decode: point, multipolygon, both endians") {
    import java.nio.{ByteBuffer, ByteOrder}
    // builds a legacy uncompressed SpatiaLite blob around a geometry body
    def blob(little: Boolean, srid: Int)(body: ByteBuffer => Unit): Array[Byte] = {
      val buf = ByteBuffer.allocate(4096)
        .order(if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      buf.put(0x00.toByte).put(if (little) 0x01.toByte else 0x00.toByte)
      buf.putInt(srid)
      (0 until 4).foreach(_ => buf.putDouble(0.0)) // MBR, unused by decode
      buf.put(0x7C.toByte)
      body(buf)
      buf.put(0xFE.toByte)
      java.util.Arrays.copyOf(buf.array(), buf.position())
    }
    val pt = blob(little = true, srid = 4326) { b =>
      b.putInt(1).putDouble(-71.064544).putDouble(42.28787)
    }
    val dp = GeomCodec.decode(Array(WkbDialect.SpatiaLite) ++ pt)
    assert(dp.getSRID == 4326 && WktWriter.write(dp) == "POINT(-71.064544 42.28787)")

    // big-endian multipolygon of two unit squares, 0x69 entity markers
    def square(b: ByteBuffer, x: Double): Unit = {
      b.putInt(3).putInt(1).putInt(5)
      Seq((x, 0.0), (x + 1, 0.0), (x + 1, 1.0), (x, 1.0), (x, 0.0))
        .foreach { case (px, py) => b.putDouble(px).putDouble(py) }
    }
    val mp = blob(little = false, srid = 0) { b =>
      b.putInt(6).putInt(2)
      b.put(0x69.toByte); square(b, 0.0)
      b.put(0x69.toByte); square(b, 5.0)
    }
    val dmp = GeomCodec.decode(Array(WkbDialect.SpatiaLite) ++ mp)
    assert(dmp.getGeometryType == "MultiPolygon" && dmp.getNumGeometries == 2)
    assert(dmp.getArea == 2.0 && dmp.getSRID == 0)

    // malformed framing / unsupported class still fail loudly
    intercept[IllegalArgumentException](
      GeomCodec.decode(Array(WkbDialect.SpatiaLite, 0x01, 0x02, 0x03)))
    val zPoint = blob(little = true, srid = 0) { b =>
      b.putInt(1001).putDouble(1).putDouble(2).putDouble(3)
    }
    intercept[IllegalArgumentException](
      GeomCodec.decode(Array(WkbDialect.SpatiaLite) ++ zPoint))
  }

  test("geojson reader round-trips every writer output and rejects garbage") {
    import graft.geo.GeoJsonReader
    val wkts = Seq(
      "POINT(-71.064544 42.28787)",
      "LINESTRING(0 0,1.5 2.5,3 0)",
      "POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,4 2,4 4,2 4,2 2))",
      "MULTIPOINT((0 0),(5 -5))",
      "MULTILINESTRING((0 0,1 1),(2 2,3 3))",
      "MULTIPOLYGON(((0 0,1 0,1 1,0 0)),((5 5,6 5,6 6,5 5)))",
      "GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,1 1))")
    for (w <- wkts) {
      val g = GeomCodec.parseWkt(w)
      val back = GeoJsonReader.read(GeoJsonWriter.write(g))
      assert(back.equalsExact(g), s"roundtrip failed for $w")
    }
    // member order + whitespace tolerance, unknown members skipped
    val shuffled = GeoJsonReader.read(
      """ { "bbox": [0,0,1,1], "coordinates": [ 1 , 2 ] , "type" : "Point" } """)
    assert(shuffled.equalsExact(GeomCodec.parseWkt("POINT(1 2)")))
    // a MultiPoint containing an empty point round-trips (the writer
    // emits [] for it) and null coordinates are a parse error, not 0.0
    val mpe = GeoJsonReader.read(
      GeoJsonWriter.write(GeomCodec.parseWkt("MULTIPOINT(EMPTY,(1 2))")))
    assert(mpe.getGeometryType == "MultiPoint" && mpe.getNumGeometries == 2)
    intercept[IllegalArgumentException](
      GeoJsonReader.read("""{"type": "Point", "coordinates": [null,null]}"""))
    intercept[IllegalArgumentException](
      GeoJsonReader.read("""{"type": "Point", "coordinates": ["1","2"]}"""))
    intercept[IllegalArgumentException](GeoJsonReader.read("""{"type": "Blob"}"""))
    intercept[IllegalArgumentException](GeoJsonReader.read("""{"coordinates": [1,2]}"""))
    intercept[IllegalArgumentException](GeoJsonReader.read("""not json"""))
    intercept[IllegalArgumentException](
      GeoJsonReader.read("""{"type": "Point", "coordinates": [1,2]} extra"""))
  }

  test("box2d sentinel and union (src/geo/box.rs:19-26)") {
    val e = Box2d.empty
    assert(e.xmin == Double.MaxValue && e.xmax == Double.MinValue)
    val b = e.union(Box2d(1, 2, 3, 4))
    assert(b == Box2d(1, 2, 3, 4))
    assert(Box2d(0, 1, 5, 6).union(Box2d(2, 3, 7, 8)) == Box2d(0, 1, 7, 8))
  }

  test("wkt number formatting is Rust-like") {
    assert(WktWriter.num(5.0) == "5")
    assert(WktWriter.num(-71.064544) == "-71.064544")
    assert(WktWriter.num(0.5) == "0.5")
    assert(WktWriter.num(12345678.5) == "12345678.5")
    assert(WktWriter.num(-0.0) == "0")
  }

  test("property: fast WKT parse agrees with the full JTS reader") {
    import org.scalacheck.Gen
    val jts = new org.locationtech.jts.io.WKTReader()
    val coord = Gen.chooseNum(-1e7, 1e7)
    val prop = Prop.forAll(coord, coord, coord, coord) {
      (x1: Double, y1: Double, x2: Double, y2: Double) =>
        val p = s"POINT($x1 $y1)"
        val l = s"LINESTRING($x1 $y1,$x2 $y2)"
        GeomCodec.parseWkt(p).equalsExact(jts.read(p)) &&
          GeomCodec.parseWkt(l).equalsExact(jts.read(l))
    }
    val result = scCheck(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
    // deviations must fall back to the full reader, not misparse
    assert(GeomCodec.parseWkt("POINT (1 2)").equalsExact(jts.read("POINT (1 2)")))
    assert(GeomCodec.parseWkt("LINESTRING(0 0, 1 1)").getNumPoints == 2)
    assert(GeomCodec.parseWkt("POINT EMPTY").isEmpty)
  }

  test("geojson covers every geometry kind with reference spacing") {
    def gj(wkt: String): String = GeoJsonWriter.write(GeomCodec.parseWkt(wkt))
    assert(gj("MULTIPOLYGON(((0 0,1 0,1 1,0 0)),((5 5,6 5,6 6,5 5)))") ==
      """{"type": "MultiPolygon", "coordinates": [[[[0,0],[1,0],[1,1],[0,0]]],[[[5,5],[6,5],[6,6],[5,5]]]]}""")
    assert(gj("MULTILINESTRING((0 0,1 1),(2 2,3 3))") ==
      """{"type": "MultiLineString", "coordinates": [[[0,0],[1,1]],[[2,2],[3,3]]]}""")
    assert(gj("GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,1 1))") ==
      """{"type": "GeometryCollection", "geometries": [{"type": "Point", "coordinates": [1,2]},{"type": "LineString", "coordinates": [[0,0],[1,1]]}]}""")
    assert(gj("MULTIPOINT((0 0),(1 1))") ==
      """{"type": "MultiPoint", "coordinates": [[0,0],[1,1]]}""")
  }

  test("property: geojson write -> read roundtrips arbitrary coordinates exactly") {
    import org.scalacheck.Gen
    import graft.geo.GeoJsonReader
    val coord = Gen.chooseNum(-1e7, 1e7)
    val prop = Prop.forAll(coord, coord, coord, coord, coord, coord) {
      (x1: Double, y1: Double, x2: Double, y2: Double, x3: Double, y3: Double) =>
        val f = GeomCodec.geometryFactory
        import org.locationtech.jts.geom.Coordinate
        val pt = f.createPoint(new Coordinate(x1, y1))
        val ls = f.createLineString(Array(
          new Coordinate(x1, y1), new Coordinate(x2, y2), new Coordinate(x3, y3)))
        val gc = f.createGeometryCollection(Array[org.locationtech.jts.geom.Geometry](pt, ls))
        Seq(pt, ls, gc).forall { g =>
          GeoJsonReader.read(GeoJsonWriter.write(g)).equalsExact(g)
        }
    }
    val result = scCheck(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("property: point roundtrip preserves coordinates exactly") {
    val prop = Prop.forAll { (px: Double, py: Double) =>
      (px.isNaN || py.isNaN) || {
        val f = GeomCodec.geometryFactory
        val p = f.createPoint(new org.locationtech.jts.geom.Coordinate(px, py))
        val back = GeomCodec.decode(GeomCodec.encodeEwkb(p))
          .asInstanceOf[org.locationtech.jts.geom.Point]
        java.lang.Double.compare(back.getX, px) == 0 &&
          java.lang.Double.compare(back.getY, py) == 0
      }
    }
    val result = scCheck(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("dumpGeoms never mutates the shared decode-cache entry") {
    import graft.functions.GeoKernels
    // Build bytes whose CACHED geometry has parent SRID 4326 but child
    // SRID 0: setSridGeom copies + sets only the top-level field (JTS
    // setSRID is non-recursive) and primes the cache with that instance.
    val mp = GeomCodec.encodeEwkb(GeomCodec.parseWkt("MULTIPOINT(1 2,3 4)"))
    val tagged = GeoKernels.setSridGeom(mp, 4326)
    val cached = GeoKernels.geom(tagged)
    assert(cached.getSRID == 4326 && cached.getGeometryN(0).getSRID == 0)
    // dumpGeoms emits parts re-tagged with the parent SRID...
    val parts = GeoKernels.dumpGeoms(tagged)
    assert(parts.length == 2 &&
      parts.forall(p => GeomCodec.decode(p).getSRID == 4326))
    // ...but must do it on COPIES: the cached parent (shared across all
    // rows on this thread) still carries the original child SRIDs
    val again = GeoKernels.geom(tagged)
    assert((0 until again.getNumGeometries)
      .forall(i => again.getGeometryN(i).getSRID == 0))
  }

  test("subdivide property: area conserved exactly, vertex cap respected") {
    import graft.functions.GeoKernels
    import org.scalacheck.Gen
    val gen = for {
      w <- Gen.choose(1, 40); h <- Gen.choose(1, 40); cap <- Gen.choose(8, 16)
    } yield (w, h, cap)
    // caps start at 8: clipping keeps collinear boundary vertices, so a
    // terminal part carries up to ring(5) + 2 original-boundary vertices
    // — caps below 7 are unsatisfiable by design (kernel depth valve).
    // forAllNoShrink: scalacheck shrinking ignores generator bounds and
    // would "shrink" into 0-sized degenerate rects.
    val prop = Prop.forAllNoShrink(gen) { case (w, h, cap) =>
      // densify to force splits (a plain rect's 5 vertices never exceed
      // the cap); all coordinates and cuts stay on exact binary fractions
      val rect = GeomCodec.parseWkt(
        s"POLYGON((0 0,$w 0,$w $h,0 $h,0 0))")
      val dense = org.locationtech.jts.densify.Densifier.densify(rect, 1.0)
      val parts = GeoKernels.subdivide(GeomCodec.encodeEwkb(dense), cap)
        .map(GeomCodec.decode)
      val areaOk = parts.map(_.getArea).sum == w.toDouble * h
      val capOk = parts.forall(_.getNumPoints <= cap)
      areaOk && capOk && parts.nonEmpty
    }
    val result = scCheck(Parameters.default.withMinSuccessfulTests(60), prop)
    assert(result.passed, result.status.toString)
  }

  test("geojson golden format (src/function/as_geojson.rs:141)") {
    val p = GeomCodec.parseWkt("POINT(-71.064544 42.28787)")
    assert(GeoJsonWriter.write(p) ==
      """{"type": "Point", "coordinates": [-71.064544,42.28787]}""")
    val poly = GeomCodec.parseWkt("POLYGON((0 0,1 0,1 1,0 0))")
    assert(GeoJsonWriter.write(poly) ==
      """{"type": "Polygon", "coordinates": [[[0,0],[1,0],[1,1],[0,0]]]}""")
  }

  test("property: TWKB roundtrip on fuzzed multi-geometries at every precision") {
    import org.scalacheck.Gen
    import org.locationtech.jts.geom._
    val f = GeomCodec.geometryFactory

    // coordinates on a 0.01 grid inside ±10^5 so every precision in the
    // tested range quantizes without Long overflow in the delta chain
    val coordGen: Gen[Coordinate] = for {
      xi <- Gen.chooseNum(-10000000L, 10000000L)
      yi <- Gen.chooseNum(-10000000L, 10000000L)
    } yield new Coordinate(xi / 100.0, yi / 100.0)

    def ringOf(cs: Seq[Coordinate]): LinearRing = {
      // angle-sort around the centroid for a well-formed (closed) ring;
      // validity is irrelevant to the codec, closure is not
      val cx = cs.map(_.x).sum / cs.size; val cy = cs.map(_.y).sum / cs.size
      val sorted = cs.sortBy(c => math.atan2(c.y - cy, c.x - cx)).toArray
      f.createLinearRing(sorted :+ sorted.head.copy())
    }
    val pointGen = coordGen.map(f.createPoint)
    val lineGen = for {
      n <- Gen.chooseNum(2, 8); cs <- Gen.listOfN(n, coordGen)
    } yield f.createLineString(cs.toArray)
    val polyGen = for {
      n <- Gen.chooseNum(3, 8); cs <- Gen.listOfN(n, coordGen)
      withHole <- Gen.oneOf(true, false)
      c0 <- coordGen
    } yield {
      val shell = ringOf(cs)
      // a hole exercises the cross-ring delta chain; containment is not
      // a codec concern
      val holes = if (withHole) Array(ringOf(Seq(c0,
        new Coordinate(c0.x + 0.5, c0.y), new Coordinate(c0.x, c0.y + 0.5))))
      else Array.empty[LinearRing]
      f.createPolygon(shell, holes)
    }
    val multiGen: Gen[Geometry] = Gen.oneOf(
      Gen.listOfN(3, pointGen).map(ps => f.createMultiPoint(ps.toArray): Geometry),
      Gen.listOfN(2, lineGen).map(ls => f.createMultiLineString(ls.toArray): Geometry),
      Gen.listOfN(2, polyGen).map(ps => f.createMultiPolygon(ps.toArray): Geometry),
      for { p <- pointGen; l <- lineGen; pg <- polyGen }
        yield f.createGeometryCollection(Array[Geometry](p, l, pg)): Geometry)
    val geomGen: Gen[Geometry] =
      Gen.oneOf(pointGen.map(g => g: Geometry), lineGen.map(g => g: Geometry),
        polyGen.map(g => g: Geometry), multiGen)
    val precGen = Gen.chooseNum(-3, 7)

    val prop = Prop.forAllNoShrink(geomGen, precGen) { (g: Geometry, prec: Int) =>
      val scale = math.pow(10, prec)
      val once = TwkbCodec.decode(TwkbCodec.encode(g, prec))
      // 1. structure: type tree and vertex counts survive
      val structureOk = once.getGeometryType == g.getGeometryType &&
        once.getNumGeometries == g.getNumGeometries &&
        once.getNumPoints == g.getNumPoints
      // 2. quantization error bounded by half a quantum per coordinate
      val cs0 = g.getCoordinates; val cs1 = once.getCoordinates
      val errOk = cs0.zip(cs1).forall { case (a, b) =>
        math.abs(a.x - b.x) <= 0.5 / scale + 1e-9 &&
          math.abs(a.y - b.y) <= 0.5 / scale + 1e-9
      }
      // 3. stability: re-encoding the decoded geometry is byte-identical
      //    and decodes to an exactly-equal geometry (the delta chain and
      //    ring re-closing introduce no drift)
      val bytes1 = TwkbCodec.encode(once, prec)
      val stableBytes = java.util.Arrays.equals(bytes1, TwkbCodec.encode(g, prec))
      val twice = TwkbCodec.decode(bytes1)
      val stableGeom = once.equalsExact(twice)
      structureOk && errOk && stableBytes && stableGeom
    }
    val result = scCheck(Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)

    // empties of every kind keep their kind
    Seq(f.createPoint(), f.createLineString(), f.createPolygon(),
      f.createMultiPoint(), f.createMultiLineString(Array.empty),
      f.createMultiPolygon(Array.empty), f.createGeometryCollection(Array.empty))
      .foreach { e =>
        val back = TwkbCodec.decode(TwkbCodec.encode(e, 2))
        assert(back.isEmpty && back.getGeometryType == e.getGeometryType)
      }
  }
}
