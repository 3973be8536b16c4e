package graft

import graft.functions.GeoFunctions
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** E2E SQL tests mirroring the reference's golden-string tests
  * (SURVEY.md §5 — one golden per function, same fixtures). */
class GeoFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GeoFunctions.register(s)
    s
  }

  private def sql1(q: String): Any = spark.sql(q).collect()(0).get(0)

  test("st_geomfromtext + st_astext roundtrip (geom_from_text.rs:96-115)") {
    assert(sql1("select ST_AsText(ST_GeomFromText('POINT(-71.064544 42.28787)'))") ==
      "POINT(-71.064544 42.28787)")
  }

  test("srid variants (geom_from_text.rs:117-137, srid.rs, as_ewkt.rs)") {
    assert(sql1("select ST_SRID(ST_GeomFromText('POINT(-71.064544 42.28787)', 4269))") == 4269)
    assert(sql1("select ST_SRID(ST_GeomFromText('POINT(-71.064544 42.28787)'))") == null)
    assert(sql1("select ST_AsEWKT(ST_GeomFromText('POINT(-71.064544 42.28787)', 4269))") ==
      "SRID=4269;POINT(-71.064544 42.28787)")
    assert(sql1("select ST_AsEWKT(ST_GeomFromText('POINT(-71.064544 42.28787)'))") ==
      "POINT(-71.064544 42.28787)")
  }

  test("st_asgeojson golden (as_geojson.rs:141)") {
    assert(sql1("select ST_AsGeoJSON(ST_GeomFromText('POINT(-71.064544 42.28787)'))") ==
      """{"type": "Point", "coordinates": [-71.064544,42.28787]}""")
  }

  test("st_geometrytype (geometry_type.rs)") {
    assert(sql1("select ST_GeometryType(ST_GeomFromText('POINT(1 2)'))") == "ST_Point")
    assert(sql1("select ST_GeometryType(ST_GeomFromText('LINESTRING(1 2,3 4)'))") == "ST_LineString")
    assert(sql1("select ST_GeometryType(ST_GeomFromText('POLYGON((0 0,1 0,1 1,0 0))'))") == "ST_Polygon")
  }

  test("st_intersects over 2-partition table (intersects.rs:168-217)") {
    import spark.implicits._
    import graft.functions.GeoFunctions._
    import org.apache.spark.sql.functions._
    // 3 LineStrings, row i: (i,i+1)(i+2,i+3)(i+4,i+5), registered twice
    val rows = (0 until 3).map { i =>
      s"LINESTRING($i ${i + 1},${i + 2} ${i + 3},${i + 4} ${i + 5})"
    }
    val df = (rows ++ rows).toDF("wkt").repartition(2)
      .select(st_geomfromtext(col("wkt")).as("geom"))
    val got = df.select(st_intersects(col("geom"),
      st_geomfromtext(lit("POINT(0 1)"))).as("r")).collect().map(_.getBoolean(0))
    assert(got.count(_ == true) == 2 && got.length == 6)
  }

  test("st_covers / st_coveredby / st_equals") {
    assert(sql1("select ST_Covers(ST_GeomFromText('POLYGON((0 0,10 0,10 10,0 10,0 0))'), ST_GeomFromText('POINT(5 5)'))") == true)
    assert(sql1("select ST_CoveredBy(ST_GeomFromText('POINT(5 5)'), ST_GeomFromText('POLYGON((0 0,10 0,10 10,0 10,0 0))'))") == true)
    assert(sql1("select ST_CoveredBy(ST_GeomFromText('POINT(15 5)'), ST_GeomFromText('POLYGON((0 0,10 0,10 10,0 10,0 0))'))") == false)
    // topological, not exact (equals.rs:137-148)
    assert(sql1("select ST_Equals(ST_GeomFromText('LINESTRING(0 0,10 10)'), ST_GeomFromText('LINESTRING(0 0,5 5,10 10)'))") == true)
  }

  test("st_buffer golden-ish: octagon bbox and vertex count (buffer.rs:119-139)") {
    assert(sql1("select ST_NPoints(ST_Buffer(ST_GeomFromText('POINT(100 90)'), 50.0, 2))") == 9)
    val r = spark.sql(
      "select Box2D(ST_Buffer(ST_GeomFromText('POINT(100 90)'), 50.0, 2)) as b")
      .collect()(0).getStruct(0)
    assert(math.abs(r.getDouble(0) - 50.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - 40.0) < 1e-9)
    assert(math.abs(r.getDouble(2) - 150.0) < 1e-9)
    assert(math.abs(r.getDouble(3) - 140.0) < 1e-9)
  }

  test("st_boundary (boundary.rs:109-120)") {
    assert(sql1("select ST_AsText(ST_Boundary(ST_GeomFromText('POLYGON((1 1,0 0,-1 1,1 1))')))") ==
      "LINESTRING(1 1,0 0,-1 1,1 1)")
  }

  test("st_makeenvelope goldens (make_envelope.rs:125-159)") {
    assert(sql1("select ST_AsEWKT(ST_MakeEnvelope(10, 10, 11, 11))") ==
      "POLYGON((10 10,10 11,11 11,11 10,10 10))")
    assert(sql1("select ST_AsEWKT(ST_MakeEnvelope(10, 10, 11, 11, 4236))") ==
      "SRID=4236;POLYGON((10 10,10 11,11 11,11 10,10 10))")
  }

  test("st_translate (translate.rs)") {
    assert(sql1("select ST_AsText(ST_Translate(ST_GeomFromText('POINT(1 2)'), 5.0, 6.0))") ==
      "POINT(6 8)")
  }

  test("st_asmvtgeom golden (as_mvt_geom.rs:127-138)") {
    assert(sql1("select ST_AsText(ST_AsMVTGeom(ST_GeomFromText('POLYGON ((0 0, 10 0, 10 5, 0 -5, 0 0))'), Box2D(ST_GeomFromText('LINESTRING(0 0, 4096 4096)'))))") ==
      "POLYGON((0 4096,10 4096,10 4091,0 4101,0 4096))")
  }

  test("st_split: polygonize semantics (split.rs:103-130, FIXME caveat)") {
    assert(sql1("select ST_GeometryType(ST_Split(ST_GeomFromText('POLYGON((0 0,100 0,100 100,0 100,0 0))'), ST_GeomFromText('LINESTRING(50 -10,50 110)')))") ==
      "ST_GeometryCollection")
    assert(sql1("select ST_NumGeometries(ST_Split(ST_GeomFromText('POLYGON((0 0,100 0,100 100,0 100,0 0))'), ST_GeomFromText('LINESTRING(50 -10,50 110)')))") == 2)
  }

  test("st_geomfromwkb raw literal (geom_from_wkb.rs:103)") {
    assert(sql1("select ST_AsText(ST_GeomFromWKB(unhex('0101000000cb49287d21c451c0f0bf95ecd8244540')))") ==
      "POINT(-71.064544 42.28787)")
    assert(sql1("select ST_SRID(ST_GeomFromWKB(unhex('0101000000cb49287d21c451c0f0bf95ecd8244540'), 4269))") == 4269)
  }

  test("box2d (box2d.rs:104-115)") {
    val r = spark.sql("select Box2D(ST_GeomFromText('LINESTRING(1 2, 3 4, 5 6)')) as b")
      .collect()(0).getStruct(0)
    assert(r == Row(1.0, 2.0, 5.0, 6.0))
  }

  test("length / isvalid / convexhull / simplify extras") {
    assert(sql1("select ST_Length(ST_GeomFromText('LINESTRING(0 0,3 4)'))") == 5.0)
    assert(sql1("select ST_Length(ST_GeomFromText('LINESTRING(0 0,3 4,3 10)'))") == 11.0)
    assert(sql1("select ST_IsValid(ST_GeomFromText('POLYGON((0 0,1 0,1 1,0 1,0 0))'))") == true)
    assert(sql1("select ST_IsValid(ST_GeomFromText('POLYGON((0 0,2 2,2 0,0 2,0 0))'))") == false)
    assert(sql1("""select ST_Area(ST_ConvexHull(ST_GeomFromText(
      'MULTIPOINT(0 0,10 0,0 20,2 2)')))""") == 100.0)
    // hull preserves SRID through the cell encoding
    assert(sql1("""select ST_SRID(ST_ConvexHull(ST_GeomFromText('MULTIPOINT(0 0,1 0,0 1)', 4326)))""") == 4326)
    // bowtie repairs to two unit triangles (area 2), already-valid input
    // passes through with its area intact, and repairs are always valid
    assert(sql1("""select ST_Area(ST_MakeValid(
      ST_GeomFromText('POLYGON((0 0,2 2,2 0,0 2,0 0))')))""") == 2.0)
    assert(sql1("""select ST_IsValid(ST_MakeValid(
      ST_GeomFromText('POLYGON((0 0,2 2,2 0,0 2,0 0))')))""") == true)
    assert(sql1("""select ST_Area(ST_MakeValid(
      ST_GeomFromText('POLYGON((0 0,1 0,1 1,0 1,0 0))')))""") == 1.0)
    // keepCollapsed: a zero-area polygon keeps its linear skeleton
    // (PostGIS behavior) instead of vanishing to POLYGON EMPTY
    assert(sql1("""select ST_GeometryType(ST_MakeValid(
      ST_GeomFromText('POLYGON((0 0,1 0,1 0,0 0))')))""") == "ST_LineString")
    assert(sql1("""select ST_NPoints(ST_Simplify(
      ST_GeomFromText('LINESTRING(0 0,1 0.1,2 0)'), 0.5))""") == 2)
    assert(sql1("""select ST_NPoints(ST_Simplify(
      ST_GeomFromText('LINESTRING(0 0,1 5,2 0)'), 0.5))""") == 3)
  }

  test("line/ring accessors: start/end/pointn/exteriorring/nrings/reverse/azimuth/perimeter") {
    val line = "ST_GeomFromText('LINESTRING(0 0,3 4,6 0)')"
    assert(sql1(s"select ST_AsText(ST_StartPoint($line))") == "POINT(0 0)")
    assert(sql1(s"select ST_AsText(ST_EndPoint($line))") == "POINT(6 0)")
    assert(sql1(s"select ST_AsText(ST_PointN($line, 2))") == "POINT(3 4)")
    // negative n counts from the end; out-of-range and wrong type → null
    assert(sql1(s"select ST_AsText(ST_PointN($line, -1))") == "POINT(6 0)")
    assert(sql1(s"select ST_PointN($line, 4)") == null)
    assert(sql1(s"select ST_PointN($line, 0)") == null)
    assert(sql1("select ST_StartPoint(ST_GeomFromText('POINT(1 2)'))") == null)
    assert(sql1(s"select ST_AsText(ST_Reverse($line))") == "LINESTRING(6 0,3 4,0 0)")
    // SRID survives all accessor encodes
    assert(sql1("select ST_SRID(ST_StartPoint(ST_GeomFromText('LINESTRING(0 0,1 1)', 4326)))") == 4326)
    val poly = "ST_GeomFromText('POLYGON((0 0,10 0,10 5,0 5,0 0),(1 1,2 1,2 2,1 2,1 1))')"
    assert(sql1(s"select ST_AsText(ST_ExteriorRing($poly))") ==
      "LINESTRING(0 0,10 0,10 5,0 5,0 0)")
    assert(sql1(s"select ST_NumInteriorRings($poly)") == 1)
    assert(sql1(s"select ST_NumInteriorRings($line)") == null)
    assert(sql1(s"select ST_ExteriorRing($line)") == null)
    // azimuth: north = 0, east = pi/2, coincident → null, non-point → null
    assert(sql1("select ST_Azimuth(ST_GeomFromText('POINT(0 0)'), ST_GeomFromText('POINT(0 5)'))") == 0.0)
    assert(sql1("select ST_Azimuth(ST_GeomFromText('POINT(0 0)'), ST_GeomFromText('POINT(5 0)'))") == math.Pi / 2)
    assert(sql1("select ST_Azimuth(ST_GeomFromText('POINT(0 0)'), ST_GeomFromText('POINT(-5 0)'))") == 3 * math.Pi / 2)
    assert(sql1("select ST_Azimuth(ST_GeomFromText('POINT(1 1)'), ST_GeomFromText('POINT(1 1)'))") == null)
    assert(sql1(s"select ST_Azimuth(ST_GeomFromText('POINT(0 0)'), $line)") == null)
    // perimeter: areal only — 0 for lines (unlike ST_Length)
    assert(sql1(s"select ST_Perimeter($poly)") == 34.0)
    assert(sql1(s"select ST_Perimeter($line)") == 0.0)
    assert(sql1("select ST_Perimeter(ST_GeomFromText('GEOMETRYCOLLECTION(LINESTRING(0 0,9 0),POLYGON((0 0,1 0,1 1,0 1,0 0)))'))") == 4.0)
  }

  test("affine family and linear referencing: rotate/scale/interpolate/locate") {
    // 90° CCW about the origin: (3,0) -> (0,3); 6dp rounding kills the
    // cos(pi/2) ~ 6e-17 residue identically in any IEEE engine
    assert(sql1("""select round(ST_X(ST_Rotate(
      ST_GeomFromText('POINT(3 0)'), pi() / 2)), 6)""") == 0.0)
    assert(sql1("""select round(ST_Y(ST_Rotate(
      ST_GeomFromText('POINT(3 0)'), pi() / 2)), 6)""") == 3.0)
    // rotation about a non-origin point: (3,1) rotated 180° about (2,1) -> (1,1)
    assert(sql1("""select ST_X(ST_Rotate(ST_GeomFromText('POINT(3 1)'), pi(), 2.0, 1.0))""")
      .asInstanceOf[Double] - 1.0 < 1e-9)
    assert(sql1("select ST_AsText(ST_Scale(ST_GeomFromText('LINESTRING(1 2,3 4)'), 2.0, 10.0))") ==
      "LINESTRING(2 20,6 40)")
    // SRID survives the transforms
    assert(sql1("select ST_SRID(ST_Rotate(ST_GeomFromText('POINT(1 1)', 4326), 0.0))") == 4326)
    val line = "ST_GeomFromText('LINESTRING(0 0,10 0,10 10)')"
    assert(sql1(s"select ST_AsText(ST_LineInterpolatePoint($line, 0.5))") == "POINT(10 0)")
    assert(sql1(s"select ST_AsText(ST_LineInterpolatePoint($line, 0.25))") == "POINT(5 0)")
    // clamped fractions hit the endpoints; non-line input -> null
    assert(sql1(s"select ST_AsText(ST_LineInterpolatePoint($line, 2.0))") == "POINT(10 10)")
    assert(sql1(s"select ST_AsText(ST_LineInterpolatePoint($line, -1.0))") == "POINT(0 0)")
    assert(sql1("select ST_LineInterpolatePoint(ST_GeomFromText('POINT(1 1)'), 0.5)") == null)
    // locate is interpolate's inverse; off-line points project
    assert(sql1(s"select ST_LineLocatePoint($line, ST_GeomFromText('POINT(10 0)'))") == 0.5)
    assert(sql1(s"select ST_LineLocatePoint($line, ST_GeomFromText('POINT(5 3)'))") == 0.25)
    assert(sql1(s"select ST_LineLocatePoint($line, ST_GeomFromText('LINESTRING(0 0,1 1)'))") == null)
    assert(sql1("""select ST_LineLocatePoint(ST_GeomFromText('LINESTRING(1 1,1 1)'),
      ST_GeomFromText('POINT(0 0)'))""") == null)
  }

  test("null propagation: null geom → null result everywhere") {
    assert(sql1("select ST_AsText(cast(null as binary))") == null)
    assert(sql1("select ST_Intersects(cast(null as binary), ST_GeomFromText('POINT(0 0)'))") == null)
    assert(sql1("select ST_GeomFromText(cast(null as string))") == null)
  }

  test("st_extent group-by golden (extent.rs:170-219)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.GeoFunctions._
    // 4 LineStrings, row i: (i,i+1)(i+2,i+3)(i+4,i+5); names a,a,b,b
    val df = (0 until 4).map { i =>
      (s"LINESTRING($i ${i + 1},${i + 2} ${i + 3},${i + 4} ${i + 5})",
        if (i < 2) "a" else "b")
    }.toDF("wkt", "name")
      .select(st_geomfromtext(col("wkt")).as("geom"), col("name"))
    df.createOrReplaceTempView("geom_table")
    val got = spark.sql(
      "select st_extent(geom) as ext, name from geom_table group by name order by name")
      .collect()
    assert(got(0).getStruct(0) == Row(0.0, 1.0, 5.0, 6.0) && got(0).getString(1) == "a")
    assert(got(1).getStruct(0) == Row(2.0, 3.0, 7.0, 8.0) && got(1).getString(1) == "b")
    // all-null group → sentinel (box.rs:19-26)
    val nulls = spark.sql(
      "select st_extent(geom) as ext from (select cast(null as binary) as geom)")
      .collect()(0).getStruct(0)
    assert(nulls == Row(Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue))
  }

  test("st_collect aggregates a group into a GeometryCollection") {
    val r = spark.sql("""
      SELECT grp, ST_AsText(st_collect(ST_GeomFromText(wkt))) AS wkt
      FROM VALUES ('a', 'POINT(1 2)'), ('a', 'POINT(3 4)'), ('b', 'LINESTRING(0 0,1 1)')
        AS t(grp, wkt)
      GROUP BY grp ORDER BY grp""").collect()
    assert(r(0).getString(1) == "GEOMETRYCOLLECTION(POINT(1 2),POINT(3 4))")
    assert(r(1).getString(1) == "GEOMETRYCOLLECTION(LINESTRING(0 0,1 1))")
  }

  test("topological predicate family: touches/crosses/overlaps/disjoint/relate") {
    // two unit squares sharing an edge: touch, don't overlap
    val a = "ST_MakeEnvelope(0D, 0D, 1D, 1D)"
    val b = "ST_MakeEnvelope(1D, 0D, 2D, 1D)"
    val c = "ST_MakeEnvelope(0.5D, 0.5D, 1.5D, 1.5D)"
    val far = "ST_MakeEnvelope(10D, 10D, 11D, 11D)"
    assert(sql1(s"select ST_Touches($a, $b)") == true)
    assert(sql1(s"select ST_Touches($a, $c)") == false)
    assert(sql1(s"select ST_Overlaps($a, $c)") == true)
    assert(sql1(s"select ST_Overlaps($a, $b)") == false)
    assert(sql1(s"select ST_Disjoint($a, $far)") == true)
    assert(sql1(s"select ST_Disjoint($a, $b)") == false)
    // a line crossing a polygon's interior
    assert(sql1(s"select ST_Crosses(ST_GeomFromText('LINESTRING(-1 0.5, 3 0.5)'), $a)") == true)
    assert(sql1(s"select ST_Crosses($a, $b)") == false)
    // DE-9IM: equal squares relate as 2FFF1FFF2
    assert(sql1(s"select ST_Relate($a, $a)") == "2FFF1FFF2")
    assert(sql1(s"select ST_Relate($a, $c, '2********')") == true)
    assert(sql1(s"select ST_Relate($a, $b, '2********')") == false)
  }

  test("overlay completion: difference/symdifference/pointonsurface/closest/shortest/snap") {
    val a = "ST_MakeEnvelope(0D, 0D, 2D, 1D)"
    val c = "ST_MakeEnvelope(1D, 0D, 3D, 1D)"
    assert(sql1(s"select ST_Area(ST_Difference($a, $c))") == 1.0)
    assert(sql1(s"select ST_Area(ST_SymDifference($a, $c))") == 2.0)
    // interior point of a polygon is inside it
    assert(sql1(s"select ST_Within(ST_PointOnSurface($a), $a)") == true)
    assert(sql1(
      "select ST_AsText(ST_ClosestPoint(ST_GeomFromText('LINESTRING(0 0, 10 0)'), ST_GeomFromText('POINT(3 5)')))") ==
      "POINT(3 0)")
    assert(sql1(
      "select ST_Length(ST_ShortestLine(ST_GeomFromText('POINT(0 0)'), ST_GeomFromText('POINT(3 4)')))") ==
      5.0)
    assert(sql1(
      "select ST_AsText(ST_Snap(ST_GeomFromText('POINT(0.05 0)'), ST_GeomFromText('POINT(0 0)'), 0.1D))") ==
      "POINT(0 0)")
  }

  test("shape tests + normalize + flip") {
    assert(sql1("select ST_IsClosed(ST_GeomFromText('LINESTRING(0 0,1 0,1 1,0 0)'))") == true)
    assert(sql1("select ST_IsClosed(ST_GeomFromText('LINESTRING(0 0,1 0)'))") == false)
    assert(sql1("select ST_IsClosed(ST_MakeEnvelope(0D,0D,1D,1D))") == null)
    assert(sql1("select ST_IsSimple(ST_GeomFromText('LINESTRING(0 0,2 2,0 2,2 0)'))") == false)
    assert(sql1("select ST_IsSimple(ST_GeomFromText('LINESTRING(0 0,1 1)'))") == true)
    assert(sql1("select ST_IsRing(ST_GeomFromText('LINESTRING(0 0,1 0,1 1,0 0)'))") == true)
    assert(sql1("select ST_IsRing(ST_GeomFromText('LINESTRING(0 0,1 1)'))") == false)
    assert(sql1("select ST_IsRing(ST_GeomFromText('POINT(0 0)'))") == null)
    assert(sql1("select ST_AsText(ST_FlipCoordinates(ST_GeomFromText('POINT(1 2)')))") ==
      "POINT(2 1)")
  }

  test("normalize canonicalizes equal rings") {
    val w1 = sql1("select ST_AsText(ST_Normalize(ST_GeomFromText('POLYGON((0 0,1 0,1 1,0 1,0 0))')))")
    val w2 = sql1("select ST_AsText(ST_Normalize(ST_GeomFromText('POLYGON((1 1,0 1,0 0,1 0,1 1))')))")
    assert(w1 == w2)
  }

  test("st_geohash matches published vector and st_dump explodes") {
    // (lat 57.64911, lon 10.40744) → u4pruydqqvj (commonly cited geohash vector)
    assert(sql1("select ST_GeoHash(ST_GeomFromText('POINT(10.40744 57.64911)'), 11)") ==
      "u4pruydqqvj")
    assert(sql1("select ST_GeoHash(ST_GeomFromText('POINT(500 0)'), 6)") == null)
    val parts = spark.sql(
      """select ST_AsText(g) from (
           select explode(ST_Dump(ST_GeomFromText(
             'GEOMETRYCOLLECTION(POINT(1 2), MULTIPOINT(3 4, 5 6))'))) as g)""")
      .collect().map(_.getString(0)).toSeq
    assert(parts == Seq("POINT(1 2)", "POINT(3 4)", "POINT(5 6)"))
    assert(sql1("select size(ST_Dump(ST_GeomFromText('POINT(1 2)')))") == 1)
  }

  test("hulls, triangulations, linework family") {
    // min bounding circle radius of a 3-4 rectangle = half diagonal 2.5
    assert(sql1("select round(ST_MinimumBoundingRadius(ST_MakeEnvelope(0D,0D,3D,4D)), 6)") == 2.5)
    // the circle polygon approximates area pi*r^2 around the rect center
    // (JTS returns an inscribed chord polygon, so corners sit marginally
    // outside it — compare area/centroid, not coverage)
    val circArea = sql1("""select ST_Area(
      ST_MinimumBoundingCircle(ST_MakeEnvelope(0D,0D,3D,4D)))""").asInstanceOf[Double]
    assert(math.abs(circArea - math.Pi * 2.5 * 2.5) / (math.Pi * 6.25) < 0.01)
    assert(sql1("""select round(ST_X(ST_Centroid(
      ST_MinimumBoundingCircle(ST_MakeEnvelope(0D,0D,3D,4D)))), 6)""") == 1.5)
    // oriented envelope of an axis-aligned rectangle has the same area
    assert(sql1("select ST_Area(ST_OrientedEnvelope(ST_MakeEnvelope(1D,1D,4D,3D)))") == 6.0)
    // oriented envelope of a 45-degree line has ~zero area but spans it
    assert(sql1("""select ST_Area(ST_OrientedEnvelope(
      ST_GeomFromText('LINESTRING(0 0,2 2,4 4)')))""") == 0.0)
    // concave hull at ratio 1 = convex hull
    assert(sql1("""select ST_Equals(
      ST_ConcaveHull(ST_GeomFromText('MULTIPOINT(0 0,4 0,4 4,0 4,2 2)'), 1.0D),
      ST_ConvexHull(ST_GeomFromText('MULTIPOINT(0 0,4 0,4 4,0 4,2 2)')))""") == true)
    // delaunay of a unit square's corners = 2 triangles
    assert(sql1("""select ST_NumGeometries(ST_DelaunayTriangles(
      ST_GeomFromText('MULTIPOINT(0 0,1 0,1 1,0 1)')))""") == 2)
    // voronoi of 2 sites = 2 cells, and they don't overlap
    assert(sql1("""select ST_NumGeometries(ST_VoronoiPolygons(
      ST_GeomFromText('MULTIPOINT(0 0,10 0)')))""") == 2)
    // linemerge sews two touching segments into one 2-unit line
    assert(sql1("""select ST_AsText(ST_LineMerge(ST_GeomFromText(
      'MULTILINESTRING((0 0,1 0),(1 0,2 0))')))""") == "LINESTRING(0 0,1 0,2 0)")
    // non-lineal input → empty collection (PostGIS contract)
    assert(sql1("select ST_NumGeometries(ST_LineMerge(ST_GeomFromText('POINT(1 1)')))") == 0)
    // unary union dissolves overlapping members: 2x1 ∪ 2x1 shifted by 1 = 3
    assert(sql1("""select ST_Area(ST_UnaryUnion(ST_GeomFromText(
      'MULTIPOLYGON(((0 0,2 0,2 1,0 1,0 0)),((1 0,3 0,3 1,1 1,1 0)))')))""") == 3.0)
    // collectionextract pulls the requested type out of a mixed collection
    assert(sql1("""select ST_AsText(ST_CollectionExtract(ST_GeomFromText(
      'GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,1 1),POINT(3 4))'), 1))""") ==
      "MULTIPOINT(1 2,3 4)")
    assert(sql1("""select ST_NumGeometries(ST_CollectionExtract(ST_GeomFromText(
      'GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,1 1))'), 3))""") == 0)
  }

  test("array constructors: makeline / polygonize / union over explicit order") {
    assert(sql1("""select ST_AsText(ST_MakeLine(array(
      ST_GeomFromText('POINT(0 0)'), ST_GeomFromText('POINT(1 1)'),
      ST_GeomFromText('POINT(2 0)'))))""") == "LINESTRING(0 0,1 1,2 0)")
    // a single point cannot make a line
    assert(sql1("select ST_MakeLine(array(ST_GeomFromText('POINT(0 0)')))") == null)
    // null elements are skipped
    assert(sql1("""select ST_AsText(ST_MakeLine(array(
      ST_GeomFromText('POINT(0 0)'), cast(null as binary),
      ST_GeomFromText('POINT(5 5)'))))""") == "LINESTRING(0 0,5 5)")
    // polygonize a closed triangle of segments → one face of area 0.5
    assert(sql1("""select ST_Area(ST_Polygonize(array(
      ST_GeomFromText('LINESTRING(0 0,1 0)'),
      ST_GeomFromText('LINESTRING(1 0,0 1)'),
      ST_GeomFromText('LINESTRING(0 1,0 0)'))))""") == 0.5)
    // union dissolves two overlapping unit-height rectangles
    assert(sql1("""select ST_Area(ST_Union(array(
      ST_MakeEnvelope(0D,0D,2D,1D), ST_MakeEnvelope(1D,0D,3D,1D))))""") == 3.0)
    // the explicit st_union_arr name works too, and an all-null array
    // dissolves to null
    assert(sql1("""select ST_Union_Arr(array(cast(null as binary)))""") == null)
  }

  test("st_minimumclearance: shorter rectangle side; infinity for a point") {
    assert(sql1("""select ST_MinimumClearance(ST_MakeEnvelope(0D, 0D, 7D, 3D))""") == 3.0)
    assert(sql1("""select ST_Length(ST_MinimumClearanceLine(
      ST_MakeEnvelope(0D, 0D, 7D, 3D)))""") == 3.0)
    assert(sql1("""select ST_MinimumClearance(ST_GeomFromText('POINT(1 1)'))""") ==
      Double.PositiveInfinity)
    assert(sql1("""select ST_MinimumClearanceLine(ST_GeomFromText('POINT(1 1)'))""") == null)
  }

  test("st_node: crossing segments split at the intersection, duplicates dissolve") {
    // a + cross: two segments meeting at (5,5) node into four
    assert(sql1("""select ST_NumGeometries(ST_Node(ST_GeomFromText(
      'MULTILINESTRING((0 5,10 5),(5 0,5 10))')))""") == 4)
    assert(sql1("""select ST_Length(ST_Node(ST_GeomFromText(
      'MULTILINESTRING((0 5,10 5),(5 0,5 10))')))""") == 20.0)
    // exact duplicate linework dissolves to one segment
    assert(sql1("""select ST_AsText(ST_Node(ST_GeomFromText(
      'MULTILINESTRING((0 0,4 0),(0 0,4 0))')))""") == "LINESTRING(0 0,4 0)")
    assert(sql1("""select ST_SRID(ST_Node(ST_GeomFromText(
      'MULTILINESTRING((0 5,10 5),(5 0,5 10))', 4326)))""") == 4326)
    assert(sql1("select ST_Node(ST_GeomFromText('POINT(1 1)'))") == null)
  }

  test("st_offsetcurve: left/right parallels of a straight segment") {
    // positive = left of direction (PostGIS/JTS shared convention):
    // for a west-to-east segment, left is +y
    assert(sql1("""select ST_AsText(ST_OffsetCurve(
      ST_GeomFromText('LINESTRING(0 0,8 0)'), 2.0D))""") == "LINESTRING(0 2,8 2)")
    assert(sql1("""select ST_AsText(ST_OffsetCurve(
      ST_GeomFromText('LINESTRING(0 0,8 0)'), -3.0D))""") == "LINESTRING(0 -3,8 -3)")
    assert(sql1("""select ST_SRID(ST_OffsetCurve(
      ST_GeomFromText('LINESTRING(0 0,8 0)', 4326), 1.0D))""") == 4326)
    assert(sql1("""select ST_OffsetCurve(ST_GeomFromText('POINT(1 1)'), 1.0D)""") == null)
  }

  test("line editors: addpoint / setpoint / removepoint (PostGIS contracts)") {
    // default position appends; explicit position inserts BEFORE it
    assert(sql1("""select ST_AsText(ST_AddPoint(
      ST_GeomFromText('LINESTRING(0 0,1 1)'), ST_GeomFromText('POINT(2 2)')))""") ==
      "LINESTRING(0 0,1 1,2 2)")
    assert(sql1("""select ST_AsText(ST_AddPoint(
      ST_GeomFromText('LINESTRING(0 0,2 2)'), ST_GeomFromText('POINT(1 1)'), 1))""") ==
      "LINESTRING(0 0,1 1,2 2)")
    // negative ST_SetPoint counts from the end (-1 = last)
    assert(sql1("""select ST_AsText(ST_SetPoint(
      ST_GeomFromText('LINESTRING(0 0,1 1,9 9)'), -1, ST_GeomFromText('POINT(2 2)')))""") ==
      "LINESTRING(0 0,1 1,2 2)")
    assert(sql1("""select ST_AsText(ST_RemovePoint(
      ST_GeomFromText('LINESTRING(0 0,5 5,1 1)'), 1))""") == "LINESTRING(0 0,1 1)")
    // SRID rides through; non-line input -> null
    assert(sql1("""select ST_SRID(ST_AddPoint(
      ST_GeomFromText('LINESTRING(0 0,1 1)', 4326), ST_GeomFromText('POINT(2 2)')))""") == 4326)
    assert(sql1("""select ST_AddPoint(ST_GeomFromText('POINT(0 0)'),
      ST_GeomFromText('POINT(2 2)'))""") == null)
    // range violations and 2-point removal raise
    def fails(expr: String, needle: String): Unit = {
      val e = intercept[Exception](sql1(expr))
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains(needle))), expr)
    }
    fails("""select ST_SetPoint(ST_GeomFromText('LINESTRING(0 0,1 1)'), 5,
      ST_GeomFromText('POINT(2 2)'))""", "out of range")
    fails("""select ST_RemovePoint(ST_GeomFromText('LINESTRING(0 0,1 1)'), 0)""",
      "at least 2 points")
  }

  test("st_linesubstring: middle cut, vertex kept, point collapse, contract errors") {
    assert(sql1("""select ST_AsText(ST_LineSubstring(
      ST_GeomFromText('LINESTRING(0 0,8 0)'), 0.25D, 0.75D))""") == "LINESTRING(2 0,6 0)")
    // interior vertices inside the window survive
    assert(sql1("""select ST_AsText(ST_LineSubstring(
      ST_GeomFromText('LINESTRING(0 0,4 0,4 4)'), 0.25D, 0.75D))""") ==
      "LINESTRING(2 0,4 0,4 2)")
    // equal fractions collapse to the point at that fraction
    assert(sql1("""select ST_AsText(ST_LineSubstring(
      ST_GeomFromText('LINESTRING(0 0,8 0)'), 0.5D, 0.5D))""") == "POINT(4 0)")
    // non-line input -> null; SRID rides through
    assert(sql1("select ST_LineSubstring(ST_GeomFromText('POINT(1 1)'), 0D, 1D)") == null)
    assert(sql1("""select ST_SRID(ST_LineSubstring(
      ST_GeomFromText('LINESTRING(0 0,8 0)', 4326), 0D, 0.5D))""") == 4326)
    // PostGIS contract: start > end (or out of [0,1]) raises
    val e = intercept[Exception](sql1("""select ST_LineSubstring(
      ST_GeomFromText('LINESTRING(0 0,8 0)'), 0.9D, 0.1D)"""))
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => Option(c.getMessage)
      .exists(_.contains("0 <= start <= end <= 1"))))
  }

  test("st_subdivide: parts bounded, area conserved, union = original, srid kept") {
    val row = spark.sql("""
      SELECT size(parts) AS n,
             round(aggregate(parts, 0.0D, (a, p) -> a + ST_Area(p)), 6) AS area,
             ST_Equals(ST_Union(parts), big) AS same,
             array_max(transform(parts, p -> ST_NPoints(p))) AS maxnp,
             array_distinct(transform(parts, p -> ST_SRID(p))) AS srids
      FROM (SELECT ST_Subdivide(big, 8) AS parts, big FROM
        (SELECT ST_Segmentize(ST_MakeEnvelope(0D, 0D, 16D, 4D, 4326), 1.0D) AS big))""")
      .collect()(0)
    assert(row.getInt(0) >= 2, "a 41-vertex ring must split")
    assert(row.getDouble(1) == 64.0, "area must be conserved exactly")
    assert(row.getBoolean(2), "united parts must equal the input")
    assert(row.getInt(3) <= 8, "every part must respect the vertex cap")
    assert(row.getSeq[Any](4).toSeq == Seq(4326), "parts keep the input SRID")
    // small inputs pass through whole; 1-arg form defaults to 256
    assert(sql1("""select size(ST_Subdivide(ST_MakeEnvelope(0D,0D,1D,1D), 8))""") == 1)
    assert(sql1("""select ST_AsText(ST_Subdivide(ST_GeomFromText('POINT(3 4)'))[0])""")
      == "POINT(3 4)")
    // PostGIS contract: max_vertices below 5 is an error
    val e = intercept[Exception](sql1(
      "select ST_Subdivide(ST_MakeEnvelope(0D,0D,1D,1D), 4)"))
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains(">= 5"))))
  }

  test("array constructors raise on mixed nonzero SRIDs (PostGIS contract)") {
    // PostGIS: "Operation on mixed SRID geometries" — sewing coordinates
    // from two projections into one geometry must be loud
    def mixedFails(expr: String): Unit = {
      val e = intercept[Exception](sql1(expr))
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(c => Option(c.getMessage)
        .exists(_.contains("mixed SRID"))), s"wrong failure for $expr: $e")
    }
    mixedFails("""select ST_MakeLine(array(
      ST_GeomFromText('POINT(0 0)', 4326), ST_GeomFromText('POINT(1 1)', 3857)))""")
    mixedFails("""select ST_Polygonize(array(
      ST_GeomFromText('LINESTRING(0 0,1 0)', 4326),
      ST_GeomFromText('LINESTRING(1 0,0 0)', 3857)))""")
    mixedFails("""select ST_Union(array(
      ST_GeomFromText('POINT(0 0)', 4326), ST_GeomFromText('POINT(1 1)', 3857)))""")
    // unset (0) elements inherit the nonzero SRID, in either order
    assert(sql1("""select ST_SRID(ST_MakeLine(array(
      ST_GeomFromText('POINT(0 0)'), ST_GeomFromText('POINT(1 1)', 4326),
      ST_GeomFromText('POINT(2 2)'))))""") == 4326)
  }

  test("shape metrics: hausdorff / frechet / maximum inscribed circle") {
    assert(sql1("""select ST_HausdorffDistance(
      ST_GeomFromText('LINESTRING(0 0,10 0)'),
      ST_GeomFromText('LINESTRING(0 3,10 3)'))""") == 3.0)
    // frechet respects direction: a reversed line forces the diagonal
    assert(sql1("""select ST_FrechetDistance(
      ST_GeomFromText('LINESTRING(0 0,10 0)'),
      ST_GeomFromText('LINESTRING(10 3,0 3)'))""") ==
      math.sqrt(100 + 9))
    assert(sql1("""select round(ST_MaxInscribedRadius(
      ST_MakeEnvelope(0D,0D,10D,4D), 0.01D), 1)""") == 2.0)
    // center of the inscribed circle lies inside the polygon
    assert(sql1("""select ST_Within(ST_MaxInscribedCenter(
      ST_MakeEnvelope(0D,0D,10D,4D), 0.01D),
      ST_MakeEnvelope(0D,0D,10D,4D))""") == true)
  }

  test("interchange: asbinary/asewkb roundtrip, setsrid, multi") {
    // raw WKB (no dialect tag) parses back through ST_GeomFromWKB
    assert(sql1("""select ST_AsText(ST_GeomFromWKB(ST_AsBinary(
      ST_GeomFromText('POINT(3 4)'))))""") == "POINT(3 4)")
    // 2D point WKB is 21 bytes; EWKB with SRID adds the 4-byte id
    assert(sql1("select length(ST_AsBinary(ST_GeomFromText('POINT(3 4)')))") == 21)
    assert(sql1("select length(ST_AsEWKB(ST_GeomFromText('POINT(3 4)', 4326)))") == 25)
    // ST_AsBinary strips the SRID; ST_AsEWKB keeps it through a roundtrip
    assert(sql1("""select ST_SRID(ST_GeomFromWKB(ST_AsEWKB(
      ST_GeomFromText('POINT(3 4)', 4326))))""") == null) // raw parse has no EWKB srid path
    assert(sql1("select ST_SRID(ST_SetSRID(ST_GeomFromText('POINT(1 2)'), 4269))") == 4269)
    assert(sql1("""select ST_SRID(ST_SetSRID(
      ST_GeomFromText('POINT(1 2)', 4269), 0))""") == null)
    assert(sql1("select ST_AsText(ST_Multi(ST_GeomFromText('POINT(1 2)')))") ==
      "MULTIPOINT(1 2)")
    assert(sql1("""select ST_AsText(ST_Multi(ST_GeomFromText(
      'MULTIPOINT(1 2,3 4)')))""") == "MULTIPOINT(1 2,3 4)")
  }

  test("expand / project / segmentize") {
    assert(sql1("select ST_AsText(ST_Expand(ST_GeomFromText('POINT(2 3)'), 1.0D))") ==
      "POLYGON((1 2,1 4,3 4,3 2,1 2))")
    // north (az=0) moves +y; east (az=pi/2) moves +x
    assert(sql1("select ST_AsText(ST_Project(ST_GeomFromText('POINT(0 0)'), 5.0D, 0.0D))") ==
      "POINT(0 5)")
    assert(sql1("""select round(ST_X(ST_Project(
      ST_GeomFromText('POINT(0 0)'), 5.0D, pi() / 2)), 6)""") == 5.0)
    // non-point input → null
    assert(sql1("""select ST_Project(ST_GeomFromText('LINESTRING(0 0,1 1)'),
      1.0D, 0.0D)""") == null)
    assert(sql1("""select ST_NPoints(ST_Segmentize(
      ST_GeomFromText('LINESTRING(0 0,10 0)'), 3.0D))""") == 5)
  }

  test("rect-rect relate fast path matches generic RelateOp exhaustively") {
    import graft.functions.{GeoKernels => K}
    import org.locationtech.jts.io.WKTReader
    val reader = new WKTReader()
    def rectWkt(x1: Double, y1: Double, x2: Double, y2: Double): String =
      s"POLYGON(($x1 $y1,$x2 $y1,$x2 $y2,$x1 $y2,$x1 $y1))"
    def enc(w: String): Array[Byte] = K.geomFromText(w)
    val a = rectWkt(0, 0, 3, 2)
    val ga = reader.read(a)
    var checked = 0
    for {
      dx <- -4 to 7; dy <- -4 to 7
      (w, h) <- Seq((3.0, 2.0), (1.0, 1.0), (5.0, 4.0), (2.0, 6.0), (0.5, 0.5))
    } {
      val b = rectWkt(dx, dy, dx + w, dy + h)
      val gb = reader.read(b)
      val expected = ga.relate(gb).toString // generic topology-graph path
      val actual = K.relate(enc(a), enc(b)) // rect fast path
      assert(actual == expected, s"A=$a B=$b: fast=$actual generic=$expected")
      // and the predicate fast paths agree with JTS
      assert(K.touches(enc(a), enc(b)) == ga.touches(gb), s"touches B=$b")
      assert(K.overlaps(enc(a), enc(b)) == ga.overlaps(gb), s"overlaps B=$b")
      assert(K.disjoint(enc(a), enc(b)) == ga.disjoint(gb), s"disjoint B=$b")
      checked += 1
    }
    assert(checked == 12 * 12 * 5)
    // non-rectangles must fall back to the generic path
    val tri = "POLYGON((0 0,4 0,0 4,0 0))"
    assert(K.relate(enc(tri), enc(a)) == reader.read(tri).relate(ga).toString)
  }

  test("line-vs-rect crosses fast path matches JTS exhaustively") {
    import graft.functions.{GeoKernels => K}
    import org.locationtech.jts.io.WKTReader
    val reader = new WKTReader()
    val rect = "POLYGON((0 0,3 0,3 2,0 2,0 0))"
    val gRect = reader.read(rect)
    def enc(w: String): Array[Byte] = K.geomFromText(w)
    var checked = 0
    val pts = for (x <- -2 to 5; y <- -1 to 3) yield (x, y)
    // every 2-point segment between grid points (includes boundary-
    // collinear runs, corner grazes, inside-only, degenerate same-point)
    for ((x0, y0) <- pts; (x1, y1) <- pts) {
      val line = s"LINESTRING($x0 $y0,$x1 $y1)"
      val gl = reader.read(line)
      assert(K.crosses(enc(line), enc(rect)) == gl.crosses(gRect),
        s"line=$line")
      checked += 1
    }
    // multi-vertex polylines: L-shapes through/around the box
    for ((x0, y0) <- Seq((-1, -1), (1, 1), (4, 1), (-1, 1))) {
      val line = s"LINESTRING($x0 $y0,$x0 3,5 3,5 $y0)"
      val gl = reader.read(line)
      assert(K.crosses(enc(line), enc(rect)) == gl.crosses(gRect), s"line=$line")
    }
    assert(checked == pts.size * pts.size)
  }

  test("st_xmin/ymin/xmax/ymax: envelope bounds; null for empty input") {
    assert(sql1("select ST_XMin(ST_GeomFromText('LINESTRING(1 2,5 9)'))") == 1.0)
    assert(sql1("select ST_YMin(ST_GeomFromText('LINESTRING(1 2,5 9)'))") == 2.0)
    assert(sql1("select ST_XMax(ST_GeomFromText('LINESTRING(1 2,5 9)'))") == 5.0)
    assert(sql1("select ST_YMax(ST_GeomFromText('LINESTRING(1 2,5 9)'))") == 9.0)
    assert(sql1("select ST_XMin(ST_GeomFromText('POLYGON EMPTY'))") == null)
  }

  test("st_maxdistance + st_longestline: farthest vertex pair, first on ties") {
    // unit square vs itself: max distance is the sqrt(2) diagonal, and the
    // first maximizing pair in vertex order is (0 0) -> (1 1)
    val sq = "ST_GeomFromText('POLYGON((0 0,1 0,1 1,0 1,0 0))')"
    assert(sql1(s"select ST_MaxDistance($sq, $sq)") == math.sqrt(2.0))
    assert(sql1(s"select ST_AsText(ST_LongestLine($sq, $sq))") ==
      "LINESTRING(0 0,1 1)")
    // disjoint points: plain distance
    assert(sql1("select ST_MaxDistance(ST_GeomFromText('POINT(0 0)'), " +
      "ST_GeomFromText('POINT(3 4)'))") == 5.0)
    assert(sql1("select ST_MaxDistance(ST_GeomFromText('POINT(0 0)'), " +
      "ST_GeomFromText('POINT EMPTY'))") == null)
  }

  test("st_angle: 3-point form at P2, 4-point vector form, degenerate null") {
    // angle at origin from ray to (1 0) [east, az=pi/2] to ray to (0 1)
    // [north, az=0], clockwise: 3*pi/2
    val a3 = sql1("select ST_Angle(ST_GeomFromText('POINT(1 0)'), " +
      "ST_GeomFromText('POINT(0 0)'), ST_GeomFromText('POINT(0 1)'))")
      .asInstanceOf[Double]
    assert(math.abs(a3 - 3 * math.Pi / 2) < 1e-12)
    // east vector to north vector, clockwise: 3*pi/2 as well
    val a4 = sql1("select ST_Angle(ST_GeomFromText('POINT(0 0)'), " +
      "ST_GeomFromText('POINT(1 0)'), ST_GeomFromText('POINT(0 0)'), " +
      "ST_GeomFromText('POINT(0 1)'))").asInstanceOf[Double]
    assert(math.abs(a4 - 3 * math.Pi / 2) < 1e-12)
    // identical rays: angle 0
    val a0 = sql1("select ST_Angle(ST_GeomFromText('POINT(1 1)'), " +
      "ST_GeomFromText('POINT(0 0)'), ST_GeomFromText('POINT(2 2)'))")
      .asInstanceOf[Double]
    assert(math.abs(a0) < 1e-12)
    // degenerate ray (P1 == P2) is null
    assert(sql1("select ST_Angle(ST_GeomFromText('POINT(0 0)'), " +
      "ST_GeomFromText('POINT(0 0)'), ST_GeomFromText('POINT(1 1)'))") == null)
  }

  test("st_removerepeatedpoints: exact dedup, tolerance, endpoint kept") {
    assert(sql1("select ST_AsText(ST_RemoveRepeatedPoints(" +
      "ST_GeomFromText('LINESTRING(0 0,0 0,1 0,1 0,2 0)')))") ==
      "LINESTRING(0 0,1 0,2 0)")
    // tol 0.5: the 0.4 stutter goes, but the final point is ALWAYS kept
    // even though it is within tol of the last kept vertex
    assert(sql1("select ST_AsText(ST_RemoveRepeatedPoints(" +
      "ST_GeomFromText('LINESTRING(0 0,0.4 0,3 0,3.3 0)'), 0.5))") ==
      "LINESTRING(0 0,3 0,3.3 0)")
    // a ring that would collapse below 4 points is returned unfiltered
    assert(sql1("select ST_NPoints(ST_RemoveRepeatedPoints(" +
      "ST_GeomFromText('POLYGON((0 0,1 0,1 1,0 0))'), 5.0))") == 4)
  }

  test("st_ispolygoncw/ccw + st_forcepolygoncw/ccw: winding order family") {
    val ccw = "ST_GeomFromText('POLYGON((0 0,2 0,2 2,0 2,0 0))')"
    assert(sql1(s"select ST_IsPolygonCCW($ccw)") == true)
    assert(sql1(s"select ST_IsPolygonCW($ccw)") == false)
    assert(sql1(s"select ST_IsPolygonCW(ST_ForcePolygonCW($ccw))") == true)
    assert(sql1(s"select ST_AsText(ST_ForcePolygonCW($ccw))") ==
      "POLYGON((0 0,0 2,2 2,2 0,0 0))")
    // idempotent on already-CW input
    assert(sql1(s"select ST_AsText(ST_ForcePolygonCW(ST_ForcePolygonCW($ccw)))") ==
      "POLYGON((0 0,0 2,2 2,2 0,0 0))")
    // holes get the opposite winding: CW shell demands CCW hole
    val holed = "ST_GeomFromText('POLYGON((0 0,4 0,4 4,0 4,0 0)," +
      "(1 1,1 2,2 2,2 1,1 1))')"
    assert(sql1(s"select ST_IsPolygonCW(ST_ForcePolygonCW($holed))") == true)
    assert(sql1(s"select ST_IsPolygonCCW(ST_ForcePolygonCCW($holed))") == true)
    // non-polygonal input passes through and reports true (PostGIS)
    assert(sql1("select ST_IsPolygonCW(ST_GeomFromText('LINESTRING(0 0,1 1)'))")
      == true)
  }

  test("st_dumppoints / st_dumpsegments / st_points: path-order vertex sets") {
    val poly = "ST_GeomFromText('POLYGON((0 0,2 0,2 2,0 2,0 0))')"
    assert(sql1(s"select size(ST_DumpPoints($poly))") == 5) // closing dup kept
    assert(sql1(s"select ST_AsText(element_at(ST_DumpPoints($poly), 2))") ==
      "POINT(2 0)")
    assert(sql1(s"select size(ST_DumpSegments($poly))") == 4)
    assert(sql1(s"select ST_AsText(element_at(ST_DumpSegments($poly), 2))") ==
      "LINESTRING(2 0,2 2)")
    assert(sql1("select size(ST_DumpSegments(ST_GeomFromText('POINT(1 1)')))") == 0)
    assert(sql1("select ST_AsText(ST_Points(ST_GeomFromText(" +
      "'LINESTRING(0 0,1 1,0 0)')))") == "MULTIPOINT(0 0,1 1,0 0)")
  }

  test("st_collectionhomogenize: unwrap, multi-promote, flatten nesting") {
    assert(sql1("select ST_AsText(ST_CollectionHomogenize(ST_GeomFromText(" +
      "'GEOMETRYCOLLECTION(POINT(1 2))')))") == "POINT(1 2)")
    assert(sql1("select ST_AsText(ST_CollectionHomogenize(ST_GeomFromText(" +
      "'GEOMETRYCOLLECTION(POINT(1 2),POINT(3 4))')))") == "MULTIPOINT(1 2,3 4)")
    // nested collection with mixed kinds flattens one level deep
    assert(sql1("select ST_AsText(ST_CollectionHomogenize(ST_GeomFromText(" +
      "'GEOMETRYCOLLECTION(POINT(1 2),GEOMETRYCOLLECTION(LINESTRING(0 0,1 1)))')))") ==
      "GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,1 1))")
    // empty members are dropped before promotion
    assert(sql1("select ST_AsText(ST_CollectionHomogenize(ST_GeomFromText(" +
      "'GEOMETRYCOLLECTION(POINT(1 2),POINT EMPTY)')))") == "POINT(1 2)")
  }

  test("st_buildarea: donut from concentric rings; null when no face") {
    val rings = "ST_GeomFromText('MULTILINESTRING(" +
      "(0 0,8 0,8 8,0 8,0 0),(2 2,4 2,4 4,2 4,2 2))')"
    assert(sql1(s"select ST_Area(ST_BuildArea($rings))") == 60.0) // 64 - 4
    assert(sql1(s"select ST_NumInteriorRings(ST_BuildArea($rings))") == 1)
    // three concentric rings: even-depth faces kept -> outer donut + core
    val triple = "ST_GeomFromText('MULTILINESTRING(" +
      "(0 0,10 0,10 10,0 10,0 0),(2 2,8 2,8 8,2 8,2 2),(4 4,6 4,6 6,4 6,4 4))')"
    assert(sql1(s"select ST_Area(ST_BuildArea($triple))") == (100.0 - 36.0) + 4.0)
    assert(sql1(s"select ST_GeometryType(ST_BuildArea($triple))") == "ST_MultiPolygon")
    assert(sql1("select ST_BuildArea(ST_GeomFromText('LINESTRING(0 0,1 1)'))") == null)
  }

  test("st_geomfromgeohash / st_pointfromgeohash: decode mirrors encode") {
    // geohash of (lon, lat) = (-5.6, 42.6) at 5 chars is 'ezs42' (the
    // classic Wikipedia fixture)
    assert(sql1("select ST_GeoHash(ST_GeomFromText('POINT(-5.6 42.6)'), 5)") ==
      "ezs42")
    // cell width at 5 chars: 13 lon bits -> 360/8192; height 12 -> 180/4096
    assert(sql1("select ST_XMax(ST_GeomFromGeoHash('ezs42')) - " +
      "ST_XMin(ST_GeomFromGeoHash('ezs42'))") == 360.0 / 8192)
    assert(sql1("select ST_YMax(ST_GeomFromGeoHash('ezs42')) - " +
      "ST_YMin(ST_GeomFromGeoHash('ezs42'))") == 180.0 / 4096)
    assert(sql1("select ST_SRID(ST_GeomFromGeoHash('ezs42'))") == 4326)
    // the encoded point stays inside its own decoded cell
    assert(sql1("select ST_Intersects(ST_GeomFromGeoHash('ezs42'), " +
      "ST_GeomFromText('POINT(-5.6 42.6)'))") == true)
    // long-hash center converges back to the input at 6dp
    assert(sql1("select round(ST_X(ST_PointFromGeoHash(ST_GeoHash(" +
      "ST_GeomFromText('POINT(-5.6 42.6)'), 15))), 6)") == -5.6)
    assert(sql1("select ST_GeomFromGeoHash('bad!')") == null)
  }

  test("st_tileenvelope: OSM XYZ bounds in 3857; zoom-0 is the world") {
    val world = 20037508.342789244
    assert(sql1("select ST_XMin(ST_TileEnvelope(0, 0, 0))") == -world)
    assert(sql1("select ST_YMax(ST_TileEnvelope(0, 0, 0))") == world)
    assert(sql1("select ST_SRID(ST_TileEnvelope(0, 0, 0))") == 3857)
    // z=1: four quadrants; tile (1,0) is the north-east
    assert(sql1("select ST_XMin(ST_TileEnvelope(1, 1, 0))") == 0.0)
    assert(sql1("select ST_YMin(ST_TileEnvelope(1, 1, 0))") == 0.0)
    assert(intercept[Exception] {
      spark.sql("select ST_TileEnvelope(1, 2, 0)").collect()
    }.getMessage.contains("out of range"))
  }

  test("st_transform: 4326 <-> 3857 closed form, roundtrip, contract") {
    // equator point: x = R * rad(lon), y = 0
    val mx = sql1("select ST_X(ST_Transform(ST_GeomFromText(" +
      "'POINT(90 0)', 4326), 3857))").asInstanceOf[Double]
    assert(math.abs(mx - 6378137.0 * math.Pi / 2) < 1e-6)
    // tan(pi/4) is 1 ulp under 1.0, so the equator lands ~7e-10 off 0 —
    // sub-nanometer; the 6dp roundtrip below is the exactness contract
    val my = sql1("select ST_Y(ST_Transform(ST_GeomFromText(" +
      "'POINT(90 0)', 4326), 3857))").asInstanceOf[Double]
    assert(math.abs(my) < 1e-8)
    assert(sql1("select ST_SRID(ST_Transform(ST_GeomFromText(" +
      "'POINT(90 0)', 4326), 3857))") == 3857)
    // roundtrip converges at 6dp
    assert(sql1("select round(ST_Y(ST_Transform(ST_Transform(" +
      "ST_GeomFromText('POINT(12 34)', 4326), 3857), 4326)), 6)") == 34.0)
    // identity when already in the target SRID
    assert(sql1("select ST_AsEWKT(ST_Transform(ST_GeomFromText(" +
      "'POINT(1 2)', 3857), 3857))") == "SRID=3857;POINT(1 2)")
    // unsupported pairs raise rather than silently approximating —
    // 27572 (NTF Lambert zone II: LCC ONE-standard-parallel on Clarke
    // 1880 IGN, a formulation outside the LCC-2SP conic tier) is not in
    // any registry (27700/29902/23031 moved to the national-grid tier,
    // 28992 to the azimuthal tier, 3577 to the conic tier, 2056 to the
    // oblique-Mercator tier — each previous raising example got
    // implemented)
    assert(intercept[Exception] {
      spark.sql("select ST_Transform(ST_GeomFromText('POINT(1 2)', 27572), 4326)")
        .collect()
    }.getMessage.contains("ST_Transform supports"))
    // ...and the national-grid tier answers directly from SQL
    assert(sql1("select ST_SRID(ST_Transform(ST_GeomFromText(" +
      "'POINT(-0.1278 51.5074)', 4326), 27700))") == 27700)
  }

  test("st_transform: UTM zones match an independent Snyder implementation") {
    // pinned values generated by tools/utm_snyder.py — Snyder 1987
    // meridian-arc + T/C/A series, a DIFFERENT published formulation
    // than the engine's Krüger n-series; agreement to 2 mm pins the
    // projection itself rather than its self-consistency
    val known = Seq(
      (52.52, 13.405, 32633, 391779.2593, 5820072.1597),
      (40.7128, -74.006, 32618, 583959.3723, 4507350.9984),
      (-33.8688, 151.2093, 32756, 334368.6336, 6250948.3453),
      (0.0, 9.0, 32632, 500000.0000, 0.0000),
      (63.0, 9.75, 32632, 537988.7788, 6985810.7567),
      (-0.0005, 36.5, 32737, 221723.6832, 9999944.6820))
    for ((lat, lon, epsg, e, n) <- known) {
      val row = spark.sql(
        s"select ST_X(ST_Transform(ST_Point($lon, $lat, 4326), $epsg))," +
          s" ST_Y(ST_Transform(ST_Point($lon, $lat, 4326), $epsg))")
        .collect()(0)
      assert(math.abs(row.getDouble(0) - e) < 2e-3,
        s"easting $epsg: ${row.getDouble(0)} vs $e")
      assert(math.abs(row.getDouble(1) - n) < 2e-3,
        s"northing $epsg: ${row.getDouble(1)} vs $n")
      // round trip back to geographic is double-exact (Newton inverse)
      val back = spark.sql(
        s"select ST_X(ST_Transform(ST_Transform(ST_Point($lon, $lat, 4326), $epsg), 4326))," +
          s" ST_Y(ST_Transform(ST_Transform(ST_Point($lon, $lat, 4326), $epsg), 4326))")
        .collect()(0)
      assert(math.abs(back.getDouble(0) - lon) < 1e-9)
      assert(math.abs(back.getDouble(1) - lat) < 1e-9)
    }
    // cross pairs pivot through geographic: 3857 -> UTM equals
    // 4326 -> UTM of the same ground point
    val viaMerc = spark.sql(
      "select ST_X(ST_Transform(ST_Transform(ST_Point(13.405, 52.52, 4326), 3857), 32633))")
      .collect()(0).getDouble(0)
    assert(math.abs(viaMerc - 391779.2593) < 2e-3)
    // UTM srid sticks on the output
    assert(sql1("select ST_SRID(ST_Transform(ST_Point(13.405, 52.52, 4326), 32633))") == 32633)
  }

  test("st_transform: conic CRSs (LCC 2SP + Albers) match the Snyder cross-check") {
    // pinned values generated by tools/conic_snyder.py (Snyder 1987
    // ellipsoidal LCC pp. 107-109 / Albers pp. 101-102, independently
    // transcribed); agreement to 1e-4 CRS units catches transcription
    // errors in either copy. Covers Lambert-93 (France), LCC Europe,
    // NY Long Island, CA zone 5 in US survey FEET, and Conus Albers.
    val known = Seq(
      (48.8566, 2.3522, 2154, 652469.0227, 6862035.2594),
      (43.2965, 5.3698, 2154, 892390.2216, 6247035.2568),
      (52.52, 13.405, 3034, 4223201.6809, 2861033.3995),
      (40.4168, -3.7038, 3034, 2865882.3267, 1656297.3979),
      (40.7128, -74.006, 32118, 299493.0052, 60645.8178),
      (40.7891, -73.1350, 32118, 373006.8996, 69479.2816),
      (34.0522, -118.2437, 2229, 6487847.0026, 1841468.2514),
      (34.4208, -119.6982, 2229, 6049551.5612, 1979845.3356),
      (39.7392, -104.9903, 5070, -762409.0478, 1893843.5996),
      (29.7604, -95.3698, 5070, 60916.2421, 742995.1309),
      (-25.0, 135.0, 3577, 299362.2208, -2706085.9795),
      (-35.0, 149.0, 3577, 1543004.5104, -3924932.4900),
      (37.0, -120.0, 3310, 0.0, -112982.4091),
      (34.05, -118.25, 3310, 161561.8266, -439129.5848))
    for ((lat, lon, epsg, e, n) <- known) {
      val row = spark.sql(
        s"select ST_X(ST_Transform(ST_Point($lon, $lat, 4326), $epsg))," +
          s" ST_Y(ST_Transform(ST_Point($lon, $lat, 4326), $epsg))")
        .collect()(0)
      assert(math.abs(row.getDouble(0) - e) < 1e-4,
        s"easting $epsg: ${row.getDouble(0)} vs $e")
      assert(math.abs(row.getDouble(1) - n) < 1e-4,
        s"northing $epsg: ${row.getDouble(1)} vs $n")
      // round trip to geographic recovers the input to 1e-9 degrees
      val back = spark.sql(
        s"select ST_X(ST_Transform(ST_Transform(ST_Point($lon, $lat, 4326), $epsg), 4326))," +
          s" ST_Y(ST_Transform(ST_Transform(ST_Point($lon, $lat, 4326), $epsg), 4326))")
        .collect()(0)
      assert(math.abs(back.getDouble(0) - lon) < 1e-9, s"$epsg lon roundtrip")
      assert(math.abs(back.getDouble(1) - lat) < 1e-9, s"$epsg lat roundtrip")
    }
    // the false origin is exact by construction: projecting (lat0, lon0)
    // of Lambert-93 gives exactly (FE, FN) = (700000, 6600000)
    val fo = spark.sql(
      "select ST_X(ST_Transform(ST_Point(3.0, 46.5, 4326), 2154))," +
        " ST_Y(ST_Transform(ST_Point(3.0, 46.5, 4326), 2154))").collect()(0)
    assert(math.abs(fo.getDouble(0) - 700000.0) < 1e-6)
    assert(math.abs(fo.getDouble(1) - 6600000.0) < 1e-6)
    // Albers preserves area: a ~100 km quad around Denver maps with
    // area within 0.1% of its 4326->5070 "truth" computed from the
    // equal-area property (compare against spherical-excess-free local
    // planar estimate via a UTM projection of the same quad)
    val quadWkt = "POLYGON((-105.6 39.3,-104.4 39.3,-104.4 40.2,-105.6 40.2,-105.6 39.3))"
    val albersArea = sql1(
      s"select ST_Area(ST_Transform(ST_GeomFromText('$quadWkt', 4326), 5070))")
      .asInstanceOf[Double]
    val utmArea = sql1(
      s"select ST_Area(ST_Transform(ST_GeomFromText('$quadWkt', 4326), 32613))")
      .asInstanceOf[Double]
    assert(math.abs(albersArea / utmArea - 1.0) < 2e-3,
      s"Albers area $albersArea vs UTM area $utmArea")
    // conic -> conic pivots through geographic: NYC in 32118 -> 5070
    // equals the direct 4326 -> 5070 projection
    val direct = spark.sql(
      "select ST_X(ST_Transform(ST_Point(-74.006, 40.7128, 4326), 5070))")
      .collect()(0).getDouble(0)
    val viaLcc = spark.sql(
      "select ST_X(ST_Transform(ST_Transform(ST_Point(-74.006, 40.7128, 4326), 32118), 5070))")
      .collect()(0).getDouble(0)
    assert(math.abs(direct - viaLcc) < 1e-6, s"pivot $viaLcc vs direct $direct")
    // srid sticks
    assert(sql1("select ST_SRID(ST_Transform(ST_Point(2.35, 48.85, 4326), 2154))") == 2154)
  }

  test("st_geometryn / st_interiorringn: 1-based component and ring access") {
    val mp = "ST_GeomFromText('MULTIPOINT(1 2,3 4)')"
    assert(sql1(s"select ST_AsText(ST_GeometryN($mp, 2))") == "POINT(3 4)")
    // a non-collection is its own first (and only) component
    assert(sql1("select ST_AsText(ST_GeometryN(ST_GeomFromText('POINT(7 8)'), 1))") ==
      "POINT(7 8)")
    assert(sql1(s"select ST_GeometryN($mp, 3)") == null)
    assert(sql1(s"select ST_GeometryN($mp, 0)") == null)
    val donut = "ST_GeomFromText('POLYGON((0 0,8 0,8 8,0 8,0 0),(2 2,3 2,3 3,2 3,2 2))')"
    assert(sql1(s"select ST_AsText(ST_InteriorRingN($donut, 1))") ==
      "LINESTRING(2 2,3 2,3 3,2 3,2 2)")
    assert(sql1(s"select ST_InteriorRingN($donut, 2)") == null)
    assert(sql1("select ST_InteriorRingN(ST_GeomFromText('POINT(0 0)'), 1)") == null)
    // SRID flows through component access
    assert(sql1("select ST_SRID(ST_GeometryN(ST_GeomFromText('MULTIPOINT(1 2,3 4)', 4326), 1))") == 4326)
  }

  test("st_nrings / st_numpoints / st_dimension / st_coorddim: shape counters") {
    val donut = "ST_GeomFromText('POLYGON((0 0,8 0,8 8,0 8,0 0),(2 2,3 2,3 3,2 3,2 2))')"
    assert(sql1(s"select ST_NRings($donut)") == 2)
    assert(sql1("select ST_NRings(ST_GeomFromText('GEOMETRYCOLLECTION(" +
      "MULTIPOLYGON(((0 0,1 0,1 1,0 0)),((5 5,6 5,6 6,5 5))), POINT(9 9))'))") == 2)
    assert(sql1("select ST_NRings(ST_GeomFromText('LINESTRING(0 0,1 1)'))") == 0)
    // strict OGC NumPoints: lines only — NPoints counts everything
    assert(sql1("select ST_NumPoints(ST_GeomFromText('LINESTRING(0 0,1 1,2 2)'))") == 3)
    assert(sql1(s"select ST_NumPoints($donut)") == null)
    assert(sql1(s"select ST_NPoints($donut)") == 10)
    assert(sql1("select ST_Dimension(ST_GeomFromText('POINT(0 0)'))") == 0)
    assert(sql1("select ST_Dimension(ST_GeomFromText('GEOMETRYCOLLECTION(" +
      "POINT(0 0), LINESTRING(0 0,1 1))'))") == 1)
    assert(sql1(s"select ST_Dimension($donut)") == 2)
    assert(sql1(s"select ST_CoordDim($donut)") == 2)
  }

  test("st_boundingdiagonal: bbox diagonal line, SRID kept, empty-safe") {
    assert(sql1("select ST_AsText(ST_BoundingDiagonal(" +
      "ST_GeomFromText('POLYGON((1 2,5 2,5 9,1 9,1 2))')))") == "LINESTRING(1 2,5 9)")
    // a point degenerates to a zero-length diagonal
    assert(sql1("select ST_AsText(ST_BoundingDiagonal(ST_GeomFromText('POINT(3 4)')))") ==
      "LINESTRING(3 4,3 4)")
    assert(sql1("select ST_SRID(ST_BoundingDiagonal(" +
      "ST_GeomFromText('LINESTRING(0 0,2 3)', 3857)))") == 3857)
    assert(sql1("select ST_AsText(ST_BoundingDiagonal(" +
      "ST_GeomFromText('LINESTRING EMPTY')))") == "LINESTRING EMPTY")
  }

  test("st_makepoint / st_point: coordinate constructors, EWKB on SRID") {
    assert(sql1("select ST_AsText(ST_MakePoint(1.5D, -2.5D))") == "POINT(1.5 -2.5)")
    assert(sql1("select ST_SRID(ST_MakePoint(1D, 2D))") == null) // no SRID -> plain WKB
    assert(sql1("select ST_AsEWKT(ST_Point(1D, 2D, 4326))") == "SRID=4326;POINT(1 2)")
    assert(sql1("select ST_Point(CAST(NULL AS DOUBLE), 2D)") == null)
  }

  test("st_makepolygon / st_linefrommultipoint: ring + path constructors") {
    assert(sql1("select ST_Area(ST_MakePolygon(" +
      "ST_GeomFromText('LINESTRING(0 0,4 0,4 4,0 4,0 0)')))") == 16.0)
    // holes subtract; the shell's SRID wins
    assert(sql1("select ST_Area(ST_MakePolygon(" +
      "ST_GeomFromText('LINESTRING(0 0,4 0,4 4,0 4,0 0)'), " +
      "array(ST_GeomFromText('LINESTRING(1 1,2 1,2 2,1 2,1 1)'))))") == 15.0)
    assert(sql1("select ST_SRID(ST_MakePolygon(" +
      "ST_GeomFromText('LINESTRING(0 0,4 0,4 4,0 4,0 0)', 4326)))") == 4326)
    // non-line input is null; an unclosed shell raises like PostGIS
    assert(sql1("select ST_MakePolygon(ST_GeomFromText('POINT(0 0)'))") == null)
    intercept[Exception] {
      spark.sql("select ST_MakePolygon(ST_GeomFromText('LINESTRING(0 0,1 0,1 1)'))")
        .collect()
    }
    assert(sql1("select ST_AsText(ST_LineFromMultiPoint(" +
      "ST_GeomFromText('MULTIPOINT(0 0,1 1,2 3)')))") == "LINESTRING(0 0,1 1,2 3)")
    assert(sql1("select ST_LineFromMultiPoint(ST_GeomFromText('POINT(0 0)'))") == null)
  }

  test("st_square / st_squaregrid: cell bounds and bbox coverage") {
    assert(sql1("select ST_AsText(ST_Square(2.0D, 1, 3))") ==
      "POLYGON((2 6,2 8,4 8,4 6,2 6))")
    // bbox (0.5,0.5)-(3.5,1.5) at size 2 spans i in {0,1}, j in {0}
    val cells = spark.sql("""
      select inline(ST_SquareGrid(2.0D,
        ST_MakeEnvelope(0.5D, 0.5D, 3.5D, 1.5D)))""").collect()
    assert(cells.map(r => (r.getInt(0), r.getInt(1))).toSet == Set((0, 0), (1, 0)))
    // exact-boundary max is still included (floor on both ends)
    assert(spark.sql("""
      select size(ST_SquareGrid(1.0D, ST_MakeEnvelope(0D, 0D, 2D, 1D)))""")
      .collect()(0).get(0) == 6)
  }

  test("st_hexagon / st_hexagongrid: flat-top cells tile without gaps") {
    // circumradius 1: area = 3*sqrt(3)/2, centered at origin for (0,0)
    val area = sql1("select ST_Area(ST_Hexagon(1.0D, 0, 0))").asInstanceOf[Double]
    assert(math.abs(area - 3 * math.sqrt(3) / 2) < 1e-12)
    assert(sql1("select ST_NPoints(ST_Hexagon(1.0D, 0, 0))") == 7)
    // a grid over a box: cells union-cover the box (no gaps) — check a
    // probe point falls in exactly one cell interior or on a boundary
    val hits = spark.sql("""
      with g as (select inline(ST_HexagonGrid(1.0D,
        ST_MakeEnvelope(-2D, -2D, 2D, 2D))))
      select count(*) from g
      where ST_Intersects(geom, ST_GeomFromText('POINT(0.3 0.4)'))""")
      .collect()(0).getLong(0)
    assert(hits >= 1)
    // every cell of the same (size) family has identical area
    val areas = spark.sql("""
      with g as (select inline(ST_HexagonGrid(1.0D,
        ST_MakeEnvelope(-2D, -2D, 2D, 2D))))
      select count(distinct round(ST_Area(geom), 9)) from g""").collect()(0).getLong(0)
    assert(areas == 1)
  }

  test("st_generatepoints: seeded determinism, count, containment") {
    val poly = "ST_GeomFromText('POLYGON((0 0,10 0,10 5,0 5,0 0))', 4326)"
    assert(sql1(s"select ST_NumGeometries(ST_GeneratePoints($poly, 20, 42))") == 20)
    assert(sql1(s"select ST_CoveredBy(ST_GeneratePoints($poly, 20, 42), $poly)") == true)
    // same seed -> identical bits; different seed -> different points
    assert(sql1(s"select ST_Equals(ST_GeneratePoints($poly, 20, 42), " +
      s"ST_GeneratePoints($poly, 20, 42))") == true)
    assert(sql1(s"select ST_Equals(ST_GeneratePoints($poly, 20, 42), " +
      s"ST_GeneratePoints($poly, 20, 43))") == false)
    assert(sql1(s"select ST_SRID(ST_GeneratePoints($poly, 3, 1))") == 4326)
    // non-areal input yields an empty multipoint
    assert(sql1("select ST_NumGeometries(ST_GeneratePoints(" +
      "ST_GeomFromText('LINESTRING(0 0,1 1)'), 5, 7))") == 0)
  }

  test("st_affine / st_transscale: matrix transform and translate-then-scale") {
    // reflection across y=x via a=0,b=1,d=1,e=0
    assert(sql1("select ST_AsText(ST_Affine(ST_GeomFromText('LINESTRING(1 2,3 4)'), " +
      "0D, 1D, 1D, 0D, 0D, 0D))") == "LINESTRING(2 1,4 3)")
    // PostGIS doc example: translate(1,0) THEN scale by (2,1)
    assert(sql1("select ST_AsText(ST_TransScale(ST_GeomFromText('POINT(2 3)'), " +
      "1D, 0D, 2D, 1D))") == "POINT(6 3)")
    assert(sql1("select ST_SRID(ST_Affine(ST_GeomFromText('POINT(1 1)', 4326), " +
      "1D, 0D, 0D, 1D, 5D, 5D))") == 4326)
  }

  test("st_shiftlongitude / st_wrapx: hemisphere shifts") {
    assert(sql1("select ST_AsText(ST_ShiftLongitude(" +
      "ST_GeomFromText('MULTIPOINT(-170 10,20 30)')))") == "MULTIPOINT(190 10,20 30)")
    // x>180 comes back down into -180..180
    assert(sql1("select ST_AsText(ST_ShiftLongitude(ST_GeomFromText('POINT(190 0)')))") ==
      "POINT(-170 0)")
    // components entirely left of wrap=0 move +360; the rest stay
    assert(sql1("select ST_AsText(ST_WrapX(" +
      "ST_GeomFromText('MULTIPOINT(-170 10,20 30)'), 0D, 360D))") ==
      "MULTIPOINT(190 10,20 30)")
    assert(sql1("select ST_AsText(ST_WrapX(" +
      "ST_GeomFromText('MULTIPOINT(-170 10,20 30)'), 0D, -360D))") ==
      "MULTIPOINT(-170 10,-340 30)")
  }

  test("st_scroll: closed ring restarts at the given vertex") {
    assert(sql1("select ST_AsText(ST_Scroll(" +
      "ST_GeomFromText('LINESTRING(0 0,1 0,1 1,0 1,0 0)'), " +
      "ST_GeomFromText('POINT(1 1)')))") == "LINESTRING(1 1,0 1,0 0,1 0,1 1)")
    assert(sql1("select ST_Scroll(ST_GeomFromText('POINT(0 0)'), " +
      "ST_GeomFromText('POINT(1 1)'))") == null)
  }

  test("st_chaikinsmoothing: corner cutting, endpoints preserved by default") {
    // one iteration of a right angle: corner (1,0) is cut at 1/4 points
    assert(sql1("select ST_AsText(ST_ChaikinSmoothing(" +
      "ST_GeomFromText('LINESTRING(0 0,1 0,1 1)')))") ==
      "LINESTRING(0 0,0.25 0,0.75 0,1 0.25,1 0.75,1 1)")
    // closed rings stay closed, vertex count doubles per iteration
    val np = sql1("select ST_NPoints(ST_ChaikinSmoothing(" +
      "ST_GeomFromText('POLYGON((0 0,4 0,4 4,0 4,0 0))'), 2, true))")
    assert(np == 17) // 4 segs -> 8 -> 16 edges + closing vertex
  }

  test("st_simplifyvw / st_simplifypolygonhull: area-based simplification") {
    // the small triangle bump (area 0.5) is removed at tolerance 1
    assert(sql1("select ST_AsText(ST_SimplifyVW(" +
      "ST_GeomFromText('LINESTRING(0 0,5 1,10 0)'), 10D))") == "LINESTRING(0 0,10 0)")
    assert(sql1("select ST_AsText(ST_SimplifyVW(" +
      "ST_GeomFromText('LINESTRING(0 0,5 1,10 0)'), 1D))") ==
      "LINESTRING(0 0,5 1,10 0)")
    // outer hull covers the input and uses fewer vertices
    val covered = sql1("select ST_Covers(ST_SimplifyPolygonHull(" +
      "ST_Segmentize(ST_MakeEnvelope(0D, 0D, 10D, 10D), 1.0D), 0.3D, true), " +
      "ST_Segmentize(ST_MakeEnvelope(0D, 0D, 10D, 10D), 1.0D))")
    assert(covered == true)
    assert(sql1("select ST_SimplifyPolygonHull(ST_GeomFromText('POINT(0 0)'), 0.5D, true)") == null)
  }

  test("st_quantizecoordinates: bit-truncation bounded by 10^-prec") {
    val got = sql1("select ST_X(ST_QuantizeCoordinates(" +
      "ST_GeomFromText('POINT(100.123456789 0)'), 3))").asInstanceOf[Double]
    assert(math.abs(got - 100.123456789) < 1e-3 && got != 100.123456789)
    // prec high enough keeps the value exactly
    assert(sql1("select ST_X(ST_QuantizeCoordinates(" +
      "ST_GeomFromText('POINT(100.123456789 0)'), 15))") == 100.123456789)
    // integers survive low precision untouched
    assert(sql1("select ST_AsText(ST_QuantizeCoordinates(" +
      "ST_GeomFromText('POINT(4 8)'), 0))") == "POINT(4 8)")
  }

  test("st_geometricmedian: resists outliers, exact on symmetric input") {
    // symmetric cross: median = center (Weiszfeld converges there)
    val wkt = sql1("select ST_AsText(ST_GeometricMedian(" +
      "ST_GeomFromText('MULTIPOINT(0 1,0 -1,1 0,-1 0)')))").asInstanceOf[String]
    val m = """POINT\((-?[0-9.eE-]+) (-?[0-9.eE-]+)\)""".r.findFirstMatchIn(wkt).get
    assert(math.abs(m.group(1).toDouble) < 1e-6 && math.abs(m.group(2).toDouble) < 1e-6)
    // unlike the centroid, the median stays near the cluster, not the outlier
    val wkt2 = sql1("select ST_AsText(ST_GeometricMedian(" +
      "ST_GeomFromText('MULTIPOINT(0 0,0.1 0,0 0.1,1000 1000)')))").asInstanceOf[String]
    val m2 = """POINT\((-?[0-9.eE-]+) (-?[0-9.eE-]+)\)""".r.findFirstMatchIn(wkt2).get
    assert(m2.group(1).toDouble < 1.0 && m2.group(2).toDouble < 1.0)
    assert(sql1("select ST_GeometricMedian(ST_GeomFromText('LINESTRING(0 0,1 1)'))") == null)
  }

  test("st_isvalidreason / st_isvaliddetail: defect diagnosis with location") {
    assert(sql1("select ST_IsValidReason(ST_GeomFromText('POINT(0 0)'))") ==
      "Valid Geometry")
    // bowtie: self-intersection at the crossing (1, 1)
    val bowtie = "ST_GeomFromText('POLYGON((0 0,2 2,2 0,0 2,0 0))')"
    val reason = sql1(s"select ST_IsValidReason($bowtie)").asInstanceOf[String]
    assert(reason.contains("Self-intersection") && reason.contains("[1 1]"))
    val row = spark.sql(s"select ST_IsValidDetail($bowtie).valid, " +
      s"ST_IsValidDetail($bowtie).reason, " +
      s"ST_AsText(ST_IsValidDetail($bowtie).location)").collect()(0)
    assert(row.getBoolean(0) == false)
    assert(row.getString(1).contains("Self-intersection"))
    assert(row.getString(2) == "POINT(1 1)")
    assert(spark.sql("select ST_IsValidDetail(ST_GeomFromText('POINT(0 0)')).valid")
      .collect()(0).getBoolean(0) == true)
  }

  test("st_summary: per-component description lines") {
    assert(sql1("select ST_Summary(ST_GeomFromText('POINT(0 0)', 4326))") == "Point[S]")
    assert(sql1("select ST_Summary(ST_GeomFromText(" +
      "'POLYGON((0 0,8 0,8 8,0 8,0 0),(2 2,3 2,3 3,2 3,2 2))'))") ==
      "Polygon[] with 2 rings")
    assert(sql1("select ST_Summary(ST_GeomFromText('MULTIPOINT(0 0,1 1)'))") ==
      "MultiPoint[] with 2 elements\n  Point[]\n  Point[]")
  }

  test("st_askml / st_assvg: interchange text forms") {
    assert(sql1("select ST_AsKML(ST_GeomFromText('POINT(1.5 2.5)'))") ==
      "<Point><coordinates>1.5,2.5</coordinates></Point>")
    assert(sql1("select ST_AsKML(ST_GeomFromText('POLYGON((0 0,4 0,4 4,0 4,0 0))'))") ==
      "<Polygon><outerBoundaryIs><LinearRing><coordinates>" +
      "0,0 4,0 4,4 0,4 0,0</coordinates></LinearRing></outerBoundaryIs></Polygon>")
    assert(sql1("select ST_AsSVG(ST_GeomFromText('POINT(1 2)'))") ==
      """cx="1" cy="-2"""")
    assert(sql1("select ST_AsSVG(ST_GeomFromText('LINESTRING(0 0,1 1,2 0)'))") ==
      "M 0 0 L 1 -1 2 0")
    assert(sql1("select ST_AsSVG(ST_GeomFromText('POLYGON((0 0,4 0,4 4,0 4,0 0))'))") ==
      "M 0 0 L 4 0 4 -4 0 -4 Z")
  }

  test("st_ashexewkb / st_geomfromhexewkb: canonical hex roundtrip") {
    // roundtrip preserves geometry and SRID
    assert(sql1("select ST_AsEWKT(ST_GeomFromHexEWKB(ST_AsHEXEWKB(" +
      "ST_GeomFromText('POINT(1 2)', 4326))))") == "SRID=4326;POINT(1 2)")
    // little-endian EWKB point with SRID flag starts 01 01000020
    val hex = sql1("select ST_AsHEXEWKB(ST_GeomFromText('POINT(1 2)', 4326))")
      .asInstanceOf[String]
    assert(hex.startsWith("0101000020E6100000"))
    // plain (no-SRID) geometry has no flag bit
    val hex0 = sql1("select ST_AsHEXEWKB(ST_GeomFromText('POINT(1 2)'))")
      .asInstanceOf[String]
    assert(hex0.startsWith("0101000000"))
  }

  test("st_sharedpaths: direction-split shared linework") {
    // same direction along the overlap [5,10]x{0}
    assert(sql1("select ST_AsText(ST_SharedPaths(" +
      "ST_GeomFromText('LINESTRING(0 0,10 0)'), " +
      "ST_GeomFromText('LINESTRING(5 0,15 0)')))") ==
      "GEOMETRYCOLLECTION(MULTILINESTRING((5 0,10 0)),MULTILINESTRING EMPTY)")
    // opposite direction: second line runs right-to-left
    assert(sql1("select ST_AsText(ST_SharedPaths(" +
      "ST_GeomFromText('LINESTRING(0 0,10 0)'), " +
      "ST_GeomFromText('LINESTRING(15 0,5 0)')))") ==
      "GEOMETRYCOLLECTION(MULTILINESTRING EMPTY,MULTILINESTRING((5 0,10 0)))")
    // crossing lines share no 1-D path: both halves empty (the WKT
    // writer collapses an all-empty collection to EMPTY, but the
    // 2-element same/opposite structure is still there)
    assert(sql1("select ST_AsText(ST_SharedPaths(" +
      "ST_GeomFromText('LINESTRING(0 0,2 2)'), " +
      "ST_GeomFromText('LINESTRING(0 2,2 0)')))") == "GEOMETRYCOLLECTION EMPTY")
    assert(sql1("select ST_NumGeometries(ST_SharedPaths(" +
      "ST_GeomFromText('LINESTRING(0 0,2 2)'), " +
      "ST_GeomFromText('LINESTRING(0 2,2 0)')))") == 2)
    assert(sql1("select ST_SharedPaths(ST_GeomFromText('POINT(0 0)'), " +
      "ST_GeomFromText('LINESTRING(0 0,1 1)'))") == null)
  }

  test("st_distancesphere / st_distancespheroid: geodesic meters on WGS84") {
    // one degree of longitude at the equator: 2*pi*R/360 on the sphere
    val dEq = sql1("select ST_DistanceSphere(ST_GeomFromText('POINT(0 0)'), " +
      "ST_GeomFromText('POINT(1 0)'))").asInstanceOf[Double]
    val r = (2.0 * 6378137.0 + 6356752.314245179) / 3.0
    assert(math.abs(dEq - 2 * math.Pi * r / 360) < 1e-6)
    // spheroid arc along the equator uses the equatorial radius instead
    val dSp = sql1("select ST_DistanceSpheroid(ST_GeomFromText('POINT(0 0)'), " +
      "ST_GeomFromText('POINT(1 0)'))").asInstanceOf[Double]
    assert(math.abs(dSp - 2 * math.Pi * 6378137.0 / 360) < 0.5)
    // a meridian degree on the spheroid is SHORTER than an equator degree
    val dMer = sql1("select ST_DistanceSpheroid(ST_GeomFromText('POINT(0 0)'), " +
      "ST_GeomFromText('POINT(0 1)'))").asInstanceOf[Double]
    assert(dMer < dSp && dMer > 110000.0)
    assert(sql1("select ST_DistanceSphere(ST_GeomFromText('POINT(0 0)'), " +
      "ST_GeomFromText('POINT EMPTY'))") == null)
    // restricted to POINT inputs: PostGIS computes MIN distance for
    // lines/polygons, centroid substitution would be silently wrong, so
    // non-point input returns null (documented deviation)
    assert(sql1("select ST_DistanceSphere(ST_GeomFromText('POINT(0 0)'), " +
      "ST_GeomFromText('LINESTRING(1 0,2 0)'))") == null)
    assert(sql1("select ST_DistanceSpheroid(ST_GeomFromText('LINESTRING(1 0,2 0)'), " +
      "ST_GeomFromText('POINT(0 0)'))") == null)
    // symmetry
    assert(sql1("select ST_DistanceSpheroid(ST_GeomFromText('POINT(12 34)'), " +
      "ST_GeomFromText('POINT(56 7)')) = ST_DistanceSpheroid(" +
      "ST_GeomFromText('POINT(56 7)'), ST_GeomFromText('POINT(12 34)'))") == true)
  }

  test("st_aslatlontext: DMS formatting with hemisphere letters") {
    // PostGIS default D°M'S.SSS"C pads seconds to exactly 3 decimals
    assert(sql1("select ST_AsLatLonText(ST_GeomFromText('POINT(-71.5 42.25)'))") ==
      """42°15'0.000"N 71°30'0.000"W""")
    assert(sql1("select ST_AsLatLonText(ST_GeomFromText('POINT(2.5 -3.125)'))") ==
      """3°7'30.000"S 2°30'0.000"E""")
    // fractional seconds keep the fixed 3-decimal width too
    assert(sql1("select ST_AsLatLonText(ST_GeomFromText('POINT(0.2505 0)'))") ==
      """0°0'0.000"N 0°15'1.800"E""")
    assert(sql1("select ST_AsLatLonText(ST_GeomFromText('LINESTRING(0 0,1 1)'))") == null)
  }

  test("st_orderingequals / st_pointinsidecircle: strict equality and circle test") {
    assert(sql1("select ST_OrderingEquals(ST_GeomFromText('LINESTRING(0 0,1 1)'), " +
      "ST_GeomFromText('LINESTRING(0 0,1 1)'))") == true)
    // ST_Equals is true for reversed lines, ordering-equals is not
    assert(sql1("select ST_OrderingEquals(ST_GeomFromText('LINESTRING(0 0,1 1)'), " +
      "ST_GeomFromText('LINESTRING(1 1,0 0)'))") == false)
    assert(sql1("select ST_PointInsideCircle(ST_GeomFromText('POINT(3 4)'), " +
      "0D, 0D, 5D)") == true) // boundary counts
    assert(sql1("select ST_PointInsideCircle(ST_GeomFromText('POINT(3 4)'), " +
      "0D, 0D, 4.9D)") == false)
    assert(sql1("select ST_PointInsideCircle(ST_GeomFromText('LINESTRING(0 0,1 1)'), " +
      "0D, 0D, 5D)") == null)
  }

  test("st_linecrossingdirection: single, multi, and same-first codes") {
    val l1 = "ST_GeomFromText('LINESTRING(0 0,0 10)')" // pointing north
    def cross(l2wkt: String): Any =
      sql1(s"select ST_LineCrossingDirection($l1, ST_GeomFromText('$l2wkt'))")
    assert(cross("LINESTRING(-1 5,1 5)") == 1)   // west→east ends right
    assert(cross("LINESTRING(1 5,-1 5)") == -1)  // east→west ends left
    assert(cross("LINESTRING(1 1,2 2)") == 0)    // never crosses
    // two crossings, last one ends left
    assert(cross("LINESTRING(-1 2,1 3,-1 4)") == -2)
    // three crossings, last runs the same direction as the first
    assert(cross("LINESTRING(-1 2,1 3,-1 4,1 5)") == 3)
    assert(sql1(s"select ST_LineCrossingDirection($l1, ST_GeomFromText('POINT(0 0)'))") == null)
  }

  test("metadata accessors: isempty, iscollection, ndims, zmflag, hasarc, force2d, memsize") {
    assert(sql1("select ST_IsEmpty(ST_GeomFromText('POLYGON EMPTY'))") == true)
    assert(sql1("select ST_IsEmpty(ST_GeomFromText('POINT(0 0)'))") == false)
    assert(sql1("select ST_IsCollection(ST_GeomFromText('MULTIPOINT(0 0)'))") == true)
    assert(sql1("select ST_IsCollection(ST_GeomFromText('POINT(0 0)'))") == false)
    assert(sql1("select ST_NDims(ST_GeomFromText('POINT(0 0)'))") == 2)
    assert(sql1("select ST_Zmflag(ST_GeomFromText('POINT(0 0)'))") == 0)
    assert(sql1("select ST_HasArc(ST_GeomFromText('LINESTRING(0 0,1 1)'))") == false)
    // force2d re-encodes to canonical EWKB: SRID and shape survive
    assert(sql1("select ST_AsEWKT(ST_Force2D(ST_GeomFromText('POINT(1 2)', 4326)))") ==
      "SRID=4326;POINT(1 2)")
    // a no-SRID point cell is tag(1) + wkb(21) bytes
    assert(sql1("select ST_MemSize(ST_GeomFromText('POINT(1 2)'))") == 22)
  }

  test("twkb: spec example bytes, roundtrips, precision, empties") {
    // the TWKB spec's own first example: POINT(1 2) at precision 0
    assert(sql1("select lower(hex(ST_AsTWKB(ST_GeomFromText('POINT(1 2)'))))") ==
      "01000204")
    assert(sql1("select ST_AsText(ST_GeomFromTWKB(ST_AsTWKB(" +
      "ST_GeomFromText('LINESTRING(0 0,3 1,7 -2)'))))") ==
      "LINESTRING(0 0,3 1,7 -2)")
    assert(sql1("select ST_AsText(ST_GeomFromTWKB(ST_AsTWKB(ST_GeomFromText(" +
      "'POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))'))))") ==
      "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))")
    assert(sql1("select ST_AsText(ST_GeomFromTWKB(ST_AsTWKB(ST_GeomFromText(" +
      "'GEOMETRYCOLLECTION(POINT(5 5),MULTILINESTRING((0 0,1 1),(2 2,3 3)))'))))") ==
      "GEOMETRYCOLLECTION(POINT(5 5),MULTILINESTRING((0 0,1 1),(2 2,3 3)))")
    // precision quantizes: 1 decimal digit kept, -1 rounds to tens
    assert(sql1("select ST_AsText(ST_GeomFromTWKB(ST_AsTWKB(" +
      "ST_GeomFromText('POINT(1.234 5.678)'), 1)))") == "POINT(1.2 5.7)")
    assert(sql1("select ST_AsText(ST_GeomFromTWKB(ST_AsTWKB(" +
      "ST_GeomFromText('POINT(1.234 5.678)'), -1)))") == "POINT(0 10)")
    assert(sql1("select ST_AsText(ST_GeomFromTWKB(ST_AsTWKB(" +
      "ST_GeomFromText('POLYGON EMPTY'))))") == "POLYGON EMPTY")
    // TWKB carries no SRID: dropped on write, unknown on read (this
    // engine's ST_SRID reports unknown as null)
    assert(sql1("select ST_SRID(ST_GeomFromTWKB(ST_AsTWKB(" +
      "ST_GeomFromText('POINT(1 2)', 4326))))") == null)
  }

  test("triangulatepolygon: square splits into 2 triangles covering it") {
    assert(sql1("select ST_NumGeometries(ST_TriangulatePolygon(" +
      "ST_GeomFromText('POLYGON((0 0,2 0,2 2,0 2,0 0))')))") == 2)
    assert(sql1("select ST_Area(ST_TriangulatePolygon(" +
      "ST_GeomFromText('POLYGON((0 0,2 0,2 2,0 2,0 0))')))") == 4.0)
  }

  test("lineinterpolatepoints: repeat multipoint, single-point form, non-line null") {
    assert(sql1("select ST_AsText(ST_LineInterpolatePoints(" +
      "ST_GeomFromText('LINESTRING(0 0,8 0)'), 0.25))") ==
      "MULTIPOINT(2 0,4 0,6 0,8 0)")
    assert(sql1("select ST_AsText(ST_LineInterpolatePoints(" +
      "ST_GeomFromText('LINESTRING(0 0,8 0)'), 0.25, false))") == "POINT(2 0)")
    assert(sql1("select ST_LineInterpolatePoints(" +
      "ST_GeomFromText('POINT(0 0)'), 0.25)") == null)
  }

  test("swapordinates: yx swaps, xy is identity, bad spec raises") {
    assert(sql1("select ST_AsText(ST_SwapOrdinates(" +
      "ST_GeomFromText('LINESTRING(1 2,3 4)'), 'yx'))") == "LINESTRING(2 1,4 3)")
    assert(sql1("select ST_AsEWKT(ST_SwapOrdinates(" +
      "ST_GeomFromText('POINT(1 2)', 4326), 'xy'))") == "SRID=4326;POINT(1 2)")
    intercept[Exception] { sql1("select ST_SwapOrdinates(" +
      "ST_GeomFromText('POINT(1 2)'), 'xz')") }
  }

  test("asgml: gml2 default / explicit, gml3 pos forms, srsName") {
    assert(sql1("select ST_AsGML(ST_GeomFromText('POINT(1 2)'))") ==
      "<gml:Point><gml:coordinates>1,2</gml:coordinates></gml:Point>")
    assert(sql1("select ST_AsGML(3, ST_GeomFromText('POINT(1 2)', 4326))") ==
      """<gml:Point srsName="EPSG:4326"><gml:pos>1 2</gml:pos></gml:Point>""")
    assert(sql1("select ST_AsGML(3, ST_GeomFromText('LINESTRING(0 0,1 1)'))") ==
      "<gml:LineString><gml:posList>0 0 1 1</gml:posList></gml:LineString>")
    assert(sql1("select ST_AsGML(2, ST_GeomFromText('POLYGON((0 0,1 0,1 1,0 0))'))") ==
      "<gml:Polygon><gml:outerBoundaryIs><gml:LinearRing><gml:coordinates>" +
      "0,0 1,0 1,1 0,0</gml:coordinates></gml:LinearRing></gml:outerBoundaryIs></gml:Polygon>")
    assert(sql1("select ST_AsGML(3, ST_GeomFromText('MULTIPOINT(1 1,2 2)'))") ==
      "<gml:MultiPoint><gml:pointMember><gml:Point><gml:pos>1 1</gml:pos></gml:Point>" +
      "</gml:pointMember><gml:pointMember><gml:Point><gml:pos>2 2</gml:pos></gml:Point>" +
      "</gml:pointMember></gml:MultiPoint>")
    intercept[Exception] { sql1("select ST_AsGML(4, ST_GeomFromText('POINT(1 2)'))") }
  }

  test("constant folding: literal geometry folds to a binary literal") {
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .createOrReplaceTempView("cf_t")
    val plan = spark.sql(
      "select ST_Intersects(ST_GeomFromText(concat('POINT(', l_orderkey % 100, ' ', l_partkey % 100, ')')), ST_GeomFromText('POINT(0 1)')) from cf_t")
    // after optimization the constant side must be a folded binary Literal,
    // so the per-row cost of the constant geometry is one pointer compare
    val folded = plan.queryExecution.optimizedPlan.expressions.exists(_.exists {
      case i: org.apache.spark.sql.graft.StIntersects =>
        i.right.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
      case _ => false
    })
    assert(folded)
  }
}
