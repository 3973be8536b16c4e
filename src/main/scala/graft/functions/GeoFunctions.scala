package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.{Shims, _}
import org.apache.spark.sql.{Column, Encoders, SparkSession}

/** Installer + Column API for the geo function surface.
  *
  * `GeoFunctions.register(spark)` registers every function from the
  * reference inventory (SURVEY.md §2.2/2.3) for SQL use — names are
  * case-insensitive in Spark, so the reference's `ST_X`/`st_x` alias pairs
  * collapse into one registration each. The `Column`-typed wrappers below
  * serve the DataFrame API.
  */
object GeoFunctions {

  private def arity(name: String, exprs: Seq[Expression], ns: Int*): Unit =
    if (!ns.contains(exprs.length))
      throw new IllegalArgumentException(
        s"$name expects ${ns.mkString(" or ")} arguments, got ${exprs.length}")

  /** name → expression builder, as used by the SQL FunctionRegistry. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "st_geomfromtext" -> { es =>
      arity("st_geomfromtext", es, 1, 2)
      StGeomFromText(es.head, if (es.length > 1) es(1) else Literal(0))
    },
    "st_geomfromwkb" -> { es =>
      arity("st_geomfromwkb", es, 1, 2)
      StGeomFromWkb(es.head, if (es.length > 1) es(1) else Literal(0))
    },
    "st_geomfromgeojson" -> { es =>
      arity("st_geomfromgeojson", es, 1, 2)
      StGeomFromGeoJson(es.head, if (es.length > 1) es(1) else Literal(0))
    },
    "st_makeenvelope" -> { es =>
      arity("st_makeenvelope", es, 4, 5)
      StMakeEnvelope(es, hasSrid = es.length == 5)
    },
    "st_astext" -> { es => arity("st_astext", es, 1); StAsText(es.head) },
    "st_asewkt" -> { es => arity("st_asewkt", es, 1); StAsEwkt(es.head) },
    "st_asgeojson" -> { es => arity("st_asgeojson", es, 1); StAsGeoJson(es.head) },
    "st_geometrytype" -> { es => arity("st_geometrytype", es, 1); StGeometryType(es.head) },
    "st_srid" -> { es => arity("st_srid", es, 1); StSrid(es.head) },
    "box2d" -> { es => arity("box2d", es, 1); StBox2d(es.head) },
    "st_intersects" -> { es => arity("st_intersects", es, 2); StIntersects(es.head, es(1)) },
    "st_covers" -> { es => arity("st_covers", es, 2); StCovers(es.head, es(1)) },
    "st_coveredby" -> { es => arity("st_coveredby", es, 2); StCoveredBy(es.head, es(1)) },
    "st_equals" -> { es => arity("st_equals", es, 2); StEquals(es.head, es(1)) },
    "st_buffer" -> { es => arity("st_buffer", es, 3); StBuffer(es.head, es(1), es(2)) },
    "st_boundary" -> { es => arity("st_boundary", es, 1); StBoundary(es.head) },
    "st_split" -> { es => arity("st_split", es, 2); StSplit(es.head, es(1)) },
    "st_split_exact" -> { es => arity("st_split_exact", es, 2); StSplitExact(es.head, es(1)) },
    "st_translate" -> { es => arity("st_translate", es, 3); StTranslate(es.head, es(1), es(2)) },
    "st_asmvtgeom" -> { es => arity("st_asmvtgeom", es, 2); StAsMvtGeom(es.head, es(1)) },
    // extras beyond the reference surface (PostGIS-standard accessors)
    "st_area" -> { es => arity("st_area", es, 1); StArea(es.head) },
    "st_distance" -> { es => arity("st_distance", es, 2); StDistance(es.head, es(1)) },
    "st_contains" -> { es => arity("st_contains", es, 2); StContains(es.head, es(1)) },
    "st_within" -> { es => arity("st_within", es, 2); StWithin(es.head, es(1)) },
    "st_dwithin" -> { es => arity("st_dwithin", es, 3); StDWithin(es.head, es(1), es(2)) },
    "st_centroid" -> { es => arity("st_centroid", es, 1); StCentroid(es.head) },
    // arity overload mirrors PostGIS: 2 geometries = pairwise union,
    // 1 array argument = dissolve-all (the aggregate's array twin)
    "st_union" -> { es =>
      arity("st_union", es, 1, 2)
      if (es.length == 1) StUnionArr(es.head) else StUnion(es.head, es(1))
    },
    "st_intersection" -> { es => arity("st_intersection", es, 2); StIntersection(es.head, es(1)) },
    "st_envelope" -> { es => arity("st_envelope", es, 1); StEnvelope(es.head) },
    "st_x" -> { es => arity("st_x", es, 1); StX(es.head) },
    "st_y" -> { es => arity("st_y", es, 1); StY(es.head) },
    "st_numgeometries" -> { es => arity("st_numgeometries", es, 1); StNumGeometries(es.head) },
    "st_npoints" -> { es => arity("st_npoints", es, 1); StNumPoints(es.head) },
    "st_length" -> { es => arity("st_length", es, 1); StLength(es.head) },
    "st_isvalid" -> { es => arity("st_isvalid", es, 1); StIsValid(es.head) },
    "st_makevalid" -> { es => arity("st_makevalid", es, 1); StMakeValid(es.head) },
    "st_convexhull" -> { es => arity("st_convexhull", es, 1); StConvexHull(es.head) },
    "st_simplify" -> { es => arity("st_simplify", es, 2); StSimplify(es.head, es(1)) },
    "st_startpoint" -> { es => arity("st_startpoint", es, 1); StStartPoint(es.head) },
    "st_endpoint" -> { es => arity("st_endpoint", es, 1); StEndPoint(es.head) },
    "st_pointn" -> { es => arity("st_pointn", es, 2); StPointN(es.head, es(1)) },
    "st_exteriorring" -> { es => arity("st_exteriorring", es, 1); StExteriorRing(es.head) },
    "st_numinteriorrings" -> { es =>
      arity("st_numinteriorrings", es, 1); StNumInteriorRings(es.head) },
    "st_reverse" -> { es => arity("st_reverse", es, 1); StReverse(es.head) },
    "st_azimuth" -> { es => arity("st_azimuth", es, 2); StAzimuth(es.head, es(1)) },
    "st_perimeter" -> { es => arity("st_perimeter", es, 1); StPerimeter(es.head) },
    "st_rotate" -> { es =>
      arity("st_rotate", es, 2, 4)
      if (es.length == 2) StRotate(es.head, es(1), Literal(0.0), Literal(0.0))
      else StRotate(es.head, es(1), es(2), es(3))
    },
    "st_scale" -> { es => arity("st_scale", es, 3); StScale(es.head, es(1), es(2)) },
    "st_lineinterpolatepoint" -> { es =>
      arity("st_lineinterpolatepoint", es, 2); StLineInterpolatePoint(es.head, es(1)) },
    "st_linesubstring" -> { es =>
      arity("st_linesubstring", es, 3); StLineSubstring(es.head, es(1), es(2)) },
    // PostGIS default position -1 = append
    "st_addpoint" -> { es =>
      arity("st_addpoint", es, 2, 3)
      StAddPoint(es.head, es(1), if (es.length == 3) es(2)
        else org.apache.spark.sql.catalyst.expressions.Literal(-1))
    },
    "st_setpoint" -> { es =>
      arity("st_setpoint", es, 3); StSetPoint(es.head, es(1), es(2)) },
    "st_removepoint" -> { es =>
      arity("st_removepoint", es, 2); StRemovePoint(es.head, es(1)) },
    "st_offsetcurve" -> { es =>
      arity("st_offsetcurve", es, 2); StOffsetCurve(es.head, es(1)) },
    "st_node" -> { es => arity("st_node", es, 1); StNode(es.head) },
    "st_minimumclearance" -> { es =>
      arity("st_minimumclearance", es, 1); StMinimumClearance(es.head) },
    "st_minimumclearanceline" -> { es =>
      arity("st_minimumclearanceline", es, 1); StMinimumClearanceLine(es.head) },
    "st_linelocatepoint" -> { es =>
      arity("st_linelocatepoint", es, 2); StLineLocatePoint(es.head, es(1)) },
    "st_touches" -> { es => arity("st_touches", es, 2); StTouches(es.head, es(1)) },
    "st_crosses" -> { es => arity("st_crosses", es, 2); StCrosses(es.head, es(1)) },
    "st_overlaps" -> { es => arity("st_overlaps", es, 2); StOverlaps(es.head, es(1)) },
    "st_disjoint" -> { es => arity("st_disjoint", es, 2); StDisjoint(es.head, es(1)) },
    "st_relate" -> { es =>
      arity("st_relate", es, 2, 3)
      if (es.length == 2) StRelate(es.head, es(1)) else StRelateMatch(es.head, es(1), es(2))
    },
    "st_difference" -> { es => arity("st_difference", es, 2); StDifference(es.head, es(1)) },
    "st_symdifference" -> { es =>
      arity("st_symdifference", es, 2); StSymDifference(es.head, es(1)) },
    "st_closestpoint" -> { es =>
      arity("st_closestpoint", es, 2); StClosestPoint(es.head, es(1)) },
    "st_shortestline" -> { es =>
      arity("st_shortestline", es, 2); StShortestLine(es.head, es(1)) },
    "st_snap" -> { es => arity("st_snap", es, 3); StSnap(es.head, es(1), es(2)) },
    "st_pointonsurface" -> { es =>
      arity("st_pointonsurface", es, 1); StPointOnSurface(es.head) },
    "st_isclosed" -> { es => arity("st_isclosed", es, 1); StIsClosed(es.head) },
    "st_issimple" -> { es => arity("st_issimple", es, 1); StIsSimple(es.head) },
    "st_isring" -> { es => arity("st_isring", es, 1); StIsRing(es.head) },
    "st_flipcoordinates" -> { es =>
      arity("st_flipcoordinates", es, 1); StFlipCoordinates(es.head) },
    "st_normalize" -> { es => arity("st_normalize", es, 1); StNormalize(es.head) },
    "st_geohash" -> { es => arity("st_geohash", es, 2); StGeoHash(es.head, es(1)) },
    "st_dump" -> { es => arity("st_dump", es, 1); StDump(es.head) },
    // PostGIS default max_vertices = 256 when omitted
    "st_subdivide" -> { es =>
      arity("st_subdivide", es, 1, 2)
      StSubdivide(es.head, if (es.length == 2) es(1)
        else org.apache.spark.sql.catalyst.expressions.Literal(256))
    },
    "st_minimumboundingcircle" -> { es =>
      arity("st_minimumboundingcircle", es, 1); StMinimumBoundingCircle(es.head) },
    "st_minimumboundingradius" -> { es =>
      arity("st_minimumboundingradius", es, 1); StMinimumBoundingRadius(es.head) },
    "st_orientedenvelope" -> { es =>
      arity("st_orientedenvelope", es, 1); StOrientedEnvelope(es.head) },
    "st_linemerge" -> { es => arity("st_linemerge", es, 1); StLineMerge(es.head) },
    "st_unaryunion" -> { es => arity("st_unaryunion", es, 1); StUnaryUnion(es.head) },
    "st_concavehull" -> { es =>
      arity("st_concavehull", es, 2); StConcaveHull(es.head, es(1)) },
    "st_delaunaytriangles" -> { es =>
      arity("st_delaunaytriangles", es, 1, 2)
      StDelaunayTriangles(es.head, if (es.length > 1) es(1) else Literal(0.0))
    },
    "st_voronoipolygons" -> { es =>
      arity("st_voronoipolygons", es, 1, 2)
      StVoronoiPolygons(es.head, if (es.length > 1) es(1) else Literal(0.0))
    },
    "st_collectionextract" -> { es =>
      arity("st_collectionextract", es, 2); StCollectionExtract(es.head, es(1)) },
    "st_snaptogrid" -> { es =>
      arity("st_snaptogrid", es, 2); StSnapToGrid(es.head, es(1)) },
    "st_reduceprecision" -> { es =>
      arity("st_reduceprecision", es, 2); StReducePrecision(es.head, es(1)) },
    "st_geometryn" -> { es => arity("st_geometryn", es, 2); StGeometryN(es.head, es(1)) },
    "st_interiorringn" -> { es =>
      arity("st_interiorringn", es, 2); StInteriorRingN(es.head, es(1)) },
    "st_nrings" -> { es => arity("st_nrings", es, 1); StNRings(es.head) },
    "st_numpoints" -> { es => arity("st_numpoints", es, 1); StNumPointsStrict(es.head) },
    "st_dimension" -> { es => arity("st_dimension", es, 1); StDimension(es.head) },
    "st_coorddim" -> { es => arity("st_coorddim", es, 1); StCoordDim(es.head) },
    "st_boundingdiagonal" -> { es =>
      arity("st_boundingdiagonal", es, 1); StBoundingDiagonal(es.head) },
    "st_makepoint" -> { es =>
      arity("st_makepoint", es, 2); StMakePoint(es, hasSrid = false) },
    // PostGIS ST_Point: the 3-arg form carries a SRID
    "st_point" -> { es =>
      arity("st_point", es, 2, 3)
      StMakePoint(es, hasSrid = es.length == 3)
    },
    "st_makepolygon" -> { es =>
      arity("st_makepolygon", es, 1, 2)
      if (es.length == 1) StMakePolygon(es.head) else StMakePolygonHoles(es.head, es(1))
    },
    "st_linefrommultipoint" -> { es =>
      arity("st_linefrommultipoint", es, 1); StLineFromMultiPoint(es.head) },
    "st_square" -> { es => arity("st_square", es, 3); StSquare(es.head, es(1), es(2)) },
    "st_hexagon" -> { es => arity("st_hexagon", es, 3); StHexagon(es.head, es(1), es(2)) },
    "st_squaregrid" -> { es =>
      arity("st_squaregrid", es, 2); StSquareGrid(es.head, es(1)) },
    "st_hexagongrid" -> { es =>
      arity("st_hexagongrid", es, 2); StHexagonGrid(es.head, es(1)) },
    // 2-arg form seeds with 0 (PostGIS's unseeded form is
    // nondeterministic; a FIXED default seed keeps plans replayable)
    "st_generatepoints" -> { es =>
      arity("st_generatepoints", es, 2, 3)
      StGeneratePoints(es.head, es(1), if (es.length == 3) es(2) else Literal(0))
    },
    "st_affine" -> { es => arity("st_affine", es, 7); StAffine(es) },
    "st_transscale" -> { es => arity("st_transscale", es, 5); StTransScale(es) },
    "st_shiftlongitude" -> { es =>
      arity("st_shiftlongitude", es, 1); StShiftLongitude(es.head) },
    "st_wrapx" -> { es => arity("st_wrapx", es, 3); StWrapX(es.head, es(1), es(2)) },
    "st_scroll" -> { es => arity("st_scroll", es, 2); StScroll(es.head, es(1)) },
    // PostGIS defaults: 1 iteration, endpoints preserved
    "st_chaikinsmoothing" -> { es =>
      arity("st_chaikinsmoothing", es, 1, 2, 3)
      StChaikinSmoothing(es.head,
        if (es.length >= 2) es(1) else Literal(1),
        if (es.length >= 3) es(2) else Literal(true))
    },
    "st_simplifyvw" -> { es => arity("st_simplifyvw", es, 2); StSimplifyVW(es.head, es(1)) },
    // PostGIS default: outer hull
    "st_simplifypolygonhull" -> { es =>
      arity("st_simplifypolygonhull", es, 2, 3)
      StSimplifyPolygonHull(es.head, es(1),
        if (es.length == 3) es(2) else Literal(true))
    },
    "st_quantizecoordinates" -> { es =>
      arity("st_quantizecoordinates", es, 2); StQuantizeCoordinates(es.head, es(1)) },
    // PostGIS defaults: tolerance from extent; here a fixed 1e-8, 10000 iters
    "st_geometricmedian" -> { es =>
      arity("st_geometricmedian", es, 1, 2, 3)
      StGeometricMedian(es.head,
        if (es.length >= 2) es(1) else Literal(1e-8),
        if (es.length >= 3) es(2) else Literal(10000))
    },
    "st_distancesphere" -> { es =>
      arity("st_distancesphere", es, 2); StDistanceSphere(es.head, es(1)) },
    "st_distancespheroid" -> { es =>
      arity("st_distancespheroid", es, 2); StDistanceSpheroid(es.head, es(1)) },
    "st_aslatlontext" -> { es =>
      arity("st_aslatlontext", es, 1); StAsLatLonText(es.head) },
    "st_orderingequals" -> { es =>
      arity("st_orderingequals", es, 2); StOrderingEquals(es.head, es(1)) },
    "st_pointinsidecircle" -> { es =>
      arity("st_pointinsidecircle", es, 4); StPointInsideCircle(es) },
    "st_isvalidreason" -> { es =>
      arity("st_isvalidreason", es, 1); StIsValidReason(es.head) },
    "st_isvaliddetail" -> { es =>
      arity("st_isvaliddetail", es, 1); StIsValidDetail(es.head) },
    "st_summary" -> { es => arity("st_summary", es, 1); StSummary(es.head) },
    "st_askml" -> { es => arity("st_askml", es, 1); StAsKml(es.head) },
    "st_assvg" -> { es => arity("st_assvg", es, 1); StAsSvg(es.head) },
    "st_ashexewkb" -> { es => arity("st_ashexewkb", es, 1); StAsHexEwkb(es.head) },
    "st_geomfromhexewkb" -> { es =>
      arity("st_geomfromhexewkb", es, 1); StGeomFromHexEwkb(es.head) },
    "st_sharedpaths" -> { es =>
      arity("st_sharedpaths", es, 2); StSharedPaths(es.head, es(1)) },
    "st_astwkb" -> { es =>
      arity("st_astwkb", es, 1, 2)
      StAsTwkb(es.head, if (es.length > 1) es(1) else Literal(0)) },
    "st_geomfromtwkb" -> { es =>
      arity("st_geomfromtwkb", es, 1); StGeomFromTwkb(es.head) },
    "st_triangulatepolygon" -> { es =>
      arity("st_triangulatepolygon", es, 1); StTriangulatePolygon(es.head) },
    "st_lineinterpolatepoints" -> { es =>
      arity("st_lineinterpolatepoints", es, 2, 3)
      StLineInterpolatePoints(es.head, es(1),
        if (es.length > 2) es(2) else Literal(true)) },
    "st_swapordinates" -> { es =>
      arity("st_swapordinates", es, 2); StSwapOrdinates(es.head, es(1)) },
    "st_asgml" -> { es =>
      arity("st_asgml", es, 1, 2)
      // PostGIS argument order: ST_AsGML([version, ] geom); default 2
      if (es.length == 1) StAsGml(Literal(2), es.head) else StAsGml(es.head, es(1)) },
    "st_isempty" -> { es => arity("st_isempty", es, 1); StIsEmpty(es.head) },
    "st_iscollection" -> { es =>
      arity("st_iscollection", es, 1); StIsCollection(es.head) },
    "st_ndims" -> { es => arity("st_ndims", es, 1); StNDims(es.head) },
    "st_zmflag" -> { es => arity("st_zmflag", es, 1); StZmFlag(es.head) },
    "st_hasarc" -> { es => arity("st_hasarc", es, 1); StHasArc(es.head) },
    "st_force2d" -> { es => arity("st_force2d", es, 1); StForce2D(es.head) },
    "st_memsize" -> { es => arity("st_memsize", es, 1); StMemSize(es.head) },
    "st_linecrossingdirection" -> { es =>
      arity("st_linecrossingdirection", es, 2)
      StLineCrossingDirection(es.head, es(1)) },
    "st_xmin" -> { es => arity("st_xmin", es, 1); StXMin(es.head) },
    "st_ymin" -> { es => arity("st_ymin", es, 1); StYMin(es.head) },
    "st_xmax" -> { es => arity("st_xmax", es, 1); StXMax(es.head) },
    "st_ymax" -> { es => arity("st_ymax", es, 1); StYMax(es.head) },
    "st_maxdistance" -> { es =>
      arity("st_maxdistance", es, 2); StMaxDistance(es.head, es(1)) },
    "st_longestline" -> { es =>
      arity("st_longestline", es, 2); StLongestLine(es.head, es(1)) },
    "st_angle" -> { es => arity("st_angle", es, 3, 4); StAngle(es) },
    // PostGIS default tolerance 0 = exact consecutive duplicates only
    "st_removerepeatedpoints" -> { es =>
      arity("st_removerepeatedpoints", es, 1, 2)
      StRemoveRepeatedPoints(es.head, if (es.length == 2) es(1) else Literal(0.0))
    },
    "st_ispolygoncw" -> { es => arity("st_ispolygoncw", es, 1); StIsPolygonCw(es.head) },
    "st_ispolygonccw" -> { es =>
      arity("st_ispolygonccw", es, 1); StIsPolygonCcw(es.head) },
    "st_forcepolygoncw" -> { es =>
      arity("st_forcepolygoncw", es, 1); StForcePolygonCw(es.head) },
    "st_forcepolygonccw" -> { es =>
      arity("st_forcepolygonccw", es, 1); StForcePolygonCcw(es.head) },
    "st_dumppoints" -> { es => arity("st_dumppoints", es, 1); StDumpPoints(es.head) },
    "st_dumpsegments" -> { es =>
      arity("st_dumpsegments", es, 1); StDumpSegments(es.head) },
    "st_collectionhomogenize" -> { es =>
      arity("st_collectionhomogenize", es, 1); StCollectionHomogenize(es.head) },
    "st_buildarea" -> { es => arity("st_buildarea", es, 1); StBuildArea(es.head) },
    "st_points" -> { es => arity("st_points", es, 1); StPoints(es.head) },
    "st_geomfromgeohash" -> { es =>
      arity("st_geomfromgeohash", es, 1); StGeomFromGeoHash(es.head) },
    "st_pointfromgeohash" -> { es =>
      arity("st_pointfromgeohash", es, 1); StPointFromGeoHash(es.head) },
    "st_tileenvelope" -> { es =>
      arity("st_tileenvelope", es, 3); StTileEnvelope(es.head, es(1), es(2)) },
    "st_transform" -> { es =>
      arity("st_transform", es, 2); StTransform(es.head, es(1)) },
    "st_hausdorffdistance" -> { es =>
      arity("st_hausdorffdistance", es, 2); StHausdorffDistance(es.head, es(1)) },
    "st_frechetdistance" -> { es =>
      arity("st_frechetdistance", es, 2); StFrechetDistance(es.head, es(1)) },
    "st_maxinscribedradius" -> { es =>
      arity("st_maxinscribedradius", es, 2); StMaxInscribedRadius(es.head, es(1)) },
    "st_maxinscribedcenter" -> { es =>
      arity("st_maxinscribedcenter", es, 2); StMaxInscribedCenter(es.head, es(1)) },
    "st_asbinary" -> { es => arity("st_asbinary", es, 1); StAsBinary(es.head) },
    "st_asewkb" -> { es => arity("st_asewkb", es, 1); StAsEwkb(es.head) },
    "st_setsrid" -> { es => arity("st_setsrid", es, 2); StSetSrid(es.head, es(1)) },
    "st_multi" -> { es => arity("st_multi", es, 1); StMulti(es.head) },
    "st_expand" -> { es => arity("st_expand", es, 2); StExpand(es.head, es(1)) },
    "st_project" -> { es => arity("st_project", es, 3); StProject(es.head, es(1), es(2)) },
    "st_segmentize" -> { es =>
      arity("st_segmentize", es, 2); StSegmentize(es.head, es(1)) },
    "st_makeline" -> { es => arity("st_makeline", es, 1); StMakeLine(es.head) },
    "st_polygonize" -> { es => arity("st_polygonize", es, 1); StPolygonize(es.head) },
    "st_union_arr" -> { es => arity("st_union_arr", es, 1); StUnionArr(es.head) },
    // training-data-pipeline surface: text dedup/analysis + vector search
    "simhash64" -> { es => arity("simhash64", es, 1); TextSimhash(es.head) },
    "jaro_sim" -> { es => arity("jaro_sim", es, 2); JaroSim(es.head, es(1)) },
    "jaro_winkler" -> { es => arity("jaro_winkler", es, 2); JaroWinklerSim(es.head, es(1)) },
    "damerau_levenshtein" -> { es =>
      arity("damerau_levenshtein", es, 2); DamerauLevenshtein(es.head, es(1)) },
    "jaccard_ch" -> { es => arity("jaccard_ch", es, 2); JaccardCh(es.head, es(1)) },
    "hamming_str" -> { es => arity("hamming_str", es, 2); HammingStr(es.head, es(1)) },
    "minhash_sig" -> { es => arity("minhash_sig", es, 2); TextMinhash(es.head, es(1)) },
    "lang_id" -> { es => arity("lang_id", es, 1); TextLangId(es.head) },
    "script_counts" -> { es => arity("script_counts", es, 1); ScriptCounts(es.head) },
    "text_fingerprint" -> { es => arity("text_fingerprint", es, 1); TextFingerprint(es.head) },
    "text_normalize" -> { es => arity("text_normalize", es, 2); TextNormalize(es.head, es(1)) },
    "deflate_len" -> { es => arity("deflate_len", es, 2); TextDeflateLen(es.head, es(1)) },
    "hamming64" -> { es => arity("hamming64", es, 2); Hamming64(es.head, es(1)) },
    "vec_cosine" -> { es => arity("vec_cosine", es, 2); VecCosine(es.head, es(1)) },
    "vec_dot" -> { es => arity("vec_dot", es, 2); VecDot(es.head, es(1)) },
    "vec_norm" -> { es => arity("vec_norm", es, 1); VecNorm(es.head) },
    "vec_normalize" -> { es => arity("vec_normalize", es, 1); VecNormalize(es.head) },
    "vec_truncate" -> { es => arity("vec_truncate", es, 2); VecTruncate(es.head, es(1)) },
    "vec_lsh_sig" -> { es => arity("vec_lsh_sig", es, 3); VecLshSig(es.head, es(1), es(2)) },
    "pq_adc" -> { es => arity("pq_adc", es, 3); PqAdc(es.head, es(1), es(2)) },
    "vec_lsh_probes" -> { es => arity("vec_lsh_probes", es, 4); VecLshProbes(es) },
    "vec_nearest_centroid" -> { es =>
      arity("vec_nearest_centroid", es, 2); VecNearestCentroid(es.head, es(1)) },
    // DeclarativeAggregate: stays in codegen'd HashAggregate, 4 doubles
    // per group across the shuffle (the analyzer wraps it in an
    // AggregateExpression like any built-in aggregate)
    "st_extent" -> { es => arity("st_extent", es, 1); StExtentAgg(es.head) },
    // TypedImperativeAggregate: partial-aggregating dissolve — map tasks
    // union their rows down before the shuffle, so per-(task, group)
    // payload is one compacted geometry, never the group's row count.
    // Named st_union_agg (not PostGIS's overloaded ST_Union) because the
    // 1-arg scalar slot is taken by the array form above.
    "st_union_agg" -> { es => arity("st_union_agg", es, 1); StUnionAgg(es.head) },
    // TypedImperativeAggregate: Misra-Gries heavy hitters — capacity-
    // bounded counter summaries ride the shuffle instead of one row
    // per distinct (group, item)
    "mg_topk" -> { es => arity("mg_topk", es, 2); MgTopK(es.head, es(1)) },
    "hilbert_d" -> { es => arity("hilbert_d", es, 3); HilbertIndex(es.head, es(1), es(2)) },
    // Aggregator-backed UDAF, expressed through the ScalaAggregator shim
    // so it rides the same registry/extension path as every other
    // function (a spark.udf.register call would be invisible to
    // SparkSessionExtensions.injectFunction). UDAF alias support is
    // absent in the reference too ("udaf not support alias",
    // src/function/extent.rs:34-37) — single lowercase name.
    "st_collect" -> { es =>
      arity("st_collect", es, 1)
      Shims.udafExpression(CollectAggregator, Encoders.BINARY, es)
    })

  /** Register everything (scalar expressions + both UDAFs) on a session.
    * Idempotent. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => Shims.registerFunction(spark, name, b) }

  // ---- Column API ---------------------------------------------------------

  private def c(e: Expression): Column = Shims.column(e)
  private def x(col: Column): Expression = Shims.expression(col)

  def st_geomfromtext(wkt: Column): Column = c(StGeomFromText(x(wkt), Literal(0)))
  def st_geomfromtext(wkt: Column, srid: Column): Column = c(StGeomFromText(x(wkt), x(srid)))
  def st_geomfromwkb(wkb: Column): Column = c(StGeomFromWkb(x(wkb), Literal(0)))
  def st_geomfromwkb(wkb: Column, srid: Column): Column = c(StGeomFromWkb(x(wkb), x(srid)))
  def st_geomfromgeojson(json: Column): Column = c(StGeomFromGeoJson(x(json), Literal(0)))
  def st_geomfromgeojson(json: Column, srid: Column): Column =
    c(StGeomFromGeoJson(x(json), x(srid)))
  def st_makeenvelope(xmin: Column, ymin: Column, xmax: Column, ymax: Column): Column =
    c(StMakeEnvelope(Seq(x(xmin), x(ymin), x(xmax), x(ymax)), hasSrid = false))
  def st_makeenvelope(xmin: Column, ymin: Column, xmax: Column, ymax: Column, srid: Column): Column =
    c(StMakeEnvelope(Seq(x(xmin), x(ymin), x(xmax), x(ymax), x(srid)), hasSrid = true))
  def st_astext(g: Column): Column = c(StAsText(x(g)))
  def st_asewkt(g: Column): Column = c(StAsEwkt(x(g)))
  def st_asgeojson(g: Column): Column = c(StAsGeoJson(x(g)))
  def st_geometrytype(g: Column): Column = c(StGeometryType(x(g)))
  def st_srid(g: Column): Column = c(StSrid(x(g)))
  def box2d(g: Column): Column = c(StBox2d(x(g)))
  def st_intersects(a: Column, b: Column): Column = c(StIntersects(x(a), x(b)))
  def st_covers(a: Column, b: Column): Column = c(StCovers(x(a), x(b)))
  def st_coveredby(a: Column, b: Column): Column = c(StCoveredBy(x(a), x(b)))
  def st_equals(a: Column, b: Column): Column = c(StEquals(x(a), x(b)))
  def st_buffer(g: Column, width: Column, quadSegs: Column): Column =
    c(StBuffer(x(g), x(width), x(quadSegs)))
  def st_boundary(g: Column): Column = c(StBoundary(x(g)))
  def st_split(a: Column, b: Column): Column = c(StSplit(x(a), x(b)))
  def st_split_exact(a: Column, b: Column): Column = c(StSplitExact(x(a), x(b)))
  def st_translate(g: Column, dx: Column, dy: Column): Column =
    c(StTranslate(x(g), x(dx), x(dy)))
  def st_asmvtgeom(g: Column, box: Column): Column = c(StAsMvtGeom(x(g), x(box)))
  def st_area(g: Column): Column = c(StArea(x(g)))
  def st_distance(a: Column, b: Column): Column = c(StDistance(x(a), x(b)))
  def st_contains(a: Column, b: Column): Column = c(StContains(x(a), x(b)))
  def st_within(a: Column, b: Column): Column = c(StWithin(x(a), x(b)))
  def st_dwithin(a: Column, b: Column, d: Column): Column = c(StDWithin(x(a), x(b), x(d)))
  def st_centroid(g: Column): Column = c(StCentroid(x(g)))
  def st_union(a: Column, b: Column): Column = c(StUnion(x(a), x(b)))
  def st_intersection(a: Column, b: Column): Column = c(StIntersection(x(a), x(b)))
  def st_envelope(g: Column): Column = c(StEnvelope(x(g)))
  def st_x(g: Column): Column = c(StX(x(g)))
  def st_y(g: Column): Column = c(StY(x(g)))
  def st_numgeometries(g: Column): Column = c(StNumGeometries(x(g)))
  def st_npoints(g: Column): Column = c(StNumPoints(x(g)))
  def st_length(g: Column): Column = c(StLength(x(g)))
  def st_isvalid(g: Column): Column = c(StIsValid(x(g)))
  def st_makevalid(g: Column): Column = c(StMakeValid(x(g)))
  def st_convexhull(g: Column): Column = c(StConvexHull(x(g)))
  def st_simplify(g: Column, tolerance: Column): Column = c(StSimplify(x(g), x(tolerance)))
  def st_startpoint(g: Column): Column = c(StStartPoint(x(g)))
  def st_endpoint(g: Column): Column = c(StEndPoint(x(g)))
  def st_pointn(g: Column, n: Column): Column = c(StPointN(x(g), x(n)))
  def st_geometryn(g: Column, n: Column): Column = c(StGeometryN(x(g), x(n)))
  def st_interiorringn(g: Column, n: Column): Column = c(StInteriorRingN(x(g), x(n)))
  def st_nrings(g: Column): Column = c(StNRings(x(g)))
  def st_numpoints(g: Column): Column = c(StNumPointsStrict(x(g)))
  def st_dimension(g: Column): Column = c(StDimension(x(g)))
  def st_coorddim(g: Column): Column = c(StCoordDim(x(g)))
  def st_boundingdiagonal(g: Column): Column = c(StBoundingDiagonal(x(g)))
  def st_makepoint(px: Column, py: Column): Column =
    c(StMakePoint(Seq(x(px), x(py)), hasSrid = false))
  def st_point(px: Column, py: Column): Column =
    c(StMakePoint(Seq(x(px), x(py)), hasSrid = false))
  def st_point(px: Column, py: Column, srid: Column): Column =
    c(StMakePoint(Seq(x(px), x(py), x(srid)), hasSrid = true))
  def st_makepolygon(shell: Column): Column = c(StMakePolygon(x(shell)))
  def st_makepolygon(shell: Column, holes: Column): Column =
    c(StMakePolygonHoles(x(shell), x(holes)))
  def st_linefrommultipoint(mp: Column): Column = c(StLineFromMultiPoint(x(mp)))
  def st_square(size: Column, i: Column, j: Column): Column =
    c(StSquare(x(size), x(i), x(j)))
  def st_hexagon(size: Column, i: Column, j: Column): Column =
    c(StHexagon(x(size), x(i), x(j)))
  def st_squaregrid(size: Column, bounds: Column): Column =
    c(StSquareGrid(x(size), x(bounds)))
  def st_hexagongrid(size: Column, bounds: Column): Column =
    c(StHexagonGrid(x(size), x(bounds)))
  def st_generatepoints(g: Column, n: Column): Column =
    c(StGeneratePoints(x(g), x(n), Literal(0)))
  def st_generatepoints(g: Column, n: Column, seed: Column): Column =
    c(StGeneratePoints(x(g), x(n), x(seed)))
  def st_affine(g: Column, a: Column, b: Column, d: Column, e: Column,
      xoff: Column, yoff: Column): Column =
    c(StAffine(Seq(x(g), x(a), x(b), x(d), x(e), x(xoff), x(yoff))))
  def st_transscale(g: Column, dx: Column, dy: Column, xf: Column, yf: Column): Column =
    c(StTransScale(Seq(x(g), x(dx), x(dy), x(xf), x(yf))))
  def st_shiftlongitude(g: Column): Column = c(StShiftLongitude(x(g)))
  def st_wrapx(g: Column, wrap: Column, move: Column): Column =
    c(StWrapX(x(g), x(wrap), x(move)))
  def st_scroll(l: Column, p: Column): Column = c(StScroll(x(l), x(p)))
  def st_chaikinsmoothing(g: Column, iters: Column, preserveEnds: Column): Column =
    c(StChaikinSmoothing(x(g), x(iters), x(preserveEnds)))
  def st_simplifyvw(g: Column, tol: Column): Column = c(StSimplifyVW(x(g), x(tol)))
  def st_simplifypolygonhull(g: Column, frac: Column, outer: Column): Column =
    c(StSimplifyPolygonHull(x(g), x(frac), x(outer)))
  def st_quantizecoordinates(g: Column, prec: Column): Column =
    c(StQuantizeCoordinates(x(g), x(prec)))
  def st_geometricmedian(g: Column, tol: Column, maxIter: Column): Column =
    c(StGeometricMedian(x(g), x(tol), x(maxIter)))
  def st_isvalidreason(g: Column): Column = c(StIsValidReason(x(g)))
  def st_isvaliddetail(g: Column): Column = c(StIsValidDetail(x(g)))
  def st_summary(g: Column): Column = c(StSummary(x(g)))
  def st_askml(g: Column): Column = c(StAsKml(x(g)))
  def st_assvg(g: Column): Column = c(StAsSvg(x(g)))
  def st_ashexewkb(g: Column): Column = c(StAsHexEwkb(x(g)))
  def st_geomfromhexewkb(h: Column): Column = c(StGeomFromHexEwkb(x(h)))
  def st_sharedpaths(a: Column, b: Column): Column = c(StSharedPaths(x(a), x(b)))
  def st_linecrossingdirection(a: Column, b: Column): Column =
    c(StLineCrossingDirection(x(a), x(b)))
  def st_astwkb(g: Column): Column = c(StAsTwkb(x(g), Literal(0)))
  def st_astwkb(g: Column, prec: Column): Column = c(StAsTwkb(x(g), x(prec)))
  def st_geomfromtwkb(b: Column): Column = c(StGeomFromTwkb(x(b)))
  def st_triangulatepolygon(g: Column): Column = c(StTriangulatePolygon(x(g)))
  def st_lineinterpolatepoints(g: Column, frac: Column, repeat: Column): Column =
    c(StLineInterpolatePoints(x(g), x(frac), x(repeat)))
  def st_swapordinates(g: Column, spec: Column): Column =
    c(StSwapOrdinates(x(g), x(spec)))
  def st_asgml(version: Column, g: Column): Column = c(StAsGml(x(version), x(g)))
  def st_isempty(g: Column): Column = c(StIsEmpty(x(g)))
  def st_iscollection(g: Column): Column = c(StIsCollection(x(g)))
  def st_ndims(g: Column): Column = c(StNDims(x(g)))
  def st_zmflag(g: Column): Column = c(StZmFlag(x(g)))
  def st_hasarc(g: Column): Column = c(StHasArc(x(g)))
  def st_force2d(g: Column): Column = c(StForce2D(x(g)))
  def st_memsize(g: Column): Column = c(StMemSize(x(g)))
  def st_distancesphere(a: Column, b: Column): Column = c(StDistanceSphere(x(a), x(b)))
  def st_distancespheroid(a: Column, b: Column): Column =
    c(StDistanceSpheroid(x(a), x(b)))
  def st_aslatlontext(g: Column): Column = c(StAsLatLonText(x(g)))
  def st_orderingequals(a: Column, b: Column): Column = c(StOrderingEquals(x(a), x(b)))
  def st_pointinsidecircle(p: Column, cx: Column, cy: Column, r: Column): Column =
    c(StPointInsideCircle(Seq(x(p), x(cx), x(cy), x(r))))
  def st_exteriorring(g: Column): Column = c(StExteriorRing(x(g)))
  def st_numinteriorrings(g: Column): Column = c(StNumInteriorRings(x(g)))
  def st_reverse(g: Column): Column = c(StReverse(x(g)))
  def st_azimuth(a: Column, b: Column): Column = c(StAzimuth(x(a), x(b)))
  def st_perimeter(g: Column): Column = c(StPerimeter(x(g)))
  def st_rotate(g: Column, theta: Column): Column =
    c(StRotate(x(g), x(theta), Literal(0.0), Literal(0.0)))
  def st_rotate(g: Column, theta: Column, ox: Column, oy: Column): Column =
    c(StRotate(x(g), x(theta), x(ox), x(oy)))
  def st_scale(g: Column, xf: Column, yf: Column): Column = c(StScale(x(g), x(xf), x(yf)))
  def st_lineinterpolatepoint(g: Column, frac: Column): Column =
    c(StLineInterpolatePoint(x(g), x(frac)))
  def st_linesubstring(g: Column, startFrac: Column, endFrac: Column): Column =
    c(StLineSubstring(x(g), x(startFrac), x(endFrac)))
  def st_addpoint(line: Column, pt: Column, pos: Column): Column =
    c(StAddPoint(x(line), x(pt), x(pos)))
  def st_setpoint(line: Column, pos: Column, pt: Column): Column =
    c(StSetPoint(x(line), x(pos), x(pt)))
  def st_removepoint(line: Column, pos: Column): Column =
    c(StRemovePoint(x(line), x(pos)))
  def st_offsetcurve(line: Column, dist: Column): Column =
    c(StOffsetCurve(x(line), x(dist)))
  def st_node(lines: Column): Column = c(StNode(x(lines)))
  def st_minimumclearance(g: Column): Column = c(StMinimumClearance(x(g)))
  def st_minimumclearanceline(g: Column): Column = c(StMinimumClearanceLine(x(g)))
  def st_linelocatepoint(line: Column, pt: Column): Column =
    c(StLineLocatePoint(x(line), x(pt)))
  def st_touches(a: Column, b: Column): Column = c(StTouches(x(a), x(b)))
  def st_crosses(a: Column, b: Column): Column = c(StCrosses(x(a), x(b)))
  def st_overlaps(a: Column, b: Column): Column = c(StOverlaps(x(a), x(b)))
  def st_disjoint(a: Column, b: Column): Column = c(StDisjoint(x(a), x(b)))
  def st_relate(a: Column, b: Column): Column = c(StRelate(x(a), x(b)))
  def st_relate(a: Column, b: Column, pattern: Column): Column =
    c(StRelateMatch(x(a), x(b), x(pattern)))
  def st_difference(a: Column, b: Column): Column = c(StDifference(x(a), x(b)))
  def st_symdifference(a: Column, b: Column): Column = c(StSymDifference(x(a), x(b)))
  def st_closestpoint(a: Column, b: Column): Column = c(StClosestPoint(x(a), x(b)))
  def st_shortestline(a: Column, b: Column): Column = c(StShortestLine(x(a), x(b)))
  def st_snap(a: Column, b: Column, tol: Column): Column = c(StSnap(x(a), x(b), x(tol)))
  def st_pointonsurface(g: Column): Column = c(StPointOnSurface(x(g)))
  def st_isclosed(g: Column): Column = c(StIsClosed(x(g)))
  def st_issimple(g: Column): Column = c(StIsSimple(x(g)))
  def st_isring(g: Column): Column = c(StIsRing(x(g)))
  def st_flipcoordinates(g: Column): Column = c(StFlipCoordinates(x(g)))
  def st_normalize(g: Column): Column = c(StNormalize(x(g)))
  def st_geohash(g: Column, precision: Column): Column = c(StGeoHash(x(g), x(precision)))
  def st_dump(g: Column): Column = c(StDump(x(g)))
  def st_subdivide(g: Column, maxVertices: Column): Column =
    c(StSubdivide(x(g), x(maxVertices)))
  def st_minimumboundingcircle(g: Column): Column = c(StMinimumBoundingCircle(x(g)))
  def st_minimumboundingradius(g: Column): Column = c(StMinimumBoundingRadius(x(g)))
  def st_orientedenvelope(g: Column): Column = c(StOrientedEnvelope(x(g)))
  def st_linemerge(g: Column): Column = c(StLineMerge(x(g)))
  def st_unaryunion(g: Column): Column = c(StUnaryUnion(x(g)))
  def st_concavehull(g: Column, lengthRatio: Column): Column =
    c(StConcaveHull(x(g), x(lengthRatio)))
  def st_delaunaytriangles(g: Column): Column = c(StDelaunayTriangles(x(g), Literal(0.0)))
  def st_voronoipolygons(g: Column): Column = c(StVoronoiPolygons(x(g), Literal(0.0)))
  def st_collectionextract(g: Column, geomType: Column): Column =
    c(StCollectionExtract(x(g), x(geomType)))
  def st_snaptogrid(g: Column, size: Column): Column = c(StSnapToGrid(x(g), x(size)))
  def st_reduceprecision(g: Column, gridSize: Column): Column =
    c(StReducePrecision(x(g), x(gridSize)))
  def st_xmin(g: Column): Column = c(StXMin(x(g)))
  def st_ymin(g: Column): Column = c(StYMin(x(g)))
  def st_xmax(g: Column): Column = c(StXMax(x(g)))
  def st_ymax(g: Column): Column = c(StYMax(x(g)))
  def st_maxdistance(a: Column, b: Column): Column = c(StMaxDistance(x(a), x(b)))
  def st_longestline(a: Column, b: Column): Column = c(StLongestLine(x(a), x(b)))
  def st_angle(p1: Column, p2: Column, p3: Column): Column =
    c(StAngle(Seq(x(p1), x(p2), x(p3))))
  def st_angle(p1: Column, p2: Column, p3: Column, p4: Column): Column =
    c(StAngle(Seq(x(p1), x(p2), x(p3), x(p4))))
  def st_removerepeatedpoints(g: Column, tol: Column): Column =
    c(StRemoveRepeatedPoints(x(g), x(tol)))
  def st_geomfromgeohash(h: Column): Column = c(StGeomFromGeoHash(x(h)))
  def st_pointfromgeohash(h: Column): Column = c(StPointFromGeoHash(x(h)))
  def st_tileenvelope(z: Column, tx: Column, ty: Column): Column =
    c(StTileEnvelope(x(z), x(tx), x(ty)))
  def st_transform(g: Column, srid: Column): Column = c(StTransform(x(g), x(srid)))
  def st_dumppoints(g: Column): Column = c(StDumpPoints(x(g)))
  def st_dumpsegments(g: Column): Column = c(StDumpSegments(x(g)))
  def st_collectionhomogenize(g: Column): Column = c(StCollectionHomogenize(x(g)))
  def st_buildarea(g: Column): Column = c(StBuildArea(x(g)))
  def st_points(g: Column): Column = c(StPoints(x(g)))
  def st_ispolygoncw(g: Column): Column = c(StIsPolygonCw(x(g)))
  def st_ispolygonccw(g: Column): Column = c(StIsPolygonCcw(x(g)))
  def st_forcepolygoncw(g: Column): Column = c(StForcePolygonCw(x(g)))
  def st_forcepolygonccw(g: Column): Column = c(StForcePolygonCcw(x(g)))
  def st_hausdorffdistance(a: Column, b: Column): Column =
    c(StHausdorffDistance(x(a), x(b)))
  def st_frechetdistance(a: Column, b: Column): Column =
    c(StFrechetDistance(x(a), x(b)))
  def st_maxinscribedradius(g: Column, tol: Column): Column =
    c(StMaxInscribedRadius(x(g), x(tol)))
  def st_maxinscribedcenter(g: Column, tol: Column): Column =
    c(StMaxInscribedCenter(x(g), x(tol)))
  def st_asbinary(g: Column): Column = c(StAsBinary(x(g)))
  def st_asewkb(g: Column): Column = c(StAsEwkb(x(g)))
  def st_setsrid(g: Column, srid: Column): Column = c(StSetSrid(x(g), x(srid)))
  def st_multi(g: Column): Column = c(StMulti(x(g)))
  def st_expand(g: Column, d: Column): Column = c(StExpand(x(g), x(d)))
  def st_project(g: Column, dist: Column, azimuth: Column): Column =
    c(StProject(x(g), x(dist), x(azimuth)))
  def st_segmentize(g: Column, maxLen: Column): Column = c(StSegmentize(x(g), x(maxLen)))
  def st_makeline(arr: Column): Column = c(StMakeLine(x(arr)))
  def st_polygonize(arr: Column): Column = c(StPolygonize(x(arr)))
  def st_union_arr(arr: Column): Column = c(StUnionArr(x(arr)))
  def st_extent(g: Column): Column = c(StExtentAgg(x(g)).toAggregateExpression())
  def st_union_agg(g: Column): Column = c(StUnionAgg(x(g)).toAggregateExpression())
  def mg_topk(item: Column, capacity: Column): Column =
    c(MgTopK(x(item), x(capacity)).toAggregateExpression())
  def hilbert_d(xc: Column, yc: Column, bits: Column): Column =
    c(HilbertIndex(x(xc), x(yc), x(bits)))
  def simhash64(t: Column): Column = c(TextSimhash(x(t)))
  def jaro_sim(a: Column, b: Column): Column = c(JaroSim(x(a), x(b)))
  def jaro_winkler(a: Column, b: Column): Column = c(JaroWinklerSim(x(a), x(b)))
  def damerau_levenshtein(a: Column, b: Column): Column = c(DamerauLevenshtein(x(a), x(b)))
  def jaccard_ch(a: Column, b: Column): Column = c(JaccardCh(x(a), x(b)))
  def hamming_str(a: Column, b: Column): Column = c(HammingStr(x(a), x(b)))
  def minhash_sig(t: Column, n: Column): Column = c(TextMinhash(x(t), x(n)))
  def lang_id(t: Column): Column = c(TextLangId(x(t)))
  def script_counts(t: Column): Column = c(ScriptCounts(x(t)))
  def text_fingerprint(t: Column): Column = c(TextFingerprint(x(t)))
  def text_normalize(t: Column, mode: Column): Column = c(TextNormalize(x(t), x(mode)))
  def deflate_len(t: Column, level: Column): Column = c(TextDeflateLen(x(t), x(level)))
  def hamming64(a: Column, b: Column): Column = c(Hamming64(x(a), x(b)))
  def vec_cosine(a: Column, b: Column): Column = c(VecCosine(x(a), x(b)))
  def vec_dot(a: Column, b: Column): Column = c(VecDot(x(a), x(b)))
  def vec_norm(a: Column): Column = c(VecNorm(x(a)))
  def vec_normalize(a: Column): Column = c(VecNormalize(x(a)))
  def vec_truncate(a: Column, dim: Column): Column = c(VecTruncate(x(a), x(dim)))
  def vec_lsh_sig(a: Column, nPlanes: Column, seed: Column): Column =
    c(VecLshSig(x(a), x(nPlanes), x(seed)))
  def vec_lsh_probes(a: Column, nPlanes: Column, seed: Column, nProbe: Column): Column =
    c(VecLshProbes(Seq(x(a), x(nPlanes), x(seed), x(nProbe))))
  def vec_nearest_centroid(a: Column, centroids: Column): Column =
    c(VecNearestCentroid(x(a), x(centroids)))
  /** The broadcast value carries (centroids, per-centroid L2 norms) —
    * both computed once on the driver; see [[Ann.kmeansAssignBcast]]. */
  def vec_nearest_centroid_bcast(a: Column,
      bc: org.apache.spark.broadcast.Broadcast[(Array[Array[Float]], Array[Double])]): Column =
    c(VecNearestCentroidBcast(x(a), bc))
  /** Top-nProbe best-cosine centroid indices over the same broadcast
    * payload — IVF probe selection at production nlist. */
  def vec_top_centroids_bcast(a: Column,
      bc: org.apache.spark.broadcast.Broadcast[(Array[Array[Float]], Array[Double])],
      nProbe: Int): Column =
    c(VecTopCentroidsBcast(x(a), bc, nProbe))
  /** PQ-encode a vector over a broadcast (flat codebook, m, ksub)
    * payload — the IVF-PQ list compression step; see [[Ann.buildIvfPq]]. */
  def pq_encode_bcast(a: Column,
      bc: org.apache.spark.broadcast.Broadcast[(Array[Float], Int, Int)]): Column =
    c(PqEncodeBcast(x(a), bc))
  /** By-residual variant: encodes a − cents(list) over a broadcast
    * (codebook, m, ksub, normalized centroids) payload. */
  def pq_encode_residual_bcast(a: Column, list: Column,
      bc: org.apache.spark.broadcast.Broadcast[(Array[Float], Int, Int, Array[Array[Float]])]): Column =
    c(PqEncodeResidualBcast(x(a), x(list), bc))
  /** ADC score of PQ `codes` against a per-query lookup table. */
  def pq_adc(lut: Column, codes: Column, ksub: Column): Column =
    c(PqAdc(x(lut), x(codes), x(ksub)))
  def grid_cells(g: Column, cellSize: Double, expand: Double): Column =
    c(GridCells(x(g), Literal(cellSize), Literal(expand)))
  def grid_anchor_cell(a: Column, b: Column, cellSize: Double, expand: Double): Column =
    c(GridAnchorCell(Seq(x(a), x(b), Literal(cellSize), Literal(expand))))
}
