package graft.functions

import graft.geo._
import org.locationtech.jts.algorithm.Orientation
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryCollection, GeometryFactory, LineString, MultiLineString, MultiPoint, MultiPolygon, Point, Polygon, Polygonal}
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.geom.util.AffineTransformation
import org.locationtech.jts.operation.buffer.BufferOp
import org.locationtech.jts.operation.polygonize.Polygonizer

/** Static geometry kernels invoked from codegen'd Catalyst expressions.
  *
  * Design notes for scale:
  *  - All functions are pure per-row; Spark parallelizes across
  *    partitions/tasks (the reference used rayon inside a batch,
  *    src/function/intersects.rs:104-107 — on Spark the equivalent lever is
  *    partition count).
  *  - Decoded geometries are cached per thread with an identity fast path:
  *    after Catalyst constant-folds `ST_GeomFromText('...')` the literal's
  *    byte array is the SAME instance on every row, so the per-row cost of
  *    the constant side of a predicate is one reference comparison, and the
  *    JTS PreparedGeometry (internal edge index) is reused — this is what
  *    makes a full-scan `ST_Intersects(geom, constant)` fast at 100 TB.
  */
object GeoKernels {

  // ---- per-thread decoded-geometry cache --------------------------------

  private final val CacheSize = 64

  private final class ByteKey(val bytes: Array[Byte]) {
    override val hashCode: Int = java.util.Arrays.hashCode(bytes)
    override def equals(o: Any): Boolean = o match {
      case k: ByteKey => java.util.Arrays.equals(bytes, k.bytes)
      case _ => false
    }
  }

  private final class Entry(val geom: Geometry) {
    // Built lazily, and only for entries that are probed repeatedly:
    // preparing a geometry seen once (a per-row value) costs more than the
    // plain predicate, while a folded constant is probed millions of times
    // and amortizes instantly.
    var prepared: PreparedGeometry = _
    var probes: Int = 0
    def preparedGeom: PreparedGeometry = {
      if (prepared == null) prepared = PreparedGeometryFactory.prepare(geom)
      prepared
    }
    /** True once this entry has been probed before (cache hit). */
    def reused(): Boolean = {
      if (probes < 2) probes += 1
      probes >= 2
    }
  }

  private final class Cache {
    var lastKey: Array[Byte] = _
    var lastEntry: Entry = _
    val lru = new java.util.LinkedHashMap[ByteKey, Entry](CacheSize, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[ByteKey, Entry]): Boolean =
        size() > CacheSize
    }
  }

  private val caches: ThreadLocal[Cache] = ThreadLocal.withInitial(() => new Cache)

  private def entryOf(tagged: Array[Byte]): Entry = {
    val c = caches.get()
    if (c.lastKey eq tagged) return c.lastEntry
    val key = new ByteKey(tagged)
    var e = c.lru.get(key)
    if (e == null) {
      e = new Entry(GeomCodec.decode(tagged))
      c.lru.put(key, e)
    }
    c.lastKey = tagged
    c.lastEntry = e
    e
  }

  /** Decode through the cache. */
  def geom(tagged: Array[Byte]): Geometry = entryOf(tagged).geom

  /** Producers call this after encoding: the emitted byte array is the
    * exact instance a downstream consumer in the same projection receives,
    * so priming the identity fast-path + LRU means e.g.
    * `ST_Intersects(ST_GeomFromText(w), c)` never re-parses the WKB it
    * just wrote. */
  private def remember(bytes: Array[Byte], g: Geometry): Array[Byte] = {
    val c = caches.get()
    val e = new Entry(g)
    c.lru.put(new ByteKey(bytes), e)
    c.lastKey = bytes
    c.lastEntry = e
    bytes
  }

  // ---- per-thread text-parse cache --------------------------------------
  // Text constructors routinely see low-cardinality inputs: dictionary-
  // encoded parquet columns, strings synthesized from small key domains,
  // tile/grid identifiers. Parsing dominates the per-row cost of those
  // queries, so repeats resolve through a bounded per-thread LRU keyed by
  // the raw string (wide enough that a whole dictionary page fits —
  // unlike the 64-slot decode cache, whose working set is folded
  // constants). Entries hold the encoded bytes AND the parsed geometry,
  // so a hit also primes the decode cache's identity fast path. Parse
  // ERRORS are not cached and re-throw per row, preserving error parity.

  private final val ParseCacheSize = 1024

  private final class ParsedEntry(val bytes: Array[Byte], val geom: Geometry)

  private val parseCaches: ThreadLocal[java.util.LinkedHashMap[String, ParsedEntry]] =
    ThreadLocal.withInitial(() =>
      new java.util.LinkedHashMap[String, ParsedEntry](ParseCacheSize, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, ParsedEntry]): Boolean =
          size() > ParseCacheSize
      })

  private def cachedParse(key: String)(parse: => Geometry): Array[Byte] = {
    val c = parseCaches.get()
    var e = c.get(key)
    if (e == null) {
      val g = parse
      e = new ParsedEntry(GeomCodec.encodeEwkb(g), g)
      c.put(key, e)
    }
    remember(e.bytes, e.geom)
  }

  // ---- constructors ------------------------------------------------------

  def geomFromText(wkt: String): Array[Byte] =
    cachedParse(wkt)(GeomCodec.parseWkt(wkt))

  def geomFromText(wkt: String, srid: Int): Array[Byte] =
    // WKT starts with a type keyword, never a digit, so the "srid wkt"
    // composite key cannot collide with a plain-WKT key
    cachedParse(srid.toString + " " + wkt) {
      val g = GeomCodec.parseWkt(wkt)
      g.setSRID(srid)
      g
    }

  def geomFromWkb(wkb: Array[Byte]): Array[Byte] = {
    val g = GeomCodec.decodeRawWkb(wkb)
    remember(GeomCodec.encodeEwkb(g), g)
  }

  def geomFromWkb(wkb: Array[Byte], srid: Int): Array[Byte] = {
    val g = GeomCodec.decodeRawWkb(wkb)
    g.setSRID(srid)
    remember(GeomCodec.encodeEwkb(g), g)
  }

  def geomFromGeoJson(json: String, srid: Int): Array[Byte] =
    // GeoJSON text begins with '{' (or leading whitespace), so these keys
    // collide with neither WKT form
    cachedParse(if (srid == 0) json else srid.toString + " " + json) {
      val g = graft.geo.GeoJsonReader.read(json)
      if (srid != 0) g.setSRID(srid)
      g
    }

  /** ST_MakeEnvelope ring order matches the reference golden
    * (src/function/make_envelope.rs:82-100): (xmin ymin, xmin ymax,
    * xmax ymax, xmax ymin, xmin ymin); EWKB when SRID given, plain WKB
    * otherwise. */
  def makeEnvelope(xmin: Double, ymin: Double, xmax: Double, ymax: Double,
      srid: Int, hasSrid: Boolean): Array[Byte] = {
    val f: GeometryFactory = GeomCodec.geometryFactory
    val shell = f.createLinearRing(Array(
      new org.locationtech.jts.geom.Coordinate(xmin, ymin),
      new org.locationtech.jts.geom.Coordinate(xmin, ymax),
      new org.locationtech.jts.geom.Coordinate(xmax, ymax),
      new org.locationtech.jts.geom.Coordinate(xmax, ymin),
      new org.locationtech.jts.geom.Coordinate(xmin, ymin)))
    val poly: Polygon = f.createPolygon(shell)
    if (hasSrid) {
      poly.setSRID(srid)
      remember(GeomCodec.encodeEwkb(poly), poly)
    } else remember(GeomCodec.encodeWkb(poly), poly)
  }

  // ---- serializers -------------------------------------------------------
  // (text writers share the derived-op memo: serialization is pure in the
  // input bytes, and repeated inputs — dictionary pages, low-cardinality
  // synthesized geometries — make the writer the residual per-row cost)

  def asText(tagged: Array[Byte]): String =
    memoDerived(tagged, 2, 0, 0)(WktWriter.write(geom(tagged)))

  /** `SRID=n;WKT` prefix only when a SRID is present
    * (src/function/as_ewkt.rs). */
  def asEwkt(tagged: Array[Byte]): String =
    memoDerived(tagged, 3, 0, 0) {
      val g = geom(tagged)
      val wkt = WktWriter.write(g)
      if (g.getSRID != 0) s"SRID=${g.getSRID};$wkt" else wkt
    }

  def asGeoJson(tagged: Array[Byte]): String =
    memoDerived(tagged, 4, 0, 0)(GeoJsonWriter.write(geom(tagged)))

  /** `ST_`-prefixed kind names (src/function/geometry_type.rs:79-92). */
  def geometryType(tagged: Array[Byte]): String = geom(tagged) match {
    case _: org.locationtech.jts.geom.Point => "ST_Point"
    case _: org.locationtech.jts.geom.LinearRing => "ST_LineString"
    case _: org.locationtech.jts.geom.LineString => "ST_LineString"
    case _: org.locationtech.jts.geom.Polygon => "ST_Polygon"
    case _: org.locationtech.jts.geom.MultiPoint => "ST_MultiPoint"
    case _: org.locationtech.jts.geom.MultiLineString => "ST_MultiLineString"
    case _: org.locationtech.jts.geom.MultiPolygon => "ST_MultiPolygon"
    case _: org.locationtech.jts.geom.GeometryCollection => "ST_GeometryCollection"
    case other => throw new IllegalArgumentException(other.getGeometryType)
  }

  /** Boxed so a missing SRID maps to SQL NULL (reference returns
    * Option<i32>, src/function/srid.rs:53). */
  def srid(tagged: Array[Byte]): java.lang.Integer = {
    val s = geom(tagged).getSRID
    if (s == 0) null else Integer.valueOf(s)
  }

  // ---- predicates (prepared-geometry accelerated) ------------------------

  /** Symmetric predicate: prepare whichever side is reused (a folded
    * constant in either argument position); plain JTS op when both sides
    * are per-row values. */
  def intersects(a: Array[Byte], b: Array[Byte]): Boolean = {
    val ea = entryOf(a)
    val eb = entryOf(b)
    if (eb.reused()) eb.preparedGeom.intersects(ea.geom)
    else if (ea.reused()) ea.preparedGeom.intersects(eb.geom)
    else ea.geom.intersects(eb.geom)
  }

  def covers(a: Array[Byte], b: Array[Byte]): Boolean = {
    val ea = entryOf(a)
    if (ea.reused()) ea.preparedGeom.covers(geom(b))
    else ea.geom.covers(geom(b))
  }

  def coveredBy(a: Array[Byte], b: Array[Byte]): Boolean = {
    val eb = entryOf(b)
    if (eb.reused()) eb.preparedGeom.covers(geom(a))
    else eb.geom.covers(geom(a))
  }

  /** Topological equality — `equalsTopo`, NOT `equalsExact`
    * (src/function/equals.rs:137-148). */
  def equalsTopo(a: Array[Byte], b: Array[Byte]): Boolean =
    geom(a).equalsTopo(geom(b))

  def contains(a: Array[Byte], b: Array[Byte]): Boolean = {
    val ea = entryOf(a)
    if (ea.reused()) ea.preparedGeom.contains(geom(b))
    else ea.geom.contains(geom(b))
  }

  def within(a: Array[Byte], b: Array[Byte]): Boolean = {
    val eb = entryOf(b)
    if (eb.reused()) eb.preparedGeom.contains(geom(a))
    else eb.geom.contains(geom(a))
  }

  def dWithin(a: Array[Byte], b: Array[Byte], d: Double): Boolean =
    geom(a).isWithinDistance(geom(b), d)

  /** Symmetric predicates with the same prepared-geometry fast path as
    * `intersects`: whichever side is a constant-folded repeat probe gets
    * the prepared structure. */
  def touches(a: Array[Byte], b: Array[Byte]): Boolean = {
    val ea = entryOf(a)
    val eb = entryOf(b)
    if (rectFastEligible(ea.geom) && rectFastEligible(eb.geom)) {
      val m = rectMatrix(ea.geom, eb.geom)
      m(0) == 'F' && (m(1) != 'F' || m(3) != 'F' || m(4) != 'F')
    }
    else if (eb.reused()) eb.preparedGeom.touches(ea.geom)
    else if (ea.reused()) ea.preparedGeom.touches(eb.geom)
    else ea.geom.touches(eb.geom)
  }

  /** Line-vs-rectangle crosses without a topology graph: per DE-9IM,
    * crosses(L, A) ⇔ the line has a positive-length portion strictly
    * inside the box AND a vertex strictly outside the closure (a segment
    * between closure points stays inside by convexity). Liang-Barsky
    * clip + strict-interior midpoint test; exhaustively property-tested
    * against JTS crosses (GeoFunctionsSpec). */
  private def lineCrossesRect(l: LineString, r: Geometry): Boolean = {
    val env = r.getEnvelopeInternal
    val cs = l.getCoordinateSequence
    val n = cs.size()
    var anyOutside = false
    var i = 0
    while (i < n && !anyOutside) {
      val x = cs.getX(i); val y = cs.getY(i)
      anyOutside = x < env.getMinX || x > env.getMaxX ||
        y < env.getMinY || y > env.getMaxY
      i += 1
    }
    if (!anyOutside) return false
    i = 0
    while (i < n - 1) {
      if (segThroughOpenBox(cs.getX(i), cs.getY(i), cs.getX(i + 1), cs.getY(i + 1),
        env.getMinX, env.getMinY, env.getMaxX, env.getMaxY)) return true
      i += 1
    }
    false
  }

  /** Does segment (x0,y0)-(x1,y1) have a point strictly inside the box?
    * Liang-Barsky against the closed box, then a strict check on the
    * clipped midpoint (collinear-with-edge runs clip to the boundary and
    * fail the strict test). */
  private def segThroughOpenBox(x0: Double, y0: Double, x1: Double, y1: Double,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): Boolean = {
    val dx = x1 - x0; val dy = y1 - y0
    var t0 = 0.0; var t1 = 1.0
    def clip(p: Double, q: Double): Boolean =
      if (p == 0) q >= 0
      else {
        val r = q / p
        if (p < 0) { if (r > t1) false else { if (r > t0) t0 = r; true } }
        else { if (r < t0) false else { if (r < t1) t1 = r; true } }
      }
    if (!clip(-dx, x0 - xmin)) return false
    if (!clip(dx, xmax - x0)) return false
    if (!clip(-dy, y0 - ymin)) return false
    if (!clip(dy, ymax - y0)) return false
    if (t1 < t0) return false
    val tm = (t0 + t1) / 2
    val mx = x0 + tm * dx; val my = y0 + tm * dy
    mx > xmin && mx < xmax && my > ymin && my < ymax
  }

  def crosses(a: Array[Byte], b: Array[Byte]): Boolean = {
    val ea = entryOf(a)
    val gb = geom(b)
    ea.geom match {
      // zero-length (degenerate) lines keep JTS's own semantics via the
      // generic path — their point-set topology is a special case
      case l: LineString if rectFastEligible(gb) && l.getLength > 0 =>
        lineCrossesRect(l, gb)
      case _ =>
        if (ea.reused()) ea.preparedGeom.crosses(gb)
        else ea.geom.crosses(gb)
    }
  }

  def overlaps(a: Array[Byte], b: Array[Byte]): Boolean = {
    val ea = entryOf(a)
    val eb = entryOf(b)
    if (rectFastEligible(ea.geom) && rectFastEligible(eb.geom)) {
      val m = rectMatrix(ea.geom, eb.geom)
      m(0) != 'F' && m(2) != 'F' && m(6) != 'F'
    }
    else if (eb.reused()) eb.preparedGeom.overlaps(ea.geom)
    else if (ea.reused()) ea.preparedGeom.overlaps(eb.geom)
    else ea.geom.overlaps(eb.geom)
  }

  def disjoint(a: Array[Byte], b: Array[Byte]): Boolean = {
    val ea = entryOf(a)
    val eb = entryOf(b)
    if (rectFastEligible(ea.geom) && rectFastEligible(eb.geom)) {
      val m = rectMatrix(ea.geom, eb.geom)
      m(0) == 'F' && m(1) == 'F' && m(3) == 'F' && m(4) == 'F'
    }
    else if (eb.reused()) eb.preparedGeom.disjoint(ea.geom)
    else if (ea.reused()) ea.preparedGeom.disjoint(eb.geom)
    else ea.geom.disjoint(eb.geom)
  }

  /** DE-9IM for two non-degenerate axis-aligned rectangles from pure
    * interval arithmetic — no topology-graph build. The bbox-vs-bbox
    * comparison dominates tiling/extent workloads at scale, and the
    * generic RelateOp costs microseconds per pair; this is ~20 flops.
    * Exhaustively property-tested against RelateOp (GeoFunctionsSpec).
    * Matrix entry order: II IB IE / BI BB BE / EI EB EE. */
  private def rectMatrix(a: Geometry, b: Geometry): String = {
    val ea = a.getEnvelopeInternal; val eb = b.getEnvelopeInternal
    val ax1 = ea.getMinX; val ax2 = ea.getMaxX; val ay1 = ea.getMinY; val ay2 = ea.getMaxY
    val bx1 = eb.getMinX; val bx2 = eb.getMaxX; val by1 = eb.getMinY; val by2 = eb.getMaxY
    val openX = math.min(ax2, bx2) > math.max(ax1, bx1)
    val openY = math.min(ay2, by2) > math.max(ay1, by1)
    val closedInt = ax2 >= bx1 && bx2 >= ax1 && ay2 >= by1 && by2 >= ay1
    val aInB = ax1 >= bx1 && ax2 <= bx2 && ay1 >= by1 && ay2 <= by2
    val bInA = bx1 >= ax1 && bx2 <= ax2 && by1 >= ay1 && by2 <= ay2
    val aInIntB = ax1 > bx1 && ax2 < bx2 && ay1 > by1 && ay2 < by2
    val bInIntA = bx1 > ax1 && bx2 < ax2 && by1 > ay1 && by2 < ay2
    val ii = if (openX && openY) '2' else 'F'
    val ie = if (aInB) 'F' else '2'
    val ei = if (bInA) 'F' else '2'
    // an edge of one rect passing through the other's open interior
    def through(x1: Double, x2: Double, y1: Double, y2: Double,
        ox1: Double, ox2: Double, oy1: Double, oy2: Double): Boolean = {
      val v = (x1 > ox1 && x1 < ox2 || x2 > ox1 && x2 < ox2) && y2 > oy1 && y1 < oy2
      val h = (y1 > oy1 && y1 < oy2 || y2 > oy1 && y2 < oy2) && x2 > ox1 && x1 < ox2
      v || h
    }
    val ib = if (through(bx1, bx2, by1, by2, ax1, ax2, ay1, ay2)) '1' else 'F'
    val bi = if (through(ax1, ax2, ay1, ay2, bx1, bx2, by1, by2)) '1' else 'F'
    val sharedV = (bx1 == ax1 || bx1 == ax2 || bx2 == ax1 || bx2 == ax2) &&
      math.min(ay2, by2) > math.max(ay1, by1)
    val sharedH = (by1 == ay1 || by1 == ay2 || by2 == ay1 || by2 == ay2) &&
      math.min(ax2, bx2) > math.max(ax1, bx1)
    val bb =
      if (sharedV || sharedH) '1'
      else if (closedInt && !aInIntB && !bInIntA) '0'
      else 'F'
    val beC = if (aInB) 'F' else '1'
    val ebC = if (bInA) 'F' else '1'
    new String(Array(ii, ib, ie, bi, bb, beC, ei, ebC, '2'))
  }

  private def rectFastEligible(g: Geometry): Boolean = g match {
    case p: Polygon if p.isRectangle =>
      val e = p.getEnvelopeInternal
      e.getWidth > 0 && e.getHeight > 0
    case _ => false
  }

  /** DE-9IM intersection-matrix string (PostGIS 2-arg ST_Relate). */
  def relate(a: Array[Byte], b: Array[Byte]): String = {
    val ga = geom(a); val gb = geom(b)
    if (rectFastEligible(ga) && rectFastEligible(gb)) rectMatrix(ga, gb)
    else ga.relate(gb).toString
  }

  /** DE-9IM pattern match (PostGIS 3-arg ST_Relate). */
  def relateMatch(a: Array[Byte], b: Array[Byte], pattern: String): Boolean = {
    val ga = geom(a); val gb = geom(b)
    if (rectFastEligible(ga) && rectFastEligible(gb))
      new org.locationtech.jts.geom.IntersectionMatrix(rectMatrix(ga, gb))
        .matches(pattern)
    else ga.relate(gb, pattern)
  }

  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ga = geom(a)
    val out = ga.union(geom(b))
    out.setSRID(ga.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  def intersection(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ga = geom(a)
    val out = ga.intersection(geom(b))
    out.setSRID(ga.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  def difference(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ga = geom(a)
    val out = ga.difference(geom(b))
    out.setSRID(ga.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  def symDifference(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ga = geom(a)
    val out = ga.symDifference(geom(b))
    out.setSRID(ga.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  /** Interior point guaranteed on the surface (PostGIS ST_PointOnSurface;
    * JTS InteriorPoint — unlike the centroid it cannot fall outside a
    * concave polygon). */
  def pointOnSurface(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val out = g.getInteriorPoint
    out.setSRID(g.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  /** First point of the shortest segment from a to b (PostGIS
    * ST_ClosestPoint: the point ON a closest to b). */
  def closestPoint(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ga = geom(a)
    val near = org.locationtech.jts.operation.distance.DistanceOp
      .nearestPoints(ga, geom(b))
    val out = GeomCodec.geometryFactory.createPoint(near(0))
    out.setSRID(ga.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  /** 2-point LineString spanning the minimum distance (PostGIS
    * ST_ShortestLine). Degenerate (zero-length) when the geometries
    * intersect, matching PostGIS. */
  def shortestLine(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ga = geom(a)
    val near = org.locationtech.jts.operation.distance.DistanceOp
      .nearestPoints(ga, geom(b))
    val out = GeomCodec.geometryFactory.createLineString(near)
    out.setSRID(ga.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  /** Snap vertices of `a` to vertices/segments of `b` within `tol`
    * (PostGIS ST_Snap; JTS GeometrySnapper). */
  def snapGeom(a: Array[Byte], b: Array[Byte], tol: Double): Array[Byte] = {
    val ga = geom(a)
    val out = new org.locationtech.jts.operation.overlay.snap.GeometrySnapper(ga)
      .snapTo(geom(b), tol)
    out.setSRID(ga.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  def centroid(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val out = g.getCentroid
    out.setSRID(g.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  def envelope(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val out = g.getEnvelope
    out.setSRID(g.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  // ---- transforms --------------------------------------------------------

  // Derived-op memo: expensive unary transforms (buffer) over repeated
  // inputs — dictionary-encoded columns, synthesized low-cardinality
  // geometries — resolve to a content-keyed lookup instead of recomputing
  // construction + encode per row. Sized like the parse cache (a
  // dictionary page, not just folded constants). Misses cost one extra
  // hash of the input bytes — noise next to any real geometry op.

  private final class DerivedKey(val src: ByteKey, val op: Int,
      val p1: Double, val p2: Double) {
    override val hashCode: Int =
      ((src.hashCode * 31 + op) * 31 + p1.##) * 31 + p2.##
    override def equals(o: Any): Boolean = o match {
      case k: DerivedKey => k.op == op && k.p1 == p1 && k.p2 == p2 && k.src == src
      case _ => false
    }
  }

  private val derivedMemo: ThreadLocal[java.util.LinkedHashMap[DerivedKey, AnyRef]] =
    ThreadLocal.withInitial(() =>
      new java.util.LinkedHashMap[DerivedKey, AnyRef](ParseCacheSize, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[DerivedKey, AnyRef]): Boolean =
          size() > ParseCacheSize
      })

  private def memoDerived[T <: AnyRef](src: Array[Byte], op: Int, p1: Double,
      p2: Double)(compute: => T): T = {
    val c = derivedMemo.get()
    val key = new DerivedKey(new ByteKey(src), op, p1, p2)
    val hit = c.get(key)
    if (hit != null) return hit.asInstanceOf[T]
    val out = compute
    c.put(key, out)
    out
  }

  def buffer(tagged: Array[Byte], width: Double, quadSegs: Int): Array[Byte] =
    memoDerived(tagged, 1, width, quadSegs.toDouble)(
      bufferImpl(tagged, width, quadSegs))

  private def bufferImpl(tagged: Array[Byte], width: Double, quadSegs: Int): Array[Byte] = {
    val g = geom(tagged)
    val out = g match {
      // A point buffer is analytically a regular 4*quadSegs-gon (what
      // BufferOp computes through its full curve machinery, ~10x slower);
      // same CW vertex layout as GEOS: start angle 0, clockwise.
      case p: org.locationtech.jts.geom.Point if width > 0 && quadSegs > 0 =>
        val n = 4 * quadSegs
        val cs = new Array[org.locationtech.jts.geom.Coordinate](n + 1)
        val cx = p.getX
        val cy = p.getY
        var i = 0
        while (i < n) {
          val a = -2.0 * Math.PI * i / n
          cs(i) = new org.locationtech.jts.geom.Coordinate(
            cx + width * Math.cos(a), cy + width * Math.sin(a))
          i += 1
        }
        cs(n) = cs(0).copy()
        val f = GeomCodec.geometryFactory
        f.createPolygon(f.createLinearRing(cs))
      case _ => BufferOp.bufferOp(g, width, quadSegs)
    }
    out.setSRID(g.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  def boundary(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val out = g.getBoundary
    out.setSRID(g.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  def length(tagged: Array[Byte]): Double = geom(tagged).getLength

  def isValid(tagged: Array[Byte]): Boolean = geom(tagged).isValid

  /** Repair invalid geometry (self-intersections, bad rings) via JTS
    * GeometryFixer. keepCollapsed mirrors PostGIS ST_MakeValid: a
    * zero-area polygon collapses to its linear skeleton instead of being
    * silently dropped. */
  def makeValid(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val fixer = new org.locationtech.jts.geom.util.GeometryFixer(g)
    fixer.setKeepCollapsed(true)
    val out = fixer.getResult
    out.setSRID(g.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  // ---- line / ring accessors (PostGIS-standard extras) ------------------

  private def encodeKeepSrid(src: Geometry, out: Geometry): Array[Byte] = {
    out.setSRID(src.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  /** First point of a LineString; null for other types (PostGIS
    * ST_StartPoint). */
  def startPoint(tagged: Array[Byte]): Array[Byte] = geom(tagged) match {
    case l: LineString if !l.isEmpty => encodeKeepSrid(l, l.getStartPoint)
    case _ => null
  }

  /** Last point of a LineString; null for other types. */
  def endPoint(tagged: Array[Byte]): Array[Byte] = geom(tagged) match {
    case l: LineString if !l.isEmpty => encodeKeepSrid(l, l.getEndPoint)
    case _ => null
  }

  /** 1-based nth point of a LineString; negative n counts from the end
    * (PostGIS ST_PointN). Null for other types or out-of-range n. */
  def pointN(tagged: Array[Byte], n: Int): Array[Byte] = geom(tagged) match {
    case l: LineString =>
      val cnt = l.getNumPoints
      val idx = if (n > 0) n - 1 else cnt + n
      if (idx < 0 || idx >= cnt) null
      else encodeKeepSrid(l, l.getPointN(idx))
    case _ => null
  }

  /** Exterior ring of a Polygon as a LineString; null for other types
    * (PostGIS ST_ExteriorRing). */
  def exteriorRing(tagged: Array[Byte]): Array[Byte] = geom(tagged) match {
    case p: Polygon =>
      // re-build as a plain LineString: PostGIS returns LINESTRING, and a
      // JTS LinearRing would WKB-encode as one anyway, keeping parity
      val f = GeomCodec.geometryFactory
      encodeKeepSrid(p, f.createLineString(
        p.getExteriorRing.getCoordinateSequence))
    case _ => null
  }

  /** Interior-ring count of a Polygon; null for other types (PostGIS
    * ST_NumInteriorRings). */
  def numInteriorRings(tagged: Array[Byte]): Integer = geom(tagged) match {
    case p: Polygon => Integer.valueOf(p.getNumInteriorRing)
    case _ => null
  }

  /** 1-based nth component of a collection (PostGIS ST_GeometryN); a
    * non-collection input is its own first component, so n=1 returns it.
    * Null out-of-range. */
  def geometryN(tagged: Array[Byte], n: Int): Array[Byte] = {
    val g = geom(tagged)
    if (n < 1 || n > g.getNumGeometries) null
    else encodeKeepSrid(g, g.getGeometryN(n - 1))
  }

  /** 1-based nth interior ring of a Polygon as a LineString (PostGIS
    * ST_InteriorRingN); null for other types or out-of-range n. */
  def interiorRingN(tagged: Array[Byte], n: Int): Array[Byte] = geom(tagged) match {
    case p: Polygon if n >= 1 && n <= p.getNumInteriorRing =>
      encodeKeepSrid(p, GeomCodec.geometryFactory.createLineString(
        p.getInteriorRingN(n - 1).getCoordinateSequence))
    case _ => null
  }

  private def countRings(g: Geometry): Int = g match {
    case p: Polygon => if (p.isEmpty) 0 else 1 + p.getNumInteriorRing
    case gc: GeometryCollection =>
      var n = 0; var i = 0
      while (i < gc.getNumGeometries) { n += countRings(gc.getGeometryN(i)); i += 1 }
      n
    case _ => 0
  }

  /** Total ring count, exterior rings INCLUDED, over every polygonal
    * component (PostGIS ST_NRings); 0 for non-areal input. */
  def nRings(tagged: Array[Byte]): Int = countRings(geom(tagged))

  /** OGC ST_NumPoints: vertex count of a LineString ONLY, null for every
    * other type — unlike [[numPoints]] (ST_NPoints), which counts all
    * vertices of any geometry. */
  def numPointsStrict(tagged: Array[Byte]): Integer = geom(tagged) match {
    case l: LineString => Integer.valueOf(l.getNumPoints)
    case _ => null
  }

  /** Topological dimension (PostGIS ST_Dimension): 0 points, 1 lines,
    * 2 areas; max over collection components (JTS getDimension). */
  def dimension(tagged: Array[Byte]): Int = geom(tagged).getDimension

  /** Coordinate dimension (PostGIS ST_CoordDim) — this engine's codec is
    * strictly 2-D (graft.geo.GeomCodec), so every valid geometry is 2.
    * Decoding first keeps the error contract of the other accessors. */
  def coordDim(tagged: Array[Byte]): Int = { geom(tagged); 2 }

  /** Diagonal of the bounding box as a 2-point LineString from (xmin ymin)
    * to (xmax ymax) (PostGIS ST_BoundingDiagonal); LINESTRING EMPTY for
    * empty input. SRID is preserved. */
  def boundingDiagonal(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val f = GeomCodec.geometryFactory
    val out =
      if (g.isEmpty) f.createLineString(Array.empty[Coordinate])
      else {
        val e = g.getEnvelopeInternal
        f.createLineString(Array(new Coordinate(e.getMinX, e.getMinY),
          new Coordinate(e.getMaxX, e.getMaxY)))
      }
    encodeKeepSrid(g, out)
  }

  /** ST_MakePoint / ST_Point: point from raw coordinates — EWKB when a
    * SRID is given (ST_Point(x, y, srid)), plain WKB otherwise, the
    * [[makeEnvelope]] switch. */
  def makePoint(x: Double, y: Double, srid: Int, hasSrid: Boolean): Array[Byte] = {
    val p = GeomCodec.geometryFactory.createPoint(new Coordinate(x, y))
    if (hasSrid) {
      p.setSRID(srid)
      remember(GeomCodec.encodeEwkb(p), p)
    } else remember(GeomCodec.encodeWkb(p), p)
  }

  /** ST_MakePolygon: polygon from a closed shell LineString, plus
    * optional hole rings. Non-line input → null (the accessor
    * convention); an unclosed or too-short ring raises, matching the
    * PostGIS error. The shell's SRID wins. */
  def makePolygon(shell: Array[Byte], holes: Array[Array[Byte]]): Array[Byte] = {
    def ring(b: Array[Byte], what: String): org.locationtech.jts.geom.LinearRing =
      geom(b) match {
        case l: LineString =>
          if (!l.isClosed || l.getNumPoints < 4) throw new IllegalArgumentException(
            s"st_makepolygon: $what must be a closed ring of 4+ points")
          GeomCodec.geometryFactory.createLinearRing(l.getCoordinateSequence)
        case _ => null
      }
    geom(shell) match {
      case l: LineString =>
        val sh = ring(shell, "shell")
        val hs = if (holes == null) Array.empty[org.locationtech.jts.geom.LinearRing]
          else holes.map(h => ring(h, "hole"))
        if (hs.exists(_ == null)) null
        else encodeKeepSrid(l, GeomCodec.geometryFactory.createPolygon(sh, hs))
      case _ => null
    }
  }

  /** Shell-only ST_MakePolygon (codegen entry point). */
  def makePolygonShell(shell: Array[Byte]): Array[Byte] = makePolygon(shell, null)

  /** ST_MakePolygon(shell, array<hole>) — ArrayData adapter for codegen. */
  def makePolygonHoles(shell: Array[Byte],
      holes: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte] = {
    val hs = Array.tabulate(holes.numElements())(i =>
      if (holes.isNullAt(i)) null else holes.getBinary(i))
    if (hs.contains(null)) null else makePolygon(shell, hs)
  }

  /** ST_LineFromMultiPoint: LineString threading the points of a
    * MultiPoint in order; null for other types. */
  def lineFromMultiPoint(tagged: Array[Byte]): Array[Byte] = geom(tagged) match {
    case mp: MultiPoint =>
      val coords = Array.tabulate(mp.getNumGeometries)(i =>
        mp.getGeometryN(i).asInstanceOf[Point].getCoordinate.copy())
      encodeKeepSrid(mp, GeomCodec.geometryFactory.createLineString(coords))
    case _ => null
  }

  // ---- grid tiling (PostGIS ST_Square/ST_Hexagon and the *_Grid pair) --

  /** ST_Square(size, i, j): the grid cell [i·size, (i+1)·size) ×
    * [j·size, (j+1)·size) as a polygon (PostGIS square-grid indexing,
    * origin at (0,0)). Ring order matches [[makeEnvelope]]. */
  def squareCell(size: Double, i: Int, j: Int): Array[Byte] = {
    require(size > 0, "st_square: size must be positive")
    makeEnvelope(i * size, j * size, (i + 1) * size, (j + 1) * size, 0, hasSrid = false)
  }

  private def hexCenter(size: Double, i: Int, j: Int): (Double, Double) = {
    // flat-top, odd-q offset layout: columns every 1.5·size, rows every
    // sqrt(3)·size, odd columns shifted up a half-row
    val cx = 1.5 * size * i
    val h = Math.sqrt(3.0) * size
    val cy = h * j + (if ((i & 1) != 0) h / 2 else 0.0)
    (cx, cy)
  }

  /** ST_Hexagon(size, i, j): flat-top hexagon of circumradius `size` in
    * an odd-q offset grid (columns 1.5·size apart, rows sqrt(3)·size,
    * odd columns half-row up). Vertices run CCW from the east corner. */
  def hexagonCell(size: Double, i: Int, j: Int): Array[Byte] = {
    require(size > 0, "st_hexagon: size must be positive")
    val (cx, cy) = hexCenter(size, i, j)
    val h = Math.sqrt(3.0) / 2 * size
    val half = size / 2
    val f = GeomCodec.geometryFactory
    val ring = f.createLinearRing(Array(
      new Coordinate(cx + size, cy), new Coordinate(cx + half, cy + h),
      new Coordinate(cx - half, cy + h), new Coordinate(cx - size, cy),
      new Coordinate(cx - half, cy - h), new Coordinate(cx + half, cy - h),
      new Coordinate(cx + size, cy)))
    val poly = f.createPolygon(ring)
    remember(GeomCodec.encodeWkb(poly), poly)
  }

  private final val MaxGridCells = 1 << 20

  /** ST_SquareGrid(size, bounds): every cell whose index square
    * intersects the bounds' bbox, as (i, j, geom) structs. Boundary
    * cells are included (floor on both ends), matching PostGIS. The
    * cell count is capped at 2^20 — a grid bigger than that should be
    * generated as a DataFrame (sequence × sequence), not per row. */
  def squareGrid(size: Double,
      bounds: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    require(size > 0, "st_squaregrid: size must be positive")
    val env = geom(bounds).getEnvelopeInternal
    if (env.isNull) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.empty[Any])
    val i0 = Math.floor(env.getMinX / size).toInt
    val i1 = Math.floor(env.getMaxX / size).toInt
    val j0 = Math.floor(env.getMinY / size).toInt
    val j1 = Math.floor(env.getMaxY / size).toInt
    // Long arithmetic end-to-end: with huge bounds / tiny cells the Int
    // subtraction itself overflows (indices saturate at ±2^31) and a
    // negative n would bypass the cap only to blow up at allocation
    val n = (i1.toLong - i0.toLong + 1L) * (j1.toLong - j0.toLong + 1L)
    require(n > 0 && n <= MaxGridCells,
      s"st_squaregrid: $n cells exceeds the $MaxGridCells per-row cap; tile from a range() DataFrame instead")
    val out = new Array[Any](n.toInt)
    var k = 0
    var i = i0
    while (i <= i1) {
      var j = j0
      while (j <= j1) {
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](i, j, squareCell(size, i, j)))
        k += 1; j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** ST_HexagonGrid(size, bounds): hexagons whose envelope intersects
    * the bounds' bbox, as (i, j, geom) structs; same 2^20 cap. */
  def hexagonGrid(size: Double,
      bounds: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    require(size > 0, "st_hexagongrid: size must be positive")
    val env = geom(bounds).getEnvelopeInternal
    if (env.isNull) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.empty[Any])
    val h = Math.sqrt(3.0) * size
    // generous index window, then exact envelope filter per cell
    val i0 = Math.floor((env.getMinX - size) / (1.5 * size)).toInt
    val i1 = Math.ceil((env.getMaxX + size) / (1.5 * size)).toInt
    val j0 = Math.floor((env.getMinY - h) / h).toInt
    val j1 = Math.ceil((env.getMaxY + h) / h).toInt
    // same Long-overflow discipline as squareGrid
    val n = (i1.toLong - i0.toLong + 1L) * (j1.toLong - j0.toLong + 1L)
    require(n > 0 && n <= MaxGridCells,
      s"st_hexagongrid: $n candidate cells exceeds the $MaxGridCells per-row cap; tile from a range() DataFrame instead")
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = i0
    while (i <= i1) {
      var j = j0
      while (j <= j1) {
        val (cx, cy) = hexCenter(size, i, j)
        if (cx + size >= env.getMinX && cx - size <= env.getMaxX &&
            cy + h / 2 >= env.getMinY && cy - h / 2 <= env.getMaxY) {
          buf += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](i, j, hexagonCell(size, i, j)))
        }
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.toArray)
  }

  /** ST_GeneratePoints(geom, n, seed): n uniform points inside a
    * polygonal geometry as a MULTIPOINT — rejection sampling over the
    * bbox with java.util.Random(seed), so a given (geometry, n, seed)
    * replays identically on every executor/JVM. (PostGIS is also
    * seed-deterministic, but its stream differs; parity is the
    * CONTRACT — count, containment, determinism — not the bits.) */
  def generatePoints(tagged: Array[Byte], n: Int, seed: Int): Array[Byte] = {
    require(n >= 0 && n <= 1000000, s"st_generatepoints: n must be in [0, 1e6]; got $n")
    val g = geom(tagged)
    if (g.isEmpty || g.getDimension < 2 || n == 0)
      return encodeKeepSrid(g, GeomCodec.geometryFactory.createMultiPoint(
        Array.empty[Point]))
    val env = g.getEnvelopeInternal
    val rnd = new java.util.Random(seed)
    val f = GeomCodec.geometryFactory
    val prepared = entryOf(tagged).preparedGeom
    val pts = new Array[Point](n)
    var k = 0
    var attempts = 0
    val maxAttempts = Math.max(1000L, n.toLong * 10000L)
    while (k < n && attempts < maxAttempts) {
      val x = env.getMinX + rnd.nextDouble() * env.getWidth
      val y = env.getMinY + rnd.nextDouble() * env.getHeight
      val p = f.createPoint(new Coordinate(x, y))
      if (prepared.covers(p)) { pts(k) = p; k += 1 }
      attempts += 1
    }
    require(k == n, s"st_generatepoints: rejection sampling stalled at $k/$n points")
    encodeKeepSrid(g, f.createMultiPoint(pts))
  }

  // ---- affine / smoothing / coordinate-editing family ------------------

  /** PostGIS ST_Affine, 2-D 6-parameter form:
    * x' = a·x + b·y + xoff, y' = d·x + e·y + yoff. */
  def affine(tagged: Array[Byte], a: Double, b: Double, d: Double, e: Double,
      xoff: Double, yoff: Double): Array[Byte] = {
    val g = geom(tagged)
    val out = new AffineTransformation(a, b, xoff, d, e, yoff).transform(g)
    out.setSRID(g.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  /** PostGIS ST_TransScale: translate FIRST, then scale —
    * x' = (x + dx)·xf, y' = (y + dy)·yf. */
  def transScale(tagged: Array[Byte], dx: Double, dy: Double,
      xf: Double, yf: Double): Array[Byte] = {
    val g = geom(tagged)
    val out = mapCoordsCopy(g) { c =>
      c.x = (c.x + dx) * xf
      c.y = (c.y + dy) * yf
    }
    encodeKeepSrid(g, out)
  }

  /** PostGIS ST_ShiftLongitude: x < 0 → x + 360 (lon range 0..360);
    * inputs already in 0..360 with x > 180 shift down instead. */
  def shiftLongitude(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val out = mapCoordsCopy(g) { c =>
      if (c.x < 0) c.x = c.x + 360
      else if (c.x > 180) c.x = c.x - 360
    }
    encodeKeepSrid(g, out)
  }

  /** PostGIS ST_WrapX(geom, wrap, move): every COMPONENT whose bbox sits
    * on the move-side of the wrap line is translated by `move` (move>0:
    * components entirely left of `wrap`; move<0: entirely right). */
  def wrapX(tagged: Array[Byte], wrap: Double, move: Double): Array[Byte] = {
    val g = geom(tagged)
    if (move == 0 || g.isEmpty) return encodeKeepSrid(g, g.copy())
    val parts = Array.tabulate(g.getNumGeometries) { i =>
      val part = g.getGeometryN(i)
      val env = part.getEnvelopeInternal
      val shift = if (move > 0) env.getMaxX < wrap else env.getMinX > wrap
      if (shift) {
        val moved = mapCoordsCopy(part)(c => c.x = c.x + move)
        moved
      } else part.copy()
    }
    val out =
      if (parts.length == 1) parts(0)
      else GeomCodec.geometryFactory.buildGeometry(java.util.Arrays.asList(parts: _*))
    encodeKeepSrid(g, out)
  }

  /** PostGIS ST_Scroll(closed linestring, point): rotate the vertex
    * order of a CLOSED line so it starts (and ends) at the given vertex,
    * which must be on the line's vertex list. Null for non-lines. */
  def scroll(line: Array[Byte], pt: Array[Byte]): Array[Byte] =
    (geom(line), geom(pt)) match {
      case (l: LineString, p: Point) if l.isClosed && !p.isEmpty =>
        val cs = l.getCoordinates
        val n = cs.length - 1 // last duplicates first
        val at = (0 until n).indexWhere(i => cs(i).equals2D(p.getCoordinate))
        if (at < 0) throw new IllegalArgumentException(
          "st_scroll: point is not a vertex of the line")
        val rotated = new Array[Coordinate](cs.length)
        var i = 0
        while (i < n) { rotated(i) = cs((at + i) % n).copy(); i += 1 }
        rotated(n) = rotated(0).copy()
        encodeKeepSrid(l, GeomCodec.geometryFactory.createLineString(rotated))
      case _ => null
    }

  private def chaikinOnce(cs: Array[Coordinate], closed: Boolean,
      preserveEnds: Boolean): Array[Coordinate] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Coordinate]
    val n = cs.length
    if (!closed && preserveEnds) buf += cs(0).copy()
    var i = 0
    while (i < n - 1) {
      val a = cs(i); val b = cs(i + 1)
      buf += new Coordinate(0.75 * a.x + 0.25 * b.x, 0.75 * a.y + 0.25 * b.y)
      buf += new Coordinate(0.25 * a.x + 0.75 * b.x, 0.25 * a.y + 0.75 * b.y)
      i += 1
    }
    if (!closed && preserveEnds) buf += cs(n - 1).copy()
    if (closed) buf += buf(0).copy()
    buf.toArray
  }

  /** PostGIS ST_ChaikinSmoothing: corner-cutting at the 1/4–3/4 points,
    * `iters` rounds (PostGIS caps at 5). Lines and polygon rings; other
    * types pass through unchanged. */
  def chaikinSmoothing(tagged: Array[Byte], iters: Int,
      preserveEnds: Boolean): Array[Byte] = {
    require(iters >= 1 && iters <= 5,
      s"st_chaikinsmoothing: iterations must be 1..5; got $iters")
    val g = geom(tagged)
    val f = GeomCodec.geometryFactory
    def smoothRing(r: LineString): Array[Coordinate] = {
      var cs = r.getCoordinates
      var k = 0
      while (k < iters) { cs = chaikinOnce(cs, closed = true, preserveEnds); k += 1 }
      cs
    }
    def walk(geo: Geometry): Geometry = geo match {
      case l: LineString if l.getNumPoints >= 2 =>
        var cs = l.getCoordinates
        var k = 0
        val closed = l.isClosed
        while (k < iters) { cs = chaikinOnce(cs, closed, preserveEnds); k += 1 }
        f.createLineString(cs)
      case p: Polygon =>
        f.createPolygon(
          f.createLinearRing(smoothRing(p.getExteriorRing)),
          Array.tabulate(p.getNumInteriorRing)(i =>
            f.createLinearRing(smoothRing(p.getInteriorRingN(i)))))
      case gc: GeometryCollection =>
        f.buildGeometry(java.util.Arrays.asList(
          Array.tabulate(gc.getNumGeometries)(i => walk(gc.getGeometryN(i))): _*))
      case other => other.copy()
    }
    encodeKeepSrid(g, walk(g))
  }

  /** PostGIS ST_SimplifyVW — Visvalingam-Whyatt simplification; the
    * tolerance is an AREA (vertices whose effective triangle is smaller
    * are dropped), matching PostGIS. JTS's VWSimplifier squares its
    * distance parameter internally, so we pass sqrt(area) through. */
  def simplifyVW(tagged: Array[Byte], tolerance: Double): Array[Byte] = {
    require(tolerance >= 0, "st_simplifyvw: tolerance must be non-negative")
    val g = geom(tagged)
    val out = org.locationtech.jts.simplify.VWSimplifier.simplify(
      g, Math.sqrt(tolerance))
    encodeKeepSrid(g, out)
  }

  /** PostGIS ST_SimplifyPolygonHull — outer (or inner) hull with at most
    * vertexFraction of the input vertices (JTS PolygonHullSimplifier);
    * guarantees containment (outer) / coverage (inner) and validity. */
  def simplifyPolygonHull(tagged: Array[Byte], vertexFraction: Double,
      outer: Boolean): Array[Byte] = {
    require(vertexFraction >= 0 && vertexFraction <= 1,
      s"st_simplifypolygonhull: vertex fraction must be in [0,1]; got $vertexFraction")
    val g = geom(tagged)
    if (g.getDimension < 2) return null
    val out = org.locationtech.jts.simplify.PolygonHullSimplifier.hull(
      g, outer, vertexFraction)
    encodeKeepSrid(g, out)
  }

  /** PostGIS ST_QuantizeCoordinates: zero out the low `prec`-determined
    * mantissa bits of every ordinate — with prec decimal digits kept,
    * bits below ~10^-prec are cleared, improving compression while
    * bounding the error. prec in -15..15. */
  def quantizeCoordinates(tagged: Array[Byte], prec: Int): Array[Byte] = {
    require(prec >= -15 && prec <= 15,
      s"st_quantizecoordinates: precision must be in -15..15; got $prec")
    val g = geom(tagged)
    def quantize(v: Double): Double = {
      if (v == 0.0 || java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) return v
      // bits of absolute precision to keep: exponent of the value minus
      // the exponent of the requested decimal tolerance 10^-prec
      val tolExp = Math.getExponent(Math.pow(10.0, -prec))
      val valExp = Math.getExponent(v)
      val keep = valExp - tolExp
      if (keep >= 52) return v
      if (keep < 0) return if (v > 0) 0.0 else -0.0
      val mask = -1L << (52 - keep)
      java.lang.Double.longBitsToDouble(
        java.lang.Double.doubleToLongBits(v) & mask)
    }
    val out = mapCoordsCopy(g) { c => c.x = quantize(c.x); c.y = quantize(c.y) }
    encodeKeepSrid(g, out)
  }

  /** PostGIS ST_GeometricMedian over the points of a (Multi)Point —
    * Weiszfeld iteration from the centroid, tolerance-converged (the
    * median minimizes the sum of distances; no closed form). Null for
    * non-point input. */
  def geometricMedian(tagged: Array[Byte], tol: Double, maxIter: Int): Array[Byte] = {
    require(tol > 0, "st_geometricmedian: tolerance must be positive")
    require(maxIter >= 1 && maxIter <= 10000,
      s"st_geometricmedian: max iterations must be 1..10000; got $maxIter")
    val g = geom(tagged)
    val ok = g match {
      case _: Point | _: MultiPoint => !g.isEmpty
      case _ => false
    }
    if (!ok) return null
    val cs = g.getCoordinates
    var mx = 0.0; var my = 0.0
    cs.foreach { c => mx += c.x; my += c.y }
    mx /= cs.length; my /= cs.length
    var it = 0
    var moved = Double.MaxValue
    while (it < maxIter && moved > tol) {
      var wx = 0.0; var wy = 0.0; var wsum = 0.0
      var atVertex = false
      cs.foreach { c =>
        val d = Math.hypot(c.x - mx, c.y - my)
        if (d < 1e-300) atVertex = true
        else { val w = 1.0 / d; wx += w * c.x; wy += w * c.y; wsum += w }
      }
      if (atVertex || wsum == 0.0) { moved = 0.0 }
      else {
        val nx = wx / wsum; val ny = wy / wsum
        moved = Math.hypot(nx - mx, ny - my)
        mx = nx; my = ny
      }
      it += 1
    }
    val out = GeomCodec.geometryFactory.createPoint(new Coordinate(mx, my))
    encodeKeepSrid(g, out)
  }

  // ---- validity diagnostics / interchange extras -----------------------

  private def validationError(g: Geometry) =
    new org.locationtech.jts.operation.valid.IsValidOp(g).getValidationError

  /** PostGIS ST_IsValidReason: "Valid Geometry" or
    * "<message>[<x> <y>]" at the offending coordinate. */
  def isValidReason(tagged: Array[Byte]): String = {
    val err = validationError(geom(tagged))
    if (err == null) "Valid Geometry"
    else {
      val c = err.getCoordinate
      s"${err.getMessage}[${WktWriter.num(c.x)} ${WktWriter.num(c.y)}]"
    }
  }

  /** PostGIS ST_IsValidDetail as (valid, reason, location): reason and
    * location are null for valid input; location is an encoded POINT. */
  def isValidDetail(
      tagged: Array[Byte]): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val g = geom(tagged)
    val err = validationError(g)
    if (err == null)
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](true, null, null))
    else {
      val p = GeomCodec.geometryFactory.createPoint(err.getCoordinate)
      p.setSRID(g.getSRID)
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
        false,
        org.apache.spark.unsafe.types.UTF8String.fromString(err.getMessage),
        GeomCodec.encodeEwkb(p)))
    }
  }

  /** PostGIS-style ST_Summary: one line per component —
    * "Kind[S?] with N points/rings/elements" ("S" marks a SRID). */
  def summary(tagged: Array[Byte]): String = {
    val root = geom(tagged)
    def flags(g: Geometry): String = if (g.getSRID != 0) "[S]" else "[]"
    def line(g: Geometry): String = g match {
      case p: Point => s"Point${flags(g)}"
      case l: LineString => s"LineString${flags(g)} with ${l.getNumPoints} points"
      case p: Polygon =>
        val rings = (if (p.isEmpty) 0 else 1) + p.getNumInteriorRing
        s"Polygon${flags(g)} with $rings rings"
      case gc: GeometryCollection =>
        s"${gc.getGeometryType}${flags(g)} with ${gc.getNumGeometries} elements"
      case other => other.getGeometryType + flags(g)
    }
    root match {
      case gc: GeometryCollection =>
        (line(gc) +: Array.tabulate(gc.getNumGeometries)(i =>
          "  " + line(gc.getGeometryN(i)))).mkString("\n")
      case simple => line(simple)
    }
  }

  /** PostGIS ST_AsKML (2-D, no precision argument): coordinates as
    * "x,y" pairs separated by single spaces, WKT-style minimal number
    * formatting, MultiGeometry wrapping for collections. */
  def asKml(tagged: Array[Byte]): String = memoDerived(tagged, 13, 0, 0) {
    def coords(cs: Array[Coordinate]): String =
      cs.map(c => s"${WktWriter.num(c.x)},${WktWriter.num(c.y)}").mkString(" ")
    def render(g: Geometry): String = g match {
      case p: Point =>
        s"<Point><coordinates>${coords(p.getCoordinates)}</coordinates></Point>"
      case l: LineString =>
        s"<LineString><coordinates>${coords(l.getCoordinates)}</coordinates></LineString>"
      case p: Polygon =>
        val shell = "<outerBoundaryIs><LinearRing><coordinates>" +
          coords(p.getExteriorRing.getCoordinates) +
          "</coordinates></LinearRing></outerBoundaryIs>"
        val holes = (0 until p.getNumInteriorRing).map(i =>
          "<innerBoundaryIs><LinearRing><coordinates>" +
            coords(p.getInteriorRingN(i).getCoordinates) +
            "</coordinates></LinearRing></innerBoundaryIs>").mkString
        s"<Polygon>$shell$holes</Polygon>"
      case gc: GeometryCollection =>
        "<MultiGeometry>" + (0 until gc.getNumGeometries)
          .map(i => render(gc.getGeometryN(i))).mkString + "</MultiGeometry>"
      case other => throw new IllegalArgumentException(
        s"st_askml: unsupported geometry ${other.getGeometryType}")
    }
    render(geom(tagged))
  }

  /** PostGIS ST_AsSVG (absolute paths): y is NEGATED (SVG's y axis points
    * down); points render as cx/cy attributes, paths as "M … L … [Z]";
    * multipoint components join with commas, path components with
    * spaces. */
  def asSvg(tagged: Array[Byte]): String = memoDerived(tagged, 14, 0, 0) {
    def n(v: Double): String = WktWriter.num(v)
    def pathOf(cs: Array[Coordinate], close: Boolean): String = {
      val head = s"M ${n(cs.head.x)} ${n(-cs.head.y)}"
      val body = cs.tail.take(if (close) cs.length - 2 else cs.length - 1)
        .map(c => s"${n(c.x)} ${n(-c.y)}").mkString(" ")
      val tail = if (close) " Z" else ""
      if (body.isEmpty) head + tail else s"$head L $body$tail"
    }
    def render(g: Geometry): String = g match {
      case p: Point => s"""cx="${n(p.getX)}" cy="${n(-p.getY)}""""
      case l: LineString => pathOf(l.getCoordinates, close = false)
      case p: Polygon =>
        (pathOf(p.getExteriorRing.getCoordinates, close = true) +:
          (0 until p.getNumInteriorRing).map(i =>
            pathOf(p.getInteriorRingN(i).getCoordinates, close = true)))
          .mkString(" ")
      case mp: MultiPoint => (0 until mp.getNumGeometries)
        .map(i => render(mp.getGeometryN(i))).mkString(",")
      case gc: GeometryCollection => (0 until gc.getNumGeometries)
        .map(i => render(gc.getGeometryN(i))).mkString(";")
      case other => throw new IllegalArgumentException(
        s"st_assvg: unsupported geometry ${other.getGeometryType}")
    }
    render(geom(tagged))
  }

  private final val HexDigits = "0123456789ABCDEF".toCharArray

  /** PostGIS ST_AsHEXEWKB — uppercase hex of the EWKB bytes (the
    * canonical text form of the geometry type in PostGIS). */
  def asHexEwkb(tagged: Array[Byte]): String = memoDerived(tagged, 15, 0, 0) {
    val bytes = GeomCodec.rawEwkb(geom(tagged))
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = HexDigits(b >>> 4)
      out(i * 2 + 1) = HexDigits(b & 0xf)
      i += 1
    }
    new String(out)
  }

  /** ST_GeomFromHEXEWKB — parse the hex text form (case-insensitive);
    * the JTS WKB reader understands the EWKB SRID flag. */
  def geomFromHexEwkb(hex: String): Array[Byte] =
    cachedParse("hex:" + hex) {
      GeomCodec.decodeRawWkb(
        org.locationtech.jts.io.WKBReader.hexToBytes(hex))
    }

  /** PostGIS ST_SharedPaths(line1, line2):
    * GEOMETRYCOLLECTION(MULTILINESTRING same-direction,
    * MULTILINESTRING opposite-direction) of the linework the two inputs
    * share. Direction is judged per shared component by comparing the
    * tangents of the containing segments in each input. Null for
    * non-lineal input. */
  def sharedPaths(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ga = geom(a); val gb = geom(b)
    if (ga.getDimension != 1 || gb.getDimension != 1) return null
    val inter = ga.intersection(gb)
    val f = GeomCodec.geometryFactory
    val same = scala.collection.mutable.ArrayBuffer.empty[LineString]
    val opp = scala.collection.mutable.ArrayBuffer.empty[LineString]
    def tangentAt(src: Geometry, pt: Coordinate): (Double, Double) = {
      val lil = new org.locationtech.jts.linearref.LocationIndexedLine(src)
      val loc = lil.indexOf(pt)
      val seg = loc.getSegment(src)
      val dx = seg.p1.x - seg.p0.x; val dy = seg.p1.y - seg.p0.y
      val len = Math.hypot(dx, dy)
      if (len == 0) (0.0, 0.0) else (dx / len, dy / len)
    }
    var i = 0
    while (i < inter.getNumGeometries) {
      inter.getGeometryN(i) match {
        case l: LineString if l.getNumPoints >= 2 =>
          val c0 = l.getCoordinateN(0); val c1 = l.getCoordinateN(1)
          val mid = new Coordinate((c0.x + c1.x) / 2, (c0.y + c1.y) / 2)
          val ta = tangentAt(ga, mid); val tb = tangentAt(gb, mid)
          val dot = ta._1 * tb._1 + ta._2 * tb._2
          // orient the emitted piece along line1's direction, like PostGIS
          val segDot = ta._1 * (c1.x - c0.x) + ta._2 * (c1.y - c0.y)
          val piece = if (segDot >= 0) l else l.reverse()
          if (dot >= 0) same += piece else opp += piece
        case _ =>
      }
      i += 1
    }
    val out = f.createGeometryCollection(Array[Geometry](
      f.createMultiLineString(same.toArray),
      f.createMultiLineString(opp.toArray)))
    encodeKeepSrid(ga, out)
  }

  // ---- geodesic distances / geographic formatting ----------------------

  /** PostGIS mean earth radius: (2a + b)/3 on WGS84. */
  private final val MeanEarthRadius =
    (2.0 * 6378137.0 + 6356752.314245179) / 3.0

  /** PostGIS ST_DistanceSphere restricted to POINT inputs: great-circle
    * distance in meters, haversine on the WGS84 mean-radius sphere.
    * Null for empty or non-point input — PostGIS 3.x computes the
    * MINIMUM spherical distance for lines/polygons, and silently
    * substituting centroid distance would be wrong, so the non-point
    * case is rejected instead (documented deviation, IMPLEMENTATION.md). */
  def distanceSphere(a: Array[Byte], b: Array[Byte]): java.lang.Double = {
    val ga = geom(a); val gb = geom(b)
    if (ga.isEmpty || gb.isEmpty) return null
    if (!ga.isInstanceOf[Point] || !gb.isInstanceOf[Point]) return null
    val ca = ga.getCentroid.getCoordinate
    val cb = gb.getCentroid.getCoordinate
    val f1 = Math.toRadians(ca.y); val f2 = Math.toRadians(cb.y)
    val dF = Math.toRadians(cb.y - ca.y)
    val dL = Math.toRadians(cb.x - ca.x)
    val sF = Math.sin(dF / 2); val sL = Math.sin(dL / 2)
    val h = sF * sF + Math.cos(f1) * Math.cos(f2) * sL * sL
    java.lang.Double.valueOf(
      2.0 * MeanEarthRadius * Math.asin(Math.min(1.0, Math.sqrt(h))))
  }

  /** PostGIS ST_DistanceSpheroid on WGS84, restricted to POINT inputs —
    * Vincenty inverse formula (converges for non-antipodal pairs; falls
    * back to the spherical value if 200 iterations don't converge).
    * Null for empty or non-point input (same deviation rationale as
    * [[distanceSphere]]: PostGIS min-distance semantics for extended
    * geometries are rejected rather than approximated). */
  def distanceSpheroid(a: Array[Byte], b: Array[Byte]): java.lang.Double = {
    val ga = geom(a); val gb = geom(b)
    if (ga.isEmpty || gb.isEmpty) return null
    if (!ga.isInstanceOf[Point] || !gb.isInstanceOf[Point]) return null
    val ca = ga.getCentroid.getCoordinate
    val cb = gb.getCentroid.getCoordinate
    val A = 6378137.0; val B = 6356752.314245179; val F = (A - B) / A
    val l = Math.toRadians(cb.x - ca.x)
    val u1 = Math.atan((1 - F) * Math.tan(Math.toRadians(ca.y)))
    val u2 = Math.atan((1 - F) * Math.tan(Math.toRadians(cb.y)))
    val sinU1 = Math.sin(u1); val cosU1 = Math.cos(u1)
    val sinU2 = Math.sin(u2); val cosU2 = Math.cos(u2)
    var lambda = l
    var iter = 0
    var converged = false
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var cosSqAlpha = 0.0; var cos2SigmaM = 0.0
    while (iter < 200 && !converged) {
      val sinL = Math.sin(lambda); val cosL = Math.cos(lambda)
      sinSigma = Math.sqrt(
        (cosU2 * sinL) * (cosU2 * sinL) +
        (cosU1 * sinU2 - sinU1 * cosU2 * cosL) * (cosU1 * sinU2 - sinU1 * cosU2 * cosL))
      if (sinSigma == 0.0) return java.lang.Double.valueOf(0.0) // coincident
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosL
      sigma = Math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinL / sinSigma
      cosSqAlpha = 1 - sinAlpha * sinAlpha
      cos2SigmaM = if (cosSqAlpha == 0) 0.0
        else cosSigma - 2 * sinU1 * sinU2 / cosSqAlpha
      val c = F / 16 * cosSqAlpha * (4 + F * (4 - 3 * cosSqAlpha))
      val prev = lambda
      lambda = l + (1 - c) * F * sinAlpha *
        (sigma + c * sinSigma * (cos2SigmaM + c * cosSigma *
          (-1 + 2 * cos2SigmaM * cos2SigmaM)))
      if (Math.abs(lambda - prev) < 1e-12) converged = true
      iter += 1
    }
    if (!converged) return distanceSphere(a, b)
    val uSq = cosSqAlpha * (A * A - B * B) / (B * B)
    val bigA = 1 + uSq / 16384 * (4096 + uSq * (-768 + uSq * (320 - 175 * uSq)))
    val bigB = uSq / 1024 * (256 + uSq * (-128 + uSq * (74 - 47 * uSq)))
    val deltaSigma = bigB * sinSigma * (cos2SigmaM + bigB / 4 *
      (cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM) -
        bigB / 6 * cos2SigmaM * (-3 + 4 * sinSigma * sinSigma) *
          (-3 + 4 * cos2SigmaM * cos2SigmaM)))
    java.lang.Double.valueOf(B * bigA * (sigma - deltaSigma))
  }

  /** PostGIS ST_AsLatLonText, default 'D°M''S.SSS"C' format:
    * latitude then longitude, seconds rounded to 3 decimals, hemisphere
    * letters N/S/E/W. Null for non-point input. */
  def asLatLonText(tagged: Array[Byte]): String = geom(tagged) match {
    case p: Point if !p.isEmpty =>
      def dms(v: Double, pos: Char, neg: Char): String = {
        val hemi = if (v < 0) neg else pos
        val av = Math.abs(v)
        var d = av.toInt
        var m = ((av - d) * 60).toInt
        // round seconds to 3dp and carry into minutes/degrees
        var s = Math.rint((av - d - m / 60.0) * 3600 * 1000) / 1000
        if (s >= 60.0) { s -= 60.0; m += 1 }
        if (m >= 60) { m -= 60; d += 1 }
        // PostGIS's default D°M'S.SSS"C pads seconds to exactly 3
        // decimals (0.000), so format fixed-width rather than trimming
        val sStr = String.format(java.util.Locale.ROOT, "%.3f",
          java.lang.Double.valueOf(s))
        s"$d°$m'$sStr\"$hemi"
      }
      s"${dms(p.getY, 'N', 'S')} ${dms(p.getX, 'E', 'W')}"
    case _ => null
  }

  /** PostGIS ST_OrderingEquals: same type AND identical coordinate
    * sequences in identical order (stricter than ST_Equals). */
  def orderingEquals(a: Array[Byte], b: Array[Byte]): Boolean = {
    val ga = geom(a); val gb = geom(b)
    ga.equalsExact(gb)
  }

  /** PostGIS ST_PointInsideCircle(point, cx, cy, r): 2-D distance from
    * the point to (cx, cy) <= r (boundary counts). Null for non-point. */
  def pointInsideCircle(tagged: Array[Byte], cx: Double, cy: Double,
      r: Double): java.lang.Boolean = geom(tagged) match {
    case p: Point if !p.isEmpty =>
      val dx = p.getX - cx; val dy = p.getY - cy
      java.lang.Boolean.valueOf(dx * dx + dy * dy <= r * r)
    case _ => null
  }

  /** PostGIS ST_LineCrossingDirection(line1, line2) result codes:
    * 0 no crossing; ±1 single crossing; multiple crossings end ±2, or
    * ±3 when the LAST crossing runs the same direction as the FIRST
    * (PostGIS's MULTICROSS_END_SAME_FIRST). Sign: -1/left when,
    * walking line1's direction, line2 passes right→left; +1/right
    * otherwise. Crossings are PROPER interior segment crossings
    * ordered along line2; vertex touches and collinear overlaps do not
    * count (PostGIS counts some touch configurations — documented
    * deviation). Null for non-LineString input. */
  def lineCrossingDirection(a: Array[Byte], b: Array[Byte]): Integer =
    (geom(a), geom(b)) match {
      case (l1: LineString, l2: LineString) =>
        val p = l1.getCoordinates
        val q = l2.getCoordinates
        val crossings = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Int)]
        var j = 0
        while (j < q.length - 1) {
          var i = 0
          while (i < p.length - 1) {
            val d1x = p(i + 1).x - p(i).x; val d1y = p(i + 1).y - p(i).y
            val d2x = q(j + 1).x - q(j).x; val d2y = q(j + 1).y - q(j).y
            val denom = d1x * d2y - d1y * d2x
            if (denom != 0) {
              val rx = q(j).x - p(i).x; val ry = q(j).y - p(i).y
              val t1 = (rx * d2y - ry * d2x) / denom
              val t2 = (rx * d1y - ry * d1x) / denom
              if (t1 > 0 && t1 < 1 && t2 > 0 && t2 < 1) {
                // denom > 0: line2's heading lies CCW (left) of line1's
                crossings += ((j, t2, if (denom > 0) -1 else 1))
              }
            }
            i += 1
          }
          j += 1
        }
        if (crossings.isEmpty) Integer.valueOf(0)
        else if (crossings.length == 1) Integer.valueOf(crossings(0)._3)
        else {
          val sorted = crossings.sortBy(c => (c._1, c._2))
          val first = sorted.head._3; val last = sorted.last._3
          Integer.valueOf(if (first == last) 3 * last else 2 * last)
        }
      case _ => null
    }

  // ---- trivial metadata accessors (2-D codec constants included) -------

  /** PostGIS ST_IsEmpty. */
  def isEmpty(tagged: Array[Byte]): Boolean = geom(tagged).isEmpty

  /** PostGIS ST_IsCollection: true for Multi* and GeometryCollection —
    * including empty and single-element ones (type-based, not count). */
  def isCollection(tagged: Array[Byte]): Boolean =
    geom(tagged).isInstanceOf[GeometryCollection]

  /** PostGIS ST_NDims — always 2 in this codec. */
  def nDims(tagged: Array[Byte]): Int = { geom(tagged); 2 }

  /** PostGIS ST_Zmflag — 0 (no Z, no M) in this codec. */
  def zmFlag(tagged: Array[Byte]): Int = { geom(tagged); 0 }

  /** PostGIS ST_HasArc — always false (no curve types in WKB dialects
    * 1-5; a curve tag fails decode long before this call). */
  def hasArc(tagged: Array[Byte]): Boolean = { geom(tagged); false }

  /** PostGIS ST_Force2D — identity in a 2-D codec, but re-encoded so
    * the output is the canonical EWKB form regardless of input dialect. */
  def force2D(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    encodeKeepSrid(g, g.copy())
  }

  /** PostGIS ST_MemSize analogue: the stored cell size in bytes (tag +
    * WKB) — the column-size planning number for THIS engine, not
    * PostGIS's in-memory serialization. */
  def memSize(tagged: Array[Byte]): Int = tagged.length

  // ---- TWKB / GML interchange, triangulation, ordinate editing ---------

  /** PostGIS ST_AsTWKB(geom, decimaldigits): compact delta/varint
    * serialization ([[graft.geo.TwkbCodec]]); SRID is dropped (TWKB
    * carries none). */
  def asTwkb(tagged: Array[Byte], prec: Int): Array[Byte] =
    TwkbCodec.encode(geom(tagged), prec)

  /** PostGIS ST_GeomFromTWKB: SRID of the result is 0 (unknown). */
  def geomFromTwkb(twkb: Array[Byte]): Array[Byte] = {
    val g = TwkbCodec.decode(twkb)
    remember(GeomCodec.encodeEwkb(g), g)
  }

  /** PostGIS ST_TriangulatePolygon: constrained Delaunay triangulation
    * of polygonal input (holes + multipolygons honored; JTS 1.18+
    * ConstrainedDelaunayTriangulator) as a GEOMETRYCOLLECTION of
    * triangles. */
  def triangulatePolygon(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val out = org.locationtech.jts.triangulate.polygon
      .ConstrainedDelaunayTriangulator.triangulate(g)
    encodeKeepSrid(g, out)
  }

  /** PostGIS ST_LineInterpolatePoints(line, frac, repeat): with
    * repeat=false a single POINT (same as ST_LineInterpolatePoint);
    * with repeat=true a MULTIPOINT at every multiple of `frac` of the
    * line's length (k·frac for k = 1..floor(1/frac), endpoint included
    * when frac divides 1). Null for non-LineString input. */
  def lineInterpolatePoints(tagged: Array[Byte], frac: Double,
      repeat: Boolean): Array[Byte] =
    geom(tagged) match {
      case l: LineString if !l.isEmpty =>
        if (!repeat) return lineInterpolatePoint(tagged, frac)
        val f = math.max(1e-9, math.min(1.0, frac))
        val ix = new org.locationtech.jts.linearref.LengthIndexedLine(l)
        val n = math.floor(1.0 / f + 1e-9).toInt
        val pts = Array.tabulate(n) { k =>
          GeomCodec.geometryFactory.createPoint(
            ix.extractPoint(math.min((k + 1) * f, 1.0) * l.getLength))
        }
        encodeKeepSrid(l, GeomCodec.geometryFactory.createMultiPoint(pts))
      case _ => null
    }

  /** PostGIS ST_SwapOrdinates(geom, 'xy'): 2-char ordinate spec over
    * {x, y} — output x takes spec(0), output y takes spec(1); 'yx'
    * swaps, 'xy' is identity. Z/M specs raise (2-D codec). */
  def swapOrdinates(tagged: Array[Byte], spec: String): Array[Byte] = {
    val s = spec.toLowerCase
    if (s.length != 2 || s.exists(ch => ch != 'x' && ch != 'y'))
      throw new IllegalArgumentException(
        s"st_swapordinates: ordinate spec must be 2 chars over {x, y}, got '$spec'")
    val g = geom(tagged)
    val out = g.copy()
    out.apply(new org.locationtech.jts.geom.CoordinateFilter {
      override def filter(c: Coordinate): Unit = {
        val x = c.x; val y = c.y
        c.x = if (s.charAt(0) == 'x') x else y
        c.y = if (s.charAt(1) == 'x') x else y
      }
    })
    out.geometryChanged()
    encodeKeepSrid(g, out)
  }

  /** PostGIS ST_AsGML(version, geom), versions 2 and 3: GML 2 uses
    * `coordinates` ("x,y" comma pairs) and outer/innerBoundaryIs; GML 3
    * uses `pos`/`posList` (space-separated) and exterior/interior.
    * A nonzero SRID becomes srsName="EPSG:n" on the outermost element.
    * 2-D output only; no srsDimension attribute (dimension is implied). */
  def asGml(version: Int, tagged: Array[Byte]): String = {
    if (version != 2 && version != 3)
      throw new IllegalArgumentException(
        s"st_asgml: version must be 2 or 3, got $version")
    memoDerived(tagged, 21, version, 0) {
      val root = geom(tagged)
      val v3 = version == 3
      def cs2(cs: Array[Coordinate]): String =
        cs.map(c => s"${WktWriter.num(c.x)},${WktWriter.num(c.y)}").mkString(" ")
      def cs3(cs: Array[Coordinate]): String =
        cs.map(c => s"${WktWriter.num(c.x)} ${WktWriter.num(c.y)}").mkString(" ")
      def srs(top: Boolean): String =
        if (top && root.getSRID != 0) s""" srsName="EPSG:${root.getSRID}"""" else ""
      def ring(r: LineString): String =
        if (v3) s"<gml:LinearRing><gml:posList>${cs3(r.getCoordinates)}</gml:posList></gml:LinearRing>"
        else s"<gml:LinearRing><gml:coordinates>${cs2(r.getCoordinates)}</gml:coordinates></gml:LinearRing>"
      def render(g: Geometry, top: Boolean): String = g match {
        case p: Point =>
          if (v3) s"<gml:Point${srs(top)}><gml:pos>${cs3(p.getCoordinates)}</gml:pos></gml:Point>"
          else s"<gml:Point${srs(top)}><gml:coordinates>${cs2(p.getCoordinates)}</gml:coordinates></gml:Point>"
        case l: LineString =>
          if (v3) s"<gml:LineString${srs(top)}><gml:posList>${cs3(l.getCoordinates)}</gml:posList></gml:LineString>"
          else s"<gml:LineString${srs(top)}><gml:coordinates>${cs2(l.getCoordinates)}</gml:coordinates></gml:LineString>"
        case p: Polygon =>
          val shell =
            if (v3) s"<gml:exterior>${ring(p.getExteriorRing)}</gml:exterior>"
            else s"<gml:outerBoundaryIs>${ring(p.getExteriorRing)}</gml:outerBoundaryIs>"
          val holes = (0 until p.getNumInteriorRing).map(i =>
            if (v3) s"<gml:interior>${ring(p.getInteriorRingN(i))}</gml:interior>"
            else s"<gml:innerBoundaryIs>${ring(p.getInteriorRingN(i))}</gml:innerBoundaryIs>").mkString
          s"<gml:Polygon${srs(top)}>$shell$holes</gml:Polygon>"
        case mp: MultiPoint =>
          s"<gml:MultiPoint${srs(top)}>" + (0 until mp.getNumGeometries).map(i =>
            s"<gml:pointMember>${render(mp.getGeometryN(i), top = false)}</gml:pointMember>").mkString +
            "</gml:MultiPoint>"
        case ml: MultiLineString =>
          s"<gml:MultiLineString${srs(top)}>" + (0 until ml.getNumGeometries).map(i =>
            s"<gml:lineStringMember>${render(ml.getGeometryN(i), top = false)}</gml:lineStringMember>").mkString +
            "</gml:MultiLineString>"
        case mp: MultiPolygon =>
          s"<gml:MultiPolygon${srs(top)}>" + (0 until mp.getNumGeometries).map(i =>
            s"<gml:polygonMember>${render(mp.getGeometryN(i), top = false)}</gml:polygonMember>").mkString +
            "</gml:MultiPolygon>"
        case gc: GeometryCollection =>
          s"<gml:MultiGeometry${srs(top)}>" + (0 until gc.getNumGeometries).map(i =>
            s"<gml:geometryMember>${render(gc.getGeometryN(i), top = false)}</gml:geometryMember>").mkString +
            "</gml:MultiGeometry>"
        case other => throw new IllegalArgumentException(
          s"st_asgml: unsupported geometry ${other.getGeometryType}")
      }
      render(root, top = true)
    }
  }

  /** Vertex order reversed, every component (PostGIS ST_Reverse). */
  def reverse(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    encodeKeepSrid(g, g.reverse())
  }

  /** North-based azimuth (radians, clockwise, [0, 2pi)) of the segment
    * a->b; null when the points coincide or either input is not a Point
    * (PostGIS ST_Azimuth). */
  def azimuth(a: Array[Byte], b: Array[Byte]): java.lang.Double =
    (geom(a), geom(b)) match {
      case (pa: Point, pb: Point) if !pa.isEmpty && !pb.isEmpty =>
        val dx = pb.getX - pa.getX
        val dy = pb.getY - pa.getY
        if (dx == 0.0 && dy == 0.0) null
        else {
          val az = math.atan2(dx, dy) // north-based: x first
          java.lang.Double.valueOf(if (az < 0) az + 2 * math.Pi else az)
        }
      case _ => null
    }

  /** Boundary length of areal geometry; 0 for points and lines (PostGIS
    * ST_Perimeter — NOT getLength, which returns line length too). */
  def perimeter(tagged: Array[Byte]): Double = geom(tagged) match {
    case p: Polygonal => p.asInstanceOf[Geometry].getLength
    case c: GeometryCollection =>
      // sum areal members only, mirroring PostGIS over collections
      (0 until c.getNumGeometries).map(c.getGeometryN).collect {
        case p: Polygonal => p.asInstanceOf[Geometry].getLength
      }.sum
    case _ => 0.0
  }

  /** PostGIS ST_IsClosed: start==end for each linear component; true for
    * points, false for empty lines. Areal/collection inputs → null. */
  def isClosed(tagged: Array[Byte]): java.lang.Boolean = geom(tagged) match {
    case l: LineString => java.lang.Boolean.valueOf(!l.isEmpty && l.isClosed)
    case m: MultiLineString =>
      java.lang.Boolean.valueOf(!m.isEmpty && m.isClosed)
    case _: Point | _: MultiPoint => java.lang.Boolean.TRUE
    case _ => null
  }

  def isSimple(tagged: Array[Byte]): Boolean = geom(tagged).isSimple

  /** PostGIS ST_IsRing: closed AND simple; only defined for LineString. */
  def isRing(tagged: Array[Byte]): java.lang.Boolean = geom(tagged) match {
    case l: LineString =>
      java.lang.Boolean.valueOf(!l.isEmpty && l.isClosed && l.isSimple)
    case _ => null
  }

  /** Swap x and y of every coordinate (PostGIS ST_FlipCoordinates). */
  def flipCoordinates(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val out = g.copy()
    out.apply(new org.locationtech.jts.geom.CoordinateFilter {
      override def filter(c: Coordinate): Unit = { val t = c.x; c.x = c.y; c.y = t }
    })
    out.geometryChanged()
    encodeKeepSrid(g, out)
  }

  /** Canonical vertex ordering (PostGIS ST_Normalize; JTS normalize) —
    * makes topologically-equal geometries byte-comparable. */
  def normalizeGeom(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val out = g.norm()
    encodeKeepSrid(g, out)
  }

  private val GeohashBase32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash of the geometry's bbox center at `precision`
    * base-32 characters (PostGIS ST_GeoHash uses lon/lat: x=lon, y=lat).
    * Null for empty geometry or coordinates outside the lon/lat domain. */
  def geohash(tagged: Array[Byte], precision: Int): String =
    memoDerived(tagged, 23, precision.toDouble, 0)(geohashImpl(tagged, precision))

  private def geohashImpl(tagged: Array[Byte], precision: Int): String = {
    val g = geom(tagged)
    if (g.isEmpty || precision <= 0) return null
    val env = g.getEnvelopeInternal
    val lon = (env.getMinX + env.getMaxX) / 2.0
    val lat = (env.getMinY + env.getMaxY) / 2.0
    if (lon < -180 || lon > 180 || lat < -90 || lat > 90) return null
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    val sb = new java.lang.StringBuilder(precision)
    var bit = 0; var ch = 0; var evenBit = true
    while (sb.length < precision) {
      if (evenBit) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      evenBit = !evenBit
      bit += 1
      if (bit == 5) { sb.append(GeohashBase32.charAt(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** Component geometries, recursing through nested collections (PostGIS
    * ST_Dump flattened): multi/collection → parts, simple → [self]. */
  def dumpGeoms(tagged: Array[Byte]): Array[Array[Byte]] = {
    val g = geom(tagged)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def rec(x: Geometry): Unit =
      if (x.getNumGeometries > 1 || x.isInstanceOf[GeometryCollection])
        (0 until x.getNumGeometries).foreach(i => rec(x.getGeometryN(i)))
      else {
        // copy before setSRID: x is a child of the CACHED parent (the
        // per-thread decode LRU shares entries across rows), so an
        // in-place setSRID would leak into every later kernel reading
        // the same cached geometry — same discipline as setSridGeom
        val c = x.copy()
        c.setSRID(g.getSRID)
        out += GeomCodec.encodeEwkb(c)
      }
    rec(g)
    out.toArray
  }

  /** Recursively split a geometry until every part carries at most
    * `maxVertices` vertices (PostGIS ST_Subdivide): halve the part's
    * envelope along its longer axis, clip, recurse. THE pre-join scale
    * lever for oversized geometries — a continent-sized polygon covers
    * thousands of grid cells and turns every one into a hot bucket;
    * subdivided parts grid-partition evenly and carry cheap per-part
    * predicates. Parts keep the input's SRID (set on copies — the
    * decoded input is a shared cache entry) and dimension (cut-line
    * artifacts of polygon clipping are dropped).
    *
    * Termination valve: clipping preserves collinear boundary vertices,
    * so a cap at the 5-vertex floor can be unsatisfiable (a ring plus
    * one boundary vertex is 6 points no matter how small the part); the
    * recursion stops at depth 32 and emits the part as-is rather than
    * loop. Caps of 8+ subdivide densified rectilinear inputs fully. */
  def subdivide(tagged: Array[Byte], maxVertices: Int): Array[Array[Byte]] = {
    require(maxVertices >= 5,
      s"st_subdivide maxVertices must be >= 5 (PostGIS contract); got $maxVertices")
    val g = geom(tagged)
    val srid = g.getSRID
    val dim = g.getDimension
    val f = GeomCodec.geometryFactory
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def rec(x: Geometry, depth: Int): Unit = {
      if (x.isEmpty) return
      if (x.getNumGeometries > 1 || x.isInstanceOf[GeometryCollection]) {
        (0 until x.getNumGeometries).map(x.getGeometryN)
          .filter(p => !p.isEmpty && p.getDimension == dim)
          .foreach(rec(_, depth))
      } else if (x.getNumPoints <= maxVertices || depth >= 32) {
        val c = x.copy(); c.setSRID(srid); out += GeomCodec.encodeEwkb(c)
      } else {
        val env = x.getEnvelopeInternal
        val halves =
          if (env.getWidth >= env.getHeight) {
            val mx = (env.getMinX + env.getMaxX) / 2
            Seq(new org.locationtech.jts.geom.Envelope(
                  env.getMinX, mx, env.getMinY, env.getMaxY),
                new org.locationtech.jts.geom.Envelope(
                  mx, env.getMaxX, env.getMinY, env.getMaxY))
          } else {
            val my = (env.getMinY + env.getMaxY) / 2
            Seq(new org.locationtech.jts.geom.Envelope(
                  env.getMinX, env.getMaxX, env.getMinY, my),
                new org.locationtech.jts.geom.Envelope(
                  env.getMinX, env.getMaxX, my, env.getMaxY))
          }
        halves.foreach(h => rec(x.intersection(f.toGeometry(h)), depth + 1))
      }
    }
    rec(g, 0)
    out.toArray
  }

  /** Rotate counter-clockwise by theta radians about (ox, oy) (PostGIS
    * ST_Rotate; origin defaults to (0,0) at the expression layer). */
  def rotate(tagged: Array[Byte], theta: Double, ox: Double,
      oy: Double): Array[Byte] = {
    val g = geom(tagged)
    encodeKeepSrid(g,
      AffineTransformation.rotationInstance(theta, ox, oy).transform(g))
  }

  /** Scale x/y about the origin (PostGIS ST_Scale). */
  def scaleGeom(tagged: Array[Byte], xf: Double, yf: Double): Array[Byte] = {
    val g = geom(tagged)
    encodeKeepSrid(g,
      AffineTransformation.scaleInstance(xf, yf).transform(g))
  }

  /** Point at `frac` (clamped to [0,1]) of a LineString's length; null
    * for other types (PostGIS ST_LineInterpolatePoint). */
  def lineInterpolatePoint(tagged: Array[Byte], frac: Double): Array[Byte] =
    geom(tagged) match {
      case l: LineString if !l.isEmpty =>
        val f = math.max(0.0, math.min(1.0, frac))
        val ix = new org.locationtech.jts.linearref.LengthIndexedLine(l)
        val c = ix.extractPoint(f * l.getLength)
        encodeKeepSrid(l, GeomCodec.geometryFactory.createPoint(c))
      case _ => null
    }

  /** Minimum clearance (PostGIS ST_MinimumClearance; JTS
    * MinimumClearance): the smallest distance any vertex can move before
    * the geometry becomes invalid — a robustness measure for snapping /
    * precision reduction decisions. Infinity (encoded as PostGIS does,
    * Double.PositiveInfinity) when no clearance exists (e.g. a point). */
  def minimumClearance(tagged: Array[Byte]): Double = {
    val d = org.locationtech.jts.precision.MinimumClearance.getDistance(geom(tagged))
    // JTS signals "no clearance exists" with Double.MAX_VALUE; PostGIS
    // returns Infinity — match PostGIS
    if (d == Double.MaxValue) Double.PositiveInfinity else d
  }

  /** The two-point line realizing the minimum clearance (PostGIS
    * ST_MinimumClearanceLine); null when clearance is infinite. */
  def minimumClearanceLine(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val line = org.locationtech.jts.precision.MinimumClearance.getLine(g)
    if (line == null || line.isEmpty) null else encodeKeepSrid(g, line)
  }

  /** Fully node the input linework (PostGIS ST_Node): crossing segments
    * are split at their intersections and duplicate segments dissolve —
    * the self-union of the lines (JTS UnaryUnionOp performs snap-free
    * noding). Non-linear input → null, matching PostGIS's lines-only
    * contract. */
  def nodeLines(tagged: Array[Byte]): Array[Byte] =
    geom(tagged) match {
      case g @ (_: LineString | _: MultiLineString) if !g.isEmpty =>
        encodeKeepSrid(g, g.union())
      case _ => null
    }

  /** Curve parallel to a line at signed `dist` — positive offsets to the
    * LEFT of the line direction, like PostGIS ST_OffsetCurve (JTS
    * OffsetCurve, same convention). Documented deviation: PostGIS
    * REVERSES vertex direction on right-side (negative) offsets; JTS
    * keeps the input direction, which this library considers the saner
    * contract (spec'd in GeoFunctionsSpec). Non-line input → null. */
  def offsetCurve(tagged: Array[Byte], dist: Double): Array[Byte] =
    geom(tagged) match {
      case l: LineString if !l.isEmpty =>
        encodeKeepSrid(l,
          org.locationtech.jts.operation.buffer.OffsetCurve.getCurve(l, dist))
      case _ => null
    }

  // ---- line editors (PostGIS ST_AddPoint / ST_SetPoint / ST_RemovePoint)

  private def rebuildLine(src: LineString,
      coords: Array[Coordinate]): Array[Byte] =
    encodeKeepSrid(src, GeomCodec.geometryFactory.createLineString(coords))

  /** Insert `pt` into the line before 0-based `pos`; -1 appends (PostGIS
    * ST_AddPoint default). Non-(line, point) input → null; positions
    * outside -1..numPoints raise. */
  def addPoint(line: Array[Byte], pt: Array[Byte], pos: Int): Array[Byte] =
    (geom(line), geom(pt)) match {
      case (l: LineString, p: Point) if !p.isEmpty =>
        val cs = l.getCoordinates
        val at = if (pos == -1) cs.length else pos
        if (at < 0 || at > cs.length) throw new IllegalArgumentException(
          s"st_addpoint position must be -1 (append) or 0..${cs.length}; got $pos")
        rebuildLine(l, (cs.take(at) :+ p.getCoordinate.copy()) ++ cs.drop(at))
      case _ => null
    }

  /** Replace the 0-based `pos`-th vertex with `pt`; negative counts from
    * the end (-1 = last), PostGIS ST_SetPoint. */
  def setPoint(line: Array[Byte], pos: Int, pt: Array[Byte]): Array[Byte] =
    (geom(line), geom(pt)) match {
      case (l: LineString, p: Point) if !p.isEmpty =>
        val cs = l.getCoordinates
        val at = if (pos < 0) cs.length + pos else pos
        if (at < 0 || at >= cs.length) throw new IllegalArgumentException(
          s"st_setpoint index out of range (${cs.length} points); got $pos")
        val out = cs.clone()
        out(at) = p.getCoordinate.copy()
        rebuildLine(l, out)
      case _ => null
    }

  /** Remove the 0-based `pos`-th vertex (PostGIS ST_RemovePoint); the
    * result must remain a valid 2+-point line. */
  def removePoint(line: Array[Byte], pos: Int): Array[Byte] =
    geom(line) match {
      case l: LineString =>
        val cs = l.getCoordinates
        if (pos < 0 || pos >= cs.length) throw new IllegalArgumentException(
          s"st_removepoint index out of range (${cs.length} points); got $pos")
        if (cs.length <= 2) throw new IllegalArgumentException(
          "st_removepoint: a line needs at least 2 points")
        rebuildLine(l, cs.take(pos) ++ cs.drop(pos + 1))
      case _ => null
    }

  /** Substring of a LineString between the two length fractions (PostGIS
    * ST_LineSubstring): the part from `s` to `e` of the line's length,
    * equal fractions collapse to a point, non-LineString input → null.
    * Fractions outside 0 <= s <= e <= 1 raise, matching PostGIS. */
  def lineSubstring(tagged: Array[Byte], s: Double, e: Double): Array[Byte] = {
    if (!(s >= 0.0 && s <= e && e <= 1.0)) throw new IllegalArgumentException(
      s"st_linesubstring fractions must satisfy 0 <= start <= end <= 1; got $s, $e")
    geom(tagged) match {
      case l: LineString if !l.isEmpty =>
        val len = l.getLength
        val ix = new org.locationtech.jts.linearref.LengthIndexedLine(l)
        val out: Geometry =
          if (s == e) GeomCodec.geometryFactory.createPoint(ix.extractPoint(s * len))
          else ix.extractLine(s * len, e * len)
        encodeKeepSrid(l, out)
      case _ => null
    }
  }

  /** Fraction of a LineString's length at the point closest to `pt`;
    * null when inputs are not (LineString, Point) or the line has zero
    * length (PostGIS ST_LineLocatePoint). */
  def lineLocatePoint(line: Array[Byte], pt: Array[Byte]): java.lang.Double =
    (geom(line), geom(pt)) match {
      case (l: LineString, p: Point) if !l.isEmpty && !p.isEmpty =>
        val len = l.getLength
        if (len == 0.0) null
        else {
          val ix = new org.locationtech.jts.linearref.LengthIndexedLine(l)
          java.lang.Double.valueOf(ix.indexOf(p.getCoordinate) / len)
        }
      case _ => null
    }

  /** Smallest enclosing circle as a polygon (PostGIS
    * ST_MinimumBoundingCircle; JTS approximates with a buffer-style
    * polygon around the exact center/radius). */
  def minimumBoundingCircle(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val out = new org.locationtech.jts.algorithm.MinimumBoundingCircle(g).getCircle
    encodeKeepSrid(g, out)
  }

  /** Exact radius of the smallest enclosing circle (PostGIS
    * ST_MinimumBoundingRadius' radius component). */
  def minimumBoundingRadius(tagged: Array[Byte]): Double =
    new org.locationtech.jts.algorithm.MinimumBoundingCircle(geom(tagged)).getRadius

  /** Minimum-area rotated rectangle (PostGIS ST_OrientedEnvelope; JTS
    * MinimumDiameter.getMinimumRectangle). */
  def orientedEnvelope(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val out = org.locationtech.jts.algorithm.MinimumDiameter.getMinimumRectangle(g)
    encodeKeepSrid(g, out)
  }

  /** Concave hull by length ratio in [0,1]: 1 = convex hull, smaller =
    * tighter (PostGIS ST_ConcaveHull's param_pctconvex analog; JTS 1.19+
    * ConcaveHull). */
  def concaveHull(tagged: Array[Byte], lengthRatio: Double): Array[Byte] = {
    val g = geom(tagged)
    val out = org.locationtech.jts.algorithm.hull.ConcaveHull
      .concaveHullByLengthRatio(g, lengthRatio)
    encodeKeepSrid(g, out)
  }

  /** Delaunay triangulation of the input's vertices as a
    * GeometryCollection of triangles (PostGIS ST_DelaunayTriangles). */
  def delaunayTriangles(tagged: Array[Byte], tolerance: Double): Array[Byte] = {
    val g = geom(tagged)
    val b = new org.locationtech.jts.triangulate.DelaunayTriangulationBuilder
    b.setSites(g)
    if (tolerance > 0) b.setTolerance(tolerance)
    val out = b.getTriangles(GeomCodec.geometryFactory)
    encodeKeepSrid(g, out)
  }

  /** Voronoi diagram of the input's vertices as a GeometryCollection of
    * cells, clipped to the JTS default expanded envelope (PostGIS
    * ST_VoronoiPolygons with default extend_to). */
  def voronoiPolygons(tagged: Array[Byte], tolerance: Double): Array[Byte] = {
    val g = geom(tagged)
    val b = new org.locationtech.jts.triangulate.VoronoiDiagramBuilder
    b.setSites(g)
    if (tolerance > 0) b.setTolerance(tolerance)
    val out = b.getDiagram(GeomCodec.geometryFactory)
    encodeKeepSrid(g, out)
  }

  /** Sew contiguous linework into maximal LineStrings (PostGIS
    * ST_LineMerge): single merged line stays a LineString, otherwise a
    * MultiLineString; non-lineal input → empty GEOMETRYCOLLECTION like
    * PostGIS. */
  def lineMerge(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val merger = new org.locationtech.jts.operation.linemerge.LineMerger
    merger.add(g)
    val merged = merger.getMergedLineStrings
      .toArray(new Array[LineString](0))
    val out: Geometry =
      if (merged.isEmpty) GeomCodec.geometryFactory
        .createGeometryCollection(Array.empty[Geometry])
      else if (merged.length == 1) merged(0)
      else GeomCodec.geometryFactory.createMultiLineString(merged)
    encodeKeepSrid(g, out)
  }

  /** Union of all components of one geometry (PostGIS ST_UnaryUnion) —
    * dissolves overlapping members of a multi/collection. */
  def unaryUnion(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val out = g.union()
    encodeKeepSrid(g, out)
  }

  /** Components of the requested type (1=point, 2=line, 3=polygon) as a
    * Multi* geometry (PostGIS ST_CollectionExtract). */
  def collectionExtract(tagged: Array[Byte], geomType: Int): Array[Byte] = {
    val g = geom(tagged)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Geometry]
    def rec(x: Geometry): Unit =
      if (x.isInstanceOf[GeometryCollection])
        (0 until x.getNumGeometries).foreach(i => rec(x.getGeometryN(i)))
      else buf += x
    rec(g)
    val f = GeomCodec.geometryFactory
    val out: Geometry = geomType match {
      case 1 => f.createMultiPoint(
        buf.collect { case p: Point => p }.toArray)
      case 2 => f.createMultiLineString(
        buf.collect { case l: LineString => l }.toArray)
      case 3 => f.createMultiPolygon(
        buf.collect { case p: Polygon => p }.toArray)
      case other => throw new IllegalArgumentException(
        s"ST_CollectionExtract type must be 1, 2, or 3; got $other")
    }
    encodeKeepSrid(g, out)
  }

  // ---- array-of-geometry constructors ------------------------------------
  // PostGIS's ordered aggregates (ST_MakeLine, ST_Polygonize, ST_Union agg)
  // are exposed over ARRAYS instead of as AggregateFunctions: Spark
  // aggregation order is partitioning-dependent, so the deterministic
  // spelling is sort_array(collect_list(...)) → array kernel — the caller
  // states the order explicitly and results are engine-reproducible.

  /** SRID folding for multi-element constructors, PostGIS contract:
    * unset (0) elements inherit the running SRID; two DIFFERENT nonzero
    * SRIDs raise "Operation on mixed SRID geometries" exactly as PostGIS
    * aggregates do — mixing projections silently would produce
    * coordinates in two reference systems sewn into one geometry. */
  private def mergeSrid(cur: Int, g: Geometry, op: String): Int = {
    val s = g.getSRID
    if (s == 0 || s == cur) cur
    else if (cur == 0) s
    else throw new IllegalArgumentException(
      s"$op: Operation on mixed SRID geometries ($cur vs $s)")
  }

  /** Coordinates of all elements (points/lines) in array order sewn into
    * one LineString (PostGIS ST_MakeLine); null with fewer than 2
    * coordinates; null elements skipped. */
  def makeLineArr(arr: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val coords = scala.collection.mutable.ArrayBuffer.empty[Coordinate]
    var srid = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val g = geom(arr.getBinary(i))
        srid = mergeSrid(srid, g, "ST_MakeLine")
        coords ++= g.getCoordinates
      }
      i += 1
    }
    if (coords.length < 2) null
    else {
      val out = GeomCodec.geometryFactory.createLineString(coords.toArray)
      out.setSRID(srid)
      remember(GeomCodec.encodeEwkb(out), out)
    }
  }

  /** Polygonize the linework of all elements into a GeometryCollection
    * of faces (PostGIS ST_Polygonize's aggregate, array form). */
  def polygonizeArr(arr: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte] = {
    val p = new Polygonizer()
    val n = arr.numElements()
    var srid = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val g = geom(arr.getBinary(i))
        srid = mergeSrid(srid, g, "ST_Polygonize")
        p.add(g)
      }
      i += 1
    }
    val polys = p.getPolygons.toArray(new Array[Polygon](0))
      .map(_.asInstanceOf[Geometry])
    val out: Geometry =
      GeomCodec.geometryFactory.createGeometryCollection(polys)
    out.setSRID(srid)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  /** Dissolved union of all elements (PostGIS ST_Union aggregate, array
    * form); null for an empty/all-null array. */
  def unionArr(arr: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val gs = scala.collection.mutable.ArrayBuffer.empty[Geometry]
    var srid = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val g = geom(arr.getBinary(i))
        srid = mergeSrid(srid, g, "ST_Union")
        gs += g
      }
      i += 1
    }
    if (gs.isEmpty) null
    else {
      val out = org.locationtech.jts.operation.union.UnaryUnionOp.union(
        java.util.Arrays.asList(gs.toSeq: _*))
      out.setSRID(srid)
      remember(GeomCodec.encodeEwkb(out), out)
    }
  }

  /** Discrete (vertex-based) Hausdorff distance (PostGIS
    * ST_HausdorffDistance; JTS DiscreteHausdorffDistance). */
  def hausdorffDistance(a: Array[Byte], b: Array[Byte]): Double =
    org.locationtech.jts.algorithm.distance.DiscreteHausdorffDistance
      .distance(geom(a), geom(b))

  /** Discrete Fréchet distance (PostGIS ST_FrechetDistance; JTS
    * DiscreteFrechetDistance). */
  def frechetDistance(a: Array[Byte], b: Array[Byte]): Double =
    org.locationtech.jts.algorithm.distance.DiscreteFrechetDistance
      .distance(geom(a), geom(b))

  /** Radius of the maximum inscribed circle, to within `tol` (PostGIS
    * ST_MaximumInscribedCircle's radius; JTS MaximumInscribedCircle). */
  def maxInscribedRadius(tagged: Array[Byte], tol: Double): Double = {
    val mic = new org.locationtech.jts.algorithm.construct.MaximumInscribedCircle(
      geom(tagged), tol)
    mic.getRadiusLine.getLength
  }

  /** Center of the maximum inscribed circle (PostGIS's center field). */
  def maxInscribedCenter(tagged: Array[Byte], tol: Double): Array[Byte] = {
    val g = geom(tagged)
    val mic = new org.locationtech.jts.algorithm.construct.MaximumInscribedCircle(g, tol)
    encodeKeepSrid(g, mic.getCenter)
  }

  /** Snap every coordinate to a regular grid of `size` (PostGIS
    * ST_SnapToGrid(geom, size): round(x/size)·size). Duplicate
    * consecutive vertices produced by snapping are kept (PostGIS
    * removes them only in the 4-arg form; spec'd behavior here). */
  def snapToGrid(tagged: Array[Byte], size: Double): Array[Byte] = {
    val g = geom(tagged)
    val out = g.copy()
    out.apply(new org.locationtech.jts.geom.CoordinateFilter {
      override def filter(c: Coordinate): Unit = {
        c.x = math.rint(c.x / size) * size
        c.y = math.rint(c.y / size) * size
      }
    })
    out.geometryChanged()
    encodeKeepSrid(g, out)
  }

  /** Valid-topology precision reduction (PostGIS ST_ReducePrecision;
    * JTS GeometryPrecisionReducer — collapses/repairs where plain
    * snapping would invalidate). `gridSize` is the cell width. */
  def reducePrecision(tagged: Array[Byte], gridSize: Double): Array[Byte] = {
    val g = geom(tagged)
    val pm = new org.locationtech.jts.geom.PrecisionModel(1.0 / gridSize)
    val out = org.locationtech.jts.precision.GeometryPrecisionReducer.reduce(g, pm)
    encodeKeepSrid(g, out)
  }

  /** Raw untagged OGC WKB bytes (PostGIS ST_AsBinary) — the interchange
    * form; the 1-byte dialect tag is internal to this library's cells. */
  def asBinary(tagged: Array[Byte]): Array[Byte] = GeomCodec.rawWkb(geom(tagged))

  /** Raw untagged EWKB bytes, SRID flag when set (PostGIS ST_AsEWKB). */
  def asEwkbBin(tagged: Array[Byte]): Array[Byte] = GeomCodec.rawEwkb(geom(tagged))

  /** Retag with a new SRID without touching coordinates (PostGIS
    * ST_SetSRID); srid 0 clears it. The cached source geometry is copied
    * before mutation — cache entries are shared across rows. */
  def setSridGeom(tagged: Array[Byte], srid: Int): Array[Byte] = {
    val g = geom(tagged).copy()
    g.setSRID(srid)
    remember(GeomCodec.encodeEwkb(g), g)
  }

  /** Promote single geometries to their Multi* form; multi/collection
    * inputs pass through (PostGIS ST_Multi). */
  def multiGeom(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val f = GeomCodec.geometryFactory
    val out: Geometry = g match {
      case p: Point => f.createMultiPoint(Array(p))
      case l: LineString => f.createMultiLineString(Array(l))
      case p: Polygon => f.createMultiPolygon(Array(p))
      case other => other
    }
    encodeKeepSrid(g, out)
  }

  /** Envelope grown by `d` on every side, as a polygon (PostGIS
    * ST_Expand). */
  def expandEnv(tagged: Array[Byte], d: Double): Array[Byte] = {
    val g = geom(tagged)
    val env = g.getEnvelopeInternal
    makeEnvelope(env.getMinX - d, env.getMinY - d, env.getMaxX + d,
      env.getMaxY + d, g.getSRID, g.getSRID != 0)
  }

  /** Point at `dist` along `azimuth` (radians clockwise from north, the
    * PostGIS ST_Project convention): x + d·sin(az), y + d·cos(az).
    * Null for non-point input. */
  def project(tagged: Array[Byte], dist: Double, azimuth: Double): Array[Byte] =
    geom(tagged) match {
      case p: Point if !p.isEmpty =>
        val out = GeomCodec.geometryFactory.createPoint(new Coordinate(
          p.getX + dist * math.sin(azimuth), p.getY + dist * math.cos(azimuth)))
        encodeKeepSrid(p, out)
      case _ => null
    }

  /** Densify: no segment longer than `maxLen` (PostGIS ST_Segmentize;
    * JTS Densifier splits each segment into equal parts). */
  def segmentize(tagged: Array[Byte], maxLen: Double): Array[Byte] = {
    val g = geom(tagged)
    val out = org.locationtech.jts.densify.Densifier.densify(g, maxLen)
    encodeKeepSrid(g, out)
  }

  def convexHull(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val out = g.convexHull()
    out.setSRID(g.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  /** Douglas-Peucker simplification (PostGIS ST_Simplify semantics:
    * topology not necessarily preserved). */
  def simplify(tagged: Array[Byte], tolerance: Double): Array[Byte] = {
    val g = geom(tagged)
    val out = org.locationtech.jts.simplify.DouglasPeuckerSimplifier
      .simplify(g, tolerance)
    out.setSRID(g.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  def translate(tagged: Array[Byte], dx: Double, dy: Double): Array[Byte] = {
    val g = geom(tagged)
    val out = AffineTransformation.translationInstance(dx, dy).transform(g)
    out.setSRID(g.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  /** ST_Split à la the reference (src/function/split.rs:103-130):
    * polygonize(boundary(a) ∪ b) → GeometryCollection of faces. The
    * reference marks its own implementation `FIXME` (split.rs:148) — we
    * reproduce the boundary∪polygonize semantics, not true PostGIS split. */
  def split(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    // boundary∪union∪polygonize is orders of magnitude more expensive than
    // a lookup, and split inputs are frequently repeated (folded literals,
    // CASE branches) — memoize results per thread.
    val c = splitMemo.get()
    val key = (new ByteKey(a), new ByteKey(b))
    val hit = c.get(key)
    if (hit != null) return hit
    val out = splitImpl(a, b)
    c.put(key, out)
    out
  }

  private val splitMemo: ThreadLocal[java.util.LinkedHashMap[(ByteKey, ByteKey), Array[Byte]]] =
    ThreadLocal.withInitial(() =>
      new java.util.LinkedHashMap[(ByteKey, ByteKey), Array[Byte]](CacheSize, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(ByteKey, ByteKey), Array[Byte]]): Boolean =
          size() > CacheSize
      })

  private def splitImpl(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ga = geom(a)
    val gb = geom(b)
    val union = ga.getBoundary.union(gb)
    val polygonizer = new Polygonizer()
    polygonizer.add(union)
    val polys = polygonizer.getPolygons
    val arr = new Array[Geometry](polys.size())
    val it = polys.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().asInstanceOf[Geometry]; i += 1 }
    val out = GeomCodec.geometryFactory.createGeometryCollection(arr)
    out.setSRID(ga.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  /** ST_SplitExact — TRUE PostGIS ST_Split semantics, offered beside the
    * reference-faithful [[split]] (which carries the reference's own
    * `FIXME` polygonize-everything behavior, split.rs:148):
    *  - (poly|multipoly, line blade): polygonize the noded
    *    boundary ∪ blade arrangement, then keep ONLY the faces whose
    *    interior point lies inside the input — exterior faces and faces
    *    inside holes are dropped (the part [[split]] gets wrong).
    *  - (line|multiline, line blade): overlay difference — PostGIS's own
    *    lwline_split_by_line recipe — which nodes the input at every
    *    crossing and returns the pieces between nodes.
    *  - (line|multiline, point blade): cut at each blade point that
    *    lies EXACTLY on the line (distance 0, no snapping — PostGIS
    *    leaves off-line points as no-ops).
    * Result is always a GeometryCollection of the pieces (the input
    * unchanged when the blade misses), SRID preserved. Unsupported
    * input/blade dimension combinations throw, as PostGIS errors do. */
  def splitExact(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ga = geom(a)
    val gb = geom(b)
    val pieces: Seq[Geometry] = (ga, gb) match {
      case (_: Polygonal, _: LineString | _: MultiLineString) =>
        val polygonizer = new Polygonizer()
        polygonizer.add(ga.getBoundary.union(gb))
        val prepared = PreparedGeometryFactory.prepare(ga)
        val it = polygonizer.getPolygons.iterator()
        val kept = scala.collection.mutable.ArrayBuffer.empty[Geometry]
        while (it.hasNext) {
          val face = it.next().asInstanceOf[Geometry]
          if (prepared.covers(face.getInteriorPoint)) kept += face
        }
        kept.toSeq
      case (_: LineString | _: MultiLineString,
            _: LineString | _: MultiLineString) =>
        // difference removes blade-collinear parts and nodes the input;
        // the explicit point cuts make the split independent of whether
        // the overlay merged output edges back through a crossing node
        // (cuts at existing endpoints are no-ops)
        val inter = ga.intersection(gb)
        val cutPts = (0 until inter.getNumGeometries).map(inter.getGeometryN)
          .collect { case p: Point => p }
        flatten(ga.difference(gb)).flatMap {
          case l: LineString => splitLineAtPoints(l, cutPts)
          case other => Seq(other)
        }
      case (_: LineString | _: MultiLineString, _: Point | _: MultiPoint) =>
        val cuts = (0 until gb.getNumGeometries).map(gb.getGeometryN)
        (0 until ga.getNumGeometries).map(ga.getGeometryN).flatMap { comp =>
          splitLineAtPoints(comp.asInstanceOf[LineString], cuts)
        }
      case _ => throw new IllegalArgumentException(
        s"st_split_exact: splitting a ${ga.getGeometryType} by a " +
          s"${gb.getGeometryType} is not supported")
    }
    val out = GeomCodec.geometryFactory.createGeometryCollection(pieces.toArray)
    out.setSRID(ga.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  private def flatten(g: Geometry): Seq[Geometry] =
    if (g.isEmpty) Seq.empty
    else (0 until g.getNumGeometries).map(g.getGeometryN)

  /** Cut one LineString at every blade point with exact distance 0 that
    * is not an endpoint; pieces come back in along-the-line order. */
  private def splitLineAtPoints(line: LineString,
      cuts: Seq[Geometry]): Seq[Geometry] = {
    val lil = new org.locationtech.jts.linearref.LengthIndexedLine(line)
    val end = line.getLength
    val idxs = cuts.collect {
      case p: Point if line.distance(p) == 0.0 =>
        lil.indexOf(p.getCoordinate)
    }.filter(i => i > 0.0 && i < end).distinct.sorted
    if (idxs.isEmpty) Seq(line)
    else (0.0 +: idxs :+ end).sliding(2).map {
      case Seq(from, until) => lil.extractLine(from, until)
    }.toSeq
  }

  /** ST_AsMVTGeom: affine-map into a 4096×4096 tile space with Y flipped
    * (src/function/as_mvt_geom.rs:85-95): fx = 4096/w, fy = -4096/h,
    * translate (-xmin*fx, -ymax*fy). */
  def asMvtGeom(tagged: Array[Byte],
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): Array[Byte] = {
    val g = geom(tagged)
    val fx = 4096.0 / (xmax - xmin)
    val fy = -4096.0 / (ymax - ymin)
    val t = new AffineTransformation(fx, 0.0, -xmin * fx, 0.0, fy, -ymax * fy)
    val out = t.transform(g)
    out.setSRID(g.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  // ---- box2d -------------------------------------------------------------

  /** Null (None) for empty geometries, matching src/function/box2d.rs. */
  def box2dOrNull(tagged: Array[Byte]): Box2d =
    Box2d.ofGeometry(geom(tagged)).orNull

  /** Catalyst-facing variant: struct row or null (empty geometry). */
  def box2dRow(tagged: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val env = geom(tagged).getEnvelopeInternal
    if (env.isNull) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](env.getMinX, env.getMinY, env.getMaxX, env.getMaxY))
  }

  // ---- grid cells (spatial-join rewrite support) -------------------------

  /** Packed (cx << 32 | cy) ids of the grid cells covering the geometry's
    * bbox expanded by `expand` (0 for plain coverage; a distance for
    * ST_DWithin joins). Cell coordinates are offset by 2^31 so negative
    * cells pack without sign-extension collisions. */
  def gridCells(tagged: Array[Byte], cellSize: Double, expand: Double): Array[Long] = {
    val env = geom(tagged).getEnvelopeInternal
    if (env.isNull) return Array.empty
    val x0 = Math.floor((env.getMinX - expand) / cellSize).toLong
    val x1 = Math.floor((env.getMaxX + expand) / cellSize).toLong
    val y0 = Math.floor((env.getMinY - expand) / cellSize).toLong
    val y1 = Math.floor((env.getMaxY + expand) / cellSize).toLong
    // guard each axis before multiplying (the product itself can overflow
    // Long for outlier coordinates); >1M cells means the cellSize conf is
    // wrong for this data — fail with guidance instead of overflowing
    val nx = x1 - x0 + 1
    val ny = y1 - y0 + 1
    if (nx > 1000000L || ny > 1000000L || nx * ny > 1000000L)
      throw new IllegalArgumentException(
        s"geometry bbox covers ${nx}x$ny grid cells at cellSize=$cellSize; " +
          "raise the cell size in use toward the median bbox size — the " +
          "spark.graft.spatialJoin.cellSize conf for the join rule, the " +
          "cellSize argument for gridJoin, or the dist/eps argument for " +
          "clusterWithin/clusterIntersecting/dbscan (large-extent " +
          "geometries are incompatible with a small dist/eps there)")
    val n = (nx * ny).toInt
    val out = new Array[Long](n)
    var i = 0
    var cx = x0
    while (cx <= x1) {
      var cy = y0
      while (cy <= y1) { out(i) = pack(cx, cy); i += 1; cy += 1 }
      cx += 1
    }
    out
  }

  /** The canonical dedup cell for a candidate pair: the cell containing
    * the min-corner of the (expanded-a ∩ b) bbox intersection. For pairs
    * that satisfy the predicate this cell is inside both cover sets, so
    * keeping only the join match on this cell emits each pair exactly
    * once — no distinct needed. `expandA` matches the gridCells expansion
    * of the left side (0 except for ST_DWithin). */
  def gridAnchorCell(a: Array[Byte], b: Array[Byte], cellSize: Double,
      expandA: Double): Long = {
    val ea = geom(a).getEnvelopeInternal
    val eb = geom(b).getEnvelopeInternal
    val ax = Math.max(ea.getMinX - expandA, eb.getMinX)
    val ay = Math.max(ea.getMinY - expandA, eb.getMinY)
    pack(Math.floor(ax / cellSize).toLong, Math.floor(ay / cellSize).toLong)
  }

  private def pack(cx: Long, cy: Long): Long =
    ((cx + 0x80000000L) << 32) | ((cy + 0x80000000L) & 0xffffffffL)

  // extra accessors beyond the reference surface (PostGIS-standard, used by
  // oracle-able verification queries)
  def area(tagged: Array[Byte]): Double = geom(tagged).getArea
  def distance(a: Array[Byte], b: Array[Byte]): Double = geom(a).distance(geom(b))
  def numGeometries(tagged: Array[Byte]): Int = geom(tagged).getNumGeometries
  def numPoints(tagged: Array[Byte]): Int = geom(tagged).getNumPoints
  /** Boxed variants: null for empty geometries (PostGIS ST_X of POINT
    * EMPTY is NULL; JTS getCoordinate returns null there). Used by
    * interpreted eval; codegen uses the allocation-free pair below. */
  def x(tagged: Array[Byte]): java.lang.Double = {
    val c = geom(tagged).getCoordinate
    if (c == null) null else java.lang.Double.valueOf(c.x)
  }
  def y(tagged: Array[Byte]): java.lang.Double = {
    val c = geom(tagged).getCoordinate
    if (c == null) null else java.lang.Double.valueOf(c.y)
  }

  /** Envelope bound accessors for the declarative st_extent aggregate:
    * an emptiness probe plus a primitive read per bound (0=minX, 1=minY,
    * 2=maxX, 3=maxY) — both hit the decode cache, no boxing in codegen. */
  def envMissing(tagged: Array[Byte]): Boolean =
    geom(tagged).getEnvelopeInternal.isNull
  def envBoundPrim(tagged: Array[Byte], which: Int): Double = {
    val e = geom(tagged).getEnvelopeInternal
    which match {
      case 0 => e.getMinX
      case 1 => e.getMinY
      case 2 => e.getMaxX
      case _ => e.getMaxY
    }
  }
  def envBound(tagged: Array[Byte], which: Int): java.lang.Double =
    if (envMissing(tagged)) null
    else java.lang.Double.valueOf(envBoundPrim(tagged, which))

  /** Allocation-free hot path: check the coordinate exists (cache hit —
    * the geometry is already decoded), then read the primitive value.
    * `getCoordinate == null` covers empty geometries AND non-empty
    * collections whose first component is empty, matching x()/y(). */
  def isEmptyGeom(tagged: Array[Byte]): Boolean = geom(tagged).isEmpty
  def coordMissing(tagged: Array[Byte]): Boolean = geom(tagged).getCoordinate == null
  def xPrim(tagged: Array[Byte]): Double = geom(tagged).getCoordinate.x
  def yPrim(tagged: Array[Byte]): Double = geom(tagged).getCoordinate.y

  // ---- farthest-point family, angles, vertex hygiene, orientation -------
  // (PostGIS-standard extras beyond the reference surface)

  /** ST_MaxDistance — largest distance from any point of a to any point
    * of b. The pointwise distance over two segment sets attains its
    * maximum at a vertex pair (distance along a segment is convex, so
    * interior points never beat both endpoints), making the vertex
    * double loop exact, not an approximation. O(n·m) per row; Spark
    * parallelizes across rows. Null for empty input (PostGIS). */
  def maxDistance(a: Array[Byte], b: Array[Byte]): java.lang.Double = {
    val ca = geom(a).getCoordinates
    val cb = geom(b).getCoordinates
    if (ca.isEmpty || cb.isEmpty) return null
    var best = -1.0
    var i = 0
    while (i < ca.length) {
      var j = 0
      while (j < cb.length) {
        val d = ca(i).distance(cb(j))
        if (d > best) best = d
        j += 1
      }
      i += 1
    }
    java.lang.Double.valueOf(best)
  }

  /** ST_LongestLine — the 2-point line realizing maxDistance, from the
    * FIRST maximizing vertex pair in coordinate order (strict > keeps
    * the first, matching PostGIS's first-found tie behavior). SRID of
    * the first argument is kept. Null for empty input. */
  def longestLine(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ga = geom(a)
    val ca = ga.getCoordinates
    val cb = geom(b).getCoordinates
    if (ca.isEmpty || cb.isEmpty) return null
    var best = -1.0
    var bi = 0
    var bj = 0
    var i = 0
    while (i < ca.length) {
      var j = 0
      while (j < cb.length) {
        val d = ca(i).distance(cb(j))
        if (d > best) { best = d; bi = i; bj = j }
        j += 1
      }
      i += 1
    }
    val f = GeomCodec.geometryFactory
    val out = f.createLineString(Array(ca(bi).copy(), cb(bj).copy()))
    encodeKeepSrid(ga, out)
  }

  /** North-based clockwise azimuth of the vector from→to; NaN when
    * degenerate (same convention as the azimuth kernel above). */
  private def azOf(from: Coordinate, to: Coordinate): Double = {
    val dx = to.x - from.x
    val dy = to.y - from.y
    if (dx == 0.0 && dy == 0.0) Double.NaN
    else { val az = math.atan2(dx, dy); if (az < 0) az + 2 * math.Pi else az }
  }

  /** ST_Angle(P1, P2, P3) — angle at P2, measured clockwise from ray
    * P2→P1 to ray P2→P3, in [0, 2π). Null for empty points or a
    * degenerate ray (coincident with P2). Azimuth convention matches
    * ST_Azimuth, so the identity angle = az(P2→P3) − az(P2→P1) (mod 2π)
    * holds exactly and is the contract the oracle replays. */
  def angle3(a: Array[Byte], b: Array[Byte], c: Array[Byte]): java.lang.Double = {
    val pa = geom(a).getCoordinate
    val pb = geom(b).getCoordinate
    val pc = geom(c).getCoordinate
    if (pa == null || pb == null || pc == null) return null
    val az1 = azOf(pb, pa)
    val az2 = azOf(pb, pc)
    if (az1.isNaN || az2.isNaN) return null
    val r = az2 - az1
    java.lang.Double.valueOf(if (r < 0) r + 2 * math.Pi else r)
  }

  /** ST_Angle(P1, P2, P3, P4) — clockwise angle from vector P1→P2 to
    * vector P3→P4, in [0, 2π). Null on empty/degenerate input. */
  def angle4(a: Array[Byte], b: Array[Byte], c: Array[Byte],
      d: Array[Byte]): java.lang.Double = {
    val pa = geom(a).getCoordinate
    val pb = geom(b).getCoordinate
    val pc = geom(c).getCoordinate
    val pd = geom(d).getCoordinate
    if (pa == null || pb == null || pc == null || pd == null) return null
    val az1 = azOf(pa, pb)
    val az2 = azOf(pc, pd)
    if (az1.isNaN || az2.isNaN) return null
    val r = az2 - az1
    java.lang.Double.valueOf(if (r < 0) r + 2 * math.Pi else r)
  }

  /** ST_RemoveRepeatedPoints(geom [, tol]) — drop consecutive vertices
    * within tol of the previously KEPT vertex (tol=0 removes exact
    * consecutive duplicates). The final vertex of every component is
    * always kept — liblwgeom's behavior, which preserves line endpoints
    * and ring closure — and a ring that would fall under 4 points is
    * returned unfiltered. Points pass through; MultiPoints filter
    * consecutive elements. */
  def removeRepeatedPoints(tagged: Array[Byte], tol: Double): Array[Byte] = {
    val g = geom(tagged)
    val f = GeomCodec.geometryFactory
    def filt(cs: Array[Coordinate]): Array[Coordinate] = {
      if (cs.length <= 2) return cs
      val out = new java.util.ArrayList[Coordinate](cs.length)
      out.add(cs(0))
      var last = cs(0)
      var i = 1
      while (i < cs.length - 1) {
        if (last.distance(cs(i)) > tol) { out.add(cs(i)); last = cs(i) }
        i += 1
      }
      out.add(cs(cs.length - 1))
      out.toArray(new Array[Coordinate](out.size))
    }
    def walk(geo: Geometry): Geometry = geo match {
      case p: Polygon if !p.isEmpty =>
        val shell = filt(p.getExteriorRing.getCoordinates)
        if (shell.length < 4) p
        else {
          val holes = Array.tabulate(p.getNumInteriorRing) { i =>
            val orig = p.getInteriorRingN(i).getCoordinates
            val h = filt(orig)
            f.createLinearRing(if (h.length < 4) orig else h)
          }
          f.createPolygon(f.createLinearRing(shell), holes)
        }
      case l: LineString if !l.isEmpty =>
        val cs = filt(l.getCoordinates)
        if (l.isClosed && cs.length < 4) l
        else f.createLineString(cs)
      case mp: MultiPoint if !mp.isEmpty =>
        f.createMultiPointFromCoords(filt(mp.getCoordinates))
      case gc: GeometryCollection =>
        val parts = Array.tabulate(gc.getNumGeometries)(i => walk(gc.getGeometryN(i)))
        gc match {
          case _: MultiLineString =>
            f.createMultiLineString(parts.map(_.asInstanceOf[LineString]))
          case _: org.locationtech.jts.geom.MultiPolygon =>
            f.createMultiPolygon(parts.map(_.asInstanceOf[Polygon]))
          case _ => f.createGeometryCollection(parts)
        }
      case other => other
    }
    val out = walk(g)
    out.setSRID(g.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  // polygon winding-order family (PostGIS ST_IsPolygonCW / ST_ForcePolygonCW)

  private def polygonOriented(p: Polygon, shellCcw: Boolean): Boolean = {
    if (p.isEmpty) return true
    if (Orientation.isCCW(p.getExteriorRing.getCoordinateSequence) != shellCcw)
      return false
    (0 until p.getNumInteriorRing).forall(i =>
      Orientation.isCCW(p.getInteriorRingN(i).getCoordinateSequence) != shellCcw)
  }

  private def allPolygonsOriented(g: Geometry, shellCcw: Boolean): Boolean = g match {
    case p: Polygon => polygonOriented(p, shellCcw)
    case gc: GeometryCollection =>
      (0 until gc.getNumGeometries).forall(i =>
        allPolygonsOriented(gc.getGeometryN(i), shellCcw))
    case _ => true
  }

  /** ST_IsPolygonCW — all shells clockwise, all holes counter-clockwise;
    * true for geometries without polygonal components (PostGIS). */
  def isPolygonCw(tagged: Array[Byte]): Boolean =
    allPolygonsOriented(geom(tagged), shellCcw = false)

  /** ST_IsPolygonCCW — all shells counter-clockwise, holes clockwise. */
  def isPolygonCcw(tagged: Array[Byte]): Boolean =
    allPolygonsOriented(geom(tagged), shellCcw = true)

  // rebuilt rings never mutate the cached parent's coordinates: the
  // unchanged path shares (read-only) sequences, the reversed path copies
  private def orientRing(r: LineString,
      wantCcw: Boolean): org.locationtech.jts.geom.LinearRing = {
    val f = GeomCodec.geometryFactory
    val cs = r.getCoordinates
    if (Orientation.isCCW(cs) == wantCcw) f.createLinearRing(cs)
    else f.createLinearRing(cs.reverse)
  }

  private def forceOrient(g: Geometry, shellCcw: Boolean): Geometry = g match {
    case p: Polygon if !p.isEmpty =>
      val f = GeomCodec.geometryFactory
      val holes = Array.tabulate(p.getNumInteriorRing)(i =>
        orientRing(p.getInteriorRingN(i), !shellCcw))
      f.createPolygon(orientRing(p.getExteriorRing, shellCcw), holes)
    case gc: GeometryCollection =>
      val f = GeomCodec.geometryFactory
      val parts =
        Array.tabulate(gc.getNumGeometries)(i => forceOrient(gc.getGeometryN(i), shellCcw))
      gc match {
        case _: org.locationtech.jts.geom.MultiPolygon =>
          f.createMultiPolygon(parts.map(_.asInstanceOf[Polygon]))
        case _: MultiLineString | _: MultiPoint => gc
        case _ => f.createGeometryCollection(parts)
      }
    case other => other
  }

  /** ST_ForcePolygonCW — orient shells clockwise, holes counter-clockwise. */
  def forcePolygonCw(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val out = forceOrient(g, shellCcw = false)
    out.setSRID(g.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  /** ST_ForcePolygonCCW — orient shells counter-clockwise, holes clockwise. */
  def forcePolygonCcw(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val out = forceOrient(g, shellCcw = true)
    out.setSRID(g.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  // ---- dumps, collection surgery, areal assembly ------------------------

  /** ST_DumpPoints — every vertex as a Point in path order (ring-closing
    * duplicates included, like PostGIS). Coordinates are copied, so the
    * cached parent is never aliased by the new Points. */
  def dumpPoints(tagged: Array[Byte]): Array[Array[Byte]] = {
    val g = geom(tagged)
    val f = GeomCodec.geometryFactory
    val srid = g.getSRID
    val cs = g.getCoordinates
    val out = new Array[Array[Byte]](cs.length)
    var i = 0
    while (i < cs.length) {
      val p = f.createPoint(cs(i).copy())
      p.setSRID(srid)
      out(i) = GeomCodec.encodeEwkb(p)
      i += 1
    }
    out
  }

  /** ST_DumpSegments — each consecutive-vertex pair of every line/ring
    * path as a 2-point LineString (PostGIS 3.2). Points contribute none. */
  def dumpSegments(tagged: Array[Byte]): Array[Array[Byte]] = {
    val g = geom(tagged)
    val f = GeomCodec.geometryFactory
    val srid = g.getSRID
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def path(cs: Array[Coordinate]): Unit = {
      var i = 0
      while (i < cs.length - 1) {
        val l = f.createLineString(Array(cs(i).copy(), cs(i + 1).copy()))
        l.setSRID(srid)
        out += GeomCodec.encodeEwkb(l)
        i += 1
      }
    }
    def rec(x: Geometry): Unit = x match {
      case l: LineString => path(l.getCoordinates)
      case p: Polygon =>
        path(p.getExteriorRing.getCoordinates)
        (0 until p.getNumInteriorRing).foreach(i =>
          path(p.getInteriorRingN(i).getCoordinates))
      case gc: GeometryCollection =>
        (0 until gc.getNumGeometries).foreach(i => rec(gc.getGeometryN(i)))
      case _ => ()
    }
    rec(g)
    out.toArray
  }

  /** ST_CollectionHomogenize — simplest representation of a collection:
    * single element unwraps, a uniform collection becomes its Multi*,
    * mixed kinds flatten to one non-nested GEOMETRYCOLLECTION; empty
    * components are dropped (PostGIS). All-empty input passes through. */
  def collectionHomogenize(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val f = GeomCodec.geometryFactory
    val parts = scala.collection.mutable.ArrayBuffer.empty[Geometry]
    def rec(x: Geometry): Unit =
      if (x.isInstanceOf[GeometryCollection])
        (0 until x.getNumGeometries).foreach(i => rec(x.getGeometryN(i)))
      else if (!x.isEmpty) parts += x
    rec(g)
    val out: Geometry =
      if (parts.isEmpty) g.copy()
      else if (parts.length == 1) parts(0).copy()
      else {
        val kinds = parts.map(_.getGeometryType).distinct
        if (kinds.length == 1) kinds.head match {
          case "Point" =>
            f.createMultiPoint(parts.map(_.asInstanceOf[Point]).toArray)
          case "LineString" =>
            f.createMultiLineString(parts.map(_.asInstanceOf[LineString]).toArray)
          case "Polygon" =>
            f.createMultiPolygon(parts.map(_.asInstanceOf[Polygon]).toArray)
          case _ => f.createGeometryCollection(parts.toArray)
        } else f.createGeometryCollection(parts.toArray)
      }
    out.setSRID(g.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  /** ST_BuildArea — areal geometry from constituent linework: polygonize
    * the self-noded edges, then keep faces at EVEN nesting depth, where
    * depth counts the OTHER faces whose shell ring encloses this face
    * (odd-depth faces are the holes — GEOS BuildArea's parity rule,
    * which turns two concentric rings into a donut instead of two
    * stacked polygons). Depth must test shell rings, not the hole-
    * assigned faces the JTS polygonizer emits: the donut face does not
    * `contains` the core's interior point, but its shell does. Null
    * when no face forms (PostGIS returns NULL). */
  def buildArea(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    if (g.isEmpty) return null
    val pz = new Polygonizer()
    pz.add(g.union())
    val faces = pz.getPolygons.toArray(new Array[Polygon](0))
    if (faces.isEmpty) return null
    val f = GeomCodec.geometryFactory
    val shells = faces.map(face =>
      f.createPolygon(face.getExteriorRing.getCoordinateSequence))
    val kept = faces.indices.filter { i =>
      val ip = faces(i).getInteriorPoint
      faces.indices.count(j => j != i && shells(j).contains(ip)) % 2 == 0
    }.map(faces)
    if (kept.isEmpty) return null
    val out: Geometry =
      if (kept.length == 1) kept.head else f.createMultiPolygon(kept.toArray)
    out.setSRID(g.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  // ---- geohash decode, tile envelopes, web-mercator transform -----------

  /** Decode a geohash to cell bounds (lonLo, latLo, lonHi, latHi);
    * null for empty/invalid input. Bisection mirrors the encoder above,
    * so every bound is an exact binary fraction of the ±180/±90 domain. */
  private def geohashBounds(hash: String): Array[Double] = {
    if (hash == null || hash.isEmpty) return null
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var evenBit = true
    var i = 0
    while (i < hash.length) {
      val idx = GeohashBase32.indexOf(Character.toLowerCase(hash.charAt(i)))
      if (idx < 0) return null
      var b = 4
      while (b >= 0) {
        val bit = (idx >> b) & 1
        if (evenBit) {
          val mid = (lonLo + lonHi) / 2
          if (bit == 1) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bit == 1) latLo = mid else latHi = mid
        }
        evenBit = !evenBit
        b -= 1
      }
      i += 1
    }
    Array(lonLo, latLo, lonHi, latHi)
  }

  /** ST_GeomFromGeoHash — the cell as a rectangle polygon, SRID 4326
    * (PostGIS). Null for invalid hashes. */
  def geomFromGeoHash(hash: String): Array[Byte] =
    memoDerived(hash.getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      24, 0, 0) {
      val b = geohashBounds(hash)
      if (b == null) null
      else makeEnvelope(b(0), b(1), b(2), b(3), 4326, hasSrid = true)
    }

  /** ST_PointFromGeoHash — the cell center, SRID 4326. */
  def pointFromGeoHash(hash: String): Array[Byte] =
    memoDerived(hash.getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      25, 0, 0) {
      val b = geohashBounds(hash)
      if (b == null) null
      else {
        val p = GeomCodec.geometryFactory.createPoint(
          new Coordinate((b(0) + b(2)) / 2, (b(1) + b(3)) / 2))
        p.setSRID(4326)
        remember(GeomCodec.encodeEwkb(p), p)
      }
    }

  private final val MercRadius = 6378137.0
  private final val MercMax = 20037508.342789244 // π · R, the 3857 half-world

  /** ST_TileEnvelope(z, x, y) — Web Mercator XYZ tile bounds as a
    * rectangle polygon, SRID 3857 (y grows southward — OSM convention,
    * PostGIS default bounds). Invalid z/x/y raise. */
  def tileEnvelope(z: Int, x: Int, y: Int): Array[Byte] = {
    require(z >= 0 && z < 32, s"ST_TileEnvelope: invalid zoom $z")
    val n = 1L << z
    require(x >= 0 && x < n && y >= 0 && y < n,
      s"ST_TileEnvelope: tile ($x, $y) out of range at zoom $z")
    val ts = (2 * MercMax) / n
    val xmin = -MercMax + x * ts
    val ymax = MercMax - y * ts
    makeEnvelope(xmin, ymax - ts, xmin + ts, ymax, 3857, hasSrid = true)
  }

  /** ST_Transform(geom, srid) for the closed-form WGS84 family:
    * 4326 ↔ 3857 (spherical web Mercator: x = R·rad(lon),
    * y = R·ln(tan(π/4 + rad(lat)/2)) and its inverse) and
    * 4326 ↔ UTM (EPSG 326zz north / 327zz south, zones 1–60; the
    * Krüger n-series transverse Mercator below, accurate to well under
    * a millimeter in-zone), plus the conic registry
    * ([[graft.geo.ConicProjections]]: Lambert-93, LCC Europe, NY Long
    * Island, CA zone 5 ftUS, Conus Albers), plus the national-grid
    * registry ([[graft.geo.NationalGrids]]: OSGB36/British National Grid
    * 27700, TM65/Irish Grid 29902, ITM 2157, ED50/UTM 31N 23031 — the
    * non-WGS84-datum tier, Helmert 7-parameter shifts through
    * geocentric coordinates), plus the azimuthal registry
    * ([[graft.geo.AzimuthalProjections]]: Amersfoort/RD New 28992 —
    * double stereographic on Bessel 1841 with its Helmert — and
    * ETRS89 LAEA Europe 3035). Cross pairs pivot through WGS84
    * geographic coordinates. The WGS84 members share a datum exactly;
    * the conic CRSs are NAD83/ETRS89/RGF93 on GRS80, treated as
    * coincident with WGS84 (PROJ's default ballpark — 1-2 m physical
    * offset, documented in ConicProjections); the national grids apply
    * their published single-Helmert fits (survey accuracy ~3.5-10 m,
    * documented in NationalGrids). Pairs outside the registries
    * raise — silent approximation of UNKNOWN datum shifts would be a
    * correctness bug, not a feature. Identity when source = target. */
  def transformGeom(tagged: Array[Byte], toSrid: Int): Array[Byte] = {
    val g0 = geom(tagged)
    if (g0.getSRID == toSrid) return tagged
    memoDerived(tagged, 22, toSrid.toDouble, 0)(transformImpl(tagged, toSrid))
  }

  private def isUtm(srid: Int): Boolean =
    (srid >= 32601 && srid <= 32660) || (srid >= 32701 && srid <= 32760)

  private def transformImpl(tagged: Array[Byte], toSrid: Int): Array[Byte] = {
    val g = geom(tagged)
    val from = g.getSRID
    def supported(s: Int) = s == 4326 || s == 3857 || isUtm(s) ||
      graft.geo.ConicProjections.supports(s) || graft.geo.NationalGrids.supports(s) ||
      graft.geo.AzimuthalProjections.supports(s) || graft.geo.ObliqueMercator.supports(s)
    if (!supported(from) || !supported(toSrid))
      throw new IllegalArgumentException(
        "ST_Transform supports: 4326, 3857, " +
          "UTM 32601-32660/32701-32760, the conic registry " +
          s"(${graft.geo.ConicProjections.registry.keys.toSeq.sorted.mkString(", ")}), " +
          "the national-grid registry " +
          s"(${graft.geo.NationalGrids.registry.keys.toSeq.sorted.mkString(", ")}), " +
          "the azimuthal registry " +
          s"(${graft.geo.AzimuthalProjections.registry.keys.toSeq.sorted.mkString(", ")}), " +
          "and the oblique-Mercator registry " +
          s"(${graft.geo.ObliqueMercator.registry.keys.toSeq.sorted.mkString(", ")}) " +
          s"(got SRID $from -> $toSrid)")
    val out = mapCoordsCopy(g) { c =>
      // pivot through WGS84 geographic degrees (no-op when from = 4326;
      // national grids fold their Helmert datum shift into the pivot)
      from match {
        case 4326 => ()
        case 3857 =>
          c.x = math.toDegrees(c.x / MercRadius)
          c.y = math.toDegrees(2 * math.atan(math.exp(c.y / MercRadius)) - math.Pi / 2)
        case conic if graft.geo.ConicProjections.supports(conic) =>
          graft.geo.ConicProjections.conicToGeographic(conic, c)
        case ng if graft.geo.NationalGrids.supports(ng) =>
          graft.geo.NationalGrids.gridToGeographic(ng, c)
        case az if graft.geo.AzimuthalProjections.supports(az) =>
          graft.geo.AzimuthalProjections.azToGeographic(az, c)
        case hom if graft.geo.ObliqueMercator.supports(hom) =>
          graft.geo.ObliqueMercator.homToGeographic(hom, c)
        case utm => TransverseMercator.utmToGeographic(utm, c)
      }
      toSrid match {
        case 4326 => ()
        case 3857 =>
          val lon = c.x; val lat = c.y
          c.x = MercRadius * math.toRadians(lon)
          c.y = MercRadius * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2))
        case conic if graft.geo.ConicProjections.supports(conic) =>
          graft.geo.ConicProjections.geographicToConic(conic, c)
        case ng if graft.geo.NationalGrids.supports(ng) =>
          graft.geo.NationalGrids.geographicToGrid(ng, c)
        case az if graft.geo.AzimuthalProjections.supports(az) =>
          graft.geo.AzimuthalProjections.geographicToAz(az, c)
        case hom if graft.geo.ObliqueMercator.supports(hom) =>
          graft.geo.ObliqueMercator.geographicToHom(hom, c)
        case utm => TransverseMercator.geographicToUtm(utm, c)
      }
    }
    out.setSRID(toSrid)
    remember(GeomCodec.encodeEwkb(out), out)
  }

  /** Deep-copy then mutate coordinates in place — the copy keeps the
    * cached original untouched. */
  private def mapCoordsCopy(g: Geometry)(fn: Coordinate => Unit): Geometry = {
    val out = g.copy()
    out.apply(new org.locationtech.jts.geom.CoordinateFilter {
      override def filter(c: Coordinate): Unit = fn(c)
    })
    out.geometryChanged()
    out
  }

  /** ST_Points — every vertex as one MultiPoint (duplicates kept, path
    * order — PostGIS). */
  def pointsOf(tagged: Array[Byte]): Array[Byte] = {
    val g = geom(tagged)
    val f = GeomCodec.geometryFactory
    val cs = g.getCoordinates
    val copies = new Array[Coordinate](cs.length)
    var i = 0
    while (i < cs.length) { copies(i) = cs(i).copy(); i += 1 }
    val out = f.createMultiPointFromCoords(copies)
    out.setSRID(g.getSRID)
    remember(GeomCodec.encodeEwkb(out), out)
  }
}
