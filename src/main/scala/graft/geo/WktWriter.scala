package graft.geo

import org.locationtech.jts.geom._

/** WKT emitter matching the reference's golden formatting.
  *
  * JTS's own WKTWriter prints `POINT (1 2)` / `MULTIPOINT ((0 0), (1 1))`;
  * the reference's geozero/GEOS output is `POINT(1 2)` with no space after
  * the tag or after commas, and whole doubles printed without a decimal
  * point (goldens: `POLYGON((10 10,10 11,11 11,11 10,10 10))` in
  * src/function/make_envelope.rs:138, `POINT(-71.064544 42.28787)` in
  * src/function/geom_from_text.rs:112). This writer reproduces that.
  */
object WktWriter {

  /** Rust-style minimal f64 formatting: whole values print as integers
    * ("5" not "5.0"), everything else the shortest round-trip decimal. */
  def num(v: Double): String = {
    if (v == Math.rint(v) && !v.isInfinite && Math.abs(v) < 1e15) {
      v.toLong.toString
    } else {
      val s = java.lang.Double.toString(v)
      if (s.indexOf('E') >= 0) new java.math.BigDecimal(s).toPlainString else s
    }
  }

  def write(g: Geometry): String = g match {
    case p: Point =>
      if (p.isEmpty) "POINT EMPTY" else s"POINT(${coord(p.getCoordinate)})"
    case l: LineString => // includes LinearRing
      if (l.isEmpty) "LINESTRING EMPTY" else s"LINESTRING(${coords(l.getCoordinateSequence)})"
    case p: Polygon =>
      if (p.isEmpty) "POLYGON EMPTY" else s"POLYGON(${rings(p)})"
    case m: MultiPoint =>
      if (m.isEmpty) "MULTIPOINT EMPTY"
      else "MULTIPOINT(" + (0 until m.getNumGeometries)
        .map(i => coord(m.getGeometryN(i).asInstanceOf[Point].getCoordinate))
        .mkString(",") + ")"
    case m: MultiLineString =>
      if (m.isEmpty) "MULTILINESTRING EMPTY"
      else "MULTILINESTRING(" + (0 until m.getNumGeometries)
        .map(i => "(" + coords(m.getGeometryN(i).asInstanceOf[LineString].getCoordinateSequence) + ")")
        .mkString(",") + ")"
    case m: MultiPolygon =>
      if (m.isEmpty) "MULTIPOLYGON EMPTY"
      else "MULTIPOLYGON(" + (0 until m.getNumGeometries)
        .map(i => "(" + rings(m.getGeometryN(i).asInstanceOf[Polygon]) + ")")
        .mkString(",") + ")"
    case c: GeometryCollection =>
      if (c.isEmpty) "GEOMETRYCOLLECTION EMPTY"
      else "GEOMETRYCOLLECTION(" + (0 until c.getNumGeometries)
        .map(i => write(c.getGeometryN(i))).mkString(",") + ")"
    case other =>
      throw new IllegalArgumentException(s"unsupported geometry: ${other.getGeometryType}")
  }

  private def coord(c: Coordinate): String = s"${num(c.x)} ${num(c.y)}"

  private def coords(seq: CoordinateSequence): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < seq.size()) {
      if (i > 0) sb.append(',')
      sb.append(num(seq.getX(i))).append(' ').append(num(seq.getY(i)))
      i += 1
    }
    sb.toString
  }

  private def rings(p: Polygon): String = {
    val sb = new StringBuilder
    sb.append('(').append(coords(p.getExteriorRing.getCoordinateSequence)).append(')')
    var i = 0
    while (i < p.getNumInteriorRing) {
      sb.append(",(").append(coords(p.getInteriorRingN(i).getCoordinateSequence)).append(')')
      i += 1
    }
    sb.toString
  }
}
