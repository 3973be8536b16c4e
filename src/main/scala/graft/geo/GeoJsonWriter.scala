package graft.geo

import org.locationtech.jts.geom._

/** GeoJSON emitter matching the reference's golden formatting exactly:
  * `{"type": "Point", "coordinates": [-71.064544,42.28787]}`
  * (src/function/as_geojson.rs:141) — a space after each key's colon, no
  * space inside coordinate arrays. jts-core ships no GeoJSON writer, so
  * this is hand-rolled per SURVEY.md §2.2 #5.
  */
object GeoJsonWriter {

  def write(g: Geometry): String = g match {
    case p: Point =>
      s"""{"type": "Point", "coordinates": ${pointCoords(p)}}"""
    case l: LineString =>
      s"""{"type": "LineString", "coordinates": ${lineCoords(l.getCoordinateSequence)}}"""
    case p: Polygon =>
      s"""{"type": "Polygon", "coordinates": ${polyCoords(p)}}"""
    case m: MultiPoint =>
      val cs = (0 until m.getNumGeometries)
        .map(i => pointCoords(m.getGeometryN(i).asInstanceOf[Point])).mkString(",")
      s"""{"type": "MultiPoint", "coordinates": [$cs]}"""
    case m: MultiLineString =>
      val cs = (0 until m.getNumGeometries)
        .map(i => lineCoords(m.getGeometryN(i).asInstanceOf[LineString].getCoordinateSequence))
        .mkString(",")
      s"""{"type": "MultiLineString", "coordinates": [$cs]}"""
    case m: MultiPolygon =>
      val cs = (0 until m.getNumGeometries)
        .map(i => polyCoords(m.getGeometryN(i).asInstanceOf[Polygon])).mkString(",")
      s"""{"type": "MultiPolygon", "coordinates": [$cs]}"""
    case c: GeometryCollection =>
      val gs = (0 until c.getNumGeometries).map(i => write(c.getGeometryN(i))).mkString(",")
      s"""{"type": "GeometryCollection", "geometries": [$gs]}"""
    case other =>
      throw new IllegalArgumentException(s"unsupported geometry: ${other.getGeometryType}")
  }

  private def pointCoords(p: Point): String =
    if (p.isEmpty) "[]"
    else s"[${WktWriter.num(p.getX)},${WktWriter.num(p.getY)}]"

  private def lineCoords(seq: CoordinateSequence): String = {
    val sb = new StringBuilder("[")
    var i = 0
    while (i < seq.size()) {
      if (i > 0) sb.append(',')
      sb.append('[').append(WktWriter.num(seq.getX(i))).append(',')
        .append(WktWriter.num(seq.getY(i))).append(']')
      i += 1
    }
    sb.append(']').toString
  }

  private def polyCoords(p: Polygon): String = {
    val sb = new StringBuilder("[")
    sb.append(lineCoords(p.getExteriorRing.getCoordinateSequence))
    var i = 0
    while (i < p.getNumInteriorRing) {
      sb.append(',').append(lineCoords(p.getInteriorRingN(i).getCoordinateSequence))
      i += 1
    }
    sb.append(']').toString
  }
}
