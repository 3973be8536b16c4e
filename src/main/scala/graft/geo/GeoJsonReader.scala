package graft.geo

import org.locationtech.jts.geom._

/** GeoJSON geometry parser — the read twin of [[GeoJsonWriter]] (PostGIS
  * `ST_GeomFromGeoJSON`). Hand-rolled recursive descent over the RFC 7946
  * geometry subset: all seven geometry types, members in any order,
  * arbitrary whitespace, unknown members (bbox, crs, foreign) skipped.
  * Coordinates beyond (x, y) are ignored (2-D engine). Hand-rolled rather
  * than binding Jackson/json4s off Spark's jar directory: graft.geo is a
  * no-Spark-deps module, and pinning to whatever JSON library version a
  * Spark distribution happens to ship is a compatibility hazard for a
  * library; the geometry subset is small enough to own.
  */
object GeoJsonReader {

  def read(json: String): Geometry = {
    val p = new P(json)
    val g = p.parseGeometry()
    p.ws()
    require(p.eof, s"trailing content at offset ${p.pos}")
    g
  }

  private val factory = GeomCodec.geometryFactory

  private final class P(s: String) {
    private var i = 0
    def pos: Int = i
    def eof: Boolean = i >= s.length

    def ws(): Unit = while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"bad GeoJSON at offset $i: $msg")

    private def expect(c: Char): Unit = {
      ws()
      if (eof || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }

    private def peek(): Char = { ws(); if (eof) fail("unexpected end") else s.charAt(i) }

    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!eof && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'u' if i + 5 < s.length =>
              val hex = s.substring(i + 2, i + 6)
              // non-hex digits must surface as the parser's documented
              // IllegalArgumentException, not a NumberFormatException
              if (!hex.forall(c => Character.digit(c, 16) >= 0))
                fail(s"invalid \\u escape: $hex")
              sb.append(Integer.parseInt(hex, 16).toChar); i += 6
            case 'n' => sb.append('\n'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case e => sb.append(e); i += 2
          }
        } else { sb.append(c); i += 1 }
      }
      if (eof) fail("unterminated string")
      i += 1
      sb.toString
    }

    private def parseNumber(): Double = {
      ws()
      val start = i
      if (!eof && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
      while (!eof && (Character.isDigit(s.charAt(i)) || "+-.eE".indexOf(s.charAt(i)) >= 0)) i += 1
      if (i == start) fail("expected number")
      try java.lang.Double.parseDouble(s.substring(start, i))
      catch { case _: NumberFormatException => fail("malformed number") }
    }

    /** Generic JSON value — used for coordinates (nested Vectors/Doubles)
      * and for skipping unknown members. */
    private def parseValue(): Any = peek() match {
      case '{' =>
        expect('{')
        if (peek() == '}') { i += 1; Map.empty }
        else {
          var done = false
          val m = scala.collection.mutable.Map.empty[String, Any]
          while (!done) {
            val k = parseString(); expect(':'); m(k) = parseValue()
            if (peek() == ',') i += 1 else { expect('}'); done = true }
          }
          m
        }
      case '[' =>
        expect('[')
        if (peek() == ']') { i += 1; Vector.empty }
        else {
          val b = Vector.newBuilder[Any]
          var done = false
          while (!done) {
            b += parseValue()
            if (peek() == ',') i += 1 else { expect(']'); done = true }
          }
          b.result()
        }
      case '"' => parseString()
      case 't' if s.regionMatches(i, "true", 0, 4) => i += 4; true
      case 'f' if s.regionMatches(i, "false", 0, 5) => i += 5; false
      case 'n' if s.regionMatches(i, "null", 0, 4) => i += 4; null
      case _ => parseNumber()
    }

    def parseGeometry(): Geometry = {
      expect('{')
      var typ: String = null
      var coords: Any = null
      var geoms: Vector[Geometry] = null
      var done = peek() == '}'
      if (done) i += 1
      while (!done) {
        val key = parseString()
        expect(':')
        key match {
          case "type" => typ = parseString()
          case "coordinates" => coords = parseValue()
          case "geometries" =>
            expect('[')
            val b = Vector.newBuilder[Geometry]
            if (peek() == ']') i += 1
            else {
              var inner = false
              while (!inner) {
                b += parseGeometry()
                if (peek() == ',') i += 1 else { expect(']'); inner = true }
              }
            }
            geoms = b.result()
          case _ => parseValue() // bbox, crs, foreign members — skipped
        }
        if (peek() == ',') i += 1 else { expect('}'); done = true }
      }
      build(typ, coords, geoms)
    }

    private def coord(v: Any): Coordinate = v match {
      // strict element check: a JSON null would otherwise unbox to 0.0 and
      // silently corrupt coordinates instead of failing the parse
      case xs: Vector[_] if xs.length >= 2 &&
          xs(0).isInstanceOf[Double] && xs(1).isInstanceOf[Double] =>
        new Coordinate(xs(0).asInstanceOf[Double], xs(1).asInstanceOf[Double])
      case _ => fail("position must be [x, y, ...] numbers")
    }

    private def coordSeq(v: Any): Array[Coordinate] = v match {
      case xs: Vector[_] => xs.map(coord).toArray
      case _ => fail("expected coordinate array")
    }

    private def rings(v: Any): (LinearRing, Array[LinearRing]) = v match {
      case xs: Vector[_] if xs.nonEmpty =>
        val all = xs.map(r => factory.createLinearRing(coordSeq(r)))
        (all.head, all.tail.toArray)
      case _ => fail("polygon needs at least one ring")
    }

    private def build(typ: String, coords: Any, geoms: Vector[Geometry]): Geometry = {
      if (typ == null) fail("missing \"type\"")
      typ match {
        case "Point" => coords match {
          case xs: Vector[_] if xs.isEmpty => factory.createPoint()
          case v => factory.createPoint(coord(v))
        }
        case "LineString" => factory.createLineString(coordSeq(coords))
        case "Polygon" => coords match {
          case xs: Vector[_] if xs.isEmpty => factory.createPolygon()
          case v => val (shell, holes) = rings(v); factory.createPolygon(shell, holes)
        }
        case "MultiPoint" => coords match {
          // an empty-position member ([]) is what the writer emits for an
          // empty point — round-trip it instead of rejecting
          case xs: Vector[_] => factory.createMultiPoint(
            xs.map {
              case e: Vector[_] if e.isEmpty => factory.createPoint()
              case c => factory.createPoint(coord(c))
            }.toArray)
          case _ => fail("expected coordinate array")
        }
        case "MultiLineString" => coords match {
          case xs: Vector[_] => factory.createMultiLineString(
            xs.map(l => factory.createLineString(coordSeq(l))).toArray)
          case _ => fail("expected coordinate array")
        }
        case "MultiPolygon" => coords match {
          case xs: Vector[_] => factory.createMultiPolygon(
            xs.map { p => val (shell, holes) = rings(p); factory.createPolygon(shell, holes) }.toArray)
          case _ => fail("expected coordinate array")
        }
        case "GeometryCollection" =>
          if (geoms == null) fail("GeometryCollection needs \"geometries\"")
          factory.createGeometryCollection(geoms.toArray)
        case other => fail(s"unsupported geometry type '$other'")
      }
    }
  }
}
