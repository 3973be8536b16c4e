package graft.geo

import org.locationtech.jts.geom.{Geometry, GeometryFactory, PrecisionModel}
import org.locationtech.jts.io.{ByteOrderValues, WKBReader, WKBWriter, WKTReader}

/** WKB dialect tags — the 1-byte prefix on every geometry cell.
  *
  * Mirrors the reference's dialect codec exactly
  * (src/geo/dialect.rs:5-29): Wkb=1, Ewkb=2, Geopackage=3, MySQL=4,
  * SpatiaLite=5; decoding an unknown tag is an error.
  */
object WkbDialect {
  final val Wkb: Byte = 1
  final val Ewkb: Byte = 2
  final val Geopackage: Byte = 3
  final val MySQL: Byte = 4
  final val SpatiaLite: Byte = 5
}

/** Geometry <-> dialect-prefixed WKB codec on JTS.
  *
  * The cell layout is `[1-byte dialect tag] ++ WKB bytes`, written by the
  * reference's GeometryArrayBuilder (src/geo/builder.rs:75-81) and decoded
  * by GeometryArray::geo_value (src/geo/array.rs:13-23). Like the
  * reference, writes are EWKB by default; the SRID flag is present only
  * when a SRID is set (geozero Ewkb behaviour, see
  * src/function/geom_from_text.rs:51-68).
  *
  * Pure functions, no Spark dependency — unit-testable standalone. All JTS
  * reader/writer instances are thread-local (JTS IO classes are not
  * thread-safe; Spark runs one task per thread).
  */
object GeomCodec {

  private val factory = new GeometryFactory(new PrecisionModel(), 0)

  private val wkbReaders: ThreadLocal[WKBReader] =
    ThreadLocal.withInitial(() => new WKBReader(factory))
  private val wktReaders: ThreadLocal[WKTReader] =
    ThreadLocal.withInitial(() => new WKTReader(factory))
  // EWKB writer (emits the SRID flag) vs plain ISO-WKB writer.
  private val ewkbWriters: ThreadLocal[WKBWriter] =
    ThreadLocal.withInitial(() => new WKBWriter(2, ByteOrderValues.LITTLE_ENDIAN, true))
  private val wkbWriters: ThreadLocal[WKBWriter] =
    ThreadLocal.withInitial(() => new WKBWriter(2, ByteOrderValues.LITTLE_ENDIAN, false))

  def geometryFactory: GeometryFactory = factory

  def parseWkt(wkt: String): Geometry = {
    // Fast path for the two dominant shapes, 'POINT(x y)' and
    // 'LINESTRING(x y,...)': JTS's StreamTokenizer-based WKTReader costs
    // ~10x a direct scan. Any deviation (Z/M, EMPTY, exotic spacing)
    // falls back to the full reader.
    val g = fastParse(wkt)
    if (g != null) g else wktReaders.get().read(wkt)
  }

  private def fastParse(wkt: String): Geometry = {
    val n = wkt.length
    if (n > 6 && wkt.regionMatches(0, "POINT(", 0, 6) && wkt.charAt(n - 1) == ')') {
      val sep = wkt.indexOf(' ', 6)
      if (sep < 0) return null
      try {
        val x = java.lang.Double.parseDouble(wkt.substring(6, sep))
        val y = java.lang.Double.parseDouble(wkt.substring(sep + 1, n - 1))
        return factory.createPoint(new org.locationtech.jts.geom.Coordinate(x, y))
      } catch { case _: NumberFormatException => return null }
    }
    if (n > 11 && wkt.regionMatches(0, "LINESTRING(", 0, 11) && wkt.charAt(n - 1) == ')') {
      try {
        val body = wkt.substring(11, n - 1)
        val parts = body.split(',')
        val cs = new Array[org.locationtech.jts.geom.Coordinate](parts.length)
        var i = 0
        while (i < parts.length) {
          val p = parts(i)
          val sep = p.indexOf(' ')
          if (sep < 0 || p.indexOf(' ', sep + 1) >= 0) return null
          cs(i) = new org.locationtech.jts.geom.Coordinate(
            java.lang.Double.parseDouble(p.substring(0, sep)),
            java.lang.Double.parseDouble(p.substring(sep + 1)))
          i += 1
        }
        return factory.createLineString(cs)
      } catch { case _: NumberFormatException => return null }
    }
    null
  }

  /** Decode a dialect-prefixed cell into a JTS geometry. SRID (if carried
    * by the dialect) lands in `geometry.getSRID` (0 = none). */
  def decode(tagged: Array[Byte]): Geometry = {
    if (tagged == null || tagged.length < 2)
      throw new IllegalArgumentException("geometry cell too short")
    val body = java.util.Arrays.copyOfRange(tagged, 1, tagged.length)
    tagged(0) match {
      case WkbDialect.Wkb | WkbDialect.Ewkb =>
        // JTS WKBReader understands both ISO WKB and PostGIS EWKB
        // (it reads the SRID flag and sets geometry SRID).
        wkbReaders.get().read(body)
      case WkbDialect.Geopackage => decodeGeoPackage(body)
      case WkbDialect.MySQL => decodeMySql(body)
      case WkbDialect.SpatiaLite => decodeSpatiaLite(body)
      case other =>
        throw new IllegalArgumentException(s"Cannot decode WkbDialect from $other")
    }
  }

  /** Raw (untagged) WKB/EWKB bytes → geometry, for ST_GeomFromWKB input. */
  def decodeRawWkb(wkb: Array[Byte]): Geometry = wkbReaders.get().read(wkb)

  /** Encode as dialect-tagged EWKB (tag 2). The SRID flag is written only
    * when the geometry has a non-zero SRID, matching geozero's Ewkb
    * encoding with srid: Option<i32>. */
  def encodeEwkb(geom: Geometry): Array[Byte] = {
    val writer = if (geom.getSRID != 0) ewkbWriters.get() else wkbWriters.get()
    prefix(WkbDialect.Ewkb, writer.write(geom))
  }

  /** Encode as dialect-tagged plain WKB (tag 1) — only ST_MakeEnvelope
    * without SRID produces this in the reference
    * (src/function/make_envelope.rs:95-100). */
  def encodeWkb(geom: Geometry): Array[Byte] =
    prefix(WkbDialect.Wkb, wkbWriters.get().write(geom))

  /** Raw UNTAGGED OGC WKB for interchange (PostGIS ST_AsBinary). */
  def rawWkb(geom: Geometry): Array[Byte] = wkbWriters.get().write(geom)

  /** Raw UNTAGGED EWKB — SRID flag present only when set (PostGIS
    * ST_AsEWKB). */
  def rawEwkb(geom: Geometry): Array[Byte] =
    (if (geom.getSRID != 0) ewkbWriters.get() else wkbWriters.get()).write(geom)

  private def prefix(tag: Byte, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](body.length + 1)
    out(0) = tag
    System.arraycopy(body, 0, out, 1, body.length)
    out
  }

  /** GeoPackage geometry blob: 'GP' magic, version, flags, srid, optional
    * envelope, then standard WKB (OGC GeoPackage spec §2.1.3). */
  private def decodeGeoPackage(b: Array[Byte]): Geometry = {
    require(b.length > 8 && b(0) == 'G'.toByte && b(1) == 'P'.toByte,
      "bad GeoPackage magic")
    val flags = b(3)
    val envIndicator = (flags >> 1) & 0x07
    val envBytes = envIndicator match {
      case 0 => 0
      case 1 => 32
      case 2 | 3 => 48
      case 4 => 64
      case other => throw new IllegalArgumentException(
        s"bad GeoPackage envelope indicator $other")
    }
    val littleEndian = (flags & 0x01) == 1
    val srid = readInt(b, 4, littleEndian)
    val geom = wkbReaders.get().read(
      java.util.Arrays.copyOfRange(b, 8 + envBytes, b.length))
    if (srid != 0 && geom.getSRID == 0) geom.setSRID(srid)
    geom
  }

  /** SpatiaLite geometry BLOB (public format, v4 "legacy" uncompressed
    * classes — what geozero's SpatiaLite dialect reads for the reference):
    * 0x00 start marker, endianness flag (0x01 little / 0x00 big), int32
    * SRID, 4×float64 MBR, 0x7C MBR-end marker, then the geometry body —
    * WKB-like but with NO per-geometry byte-order byte (the blob's
    * endianness applies throughout) and each collection entity prefixed
    * by a 0x69 marker instead. Trailing 0xFE end marker.
    * Compressed (1000000+) and Z/M (1001+) classes are rejected loudly. */
  private def decodeSpatiaLite(b: Array[Byte]): Geometry = {
    require(b.length >= 45 && b(0) == 0x00 && b(38) == 0x7C.toByte &&
      b(b.length - 1) == 0xFE.toByte, "bad SpatiaLite blob framing")
    val little = b(1) == 0x01.toByte
    val buf = java.nio.ByteBuffer.wrap(b).order(
      if (little) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
    val srid = buf.getInt(2)
    buf.position(39)
    val g = readSpatiaLiteGeom(buf)
    if (srid > 0) g.setSRID(srid)
    g
  }

  private def readSpatiaLiteGeom(buf: java.nio.ByteBuffer): Geometry = {
    import org.locationtech.jts.geom.Coordinate
    def coords(n: Int): Array[Coordinate] =
      Array.fill(n)(new Coordinate(buf.getDouble, buf.getDouble))
    def ring(): org.locationtech.jts.geom.LinearRing =
      factory.createLinearRing(coords(buf.getInt))
    buf.getInt match {
      case 1 => factory.createPoint(new Coordinate(buf.getDouble, buf.getDouble))
      case 2 => factory.createLineString(coords(buf.getInt))
      case 3 =>
        val nRings = buf.getInt
        require(nRings >= 1, "polygon with zero rings")
        val shell = ring()
        factory.createPolygon(shell, Array.fill(nRings - 1)(ring()))
      case t @ (4 | 5 | 6 | 7) =>
        val n = buf.getInt
        val parts = Array.fill(n) {
          require(buf.get() == 0x69.toByte, "missing SpatiaLite entity marker")
          readSpatiaLiteGeom(buf)
        }
        t match {
          case 4 => factory.createMultiPoint(
            parts.map(_.asInstanceOf[org.locationtech.jts.geom.Point]))
          case 5 => factory.createMultiLineString(
            parts.map(_.asInstanceOf[org.locationtech.jts.geom.LineString]))
          case 6 => factory.createMultiPolygon(
            parts.map(_.asInstanceOf[org.locationtech.jts.geom.Polygon]))
          case _ => factory.createGeometryCollection(parts)
        }
      case other => throw new IllegalArgumentException(
        s"unsupported SpatiaLite geometry class $other (Z/M/compressed not supported)")
    }
  }

  /** MySQL geometry value: 4-byte little-endian SRID, then standard WKB. */
  private def decodeMySql(b: Array[Byte]): Geometry = {
    require(b.length > 4, "MySQL geometry too short")
    val srid = readInt(b, 0, littleEndian = true)
    val geom = wkbReaders.get().read(java.util.Arrays.copyOfRange(b, 4, b.length))
    if (srid != 0) geom.setSRID(srid)
    geom
  }

  private def readInt(b: Array[Byte], off: Int, littleEndian: Boolean): Int =
    if (littleEndian)
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    else
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
}
