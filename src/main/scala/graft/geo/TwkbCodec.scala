package graft.geo

import org.locationtech.jts.geom._

/** TWKB ("Tiny WKB") reader/writer, 2-D.
  *
  * Implements the public TWKB specification
  * (github.com/TWKB/Specification): coordinates are scaled by
  * 10^precision, rounded to longs, and written as zigzag varints of the
  * DELTA from the previously written coordinate — the delta chain runs
  * through every ring and component of one geometry, which is what makes
  * dense linework tiny. The precision nibble rides in the high half of
  * the type byte (itself zigzag-encoded).
  *
  * Writer choices (all spec-legal, documented for interop):
  *  - polygon rings are written in full, including the closing point —
  *    the spec allows omitting it, and the reader below re-closes
  *    unclosed rings either way;
  *  - no bbox, no size, no id-list (the optional metadata blocks are
  *    parsed and skipped on read);
  *  - empty geometries set the is-empty metadata flag and write no body.
  *
  * The reader rejects Z/M dimensions (extended-precision flag with a
  * nonzero zm byte): this engine's codec is strictly 2-D.
  */
object TwkbCodec {

  private final val TypeIds: Map[Int, String] = Map(
    1 -> "Point", 2 -> "LineString", 3 -> "Polygon", 4 -> "MultiPoint",
    5 -> "MultiLineString", 6 -> "MultiPolygon", 7 -> "GeometryCollection")

  private def typeIdOf(g: Geometry): Int = g match {
    case _: Point => 1
    case _: LineString => 2
    case _: Polygon => 3
    case _: MultiPoint => 4
    case _: MultiLineString => 5
    case _: MultiPolygon => 6
    case _: GeometryCollection => 7
    case other => throw new IllegalArgumentException(
      s"st_astwkb: unsupported geometry ${other.getGeometryType}")
  }

  // ---- varint plumbing --------------------------------------------------

  private final class Writer {
    val buf = new java.io.ByteArrayOutputStream(64)
    def byte(b: Int): Unit = buf.write(b & 0xFF)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { buf.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      buf.write(v.toInt)
    }
    def svarint(v: Long): Unit = varint((v << 1) ^ (v >> 63))
    // delta-chain state in scaled (long) space
    var px: Long = 0L
    var py: Long = 0L
  }

  private final class Reader(bytes: Array[Byte]) {
    var pos = 0
    def byte(): Int = { val b = bytes(pos) & 0xFF; pos += 1; b }
    def varint(): Long = {
      var shift = 0; var out = 0L; var b = 0
      do {
        if (pos >= bytes.length)
          throw new IllegalArgumentException("st_geomfromtwkb: truncated varint")
        b = byte(); out |= (b & 0x7FL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      out
    }
    def svarint(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1L) }
    var px: Long = 0L
    var py: Long = 0L
  }

  // ---- write ------------------------------------------------------------

  /** Serialize, dropping SRID (TWKB carries none). `prec` is clamped to
    * PostGIS's [-7, 7]. */
  def encode(g: Geometry, prec0: Int): Array[Byte] = {
    val prec = math.max(-7, math.min(7, prec0))
    val w = new Writer
    writeGeom(w, g, prec)
    w.buf.toByteArray
  }

  private def writeGeom(w: Writer, g: Geometry, prec: Int): Unit = {
    val scale = math.pow(10, prec)
    val typeId = typeIdOf(g)
    val zz = ((prec.toLong << 1) ^ (prec.toLong >> 63)).toInt
    w.byte((zz << 4) | typeId)
    w.byte(if (g.isEmpty) 0x10 else 0x00)
    if (g.isEmpty) return

    def coords(cs: Array[Coordinate]): Unit = cs.foreach { c =>
      val qx = Math.round(c.x * scale); val qy = Math.round(c.y * scale)
      w.svarint(qx - w.px); w.svarint(qy - w.py)
      w.px = qx; w.py = qy
    }
    def poly(p: Polygon): Unit = {
      w.varint(1L + p.getNumInteriorRing)
      val rings = p.getExteriorRing +:
        Array.tabulate(p.getNumInteriorRing)(p.getInteriorRingN)
      rings.foreach { r => w.varint(r.getNumPoints.toLong); coords(r.getCoordinates) }
    }
    g match {
      case p: Point => coords(p.getCoordinates)
      case l: LineString => w.varint(l.getNumPoints.toLong); coords(l.getCoordinates)
      case p: Polygon => poly(p)
      case mp: MultiPoint =>
        w.varint(mp.getNumGeometries.toLong)
        (0 until mp.getNumGeometries)
          .foreach(i => coords(mp.getGeometryN(i).getCoordinates))
      case ml: MultiLineString =>
        w.varint(ml.getNumGeometries.toLong)
        (0 until ml.getNumGeometries).foreach { i =>
          val l = ml.getGeometryN(i).asInstanceOf[LineString]
          w.varint(l.getNumPoints.toLong); coords(l.getCoordinates)
        }
      case mp: MultiPolygon =>
        w.varint(mp.getNumGeometries.toLong)
        (0 until mp.getNumGeometries)
          .foreach(i => poly(mp.getGeometryN(i).asInstanceOf[Polygon]))
      case gc: GeometryCollection =>
        w.varint(gc.getNumGeometries.toLong)
        // children are complete nested TWKB geometries with their own
        // type byte; the delta chain restarts per child (spec)
        (0 until gc.getNumGeometries).foreach { i =>
          w.px = 0L; w.py = 0L
          writeGeom(w, gc.getGeometryN(i), prec)
        }
    }
  }

  // ---- read -------------------------------------------------------------

  def decode(bytes: Array[Byte]): Geometry = {
    val r = new Reader(bytes)
    val g = readGeom(r)
    if (r.pos != bytes.length)
      throw new IllegalArgumentException(
        s"st_geomfromtwkb: ${bytes.length - r.pos} trailing bytes")
    g
  }

  private def readGeom(r: Reader): Geometry = {
    val f = GeomCodec.geometryFactory
    val tb = r.byte()
    val typeId = tb & 0x0F
    if (!TypeIds.contains(typeId))
      throw new IllegalArgumentException(s"st_geomfromtwkb: bad type id $typeId")
    val zzPrec = (tb >> 4) & 0x0F
    val prec = ((zzPrec >>> 1) ^ -(zzPrec & 1)).toInt
    val descale = math.pow(10, prec)
    val meta = r.byte()
    if ((meta & 0x08) != 0) {
      val ext = r.byte()
      if ((ext & 0x03) != 0) throw new IllegalArgumentException(
        "st_geomfromtwkb: Z/M coordinates are not supported by this 2-D codec")
    }
    val empty = (meta & 0x10) != 0
    if ((meta & 0x01) != 0) (0 until 4).foreach(_ => r.svarint()) // bbox: 2 dims × (min, delta)
    if ((meta & 0x02) != 0) r.varint()                            // size hint

    def pt(): Coordinate = {
      r.px += r.svarint(); r.py += r.svarint()
      new Coordinate(r.px / descale, r.py / descale)
    }
    def pts(n: Int): Array[Coordinate] = Array.fill(n)(pt())
    def ring(): LinearRing = {
      val cs = pts(r.varint().toInt)
      val closed = cs.length >= 3 && cs.head.equals2D(cs.last)
      f.createLinearRing(if (closed) cs else cs :+ cs.head.copy())
    }
    def poly(): Polygon = {
      val nr = r.varint().toInt
      if (nr == 0) f.createPolygon()
      else { val shell = ring(); f.createPolygon(shell, Array.fill(nr - 1)(ring())) }
    }
    def idList(n: Int): Unit =
      if ((meta & 0x04) != 0) (0 until n).foreach(_ => r.svarint())

    typeId match {
      case 1 => if (empty) f.createPoint() else f.createPoint(pt())
      case 2 => if (empty) f.createLineString() else f.createLineString(pts(r.varint().toInt))
      case 3 => if (empty) f.createPolygon() else poly()
      case 4 =>
        if (empty) f.createMultiPoint()
        else { val n = r.varint().toInt; idList(n)
          f.createMultiPoint(Array.fill(n)(f.createPoint(pt()))) }
      case 5 =>
        if (empty) f.createMultiLineString(Array.empty)
        else { val n = r.varint().toInt; idList(n)
          f.createMultiLineString(Array.fill(n)(f.createLineString(pts(r.varint().toInt)))) }
      case 6 =>
        if (empty) f.createMultiPolygon(Array.empty)
        else { val n = r.varint().toInt; idList(n)
          f.createMultiPolygon(Array.fill(n)(poly())) }
      case 7 =>
        if (empty) f.createGeometryCollection(Array.empty)
        else { val n = r.varint().toInt; idList(n)
          f.createGeometryCollection(Array.fill(n) { r.px = 0L; r.py = 0L; readGeom(r) }) }
    }
  }
}
