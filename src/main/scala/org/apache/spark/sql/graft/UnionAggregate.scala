package org.apache.spark.sql.graft

import graft.geo.GeomCodec
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.operation.union.UnaryUnionOp

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Tiered geometry accumulator for [[StUnionAgg]]: `levels(i)` holds
  * partial unions of ~`CompactAt`^(i+1) inputs each, so compaction only
  * ever unions SIMILAR-SIZED batches (the merge-forest discipline).
  * A flat "union the accumulated result with each new batch" scheme is
  * quadratic — the accumulated polygon's boundary is re-traversed on
  * every batch (measured 145 s for 600k unit squares; tiered: ~2 s).
  * Each input participates in O(log_64 n) unions instead of O(n/64). */
final class GeomAccumulator(
    val levels: ArrayBuffer[ArrayBuffer[Geometry]] = ArrayBuffer(ArrayBuffer.empty[Geometry]),
    var srid: Int = 0) {
  /** Input-byte dedup set: an EXACT duplicate input cell contributes
    * nothing to a union, and heavy-multiplicity inputs (points reported
    * many times, repeated footprints) are the common case — dropping
    * them before decode skips both the parse and the union work.
    * Content-hashed ByteBuffers; bounded at [[GeomAccumulator.SeenCap]]
    * entries then cleared (dedup turns approximate, result unchanged).
    * Deliberately NOT serialized — partials arrive already dissolved. */
  @transient lazy val seen = new java.util.HashSet[java.nio.ByteBuffer]()
  def add(g: Geometry): Unit = {
    if (srid == 0 && g.getSRID != 0) srid = g.getSRID
    levels(0) += g
  }
  def all: Seq[Geometry] = levels.toSeq.flatten
  def isEmpty: Boolean = levels.forall(_.isEmpty)
}

object GeomAccumulator {
  val SeenCap = 1 << 16
}

/** `st_union_agg(geom)` — the PostGIS aggregate form of ST_Union: the
  * geometric union of every non-null, non-empty geometry in the group
  * (NULL for an empty group), as tagged EWKB carrying the group's first
  * non-zero SRID.
  *
  * Scale design (100 TB): a TypedImperativeAggregate, so Spark runs it
  * PARTIAL → shuffle → FINAL: each map task dissolves its own rows
  * before anything moves, and the buffer self-compacts in tiers of
  * [[StUnionAgg.CompactAt]] (see [[GeomAccumulator]]) — in-memory state
  * is O(CompactAt · log n) geometries and the shuffle payload per
  * (task, group) is ONE dissolved geometry, never the group's row
  * count. This is the aggregate to reach for over
  * `st_union_arr(collect_list(g))`, which ships every input geometry to
  * the reducer. JTS `UnaryUnionOp` does each batch union (internally
  * STRtree-grouped cascaded union for polygonal inputs).
  *
  * Determinism note: vertex-level float coordinates of a union can
  * depend on operation ORDER (tier boundaries move with partitioning);
  * on integer-coordinate inputs the union is exact and order-free.
  * Metrics (area, emptiness, interior-point containment) are stable
  * either way; byte-compare across different partitionings is not
  * guaranteed — the caveat PostGIS documents for its parallel union. */
case class StUnionAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GeomAccumulator]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def prettyName: String = "st_union_agg"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def createAggregationBuffer(): GeomAccumulator = new GeomAccumulator()

  override def update(buf: GeomAccumulator, input: InternalRow): GeomAccumulator = {
    val v = child.eval(input)
    if (v != null) {
      if (buf.seen.size >= GeomAccumulator.SeenCap) buf.seen.clear()
      if (buf.seen.add(java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]]))) {
        val g = GeomCodec.decode(v.asInstanceOf[Array[Byte]])
        if (!g.isEmpty) { buf.add(g); cascade(buf) }
      }
    }
    buf
  }

  override def merge(buf: GeomAccumulator, other: GeomAccumulator): GeomAccumulator = {
    if (buf.srid == 0) buf.srid = other.srid
    // incoming partials are already dissolved runs — file them at their
    // tier so they merge with peers of similar size, not raw inputs
    other.levels.zipWithIndex.foreach { case (lvl, i) =>
      while (buf.levels.length <= i) buf.levels += ArrayBuffer.empty[Geometry]
      buf.levels(i) ++= lvl
    }
    cascade(buf)
    buf
  }

  private def cascade(buf: GeomAccumulator): Unit = {
    var i = 0
    while (i < buf.levels.length) {
      if (buf.levels(i).length >= StUnionAgg.CompactAt) {
        val u = UnaryUnionOp.union(buf.levels(i).asJava)
        buf.levels(i).clear()
        if (buf.levels.length <= i + 1) buf.levels += ArrayBuffer.empty[Geometry]
        if (u != null && !u.isEmpty) buf.levels(i + 1) += u
      }
      i += 1
    }
  }

  private def unionAll(buf: GeomAccumulator): Geometry = {
    val gs = buf.all
    if (gs.isEmpty) null else UnaryUnionOp.union(gs.asJava)
  }

  // frame: [int32 n][int32 srid] then per geometry [int32 len][EWKB].
  // Partials are dissolved to ONE geometry before riding the shuffle —
  // that is the point of the aggregate.
  override def serialize(buf: GeomAccumulator): Array[Byte] = {
    val u = unionAll(buf)
    val blobs = if (u == null || u.isEmpty) Seq.empty else Seq(GeomCodec.rawEwkb(u))
    val bb = java.nio.ByteBuffer.allocate(8 + blobs.map(_.length + 4).sum)
    bb.putInt(blobs.length).putInt(buf.srid)
    blobs.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GeomAccumulator = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val acc = new GeomAccumulator(srid = bb.getInt)
    // a deserialized partial is one big dissolved run; level 0 of a
    // fresh accumulator only ever collects such runs on the final-merge
    // side, so they batch-union with their own kind
    var i = 0
    while (i < n) {
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      acc.levels(0) += GeomCodec.decodeRawWkb(b)
      i += 1
    }
    acc
  }

  override def eval(buf: GeomAccumulator): Any = {
    val u = unionAll(buf)
    if (u == null) return null
    u.setSRID(buf.srid)
    GeomCodec.encodeEwkb(u)
  }

  override def withNewMutableAggBufferOffset(o: Int): StUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): StUnionAgg =
    copy(child = c)
}

object StUnionAgg {
  /** Tier fan-in: union a tier when it reaches this many members. 64
    * balances JTS cascaded-union batching (bigger batches → better
    * STRtree grouping) against per-batch latency and buffer memory. */
  val CompactAt = 64
}
