package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Counter summary for [[MgTopK]]: item → count, bounded at `capacity`
  * live entries by the Misra–Gries decrement rule. */
final class MgSummary(
    val counters: java.util.HashMap[UTF8String, Long] = new java.util.HashMap[UTF8String, Long]())

/** `mg_topk(item, capacity)` — mergeable Misra–Gries heavy-hitters
  * summary: the frequent items of a group in ONE pass with a hard
  * `capacity`-entry state bound, as `array<struct<item, est>>` sorted
  * by (est desc, item asc in UTF-8 byte order).
  *
  * Scale design (100 TB): the exact alternative — `groupBy(group,
  * item).count` then a per-group top-k window — shuffles one row per
  * DISTINCT (group, item): at corpus scale that is the vocabulary
  * itself, per group. This aggregate runs PARTIAL → shuffle → FINAL
  * like any built-in: each map task keeps at most `capacity` counters
  * per group and ships exactly that summary, so the exchange carries
  * `groups × capacity` fixed-size entries no matter how many distinct
  * items exist. State per (task, group) is O(capacity).
  *
  * Estimate law (Misra–Gries, and the Agarwal et al. mergeable-
  * summaries merge): each reported `est` undercounts its true
  * frequency by at most `N / (capacity + 1)` (N = group's row count),
  * and every item with true frequency above that bound IS present in
  * the summary. With `capacity >=` the group's distinct-item count no
  * decrement ever fires and the summary is EXACT and merge-order-free
  * (counters just add) — the regime the DuckDB contract row pins.
  * Below that, which sub-threshold stragglers survive (and their
  * exact `est`) can shift with partitioning, like every mergeable
  * sketch here — gate on the error bound, never on equality
  * (FreqSpec pins both regimes).
  *
  * Update: present → +1; room → insert at 1; full → decrement ALL
  * live counters by 1, dropping zeros (amortized O(1) via the
  * spread-the-debt argument). Merge: add counters, then if over
  * capacity subtract the (capacity+1)-th largest value from all and
  * drop non-positives — the summary stays a valid MG summary of the
  * combined stream. */
case class MgTopK(left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgSummary]
    with ImplicitCastInputTypes with BinaryLike[Expression] {

  override def prettyName: String = "mg_topk"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  private lazy val capacity: Int = right match {
    case e if e.foldable =>
      val v = e.eval(null)
      require(v != null, "mg_topk capacity must not be null")
      val k = v.asInstanceOf[Int]
      require(k > 0 && k <= (1 << 22), s"mg_topk capacity must be in [1, 2^22] (got $k)")
      k
    case _ => throw new IllegalArgumentException("mg_topk capacity must be a literal")
  }

  override def createAggregationBuffer(): MgSummary = new MgSummary()

  override def update(buf: MgSummary, input: InternalRow): MgSummary = {
    val v = left.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      val cur = buf.counters.get(item)
      if (cur != 0L || buf.counters.containsKey(item)) {
        buf.counters.put(item, cur + 1L)
      } else if (buf.counters.size < capacity) {
        // own a copy: eval may hand back a buffer-backed UTF8String
        buf.counters.put(item.clone(), 1L)
      } else {
        decrementAll(buf, 1L)
      }
    }
    buf
  }

  override def merge(buf: MgSummary, other: MgSummary): MgSummary = {
    val it = other.counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.counters.get(e.getKey)
      buf.counters.put(e.getKey, cur + e.getValue)
    }
    if (buf.counters.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything:
      // exactly capacity entries stay strictly positive (ties at the
      // pivot all reach zero and drop, possibly leaving fewer)
      val counts = new Array[Long](buf.counters.size)
      var i = 0
      val vs = buf.counters.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val pivot = counts(counts.length - capacity - 1)
      decrementAll(buf, pivot)
    }
    buf
  }

  private def decrementAll(buf: MgSummary, by: Long): Unit = {
    val it = buf.counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= by) it.remove() else e.setValue(e.getValue - by)
    }
  }

  // frame: [int32 n] then per entry [int32 len][utf8 bytes][int64 count]
  override def serialize(buf: MgSummary): Array[Byte] = {
    var bytes = 4
    val sz = buf.counters.entrySet().iterator()
    while (sz.hasNext) { bytes += 12 + sz.next().getKey.numBytes() }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(buf.counters.size)
    val it = buf.counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      bb.putInt(b.length).put(b).putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgSummary = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MgSummary()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      buf.counters.put(UTF8String.fromBytes(b), bb.getLong)
      i += 1
    }
    buf
  }

  override def eval(buf: MgSummary): Any = {
    val entries = new Array[(UTF8String, Long)](buf.counters.size)
    var i = 0
    val it = buf.counters.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    // (est desc, item asc): UTF8String.compareTo is UTF-8 byte order —
    // the repo's standing string tie-break law
    java.util.Arrays.sort(entries, new java.util.Comparator[(UTF8String, Long)] {
      override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else a._1.compareTo(b._1)
      }
    })
    val rows: Array[Any] = entries.map { case (s, n) =>
      InternalRow(s.clone(), n): Any
    }
    new GenericArrayData(rows): ArrayData
  }

  override def withNewMutableAggBufferOffset(o: Int): MgTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MgTopK =
    copy(left = l, right = r)
}
