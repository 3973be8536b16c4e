package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the write-side lever that makes
  * parquet min/max statistics selective on SEVERAL columns at once: a
  * range-partition + in-partition sort by the interleaved key places
  * rows that are close in every dimension into the same row groups, so
  * a reader filtering on ANY of the dimensions skips most of the file
  * (the Delta/Iceberg OPTIMIZE ZORDER recipe, done with plain Spark
  * primitives).
  *
  * The z-value is a pure codegen'd expression — `aggregate` over the
  * bit positions, OR-ing each column's bit into its interleaved slot —
  * no UDF, engine-replayable bit arithmetic (disjoint slots mean the
  * OR is also a sum, which is how the DuckDB oracle replays it). */
object ZOrder {

  /** Interleaved z-value of non-negative integer columns, `bits` low
    * bits each (values are masked to `bits`, so callers pre-scale into
    * range). Column k's bit i lands at position `i·n + k` (n = number
    * of columns). Supports up to 63 total bits. */
  def zvalue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zvalue needs at least one column")
    require(bits > 0 && bits * cols.size <= 63,
      s"need 0 < bits and bits*cols <= 63 (got $bits x ${cols.size})")
    val n = cols.size
    // statically unrolled: `bits` is a plan-time parameter, so the
    // interleave compiles to a flat OR of shift-and-mask terms inside
    // one codegen stage — no array machinery at runtime
    cols.zipWithIndex.map { case (c, k) =>
      val v = c.cast("long")
      (0 until bits).map { i =>
        shiftleft(shiftright(v, i).bitwiseAND(lit(1L)), i * n + k)
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
  }

  /** Cluster a frame for writing: range-partition by z-value into
    * `numFiles` parts and sort within each — one shuffle, then every
    * output file covers a compact z-range, i.e. a compact box in every
    * dimension. Write the result with plain `.write.parquet`; the
    * z-value column is dropped (it is an ordering device, not data). */
  def clusterByZ(df: DataFrame, cols: Seq[String], bits: Int,
      numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive (got $numFiles)")
    df.withColumn("__z", zvalue(cols.map(col), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Hilbert-curve index of two non-negative integer columns on the
    * 2^bits grid (codegen'd kernel; values masked to `bits`).
    * Consecutive indexes are always 4-adjacent cells, so a contiguous
    * index range is a tighter spatial blob than the Morton
    * equivalent — fewer row groups touched per box probe, no seam
    * jumps (ZOrderSpec measures both on the same data). */
  def hilbert(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"need 0 < bits <= 31 (got $bits)")
    graft.functions.GeoFunctions.hilbert_d(
      x.cast("long"), y.cast("long"), lit(bits))
  }

  /** [[clusterByZ]] with the Hilbert index as the clustering key —
    * same one-shuffle range-partition-and-sort recipe. */
  def clusterByHilbert(df: DataFrame, xCol: String, yCol: String,
      bits: Int, numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive (got $numFiles)")
    df.withColumn("__h", hilbert(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
  }
}
