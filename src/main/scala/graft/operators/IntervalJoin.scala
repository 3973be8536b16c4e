package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 1-D range joins (point-in-interval, interval-overlap) via bin
  * bucketing — the numeric/temporal analog of the spatial grid join in
  * [[SpatialJoin]]: both sides map to integer bins of width `binSize`,
  * the join becomes a shuffled EQUI-join on the bin key plus a residual
  * range predicate, and Catalyst plans a hash join instead of the
  * broadcast-nested-loop a raw inequality join degenerates to.
  *
  * Scale design (100 TB): one shuffle per side on the bin key; work is
  * proportional to bin co-occupancy, not |left|x|right|. `binSize` trades
  * duplication (an interval spanning w bins emits w rows) against bin
  * selectivity — set it near the typical interval width. Skewed bins
  * (a bin crossed by very many intervals) shuffle-salt the same way any
  * hot hash key does; AQE's skew-join handles the residual.
  */
object IntervalJoin {

  private def binOf(x: Column, binSize: Double): Column =
    floor(x / binSize).cast("long")

  /** Inner-join rows of `points` to rows of `intervals` where
    * `lo <= p <= hi` (half-open `[lo, hi)` when `closedHi = false`).
    * Each point occupies exactly one bin, so each qualifying pair meets
    * in exactly one bin — no dedup pass is needed (unlike 2-D grids,
    * where a pair can share many cells). */
  def rangeJoin(points: DataFrame, pCol: String, intervals: DataFrame,
      loCol: String, hiCol: String, binSize: Double,
      closedHi: Boolean = true): DataFrame = {
    val p = points.withColumn("__bin", binOf(col(pCol), binSize))
    val iv = intervals.withColumn("__bin",
      explode(sequence(binOf(col(loCol), binSize), binOf(col(hiCol), binSize))))
    val hiPred = if (closedHi) col(pCol) <= col(hiCol) else col(pCol) < col(hiCol)
    p.join(iv, Seq("__bin")).where(col(pCol) >= col(loCol) && hiPred)
      .drop("__bin")
  }

  /** Inner-join rows of `a` to rows of `b` where [aLo, aHi] and
    * [bLo, bHi] overlap. A pair can co-occupy many bins; the anchor-bin
    * conjunct (bin == first bin of the overlap region) emits it exactly
    * once — same trick as the spatial grid join's anchor cell, so no
    * DISTINCT pass and full rows flow through. */
  def overlapJoin(a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String, binSize: Double): DataFrame = {
    val ea = a.withColumn("__bin",
      explode(sequence(binOf(col(aLo), binSize), binOf(col(aHi), binSize))))
    val eb = b.withColumn("__bin",
      explode(sequence(binOf(col(bLo), binSize), binOf(col(bHi), binSize))))
    ea.join(eb, Seq("__bin"))
      .where(col(aLo) <= col(bHi) && col(bLo) <= col(aHi) &&
        col("__bin") === binOf(greatest(col(aLo), col(bLo)), binSize))
      .drop("__bin")
  }
}
