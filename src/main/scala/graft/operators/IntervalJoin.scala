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

  private def requireBinSize(binSize: Double): Unit =
    require(binSize > 0 && !binSize.isInfinite && !binSize.isNaN,
      s"binSize must be a finite positive number (got $binSize): " +
        "division by a zero/non-finite width maps values to ±Infinity " +
        "bins, which ANSI mode rejects at cast time mid-job")

  /** Spark orders NaN greater than any double, so `between` rejects all
    * three non-finite cases (NaN, ±Infinity). */
  private def finite(c: Column): Column =
    c.between(lit(-Double.MaxValue), lit(Double.MaxValue))

  /** Interval BOUNDS must be finite, and a non-finite bound fails
    * LOUDLY (`assert_true` throws inside the job) rather than silently
    * dropping the interval: a semi-infinite interval `[lo, +Inf)` (or a
    * NaN bound, which Spark orders above everything) would match real
    * rows under the raw inequality predicate, so discarding it would
    * silently lose every one of those matches. Clamping to
    * ±Double.MaxValue is no alternative — the bin sequence
    * `bin(lo)..bin(MaxValue)` has ~1e300 entries and the explode never
    * finishes. Callers modeling unbounded intervals should clamp to
    * their domain's real extent before joining.
    *
    * NULL bounds stay silently non-matching (row dropped) — that IS the
    * raw predicate's behavior (`NULL <= p` is never true), unlike the
    * non-finite case. */
  private def finiteOrFail(df: DataFrame, what: String, cols: String*): DataFrame = {
    val nonFiniteNonNull =
      cols.map(c => col(c).isNotNull && !finite(col(c))).reduce(_ || _)
    val msg = lit(s"$what bounds must be finite (NaN/±Infinity in ${cols.mkString(", ")}): " +
      "clamp unbounded intervals to the domain extent before the join")
    df.where(assert_true(!nonFiniteNonNull, msg).isNull)
      .where(cols.map(c => col(c).isNotNull).reduce(_ && _))
  }

  /** Inner-join rows of `points` to rows of `intervals` where
    * `lo <= p <= hi` (half-open `[lo, hi)` when `closedHi = false`).
    * Each point occupies exactly one bin, so each qualifying pair meets
    * in exactly one bin — no dedup pass is needed (unlike 2-D grids,
    * where a pair can share many cells).
    *
    * Columns travel through a plain equi-join, so the two inputs must
    * not share column names (rename before a self-join).
    *
    * Non-finite POINT values are excluded, which matches the raw
    * predicate exactly once interval bounds are finite (enforced): a NaN
    * or +Inf point sorts above every finite `hi`, a -Inf point below
    * every finite `lo`, so none can satisfy `lo <= p <= hi`. Non-finite
    * INTERVAL bounds throw (see [[finiteOrFail]]). */
  def rangeJoin(points: DataFrame, pCol: String, intervals: DataFrame,
      loCol: String, hiCol: String, binSize: Double,
      closedHi: Boolean = true): DataFrame = {
    requireBinSize(binSize)
    val p = points.where(finite(col(pCol)))
      .withColumn("__bin", binOf(col(pCol), binSize))
    val iv = finiteOrFail(intervals, "interval", loCol, hiCol)
      .withColumn("__bin",
        explode(sequence(binOf(col(loCol), binSize), binOf(col(hiCol), binSize))))
    val hiPred = if (closedHi) col(pCol) <= col(hiCol) else col(pCol) < col(hiCol)
    p.join(iv, Seq("__bin")).where(col(pCol) >= col(loCol) && hiPred)
      .drop("__bin")
  }

  /** Inner-join rows of `a` to rows of `b` where [aLo, aHi] and
    * [bLo, bHi] overlap. A pair can co-occupy many bins; the anchor-bin
    * conjunct (bin == first bin of the overlap region) emits it exactly
    * once — same trick as the spatial grid join's anchor cell, so no
    * DISTINCT pass and full rows flow through.
    *
    * As with [[rangeJoin]], the inputs must not share column names —
    * a self-overlap-join needs one side's columns renamed first.
    * Non-finite bounds on EITHER side throw (see [[finiteOrFail]]) —
    * an unbounded interval would overlap real rows, so silently
    * dropping it would silently drop matches. */
  def overlapJoin(a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String, binSize: Double): DataFrame = {
    requireBinSize(binSize)
    val ea = finiteOrFail(a, "interval", aLo, aHi)
      .withColumn("__bin",
        explode(sequence(binOf(col(aLo), binSize), binOf(col(aHi), binSize))))
    val eb = finiteOrFail(b, "interval", bLo, bHi)
      .withColumn("__bin",
        explode(sequence(binOf(col(bLo), binSize), binOf(col(bHi), binSize))))
    ea.join(eb, Seq("__bin"))
      .where(col(aLo) <= col(bHi) && col(bLo) <= col(aHi) &&
        col("__bin") === binOf(greatest(col(aLo), col(bLo)), binSize))
      .drop("__bin")
  }
}
