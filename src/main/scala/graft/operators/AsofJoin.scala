package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (temporal backward) join: every left row picks the most recent
  * right row at-or-before its timestamp on the same key — the feature
  * lookup a training pipeline runs against slowly-changing dimensions
  * (latest profile / price / label as of each event).
  *
  * Scale design (100 TB / 1000 executors): NOT a range join and NOT a
  * per-key collect. Both sides are tagged and unioned, shuffled ONCE on
  * the key, and resolved by a single ordered window pass
  * (`last(_, ignoreNulls)` over rows-unbounded-preceding) — a sort-merge
  * scan that is linear in rows and never materializes candidate pairs.
  * The left×right blow-up of the naive inequality join (which Spark would
  * plan as a broadcast-nested-loop) never exists. Skew is bounded by the
  * largest single key's history, the same bound a sort-merge join has.
  */
object AsofJoin {

  /** For each left row, attach `valueCols` of the latest right row with
    * `right.ts <= left.ts` (strict `<` when `inclusive = false`) on the
    * same key, as `asof_<name>` columns plus `asof_ts` — all null when no
    * right row qualifies. `tolerance` (same unit as the ts column) turns
    * matches older than `left.ts - tolerance` into nulls, which is also
    * the knob that keeps streaming/windowed variants' state bounded.
    *
    * When several right rows share (key, ts), which one wins is
    * tie-unspecified (deterministic only if (key, ts) is unique on the
    * right) — the same contract as pandas merge_asof.
    *
    * Null-key semantics match an equi-join (and pandas merge_asof,
    * DuckDB ASOF JOIN): a null key matches NOTHING. Left rows with a
    * null key are preserved with all-null asof columns; right rows with
    * a null key are ignored. (The window partition would otherwise
    * group the nulls together and match them to each other.)
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String], inclusive: Boolean = true,
      tolerance: Option[Long] = None): DataFrame =
    asofImpl(left, right, keyCol, tsCol, valueCols, inclusive, tolerance,
      forward = false)

  /** The time-mirrored twin: each left row picks the EARLIEST right row
    * at-or-after its timestamp (strictly after when `inclusive = false`)
    * — next-event lookups: time-to-next-purchase labels, forward fills,
    * "first response after the incident". `tolerance` nulls matches
    * farther than `left.ts + tolerance` into the future. Same one-union
    * one-shuffle one-window-scan plan (the scan just runs in descending
    * time), same null-key and tie contracts as [[asofBackward]]. */
  def asofForward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String], inclusive: Boolean = true,
      tolerance: Option[Long] = None): DataFrame =
    asofImpl(left, right, keyCol, tsCol, valueCols, inclusive, tolerance,
      forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String], inclusive: Boolean,
      tolerance: Option[Long], forward: Boolean): DataFrame = {
    tolerance.foreach(t => require(t >= 0,
      s"tolerance must be >= 0 (got $t): a negative tolerance demands " +
        "matches from the wrong side of the join direction and would " +
        "silently null every output"))
    val leftStruct = StructType(left.schema.fields)
    val valueTypes = valueCols.map(c => c -> right.schema(c).dataType)

    val l = left.select(
      col(keyCol).as("__k") +: col(tsCol).as("__ts") +: lit(1).as("__side") +:
        struct(left.columns.map(col): _*).as("__l") +:
        valueTypes.map { case (c, t) => lit(null).cast(t).as(s"__v_$c") }: _*)
    val r = right.where(col(keyCol).isNotNull).select(
      col(keyCol).as("__k") +: col(tsCol).as("__ts") +: lit(0).as("__side") +:
        lit(null).cast(leftStruct).as("__l") +:
        valueCols.map(c => col(c).as(s"__v_$c")): _*)

    // inclusive: right sorts before left at equal ts (side 0 < 1) so the
    // carry sees it; exclusive flips the tie order. Forward is the same
    // scan over DESCENDING time — the carry then holds the earliest
    // at-or-after right row instead of the latest at-or-before one.
    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val tieOrder = if (inclusive) col("__side").asc else col("__side").desc
    val w = Window.partitionBy("__k").orderBy(tsOrder, tieOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // the carry is ONE struct per right row (ts + all values), so every
    // asof_* output column comes from the SAME matched right row — a
    // per-column last() would skip right rows whose value is genuinely
    // NULL and stitch columns from different rows. Right rows with a NULL
    // ts are unmatched by definition (no position on the time axis).
    val rightRow = when(col("__side") === 0 && col("__ts").isNotNull,
      struct(col("__ts").as("__rts") +:
        valueCols.map(c => col(s"__v_$c").as(c)): _*))
    val carried = l.unionByName(r)
      .withColumn("__m", last(rightRow, ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    // a null-ts LEFT row matches nothing in either direction — explicit
    // here rather than relying on null sort position (asc puts nulls
    // first, which hid this for backward; desc puts them LAST, where
    // they would otherwise pick up the smallest-ts right row)
    val hasTs = col("__ts").isNotNull
    val fresh = tolerance match {
      case Some(tol) if forward =>
        hasTs && col("__m").isNotNull && col("__m.__rts") <= col("__ts") + lit(tol)
      case Some(tol) =>
        hasTs && col("__m").isNotNull && col("__m.__rts") >= col("__ts") - lit(tol)
      case None => hasTs && col("__m").isNotNull
    }
    carried.select(
      left.columns.map(c => col(s"__l.$c").as(c)) ++
        valueCols.map(c => when(fresh, col(s"__m.$c")).as(s"asof_$c")) :+
        when(fresh, col("__m.__rts")).as("asof_ts"): _*)
  }
}
