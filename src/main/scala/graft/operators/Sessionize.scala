package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: group each key's event stream into sessions
  * separated by inactivity gaps larger than `gap` — the batch twin of
  * [[graft.streaming.StreamOps]]' watermarked session windows, for
  * backfills and offline training-data builds.
  *
  * Scale design: one shuffle on the key, then two window passes (lag +
  * running sum) over the same (key, ts) sort — Spark reuses the sort, so
  * the whole operator is shuffle + sort + linear scan. No collect, no
  * self-join; skew is bounded by the busiest single key.
  */
object Sessionize {

  /** Append `session_idx` (1-based per key, in time order): a new session
    * starts when the gap since the key's previous event exceeds `gap`
    * (same unit as `tsCol`). Ties on (key, ts) land in one session.
    *
    * Null-timestamp contract: rows with a null `tsCol` are DROPPED — a
    * row with no timestamp has no position on the key's timeline, and
    * the previous behavior (each null row silently opening its own
    * singleton session, because a null lag-diff falls to the `otherwise`
    * branch) inflated session counts without any signal to the caller.
    * This mirrors Spark's own `session_window`, which excludes
    * null-timestamp rows from every window. Callers that consider null
    * timestamps a data error should assert upstream
    * (`df.where(col(ts).isNull)` count == 0) before sessionizing. */
  def assignSessions(df: DataFrame, keyCol: String, tsCol: String,
      gap: Long): DataFrame = {
    require(gap >= 0, s"gap must be >= 0 (got $gap): a negative gap " +
      "fails the boundary test even at diff 0 and silently makes every " +
      "event its own singleton session")
    val byTs = Window.partitionBy(keyCol).orderBy(tsCol)
    val boundary = when(
      col(tsCol) - lag(col(tsCol), 1).over(byTs) <= gap, 0).otherwise(1)
    df.where(col(tsCol).isNotNull)
      .withColumn("__brk", boundary)
      .withColumn("session_idx",
        sum(col("__brk")).over(byTs.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("__brk")
  }

  /** Per-session summary: event count and [start, end] timestamps. */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
      gap: Long): DataFrame =
    assignSessions(df, keyCol, tsCol, gap)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"))

  /** Trailing-window features per event: how many of the key's events
    * (and optionally the sum of a value column) fell in the half-open
    * window [ts - lookback, ts) — the classic leakage-safe feature
    * (strictly BEFORE the current event, so a model scored at ts sees
    * only the past). One shuffle on the key, one RANGE-frame window pass
    * over the (key, ts) sort — Spark's range frame walks the sorted
    * partition with two pointers, linear in rows. */
  def trailingWindowStats(df: DataFrame, keyCol: String, tsCol: String,
      lookback: Long, valueCol: Option[String] = None): DataFrame = {
    require(lookback > 0, "lookback must be positive")
    // the [ts-lookback, ts) contract is realized as the closed frame
    // [ts-lookback, ts-1], which is only equivalent when timestamps are
    // integral — reject fractional ts columns instead of silently
    // dropping events in (ts-1, ts)
    val tsType = df.schema(tsCol).dataType
    val tsIntegral = tsType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    require(tsIntegral, s"$tsCol must be an integral type (got $tsType)")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol))
      .rangeBetween(-lookback, -1)
    val base = df.withColumn("n_prev", count(lit(1)).over(w))
    valueCol match {
      case Some(v) =>
        // lit(0) (not 0.0): coerces to the sum's own type, so integer
        // value columns keep exact integer sums
        base.withColumn("sum_prev", coalesce(sum(col(v)).over(w), lit(0)))
      case None => base
    }
  }
}
