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

  /** Ordered-funnel completion per key: how far along `steps` each key
    * progressed, under GREEDY-FROM-EARLIEST matching — step 1 matches
    * the key's earliest step-1 event, step k+1 the earliest step-(k+1)
    * event at `ts >=` the matched step-k time. The standard simple
    * funnel semantics (what product-analytics "conversion funnel"
    * reports compute); sliding-window OPTIMAL matching — retry a later
    * step-1 occurrence when the earliest chain overruns `windowMax` —
    * is intentionally out of scope and documented, like every other
    * bounded-semantics operator here.
    *
    * Output per key: `steps_completed` (0..n), `t_start`/`t_end` (the
    * matched chain's first/last timestamp, null when nothing matched),
    * and `completed` = all steps matched AND `t_end − t_start <=
    * windowMax` (same unit as `tsCol`; pass Long.MaxValue for
    * unwindowed). Keys with NO step events still get a row (a funnel
    * report must not silently drop the non-starters). Null timestamps
    * are dropped like [[assignSessions]].
    *
    * Scale design (100 TB): events filter map-side to the funnel's
    * step set (tiny literal IN), then ONE shuffle of slim (key, ts,
    * step) triples keyed by `keyCol` with a secondary sort on (ts,
    * step), and a single streaming per-key greedy fold over the sorted
    * run — per-key state is THREE scalars (step reached, chain start,
    * chain tip), regardless of how many step events the key emits. An
    * earlier collect_list formulation materialized every step event of
    * a key into one in-memory array, so a single bot key emitting step
    * events at volume could OOM its reducer; the streaming fold scans
    * the same rows in constant memory (the upstream sort spills to
    * disk). The all-keys left join is key-partitioned the same way. */
  def funnel(df: DataFrame, keyCol: String, tsCol: String, eventCol: String,
      steps: Seq[String], windowMax: Long = Long.MaxValue): DataFrame = {
    require(steps.nonEmpty && steps.distinct.length == steps.length,
      "steps must be non-empty and distinct")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col(eventCol) === s, lit(i)).otherwise(acc)
      }
    val evts = df
      .where(col(tsCol).isNotNull && col(eventCol).isin(steps: _*))
      .select(col(keyCol).as("__k"), col(tsCol).cast("long").as("__ts"),
        stepIdx.as("__step"))
    val nSteps = steps.length
    val outSchema = StructType(Seq(
      evts.schema("__k"),
      StructField("steps_completed", IntegerType, nullable = false),
      StructField("t_start", LongType, nullable = true),
      StructField("t_end", LongType, nullable = true)))
    // keys are contiguous after the secondary sort; one output row per
    // key run, folded without buffering the run
    val matched = evts
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__ts"), col("__step"))
      .mapPartitions { rows =>
        new Iterator[Row] {
          private val it = rows.buffered
          def hasNext: Boolean = it.hasNext
          def next(): Row = {
            val key = it.head.get(0)
            var k = 0
            var t0 = 0L
            var t = 0L
            while (it.hasNext && it.head.get(0) == key) {
              val r = it.next()
              val ts = r.getLong(1)
              if (k < nSteps && r.getInt(2) == k && (k == 0 || ts >= t)) {
                if (k == 0) t0 = ts
                k += 1
                t = ts
              }
            }
            Row(key, k,
              if (k > 0) java.lang.Long.valueOf(t0) else null,
              if (k > 0) java.lang.Long.valueOf(t) else null)
          }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
    df.select(col(keyCol).as("__k")).distinct()
      .join(matched, Seq("__k"), "left")
      .select(col("__k").as(keyCol),
        coalesce(col("steps_completed"), lit(0)).as("steps_completed"),
        col("t_start"), col("t_end"),
        (coalesce(col("steps_completed"), lit(0)) === steps.length &&
          col("t_end") - col("t_start") <= windowMax).as("completed"))
  }

  /** Rolling distinct actives — the DAU/WAU/MAU report: for every day
    * in the data's span, how many distinct keys were active in the
    * trailing `w`-day window ending that day (inclusive), for each `w`
    * in `windows`. `dayCol` must be an integral day number (callers
    * derive it from the shared epoch-micros law, `tsu div 86_400_000_000`);
    * keeping the operator unit-free means the same code rolls weekly
    * actives over week numbers or hourly actives over hour buckets.
    *
    * Output: one row per day in `[min(day), max(day)]` (the DENSE
    * spine — a report that silently skips zero-activity days misreads
    * as a shorter span), with `actives_<w>` BIGINT columns, 0 where no
    * key was active in the window.
    *
    * Scale design (100 TB): raw events first collapse to DISTINCT
    * (day, key) — a map-side partial distinct then one shuffle, the
    * only pass over full data; the grid is bounded by |keys|·|days|,
    * not event volume. Each grid row then fans out map-only to the
    * `max(windows)` target days it contributes to, and one hash
    * aggregation keyed (target day, key) reduces each key's fan-out
    * rows to its MINIMUM day-gap — map-side partially combined — and a
    * second, day-keyed aggregation turns the min-gaps into every
    * window's count in one pass (`min_gap < w` is exactly "key had
    * some activity within the trailing w days", so a plain conditional
    * SUM replaces a count-DISTINCT per window: no Expand fan-out by
    * windows+1, no distinct-dedup state — the r21 rewrite; the
    * multi-countDistinct form shuffled (windows+1)× the grid through
    * the Expand). The day spine explodes from the 1-row bounds
    * aggregate and broadcast-joins the per-day counts: nothing after
    * the first distinct touches event-scale data. */
  def rollingActives(df: DataFrame, dayCol: String, keyCol: String,
      windows: Seq[Int]): DataFrame = {
    require(windows.nonEmpty && windows.forall(_ >= 1),
      s"windows must be non-empty positive day counts (got $windows)")
    require(windows.distinct.size == windows.size,
      s"duplicate window lengths: $windows")
    val dayType = df.schema(dayCol).dataType
    val dayIntegral = dayType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    require(dayIntegral, s"$dayCol must be an integral type (got $dayType)")
    val maxW = windows.max
    val dk = df.where(col(dayCol).isNotNull && col(keyCol).isNotNull)
      .select(col(dayCol).cast("long").as("__d0"), col(keyCol).as("__k"))
      .distinct()
    val fan = dk.select(col("__d0"), col("__k"),
      explode(sequence(col("__d0"), col("__d0") + lit(maxW - 1).cast("long")))
        .as("day"))
    // min gap per (day, key): gap < w  <=>  the key was active within
    // the trailing w-day window ending `day` — so each window's count
    // is a plain conditional sum over the (day, key) grid, identical to
    // countDistinct(when(gap < w, key)) but with no Expand
    val gaps = fan.groupBy("day", "__k")
      .agg(min(col("day") - col("__d0")).as("__gap"))
    val aggs = windows.map(w =>
      sum(when(col("__gap") < w, 1L).otherwise(0L)).as(s"actives_$w"))
    val counted = gaps.groupBy("day").agg(aggs.head, aggs.tail: _*)
    val spine = dk.agg(min("__d0").as("__lo"), max("__d0").as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"))).as("day"))
    // fan-out days past __hi fall off here: the spine stops at __hi
    spine.join(broadcast(counted), Seq("day"), "left")
      .select(col("day") +: windows.map(w =>
        coalesce(col(s"actives_$w"), lit(0L)).as(s"actives_$w")): _*)
  }
}
