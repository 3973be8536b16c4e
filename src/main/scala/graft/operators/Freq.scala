package graft.operators

import graft.functions.GeoFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequent-item (heavy-hitter) reporting over token streams — "what
  * are the top terms per source/shard/day" without shuffling one row
  * per distinct (group, term).
  *
  * Scale design: the exact recipe — `groupBy(group, term).count` then
  * a per-group top-k window — exchanges the full per-group vocabulary
  * (at 100 TB, the vocabulary IS corpus-sized: URLs, hashes, ids).
  * [[org.apache.spark.sql.graft.MgTopK]] replaces that with a regular
  * partial→final aggregate whose shuffle payload is a HARD
  * `capacity`-entry summary per (task, group), with the Misra–Gries
  * guarantee: every term of relative frequency above
  * `1/(capacity+1)` survives, and reported counts undercount by at
  * most `N_group/(capacity+1)`. Pick `capacity >>` the k you report
  * (e.g. 100× k) and the top-k set/order is exact for any realistic
  * skew; with `capacity >=` distinct terms the whole summary is
  * exact (the oracle regime). */
object Freq {

  /** Top-`k` tokens of `textCol` (whitespace-split) per `groupCol`,
    * via a capacity-bounded Misra–Gries summary: one row per
    * (group, rank) with the term and its estimated count. */
  def heavyHitterTokens(df: DataFrame, groupCol: String, textCol: String,
      capacity: Int, k: Int): DataFrame = {
    require(k > 0 && k <= capacity, s"need 0 < k <= capacity (got k=$k cap=$capacity)")
    df.select(col(groupCol), explode(split(col(textCol), " ")).as("__tok"))
      .where(length(col("__tok")) > 0)
      .groupBy(col(groupCol))
      .agg(GeoFunctions.mg_topk(col("__tok"), lit(capacity)).as("__hh"))
      .select(col(groupCol), posexplode(slice(col("__hh"), 1, k)))
      .select(col(groupCol), (col("pos") + 1).as("rnk"),
        col("col.item").as("term"), col("col.est").as("est"))
  }

  /** Count–min sketch row hash: `md5("cms:<row>:<key>")` → first 12 hex
    * digits as a 48-bit integer, mod `width` — the engine-replayable
    * hash law shared with [[Sampling]]/[[TextAnalysis.hashedTf]] (the
    * DuckDB side replays it as
    * `CAST(('0x' || substr(md5(...), 1, 12)) AS BIGINT) % width`).
    * NULL keys hash as the empty string, like everywhere else here. */
  private def cmsBucket(row: Column, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(lit("cms:"), row.cast("string"), lit(":"),
      coalesce(key.cast("string"), lit(""))).cast("binary")), 1, 12), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Build a count–min sketch of `keyCol`'s frequencies: `depth`
    * independent hash rows × `width` buckets, returned as the sparse
    * counts table `(row, bucket, cnt)` (absent buckets are zero). For
    * any key, `min over rows of cnt(row, bucket(row, key))` is an
    * OVERestimate of its true count, off by at most `N/width` with
    * probability `1 - (1/2)^depth` per probe — the mergeable
    * fixed-size frequency summary for dashboards and repeated
    * membership-ish probes where [[heavyHitterTokens]]'s top-k shape
    * doesn't fit.
    *
    * Scale design (100 TB): keys first collapse to per-distinct-key
    * counts — a plain codegen hash aggregation with map-side partial
    * combine, the only pass over full data — so the md5 bucket law
    * runs `depth` times per DISTINCT key, not per row (the r21
    * rewrite: the sketch exists because keys repeat, and on the q187
    * fixture this cut the md5 work 30×; on duplicate-free keys the
    * pre-count costs one combined exchange of (key, 1) rows, about
    * what the removed per-row ×depth fan-out of those same keys
    * weighed). The ×`depth` fan-out then feeds a partial+final hash
    * aggregation summing the per-key counts, whose FINAL size is at
    * most `depth·width` rows no matter the input — each task
    * pre-aggregates to its own ≤ depth·width summary, so the second
    * shuffle is sketch-sized per task, never data-sized. Shards sketch
    * independently and [[cmsMerge]] adds counts cell-wise (the CM
    * sketch is a linear projection, so merge ≡ build-on-union
    * exactly). Deterministic by construction: the md5 law has no seed
    * state, so any engine, partitioning, or merge order yields the
    * identical table (summing per-key counts is the same cell
    * arithmetic as counting rows). */
  def cmsBuild(df: DataFrame, keyCol: String, width: Int, depth: Int): DataFrame = {
    require(width > 0 && depth > 0, s"need width/depth > 0 (got $width/$depth)")
    df.select(col(keyCol).as("__k"))
      .groupBy("__k").agg(count(lit(1)).as("__kc"))
      .select(col("__k"), col("__kc"),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col("row"), cmsBucket(col("row"), col("__k"), width).as("bucket"),
        col("__kc"))
      .groupBy("row", "bucket").agg(sum("__kc").as("cnt"))
  }

  /** Merge two sketches built with the SAME (width, depth): cell-wise
    * count addition. Exactly equals building one sketch over the
    * unioned inputs (linearity). */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("row", "bucket").agg(sum("cnt").as("cnt"))

  /** Point-query the sketch: for every row of `keys`, the count–min
    * estimate of `keyCol`'s frequency (`est` BIGINT, >= the true count
    * by the CM guarantee). `width`/`depth` must match the build.
    *
    * Scale design: probe keys fan out ×depth map-side and LEFT-join
    * the broadcast sketch (≤ depth·width rows by construction) on
    * (row, bucket); a key-grouped min finishes it. No shuffle of the
    * probe frame beyond the final small agg; the sketch never
    * re-scans the data it summarized. */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      width: Int, depth: Int): DataFrame = {
    require(width > 0 && depth > 0, s"need width/depth > 0 (got $width/$depth)")
    keys.select(col(keyCol).as("__key"))
      .select(col("__key"), explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col("__key"), col("row"),
        cmsBucket(col("row"), col("__key"), width).as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy("__key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
      .select(col("__key").as(keyCol), col("est"))
  }

  /** EXACT order statistics without a global single-reducer sort: for
    * each fraction `q` in `qs`, the value of `valueCol` at ascending
    * rank `max(1, ceil(q·n))` over the `n` non-null rows (ceil computed
    * float-safe: an epsilon guards q·n landing one ulp above an exact
    * integer) — discrete
    * (type-1) quantile semantics, the element itself, never an
    * interpolation (so the result replays bit-for-bit in any engine).
    *
    * Scale design (100 TB): `percentile_approx` gives fast bounded
    * error, but corpus cut points that gate data (dedup thresholds,
    * quality-score floors) often must be EXACT and reproducible. The
    * classic exact recipe — `row_number() OVER (ORDER BY v)` — is one
    * task sorting the world. Here instead: (1) collapse to the
    * per-distinct-value histogram (one hash agg — the only pass over
    * full data); (2) RANGE-partition the histogram by value with a
    * pinned partition count and sort within partitions; (3) per-row
    * cumulative ranks assembled from a partition-local running sum
    * plus a broadcast P-row per-partition offset table (the
    * [[TextAnalysis.ccnetBuckets]] rank-assembly pattern — no global
    * window, every partition works in parallel); (4) each target rank
    * map-side probes the row whose cumulative span contains it. The
    * 1-row total-count frame rides a broadcast cross join. */
  def exactQuantiles(df: DataFrame, valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"fractions must be in (0, 1] (got $qs)")
    require(qs.distinct.size == qs.size, s"duplicate fractions: $qs")
    val spark = df.sparkSession
    val hist = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).as("__v"))
      .groupBy("__v").agg(count(lit(1)).as("__c"))
    val p = spark.sessionState.conf.numShufflePartitions
    // LAZY localCheckpoint — load-bearing for CORRECTNESS, not a perf
    // tweak. The offsets and spans consumers below would otherwise
    // each re-evaluate this subtree, and the range partitioning is NOT
    // a stable function of the data: RangePartitioner samples its
    // input in per-partition row order, the upstream hash-agg's row
    // order is a task-arrival race, and AQE additionally re-coalesces
    // the agg's shuffle from run-varying byte stats — so the two
    // evaluations can derive different boundaries and the assembled
    // global ranks drop or duplicate quantiles (observed at 6M rows,
    // ~2 runs in 5; invisible at contract scale). A pre-exchange local
    // sort cannot fix it — EliminateSorts removes sorts below
    // repartitions — so the one materialization is the only sound
    // plan; eager=false defers it to the first action (construction
    // still triggers AQE stage jobs via toRdd — the documented
    // eagerness trade of every rank-assembly operator). */
    val ranged = hist.repartitionByRange(p, col("__v"))
      .sortWithinPartitions("__v")
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .localCheckpoint(false)
    import org.apache.spark.sql.expressions.Window
    val wPrev = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    // P-row aux: safe to window globally (and to broadcast)
    val aux = ranged.groupBy("__pid").agg(sum("__c").as("__pc"))
      .withColumn("__poff", coalesce(sum("__pc").over(wPrev), lit(0L)))
      .select("__pid", "__poff")
    val wRun = Window.partitionBy("__pid").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val spans = ranged
      .withColumn("__run", sum("__c").over(wRun))
      .join(broadcast(aux), Seq("__pid"))
      .withColumn("__hi", col("__poff") + col("__run"))
      .withColumn("__lo", col("__hi") - col("__c") + 1)
    val total = df.where(col(valueCol).isNotNull)
      .agg(count(lit(1)).as("__n"))
    val targets = spark.createDataFrame(qs.map(Tuple1(_))).toDF("q")
      .crossJoin(broadcast(total))
      .withColumn("rank", greatest(lit(1L), ceil(col("q") * col("__n") - lit(1e-9))))
      .select("q", "rank")
    spans.join(broadcast(targets),
        col("__lo") <= col("rank") && col("rank") <= col("__hi"))
      .select(col("q"), col("rank"), col("__v").as("value"))
  }

  /** Per-GROUP exact type-1 quantiles: for every group and every `q`
    * in `qs`, the value at ascending rank `max(1, ceil(q·n_g))` (same
    * float-safe ceil as [[exactQuantiles]]) within
    * the group — per-source/per-domain percentiles (score cutoffs,
    * length distributions) in one pass. The many-groups complement to
    * [[exactQuantiles]]: with many modest groups, a group-partitioned
    * window distributes naturally (one shuffle keyed by group, each
    * group sorted within its task — the rank-assembly machinery is
    * only needed when ONE distribution spans the cluster).
    *
    * Output: `(group, q, rank, value)`, one row per (group, q).
    * Deterministic: the value is the element itself; ties collapse
    * under the rank like the global operator. */
  def exactQuantilesByGroup(df: DataFrame, groupCol: String,
      valueCol: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"fractions must be in (0, 1] (got $qs)")
    require(qs.distinct.size == qs.size, s"duplicate fractions: $qs")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(col(valueCol))
    val wAll = Window.partitionBy(groupCol)
    val ranked = df.where(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
    val targets = qs.map(q =>
      struct(lit(q).as("q"),
        greatest(lit(1L), ceil(lit(q) * col("__n") - lit(1e-9))).as("rank")))
    ranked
      .withColumn("__t", explode(array(targets: _*)))
      .where(col("__rn") === col("__t.rank"))
      .select(col(groupCol), col("__t.q").as("q"),
        col("__t.rank").as("rank"), col(valueCol).as("value"))
  }

  /** One-row key-skew profile of `keyCol`: row and distinct-key
    * counts, the heaviest key's count and share, and the EXACT Gini
    * coefficient of the per-key count distribution —
    * `Σ(2i − n − 1)·c_i / (n·Σc)` over counts sorted ascending — the
    * number that tells a pipeline whether a join/aggregation key needs
    * salting ([[SkewJoin]]) before it burns a cluster. Gini 0 =
    * perfectly uniform keys; → 1 = one key owns everything.
    *
    * Exactness: counts are integers; the Gini numerator is summed as
    * DECIMAL(38,0) (exact for n·max_cnt < 10^38 — beyond any real
    * corpus), and the rank weight Σ over a tie block of equal counts
    * is permutation-invariant, so the statistic is an exact,
    * partitioning-independent function of the data; only the final
    * quotient is 6dp-snapped.
    *
    * Scale design: one key hash-agg (the only pass over data), then
    * the [[exactQuantiles]] rank-assembly over the counts frame —
    * range partition + partition-local indexes + a broadcast P-row
    * offset table — so the global ascending rank never funnels through
    * one sort task. 1-row aggregates ride broadcast cross joins. */
  def skewProfile(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val counts = df.groupBy(col(keyCol).as("__k"))
      .agg(count(lit(1)).as("__c"))
    val p = spark.sessionState.conf.numShufflePartitions
    // lazy localCheckpoint: ONE materialization for both consumers —
    // see [[exactQuantiles]] for the sampling/AQE re-evaluation race
    // this closes (correctness, not perf)
    val ranged = counts.repartitionByRange(p, col("__c"), col("__k"))
      .sortWithinPartitions("__c", "__k")
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .withColumn("__lidx", col("__mid").bitwiseAND(lit((1L << 33) - 1)))
      .localCheckpoint(false)
    import org.apache.spark.sql.expressions.Window
    val wPrev = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val aux = ranged.groupBy("__pid").agg(count(lit(1)).as("__pc"))
      .withColumn("__poff", coalesce(sum("__pc").over(wPrev), lit(0L)))
      .select("__pid", "__poff")
    val tot = counts.agg(count(lit(1)).as("__nk"), sum("__c").as("__nr"),
      max("__c").as("__maxc"))
    val dec = "decimal(38,0)"
    val num = ranged.join(broadcast(aux), Seq("__pid"))
      .crossJoin(broadcast(tot.select("__nk")))
      .select(((lit(2) * (col("__poff") + col("__lidx") + 1) - col("__nk") - 1)
        .cast(dec) * col("__c").cast(dec)).as("__t"))
      .agg(sum("__t").as("__num"))
    num.crossJoin(broadcast(tot))
      .select(col("__nr").as("n_rows"), col("__nk").as("n_keys"),
        col("__maxc").as("max_cnt"),
        graft.util.Round6.rz6(col("__maxc").cast("double") / col("__nr"))
          .as("max_share"),
        graft.util.Round6.rz6(col("__num").cast("double") /
          (col("__nk").cast(dec) * col("__nr").cast(dec)).cast("double"))
          .as("gini"))
  }
}
