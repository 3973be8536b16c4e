package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-reproducible sampling and dataset splitting —
  * the selection primitives a training pipeline needs to be REPEATABLE:
  * re-running the job, on any cluster size or row order, must pick the
  * same rows (Spark's `sample()` is seed-stable only for a fixed
  * partitioning, which a 100 TB reshuffle won't preserve).
  *
  * Mechanics: rows are selected by comparing the lowercase-hex MD5 of a
  * key column against a hex threshold. Fixed-width lowercase-hex strings
  * compare lexicographically exactly like the numbers they encode, so
  * `md5(key) < hexThreshold(rate)` selects a P(rate) fraction — stable
  * across engines, partitionings, and runs. Everything is a codegen'd
  * map-side filter: no shuffle, no state.
  */
object Sampling {

  /** Hex threshold string t such that P(md5 < t) = rate. */
  private[graft] def hexThreshold(rate: Double): String = {
    require(rate >= 0 && rate <= 1, "rate must be in [0, 1]")
    // 12 hex digits (48 bits) of resolution, padded to full md5 width
    val t = math.round(rate * (1L << 48)).min(1L << 48)
    if (t == (1L << 48)) "g" // > any hex char → selects everything
    else f"$t%012x" + "0" * 20
  }

  /** Hash input: bare key when unsalted (engine-replayable as md5(key));
    * key + NUL + salt otherwise — the separator keeps (key, salt) pairs
    * unambiguous (key "a" + salt "2" must not hash like key "a2"), NUL
    * because real keys essentially never contain it. A NULL key hashes
    * as the empty string, so null-key rows sample/split
    * deterministically like any other single shared key value — without
    * the coalesce, md5(null) is null, the comparison predicate is null,
    * and null-key rows silently vanish even at rate 1.0 (while
    * splitTrainTest would route them all to "train" at any testFrac). */
  private def hashInput(keyCol: String, salt: String) = {
    val k = coalesce(col(keyCol).cast("string"), lit(""))
    if (salt.isEmpty) k
    else concat(k, lit(0.toChar.toString + salt))
  }

  /** Keep a deterministic `rate` fraction, selected by `md5(keyCol)`.
    * `salt` decorrelates independent samples over the same keys. */
  def deterministicSample(df: DataFrame, keyCol: String, rate: Double,
      salt: String = ""): DataFrame =
    df.where(md5(hashInput(keyCol, salt).cast("binary"))
      < lit(hexThreshold(rate)))

  /** Append a `split` column ("test" for a deterministic `testFrac`
    * fraction, "train" otherwise) — leakage-safe: membership depends only
    * on the key, so the same document lands in the same split across
    * reruns, engines, and corpus versions. */
  def splitTrainTest(df: DataFrame, keyCol: String, testFrac: Double,
      salt: String = ""): DataFrame =
    df.withColumn("split",
      when(md5(hashInput(keyCol, salt).cast("binary"))
        < lit(hexThreshold(testFrac)), "test").otherwise("train"))

  /** Stratified deterministic sample: a different rate per value of
    * `strataCol` (the data-mixing primitive — e.g. keep 100% of books,
    * 10% of common-crawl). Strata absent from `rates` fall back to
    * `defaultRate` (0 = drop, the safe default for unexpected strata).
    *
    * Same md5-threshold selection as [[deterministicSample]], so still a
    * map-only codegen'd filter — no shuffle, no per-stratum pass, and the
    * per-row threshold is a CASE over literals. Selection depends only on
    * (key, salt), NOT the stratum, so a document keeps/loses membership
    * consistently even if its stratum label is later corrected (and
    * nested samples at growing rates stay supersets of each other). */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = ""): DataFrame = {
    val threshold = rates.foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(hexThreshold(rate))).otherwise(acc)
    }
    df.where(md5(hashInput(keyCol, salt).cast("binary")) < threshold)
  }

  /** Temperature-based domain remixing — the data-mixing primitive where
    * the rates come from the CORPUS ITSELF instead of a hand-written map
    * (the multilingual-pretraining recipe: sample domain d proportionally
    * to n_d^α, α < 1 flattening the mixture toward uniform). Keep rates
    * are normalized to the smallest domain — `rate_d = (n_min / n_d)^(1−α)`
    * — so the rarest domain keeps everything and no domain is upsampled:
    * α = 1 keeps the corpus unchanged, α → 0 equalizes domain sizes in
    * expectation. Row selection reuses the deterministic md5-threshold
    * primitive, so which rows survive depends only on (key, salt, domain
    * counts) — replayable across runs, partitionings, and engines.
    *
    * Scale: one count aggregate over the domain column (map-side
    * combine, k rows out), rates derived on the k-row frame with an
    * unpartitioned window (k = #domains, trivially driver-scale), then a
    * broadcast join + codegen'd numeric filter — the corpus itself never
    * shuffles. The md5 prefix is compared NUMERICALLY (48-bit integer
    * via conv) because the threshold is now a computed column; the
    * strict `<` against rate·2^48 keeps the same P(rate) selection law
    * as [[hexThreshold]].
    */
  def temperatureResample(df: DataFrame, domainCol: String, keyCol: String,
      alpha: Double, salt: String = ""): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    // null-safe domain key: a NULL domain is a domain like any other —
    // an equi-join would silently drop its rows even at alpha = 1,
    // the same failure class hashInput guards against for keys
    val counts = df.groupBy(col(domainCol).as("__dom")).agg(count(lit(1)).as("__n"))
    val rates = counts.withColumn("__rate",
      pow(min(col("__n")).over(Window.partitionBy()).cast("double") / col("__n"),
        1.0 - alpha))
    val u = conv(substring(md5(hashInput(keyCol, salt).cast("binary")), 1, 12),
      16, 10).cast("long")
    df.join(broadcast(rates), col(domainCol) <=> col("__dom"))
      .where(u < col("__rate") * (1L << 48).toDouble)
      .drop("__dom", "__n", "__rate")
  }

  /** The exponential sampling key of [[weightedSample]]:
    * `r = rz6(-ln(u) / w)` with `u = (h48 + 1) / 2^48 ∈ (0, 1]` from
    * the deterministic 48-bit md5 law. Efraimidis–Spirakis (2006)
    * weighted reservoir sampling in its exponential-jump form: keeping
    * the k SMALLEST r draws a weighted sample without replacement,
    * P(row first) = w_i / Σw. Replayable by construction: h+1 ≤ 2^48
    * and the 2^48 divisor are double-exact, ln agrees at 6dp across
    * libms (the dsirWeights precedent), and the 6dp snap + key
    * tie-break make the rank a total order. */
  private def expKey(keyCol: String, weightCol: String, salt: String) = {
    val h = conv(substring(md5(hashInput(keyCol, salt).cast("binary")), 1, 12),
      16, 10).cast("long")
    graft.util.Round6.rz6(
      -log((h + 1).cast("double") / (1L << 48).toDouble) /
        col(weightCol).cast("double"))
  }

  /** Deterministic weighted sampling without replacement: the `k` rows
    * with the smallest [[expKey]] (ties by key column — total order).
    * Rows with NULL or non-positive weight are excluded — a weight of 0
    * means "never sample", and a negative weight has no sampling
    * meaning, so both fail soft rather than produce NaN keys.
    *
    * Scale: a map-side key computation and a global top-k — Spark plans
    * the `orderBy().limit(k)` as TakeOrderedAndProject (per-partition
    * heads, no full sort), so nothing corpus-sized shuffles. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, salt: String = ""): DataFrame = {
    require(k > 0, "k must be positive")
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__r", expKey(keyCol, weightCol, salt))
      .orderBy(col("__r").asc, col(keyCol).asc)
      .limit(k)
      .drop("__r")
  }

  /** Per-group variant: the `k` smallest-key rows in every `groupCol`
    * group (domain-balanced weighted subsampling). Rank-pushdown window
    * keyed by group — only (group, key-scalar) ordering state per
    * reducer, the usual top-k shape. */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String, keyCol: String,
      weightCol: String, k: Int, salt: String = ""): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__r").asc, col(keyCol).asc)
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__r", expKey(keyCol, weightCol, salt))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .select(df.columns.map(col) :+ col("__rk").cast("int").as("sample_rank"): _*)
  }

  /** Top-p (nucleus) selection per group: keep, in (score DESC, id ASC)
    * order, the smallest prefix of each group whose score mass reaches
    * fraction `p` of the group total — formally every row whose
    * PRECEDING cumulative mass is `< p·total` (so the highest-scored
    * row always survives, even when it alone exceeds `p`). The
    * quality-weighted way to shrink a corpus: "keep the documents
    * carrying the top 60% of quality mass per source" adapts the cut
    * depth to each group's score distribution, where a fixed top-k or
    * rate cannot.
    *
    * Output: the selected rows as (group, id, score, rnk).
    *
    * Determinism: the prefix test is exact when scores are
    * INTEGER-VALUED (integer window sums are order-free; `p·total` is
    * one double product both engines compute identically). For
    * fractional scores the cumulative sum depends on IEEE order —
    * fixed here by the total (score DESC, id ASC) window order, but
    * callers wanting cross-engine replay should scale scores to
    * integers (the q196 contract multiplies 2dp prices by 100).
    *
    * Scale design: one shuffle keyed by group, one window pass over
    * each group's sort (running sum + row_number share it), the
    * group-total as an unordered partition aggregate. Designed for
    * MANY groups (source, domain, shard): per-group work parallelizes
    * across the shuffle; a single giant group degenerates to one
    * task's external sort like any per-group window. */
  def topPByScore(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, p: Double): DataFrame = {
    require(p > 0 && p <= 1, s"p must be in (0, 1] (got $p)")
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(scoreCol).desc, col(idCol).asc)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val zero = lit(0).cast(df.schema(scoreCol).dataType)
    df.where(col(scoreCol).isNotNull)
      .withColumn("__cum_prev", coalesce(sum(col(scoreCol)).over(
        wOrd.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        zero))
      .withColumn("__total", sum(col(scoreCol)).over(wAll))
      .withColumn("rnk", row_number().over(wOrd))
      .where(col("__cum_prev") < lit(p) * col("__total"))
      .select(col(groupCol), col(idCol), col(scoreCol), col("rnk"))
  }
}
