package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches over corpus columns — the 100 TB
  * substitute for exact `COUNT(DISTINCT ...)` when the question is
  * "how much do these sources/shards/snapshots overlap?".
  *
  * Scale design: an exact pairwise-overlap count is a distinct-pair
  * self-join whose shuffle carries every (group, value) pair — at
  * 100 TB that is the corpus itself, per pair of groups. The sketch
  * path aggregates each group to ONE fixed-size (2^lgK registers)
  * Datasketches-HLL blob with map-side partial merging (Spark's
  * `hll_sketch_agg` is a regular partial/final aggregate), then
  * estimates any pairwise intersection driver-free by
  * inclusion–exclusion on `hll_union` of two blobs: |A∩B| ≈
  * |A| + |B| − |A∪B|. Group count rows, not corpus rows, cross the
  * final exchange; sketches are plain binary columns, so they persist
  * to parquet and merge across days/shards without re-reading data.
  *
  * Error law: HLL relative standard error is ~1.04/sqrt(2^lgK)
  * (~1.6 % at the default lgK=12) on EACH estimated cardinality, so
  * the inclusion–exclusion residual is bounded relative to the UNION
  * size, not the (possibly tiny) intersection — gate overlap
  * estimates against `|A∪B|`, never against `|A∩B|` alone. Estimates
  * are stable for a fixed plan (hashing is seedless), but the
  * Datasketches merge path is order-insensitive only WITHIN the error
  * band, not bit-exact — repartitioning can shift an estimate a few
  * per-mille (spec-pinned), so consumers must always budget the bound
  * above rather than compare sketch outputs for equality. */
object Sketch {

  /** One HLL sketch per group over `valueCol`, alongside the exact
    * distinct count. The exact column is the QA/gate companion at test
    * scale — production callers select `sk` only and skip the exact
    * aggregate entirely. */
  def groupSketches(df: DataFrame, groupCol: String, valueCol: String,
      lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4, 21] (got $lgK)")
    df.groupBy(col(groupCol))
      .agg(expr(s"hll_sketch_agg($valueCol, $lgK)").as("sk"),
        countDistinct(col(valueCol)).as("n_exact"))
  }

  /** Pairwise inclusion–exclusion overlap estimates from
    * [[groupSketches]] output: one row per unordered group pair
    * (`grp_a < grp_b`) with the three sketch estimates and `est_ab` =
    * est_a + est_b − est_union (clamped at 0). The input is
    * group-count-sized, so the self-join is broadcast. */
  def overlapEstimates(sketches: DataFrame, groupCol: String): DataFrame = {
    val a = sketches.select(col(groupCol).as("grp_a"), col("sk").as("__ska"))
    val b = sketches.select(col(groupCol).as("grp_b"), col("sk").as("__skb"))
    a.join(broadcast(b), col("grp_a") < col("grp_b"))
      .withColumn("est_a", expr("hll_sketch_estimate(__ska)"))
      .withColumn("est_b", expr("hll_sketch_estimate(__skb)"))
      .withColumn("est_union", expr("hll_sketch_estimate(hll_union(__ska, __skb))"))
      .withColumn("est_ab",
        greatest(lit(0L), col("est_a") + col("est_b") - col("est_union")))
      .drop("__ska", "__skb")
  }

  /** Exact pairwise distinct-value overlap — the test-scale companion
    * the sketch path is gated against (and exactly the distinct-pair
    * self-join shuffle the sketches exist to avoid at 100 TB). */
  def exactOverlap(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val t = df.select(col(groupCol).as("__g"), col(valueCol).as("__v")).distinct()
    t.as("a").join(t.as("b"),
        col("a.__v") === col("b.__v") && col("a.__g") < col("b.__g"))
      .groupBy(col("a.__g").as("grp_a"), col("b.__g").as("grp_b"))
      .agg(count(lit(1)).as("n_ab"))
  }
}
