package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-joins for skewed keys — the manual lever when AQE's
  * skew-join splitting can't help (e.g. the hot key's rows must still
  * meet ALL build rows for that key, or the build side is replicated
  * across a bucketed layout that AQE won't touch).
  *
  * Mechanics: the build (small) side is replicated `salts` times with a
  * salt column 0..salts-1; the probe side computes a DETERMINISTIC salt
  * from non-key columns (xxhash64 mod salts). The join key becomes
  * (key, salt), so a key that previously funneled into one reducer
  * spreads across `salts` of them. The join RESULT is identical to the
  * unsalted join — salting only re-partitions work — which is what makes
  * it safe to apply mechanically to any inner/left equi-join whose build
  * side fits `salts`-fold replication.
  */
object SkewJoin {

  /** Inner equi-join of `probe` (large, possibly skewed on `key`) with
    * `build` (small enough to replicate `salts`×). `saltBy` columns feed
    * the probe-side salt hash; they default to the whole row via a
    * uniform spread over `spark_partition_id`-free deterministic hashing
    * of the key itself plus `saltBy`. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salts: Int, saltBy: Seq[String] = Nil): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltCols = if (saltBy.nonEmpty) saltBy.map(col) else probe.columns.map(col).toSeq
    val p = probe.withColumn("__salt", pmod(xxhash64(saltCols: _*), lit(salts.toLong)))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    p.join(b, Seq(key, "__salt")).drop("__salt")
  }

  /** Per-key row counts above a threshold — the observability companion:
    * run on a sample to decide whether (and how wide) to salt. */
  def hotKeys(df: DataFrame, key: String, minRows: Long): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") >= minRows)
      .orderBy(col("n_rows").desc)
}
