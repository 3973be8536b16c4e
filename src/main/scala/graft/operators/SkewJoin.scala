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
    * a deterministic probe-side salt hash when given; by default the salt
    * comes from the row's position (`monotonically_increasing_id`), which
    * spreads even fully-IDENTICAL hot-key rows — hashing row content
    * would collapse duplicates onto one salt and silently restore the
    * skew.
    *
    * Retry safety: a positional salt is only sound if a RECOMPUTED map
    * task reproduces the same salts — otherwise a lost-executor retry
    * re-salts rows, and reducers that mix old and new shuffle output
    * duplicate or drop join rows (the SPARK-23207 round-robin bug
    * class). [[saltedJoin]] therefore sorts each probe partition by all
    * its columns before assigning positional salts, making the
    * recomputation bit-identical (same remedy Spark applied to
    * round-robin repartition). The local sort costs CPU only — no
    * shuffle; pass `saltBy` (e.g. a unique id) to skip it. Frames with
    * unorderable columns (MapType) cannot be totally sorted, so the
    * default path rejects them up front — they MUST pass `saltBy`. */
  private[graft] def saltExpr(salts: Int, saltBy: Seq[String]) =
    if (saltBy.nonEmpty) pmod(xxhash64(saltBy.map(col): _*), lit(salts.toLong))
    else pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong))

  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salts: Int, saltBy: Seq[String] = Nil): DataFrame = {
    require(salts > 0, "salts must be positive")
    val stableProbe =
      if (saltBy.nonEmpty) probe
      else {
        // The stabilizing sort must be TOTAL to make positional salts
        // retry-reproducible, and only orderable types can sort. A frame
        // with an unorderable column (MapType) can neither be totally
        // sorted nor (by default) hashed on that column, so positional
        // salting can't be made retry-safe for it — demand an explicit
        // saltBy instead of an AnalysisException from the sort (or,
        // worse, a silently partial sort that re-salts ties on retry).
        import org.apache.spark.sql.catalyst.expressions.RowOrdering
        val unorderable = probe.schema.fields
          .filterNot(f => RowOrdering.isOrderable(f.dataType)).map(_.name)
        require(unorderable.isEmpty,
          s"saltedJoin: probe has unorderable column(s) ${unorderable.mkString(", ")} " +
            "— the retry-safe positional salt needs a total per-partition sort; " +
            "pass saltBy (e.g. a unique id column) instead")
        probe.sortWithinPartitions(probe.columns.map(col): _*)
      }
    val p = stableProbe.withColumn("__salt", saltExpr(salts, saltBy))
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
