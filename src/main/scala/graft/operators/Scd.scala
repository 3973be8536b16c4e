package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) maintenance — the versioned
  * upsert every warehouse runs nightly: apply a batch of current
  * attribute values to a dimension that keeps FULL history as
  * `[valid_from, valid_to)` intervals with an `is_current` flag.
  *
  * Semantics per key at batch time `asOf`:
  *   - key absent from the batch, or batch attributes null-safe-equal
  *     to the current version → rows pass through untouched;
  *   - attributes changed → the open version closes
  *     (`valid_to = asOf`, `is_current = false`) and a new open
  *     version with the batch attributes starts at `asOf`;
  *   - brand-new key → one open version starting at `asOf`.
  * Already-closed history NEVER rejoins the batch — it unions through
  * untouched.
  *
  * Scale design (100 TB dimension, daily batch): one hash shuffle on
  * the key columns joins ONLY the current slice to the batch (a
  * full-outer, so new keys surface in the same pass); closed history
  * is a pure union with no exchange. The batch is usually orders of
  * magnitude smaller than the dimension, so AQE broadcasts it and
  * even that one shuffle disappears — nothing in the plan is ever
  * keyed on anything but the natural key, so there is no window, no
  * sort, and no skew surface beyond the join itself (salt with
  * [[SkewJoin]] if one key is pathological). Deterministic: output
  * rows are copies of input rows with only `valid_to`/`is_current`
  * rewritten, plus batch rows stamped with `asOf` — no floats, no
  * order sensitivity. */
object Scd {

  /** Apply `batch` (one row per key: key columns + attribute columns)
    * to SCD2 `dim` at time `asOf`. `dim` must carry `fromCol`/`toCol`
    * (BIGINT epoch-like instants, `toCol` null while open) and
    * `currentCol` (boolean). Returns the full new dimension. */
  def scd2Apply(dim: DataFrame, batch: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], asOf: Long,
      fromCol: String = "valid_from", toCol: String = "valid_to",
      currentCol: String = "is_current"): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "need key and attr columns")
    val outCols = (keyCols ++ attrCols ++ Seq(fromCol, toCol, currentCol)).map(col)

    // a NULL current-flag is malformed input; coalescing it to false
    // routes the row to the history branch (normalized to false in the
    // output) instead of silently dropping it between the two filters
    val history = dim.where(!coalesce(col(currentCol), lit(false)))
      .withColumn(currentCol, coalesce(col(currentCol), lit(false)))
      .select(outCols: _*)
    // dedicated always-true marker for join-match detection: the data
    // column can no longer double as the marker once NULLs are legal
    val cur = dim.where(coalesce(col(currentCol), lit(false)))
      .withColumn("__in_cur", lit(true))
    // disambiguate batch attrs; keys join by name
    val b = batch.select(
      (keyCols.map(col) ++ attrCols.map(a => col(a).as(s"__b_$a")) :+
        lit(true).as("__in_batch")): _*)
    val j = cur.join(b, keyCols, "full_outer")
    val matched = col("__in_cur").isNotNull // cur side present
    val inBatch = col("__in_batch").isNotNull
    val changed = attrCols
      .map(a => !(col(a) <=> col(s"__b_$a"))).reduce(_ || _)

    // surviving / closed versions of the current slice
    val fromCur = j.where(matched).select(
      (keyCols.map(col) ++ attrCols.map(col) ++ Seq(
        col(fromCol),
        when(inBatch && changed, lit(asOf)).otherwise(col(toCol)).as(toCol),
        (!(inBatch && changed)).as(currentCol))): _*)
    // new open versions: changed keys and brand-new keys
    val opened = j.where(inBatch && (!matched || changed)).select(
      (keyCols.map(col) ++ attrCols.map(a => col(s"__b_$a").as(a)) ++ Seq(
        lit(asOf).as(fromCol),
        lit(null).cast("bigint").as(toCol),
        lit(true).as(currentCol))): _*)

    history.unionByName(fromCur).unionByName(opened)
  }
}
