package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-batch dedup state for `foreachBatch` pipelines, with BOUNDED
  * per-batch reads.
  *
  * The naive pattern (q121's first shape) appends each batch's fresh
  * keys to one parquet directory and re-reads ALL of it every batch —
  * the read side grows O(#batches) in file count and never compacts.
  * This store keeps the state as one compacted BASE dataset plus at
  * most `compactEvery` per-batch DELTA datasets:
  *
  *  - [[append]] writes the batch's keys as one new delta; when the
  *    delta count reaches `compactEvery`, base + deltas are rewritten
  *    into a fresh single base (distinct'd) and the olds are removed —
  *    so every batch reads at most 1 + compactEvery datasets no matter
  *    how long the stream has run.
  *  - [[read]] returns the current state as a DataFrame (None while
  *    empty) — the anti-join side of a streaming dedup.
  *
  * Content semantics are a grow-only SET of rows: compaction unions and
  * `distinct`s, so replaying an append (a foreachBatch retry) or a
  * crash between compaction steps cannot corrupt state — rename-
  * before-delete means a reader always sees a complete base, the
  * newest base supersedes older ones, and re-compacting a stale delta
  * is a no-op under set union. Single-writer is assumed (micro-batches
  * of one query are sequential; that is the foreachBatch contract).
  *
  * Scale: state I/O is distributed parquet — no driver materialization
  * at any size; compaction cost is one distinct over the state, every
  * `compactEvery` batches. For key-range-sharded state (compact shards
  * independently), partition the stored keys by range at write time —
  * the base/delta scheme composes with any layout inside the dataset.
  */
final class CompactingKeyState(spark: SparkSession, path: String,
    compactEvery: Int = 8) {
  require(compactEvery >= 1, s"compactEvery must be >= 1 (got $compactEvery)")

  private val root = new Path(path)
  private val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def list(prefix: String): Seq[Path] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(prefix))

  private def gen(p: Path): Long = p.getName.dropWhile(!_.isDigit) match {
    case "" => 0L
    case s => s.toLong
  }

  /** Dataset directories a read must visit: newest base (older bases are
    * supersets-in-progress left by an interrupted compaction) + all
    * deltas. */
  private def liveDirs(): Seq[Path] = {
    val bases = list("base-")
    val newestBase = if (bases.isEmpty) Seq.empty else Seq(bases.maxBy(gen))
    newestBase ++ list("delta-")
  }

  /** Number of datasets a read visits right now (spec hook: stays
    * <= 1 + compactEvery). */
  def datasetCount: Int = liveDirs().size

  /** Current state content, None while empty.
    *
    * Two contract points for callers:
    *  - The DataFrame is LAZILY bound to the state directories as they
    *    exist right now; the next [[append]] or [[prune]] on this store
    *    may rewrite/delete them, after which executing this DataFrame
    *    fails. Consume (join + materialize) read() results BEFORE
    *    mutating the store — the natural foreachBatch order.
    *  - Between compactions the content is a MULTISET: a key present in
    *    the base and re-appended in a delta appears in both until the
    *    next compaction distincts them. The anti-join consumer this
    *    store exists for is insensitive to that; counting/metric
    *    consumers should distinct() first. */
  def read(): Option[DataFrame] = {
    val dirs = liveDirs()
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs.map(_.toString): _*))
  }

  /** Add a batch's key set; triggers compaction when the delta count
    * reaches `compactEvery`. */
  def append(keys: DataFrame): Unit = {
    val n = (list("delta-") ++ list("base-")).map(gen).maxOption.getOrElse(0L) + 1
    keys.distinct().write.parquet(new Path(root, s"delta-$n").toString)
    if (list("delta-").size >= compactEvery) compact()
  }

  /** Fold base + deltas into one fresh base. Rename-before-delete: the
    * consolidated tmp becomes the newest base FIRST, so a failure at any
    * step leaves a readable, content-complete state (at worst with
    * redundant olds that the next compaction removes). */
  private def compact(): Unit = rewrite(identity)

  /** Retention/TTL hook: rewrite the state keeping only rows that
    * satisfy `keep` — e.g. `col("ts") >= lit(watermarkUs)` when the
    * stored keys carry an event-time column and duplicates can only
    * arrive within a bounded lag, so older keys can never match again.
    * Without retention a dedup key set grows with the distinct-key
    * count forever; with it, state size is bounded by the key arrival
    * rate × the retention window. Same rename-before-delete discipline
    * as compaction — interruption at any step leaves a readable state. */
  def prune(keep: org.apache.spark.sql.Column): Unit =
    if (liveDirs().nonEmpty) rewrite(_.where(keep))

  private def rewrite(f: DataFrame => DataFrame): Unit = {
    val olds = liveDirs()
    // next generation counts EVERY dir (stale bases, orphaned tmps
    // included), so a crash leftover can never collide with the rename
    val all = list("base-") ++ list("delta-") ++ list("tmp-")
    val nextGen = all.map(gen).max + 1
    val tmp = new Path(root, s"tmp-$nextGen")
    f(spark.read.parquet(olds.map(_.toString): _*)).distinct()
      .write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(tmp, new Path(root, s"base-$nextGen")),
      s"state compaction rename failed: $tmp")
    // sweep EVERYTHING older than the new base, not just liveDirs():
    // a stale base left by a crash between rename and delete, or a
    // tmp- orphaned by a crash before rename, is removed by the NEXT
    // rewrite instead of leaking a full state copy per failure
    all.filter(p => gen(p) < nextGen).foreach(p => fs.delete(p, true))
  }
}
