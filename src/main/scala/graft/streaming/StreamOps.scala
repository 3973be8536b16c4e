package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming shapes for the engine's continuous-ingest side:
  * watermarked windowed aggregation, streaming dedup, and stateful
  * sessionization. Each transform takes/returns streaming DataFrames, so
  * the same code runs on `readStream` sources (kafka, files) and is unit
  * tested with MemoryStream.
  *
  * Scale notes: state stores shard by the grouping key; watermarks bound
  * state size (without one, streaming dedup/agg state grows without
  * bound). Event-time semantics match the batch q32_events_hourly query —
  * the streaming plan is the incremental version of the same aggregation.
  */
object StreamOps {

  /** Tumbling event-time aggregation with a watermark: the incremental
    * form of the batch hourly rollup. `valueCol = None` drops the min/max
    * columns for inputs that carry no numeric payload. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowLen: String = "1 hour", watermark: String = "2 hours",
      valueCol: Option[String] = Some("value")): DataFrame = {
    val aggs = count(lit(1)).as("n") +:
      valueCol.toSeq.flatMap(v => Seq(min(v).as("vmin"), max(v).as("vmax")))
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Tumbling-window DISTINCT cardinality as a mergeable HLL sketch
    * per (window, key): streaming state per group is one fixed-size
    * blob instead of a distinct-value set, which is what makes
    * windowed `COUNT(DISTINCT)` feasible on an unbounded stream —
    * exact streaming distinct state grows with the value universe,
    * a sketch never does. Emits both the blob (for later cross-window
    * or cross-stream `hll_union_agg` rollups — the same persisted-merge
    * contract as [[graft.operators.Sketch]]) and its point estimate. */
  def windowedDistinctSketch(events: DataFrame, tsCol: String,
      keyCol: String, valueCol: String, windowLen: String = "1 hour",
      watermark: String = "2 hours", lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4, 21] (got $lgK)")
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(expr(s"hll_sketch_agg($valueCol, $lgK)").as("sk"))
      .withColumn("n_distinct_est", expr("hll_sketch_estimate(sk)"))
  }

  /** Streaming exact dedup on a content key, state bounded by watermark:
    * late duplicates beyond the watermark horizon are accepted as new. */
  def streamingDedup(events: DataFrame, tsCol: String, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-static spatial enrichment: every streaming row gains the
    * static regions its geometry intersects. The static side is collected
    * once into a broadcast STRtree; each micro-batch of the stream probes
    * it map-only — no stream-side shuffle, no per-batch rebuild, which is
    * the only join shape that stays cheap on an unbounded stream. */
  def enrichSpatial(stream: DataFrame, streamGeom: String,
      regions: DataFrame, regionGeom: String,
      predicate: String = "intersects"): DataFrame =
    graft.operators.SpatialJoin.broadcastJoin(stream, streamGeom,
      regions, regionGeom, predicate)

  /** Stream-static as-of enrichment: each streaming row gains the value
    * columns of the LATEST static dimension row for its key (the
    * feature-store lookup a training stream runs against slowly-changing
    * dimensions). The dimension is reduced to one latest row per key in a
    * single batch aggregation; every micro-batch then broadcast-joins
    * against that reduced side map-only — no stream-side shuffle. For
    * event-time-correct (not latest-snapshot) semantics over history, run
    * [[graft.operators.AsofJoin]] in the batch backfill instead. */
  def enrichLatest(stream: DataFrame, dim: DataFrame, keyCol: String,
      dimTsCol: String, valueCols: Seq[String]): DataFrame =
    enrichLatestPrepared(stream, latestDim(dim, keyCol, dimTsCol, valueCols), keyCol)

  /** The reduced one-latest-row-per-key dimension [[enrichLatest]] joins
    * against, exposed so the CALLER owns the cache lifecycle: a
    * stream-static join re-evaluates the static PLAN every micro-batch,
    * so a long-lived stream should `latestDim(...).cache()` and pass the
    * handle to [[enrichLatestPrepared]] — and `unpersist()` that same
    * handle when refreshing the dimension. (An internal cache() here
    * would pin one orphaned copy per call with no handle to release.) */
  def latestDim(dim: DataFrame, keyCol: String, dimTsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(dimTsCol).desc)
    dim.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col(keyCol) +: col(dimTsCol).as("asof_ts") +:
        valueCols.map(c => col(c).as(s"asof_$c")): _*)
  }

  /** [[enrichLatest]] against a pre-reduced (and, for long streams,
    * caller-cached) dimension from [[latestDim]]. */
  def enrichLatestPrepared(stream: DataFrame, preparedDim: DataFrame,
      keyCol: String): DataFrame =
    stream.join(broadcast(preparedDim), Seq(keyCol), "left")

  /** Gap-based session aggregation via Spark's native `session_window` —
    * the declarative, watermark-compatible twin of
    * [[graft.operators.Sessionize.sessionStats]] (which proves the same
    * semantics in batch with lag + running sum). Works identically over
    * `readStream` (with a watermark upstream) and batch frames; `tsCol`
    * must be a TIMESTAMP column.
    *
    * Merge semantics: sessions merge when the next window's start is
    * <= the current session's end, so an event landing exactly `gap`
    * after its predecessor joins the SAME session (adjacent
    * [ts, ts+gap) windows touching at a point merge) — identical to the
    * batch operator's `<=` gap test.
    *
    * Output-mode contract for production streams: put a
    * `withWatermark(tsCol, ...)` on the input and run `append` mode —
    * the watermark closes sessions and EVICTS their state, so state
    * size stays bounded by the number of sessions still open inside the
    * watermark horizon regardless of stream length. `complete` mode
    * retains every session ever seen and is only sound for a BOUNDED
    * harness read (e.g. Trigger.AvailableNow over a finite directory,
    * as the q66 correctness query does to observe the final batch);
    * never use it on an unbounded stream. */
  def sessionWindows(events: DataFrame, tsCol: String, keyCol: String,
      gap: String): DataFrame =
    events
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"))

  /** Stream-stream interval join (the impression→click attribution
    * shape): every left row pairs with same-key right rows whose event
    * time falls in [leftTs - lookback, leftTs + lookahead]. Right-side
    * columns keep their names; the join key is emitted once.
    *
    * Both sides get `watermark` so Spark can bound join state: a buffered
    * left row is dropped once the right watermark passes
    * leftTs + lookahead (no future match can arrive), and vice versa —
    * state is the in-horizon window of both streams, independent of
    * stream length. That eviction is exactly why the time bounds are
    * mandatory here: an unconstrained stream-stream join would buffer
    * both streams forever. Works identically on batch frames
    * (withWatermark is a no-op in batch), which is how the spec
    * brute-force-checks the semantics.
    *
    * Scale: state is sharded by the join key across executors like any
    * stateful operator; skew follows the hottest key. `lookback`/
    * `lookahead`/`watermark` are SQL interval strings ("10 minutes"). */
  def intervalJoinStreams(left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String, keyCol: String,
      lookback: String, lookahead: String,
      watermark: String = "1 hour"): DataFrame = {
    require(leftTs != rightTs,
      s"left and right timestamp columns must have distinct names (both '$leftTs')")
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r,
        col(s"l.$keyCol") === col(s"r.$keyCol") &&
          col(s"r.$rightTs") >= expr(s"l.$leftTs - INTERVAL $lookback") &&
          col(s"r.$rightTs") <= expr(s"l.$leftTs + INTERVAL $lookahead"))
      .drop(col(s"r.$keyCol"))
  }

  case class SessionUpdate(userId: Long, nEvents: Long, sessionStart: Long, sessionEnd: Long)
  // public: Catalyst's generated encoder code constructs this class from
  // compiled Java, which cannot see a private constructor
  case class SessionState(n: Long, start: Long, last: Long)

  /** Gap-based sessionization via flatMapGroupsWithState (the
    * custom-state escape hatch the built-in operators can't express).
    * Arriving events are EVENT-TIME gap-split: sorted within the batch,
    * a jump of more than `gapMs` closes the running session and emits it
    * immediately — so a key whose data resumes after a quiet period can
    * never be merged into its stale session. The still-open tail session
    * is emitted when the processing-time timeout fires after `gapMs` of
    * key silence.
    *
    * Caveats (inherent to ProcessingTimeTimeout): the tail session needs
    * a LATER trigger to fire the timeout — under Trigger.AvailableNow or
    * a source that stops delivering batches, open tails are never
    * emitted. Out-of-order arrivals landing within `gapMs` BEFORE the
    * open session's last event merge into it rather than re-splitting.
    * For watermark-driven event-time sessionization use [[sessionWindows]];
    * for exact batch replay use [[graft.operators.Sessionize]]. */
  def sessionize(events: Dataset[(Long, Long)], gapMs: Long): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (userId: Long, rows: Iterator[(Long, Long)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionUpdate(userId, s.n, s.start, s.last))
          } else {
            val ts = rows.map(_._2).toArray.sorted
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionUpdate]
            var cur = state.getOption
            ts.foreach { t =>
              cur = cur match {
                case Some(s) if t - s.last <= gapMs =>
                  Some(SessionState(s.n + 1, math.min(s.start, t), math.max(s.last, t)))
                case Some(s) =>
                  closed += SessionUpdate(userId, s.n, s.start, s.last)
                  Some(SessionState(1, t, t))
                case None => Some(SessionState(1, t, t))
              }
            }
            cur.foreach(state.update)
            state.setTimeoutDuration(gapMs)
            closed.iterator
          }
      }
  }

  /** Maintain a [[graft.operators.Freq.cmsBuild count–min sketch]]
    * across `foreachBatch` micro-batches in a [[CompactingKeyState]]:
    * each batch appends its OWN batch-local sketch tagged with
    * `batchId`, and [[cmsReadSketch]] folds all deltas cell-wise. The
    * CM sketch is linear, so incremental maintenance is EXACT —
    * sketch-after-N-batches ≡ one-shot sketch over the union (the
    * q192 gate proves it against the batch oracle).
    *
    * The batch-id tag is what makes the set-semantics state safe for
    * counters: two batches that happen to produce an identical
    * (row, bucket, cnt) cell must count twice — tagging keeps the rows
    * distinct — while a foreachBatch RETRY of the same batch rewrites
    * byte-identical rows that collapse under the state's distinct,
    * giving exactly-once sketch maintenance for free. Per-batch state
    * growth is bounded by depth·width cells regardless of batch size. */
  def cmsAppendBatch(state: CompactingKeyState, batch: DataFrame,
      keyCol: String, width: Int, depth: Int, batchId: Long): Unit =
    state.append(graft.operators.Freq.cmsBuild(batch, keyCol, width, depth)
      .withColumn("batch_id", lit(batchId)))

  /** The maintained sketch: fold every appended delta cell-wise. None
    * while no batch has arrived.
    *
    * The distinct() is load-bearing for exactly-once: between
    * compactions the state content is a documented MULTISET, so a
    * foreachBatch RETRY leaves byte-identical (row, bucket, cnt,
    * batch_id) cells in TWO deltas until the next compaction folds
    * them — with `compactEvery` 1 the append-side distinct already
    * collapses them, but at the default cadence a read landing between
    * a retry and its compaction would double-count that batch. Retried
    * cells are identical (same batch replays the same data) and
    * cross-batch cells differ in batch_id, so distinct() removes
    * exactly the retry copies. */
  def cmsReadSketch(state: CompactingKeyState): Option[DataFrame] =
    state.read().map(_.distinct()
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt")))

  /** Maintain a Misra–Gries heavy-hitters summary across `foreachBatch`
    * micro-batches: each batch appends its OWN capacity-bounded summary
    * (the codegen'd `mg_topk` aggregate, exploded to `(item, est)` rows
    * and tagged with `batchId` — ≤ `capacity` rows per batch regardless
    * of batch size). Unlike the CM sketch, MG is not linear, but it IS
    * a mergeable summary (Agarwal et al. 2013, *Mergeable Summaries*):
    * [[mgReadSummary]] folds the deltas by summing per-item estimates,
    * subtracting the (capacity+1)-th largest folded count, and dropping
    * non-positive counters — the folded result carries the one-shot MG
    * guarantee over the union: every item with true count
    * `> N/(capacity+1)` survives, and estimates undercount truth by at
    * most `N/(capacity+1)` (with capacity ≥ distinct items everything
    * is exact — the q208 oracle regime; StreamMgSpec pins the
    * under-capacity bound). The batch-id tag gives exactly-once under
    * foreachBatch retries, same discipline as [[cmsAppendBatch]]. */
  def mgAppendBatch(state: CompactingKeyState, batch: DataFrame,
      keyCol: String, capacity: Int, batchId: Long): Unit =
    state.append(batch
      .agg(graft.functions.GeoFunctions.mg_topk(
        col(keyCol).cast("string"), lit(capacity)).as("__hh"))
      .select(explode(col("__hh")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est"))
      .withColumn("batch_id", lit(batchId)))

  /** Maintain a persisted BM25 index from a stream: the `foreachBatch`
    * body for continuous retrieval-index ingest. Exactly-once by
    * construction — each micro-batch's contribution lands in
    * batch-suffixed delta directories written with OVERWRITE, so a
    * foreachBatch retry rewrites rather than double-appends
    * ([[graft.operators.TextAnalysis.appendBm25BatchExactlyOnce]]).
    * Searches ([[graft.operators.TextAnalysis.bm25SearchIndex]]) over
    * the maintained index equal a one-shot build over every batch seen
    * (the q222 gate); run
    * [[graft.operators.TextAnalysis.compactBm25Index]] on a maintenance
    * cadence to fold the per-batch deltas. Bootstrap the index once
    * (e.g. `writeBm25Index` over the historical corpus, or over an
    * empty frame for a from-scratch stream) before starting the
    * query. */
  def bm25AppendBatch(state: String, batch: DataFrame, idCol: String,
      textCol: String, batchId: Long): Unit =
    graft.operators.TextAnalysis.appendBm25BatchExactlyOnce(
      batch.sparkSession, state, batch, idCol, textCol, batchId)

  /** Maintain a persisted exact-hash dedup index from a stream: the
    * `foreachBatch` body for continuous ingest dedup. Exactly-once
    * WITHOUT any batch bookkeeping, because the exact index is
    * min-idempotent: probes fold `min(doc)` per content hash, and a
    * retry's re-appended rows are byte-identical duplicates that min
    * ignores ([[graft.operators.Dedup.appendToExactIndex]]) — the
    * q223 gate chains two batches plus a simulated retry and must
    * still equal the one-shot election. Probe the batch
    * ([[graft.operators.Dedup.exactIndexHits]]) BEFORE appending it,
    * the standard order of a dedup-then-admit pipeline. */
  def exactIndexAppendBatch(state: String, batch: DataFrame, idCol: String,
      textCol: String): Unit =
    graft.operators.Dedup.appendToExactIndex(
      batch.sparkSession, state, batch, idCol, textCol)

  /** Maintain a persisted IVF (or IVF-PQ) index from a stream: the
    * `foreachBatch` body for continuous embedding ingest. Exactly-once
    * with NO bookkeeping: appended rows are facts keyed by `nid`, and
    * a retry's duplicate rows are collapsed by the search's
    * (qid, nid) dedup — search results are identical however many
    * times a batch replays (the q226 gate). Centroids stay FROZEN
    * across appends (the [[graft.operators.Ann.appendToIvfIndex]]
    * contract): watch partial-probe recall via `ivfRecallFrame` and
    * rebuild below the pipeline's floor. */
  def ivfAppendBatch(state: String, batch: DataFrame): Unit =
    graft.operators.Ann.appendToIvfIndex(batch.sparkSession, state, batch)

  /** Maintain a persisted hamming/simhash index from a stream.
    * Exactly-once with NO bookkeeping: banded fingerprint rows are
    * facts, and [[graft.operators.Dedup.hammingIndexPairs]] distincts
    * its candidate pairs, so a retry's duplicate rows change nothing
    * (the q231 gate). Probe each batch BEFORE appending it. */
  def hammingAppendBatch(state: String, batch: DataFrame, idCol: String,
      hashCol: String): Unit =
    graft.operators.Dedup.appendToHammingIndex(
      batch.sparkSession, state, batch, idCol, hashCol)

  /** Maintain a persisted MinHash-LSH index from a stream. Exactly-once
    * with NO bookkeeping: bucket rows are facts, and probes aggregate
    * band hits with countDistinct + pair-distinct, so a retry's
    * duplicate rows change nothing (the q227 gate). Probe each batch
    * ([[graft.operators.Dedup.nearDupsAgainstLshIndex]]) BEFORE
    * appending it. */
  def lshAppendBatch(state: String, batch: DataFrame, idCol: String,
      textCol: String): Unit =
    graft.operators.Dedup.appendToLshIndex(
      batch.sparkSession, state, batch, idCol, textCol)

  /** Maintain the persisted dedup-pair REGISTRY from a stream: the
    * `foreachBatch` body for continuous pair-evidence ingest (each
    * micro-batch's probe hits land here). Exactly-once with NO
    * bookkeeping: edges are id-normalized `a < b` FACTS and the
    * clustering reads ([[graft.operators.Dedup.registryClusters]], the
    * snapshot refresh's delta CC) distinct their edges, so a retry's
    * duplicate rows change nothing (the q233 gate replays batch 0 and
    * must still equal q228's analytic closure). Bootstrap the registry
    * once (`writeRegistry`, over history or an empty frame) before
    * starting the query; compaction/snapshot maintenance stays an
    * offline single-writer job like every index family here. */
  def registryAppendBatch(state: String, batch: DataFrame, aCol: String,
      bCol: String): Unit =
    graft.operators.Dedup.appendToRegistry(
      batch.sparkSession, state, batch, aCol, bCol)

  /** The full incremental-clustering loop as ONE `foreachBatch` body:
    * append the batch's pair evidence to the registry, then fold the
    * same pairs into the persisted cluster snapshot at delta cost.
    * Exactly-once with NO bookkeeping, by two independent arguments: the
    * registry append writes `a < b` edge FACTS that clustering
    * distincts, and a replayed snapshot refresh is a STRICT no-op (its
    * delta edges already land inside one component, so it writes
    * nothing); a crash between the two calls is healed by the batch
    * retry (the recomputed remap re-merges whatever was left split).
    * The q235 gate replays batch 0 and requires the snapshot to equal
    * q228's analytic closure. Keep [[graft.operators.Dedup.compactClusterSnapshot]]
    * and registry compaction on an offline cadence with the stream
    * quiesced — the single-writer rule of every index family here. */
  def registryWithSnapshotBatch(registryPath: String, snapPath: String,
      batch: DataFrame, aCol: String, bCol: String): Unit = {
    val spark = batch.sparkSession
    graft.operators.Dedup.appendToRegistry(spark, registryPath, batch, aCol, bCol)
    graft.operators.Dedup.refreshClusterSnapshot(spark, snapPath, batch, aCol, bCol)
  }

  /** Maintain a persisted NavGraph ANN index from a stream — the
    * `foreachBatch` body for continuous vector ingest. Exactly-once
    * with NO bookkeeping: node and edge rows are FACTS every NavGraph
    * read distincts (search dedupes (qid, nid) candidates, compaction
    * distincts before pruning), and the append itself dedupes the
    * union by id before computing the batch's neighbors, so a replayed
    * batch re-derives the same forward and back edges — duplicate rows
    * on disk, identical search results (the q239 gate replays batch 0
    * against the analytic co-member oracle). COMPACTION RIDES THE
    * APPEND CADENCE: every `autoCompactAfter`-th micro-batch's append
    * self-compacts, which is safe mid-stream because foreachBatch
    * serializes batches (the appending stream IS the single writer)
    * and the self-compaction publishes with max(keepVersions, 2), so
    * a concurrent search planned against the pre-flip version
    * survives. Pass `autoCompactAfter <= 0` to keep compaction an
    * offline job and own the cadence. */
  def navAppendBatch(state: String, batch: DataFrame, nlist: Int = -1,
      nProbe: Int = 4, iters: Int = 5, seed: Long = 42L,
      bruteMax: Long = 4096L, autoCompactAfter: Int = 16,
      keepVersions: Int = 1): Unit =
    graft.operators.NavGraph.appendToNavGraph(
      batch.sparkSession, state, batch, nlist, nProbe, iters, seed, bruteMax,
      autoCompactAfter, keepVersions)

  /** The COMPLETE incremental-dedup loop as ONE `foreachBatch` body —
    * the 100 TB recipe executed per micro-batch: (1) probe the
    * persisted hamming index for near-dup pairs touching the batch,
    * (2) append those pairs to the registry, (3) fold the same pairs
    * into the cluster snapshot at delta cost, (4) append the batch's
    * fingerprints into the index so the NEXT batch probes against
    * them. Admission afterwards is a
    * [[graft.operators.Dedup.snapshotDedupVerdict]] read composed with
    * a semi-join — the q237 gate runs exactly this chain over two
    * micro-batches with batch 0 replayed and checks the admitted set
    * against the analytic closure.
    *
    * Exactly-once with NO bookkeeping, step by step: on a replay the
    * batch's fingerprints are already in the index, so the probe
    * returns the SAME distinct pair set (batch-batch pairs were
    * already counted — [[graft.operators.Dedup.hammingIndexPairs]]
    * unions the batch in, drops self-pairs, and distincts); the
    * registry re-append adds duplicate edge FACTS the clustering
    * distincts; the snapshot refresh is a STRICT no-op; and the index
    * re-append adds duplicate banded facts every later probe
    * distincts away. A crash anywhere is healed by the batch retry.
    * One sizing caveat: a replayed batch's bucket rows count TWICE
    * toward the probe's `maxBucket` occupancy cap, so keep the cap at
    * 2x the worst expected bucket (the default 10000 dwarfs any sane
    * near-dup bucket). The probed pairs are checkpointed once so the
    * registry append and the snapshot refresh share one probe
    * execution. */
  def hammingDedupLoopBatch(indexPath: String, registryPath: String,
      snapPath: String, batch: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int = 3): Unit = {
    val spark = batch.sparkSession
    val pairs = graft.operators.Dedup.hammingIndexPairs(
      spark, indexPath, batch, idCol, hashCol, maxHamming).localCheckpoint()
    registryWithSnapshotBatch(registryPath, snapPath, pairs, "ida", "idb")
    graft.operators.Dedup.appendToHammingIndex(
      spark, indexPath, batch, idCol, hashCol)
  }

  /** [[hammingDedupLoopBatch]] straight from TEXT: the batch is
    * fingerprinted with the same simhash64 law as the persisted
    * simhash index family (`writeSimhashIndex` bootstraps the index),
    * then runs the identical probe → registry → snapshot → index
    * chain. The replay argument carries over unchanged because the
    * fingerprint is a pure function of the text. */
  def simhashDedupLoopBatch(indexPath: String, registryPath: String,
      snapPath: String, batch: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): Unit =
    hammingDedupLoopBatch(indexPath, registryPath, snapPath,
      batch.select(col(idCol),
        graft.functions.GeoFunctions.simhash64(col(textCol)).as("__sh64")),
      idCol, "__sh64", maxHamming)

  /** The maintained heavy-hitters summary: the mergeable-summaries fold
    * of every appended batch summary. None while no batch has arrived.
    * The global window runs on the folded item table — bounded by
    * (appended batches × capacity) rows, state-sized, never data-sized
    * (the rank-assembly aux-frame discipline). */
  def mgReadSummary(state: CompactingKeyState, capacity: Int): Option[DataFrame] = {
    require(capacity > 0, s"capacity must be positive (got $capacity)")
    state.read().map { df =>
      // distinct() for the same reason as [[cmsReadSketch]]: the state
      // is a MULTISET between compactions, so a foreachBatch retry's
      // duplicate (item, est, batch_id) rows would double-count that
      // batch at the default compactEvery until the next compaction;
      // retry rows are byte-identical, cross-batch rows differ in
      // batch_id, so distinct() removes exactly the retries
      val summed = df.distinct().groupBy("item").agg(sum("est").as("est"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("est").desc, col("item").asc)
      val ranked = summed.withColumn("__rk", row_number().over(w))
      // the (capacity+1)-th largest folded count — the amount every
      // counter pays so at most `capacity` survive; 0 when they all fit
      val thr = ranked.agg(coalesce(
        max(when(col("__rk") === capacity + 1, col("est"))), lit(0L)).as("__thr"))
      ranked.crossJoin(broadcast(thr))
        .where(col("est") > col("__thr"))
        .select(col("item"), (col("est") - col("__thr")).as("est"))
    }
  }
}
