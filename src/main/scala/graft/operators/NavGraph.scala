package graft.operators

import graft.functions.GeoFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-based ANN: a layered navigable neighbor graph (HNSW-style —
  * Malkov & Yashunin, TPAMI 2018) persisted under the versioned-root
  * lifecycle every other index family here uses, searched by a
  * DISTRIBUTED iterative beam search.
  *
  * Re-thought for Spark rather than transliterated: HNSW's in-RAM
  * insert-one-point-at-a-time construction is inherently sequential, so
  * construction here is the DISTRIBUTED equivalent of its end state —
  * per layer, every member's top-`m` neighbors by cosine, computed with
  * the IVF-probed candidate join ([[Ann.knnGraph]]'s shape: a
  * list-keyed shuffle carrying ~nProbe/nlist of the all-pairs volume,
  * exact at nProbe = nlist) or brute force when the layer is small.
  * Layer membership is deterministic — a node's level is the base-4
  * valuation of its id, capped at `maxLevel` (P[level >= L] = 4^-L for
  * dense sequence ids and for hash-valued ids alike), so levels
  * replay identically on rebuild and append with no stored RNG state.
  *
  * Search is HNSW's descent expressed as bounded iterative joins, the
  * BFS/label-propagation discipline: score the top layer's entry
  * points (one map-only scan of the n/4^maxLevel entry rows against
  * the broadcast query batch), keep the best `ef` per query, then per
  * layer — once per upper layer, `rounds` times at layer 0 — expand
  * the frontier through that layer's edge partition (partition-pruned
  * scan, frontier side broadcast) and re-rank to the best `ef`. The
  * corpus-sized node table is touched only through a semi-join pruned
  * by the candidate ids (the snapshot verdict's pattern): per round,
  * one map-only pruned scan, never a history-sized shuffle. Frontiers
  * are localCheckpointed per round (the connected-components lineage
  * discipline).
  *
  * Maintenance mirrors the other families: [[appendToNavGraph]] links
  * a batch in WITHOUT a rebuild (forward edges new→neighbor plus
  * back-edges neighbor→new keep appended nodes reachable; lists exceed
  * `m` until compaction re-prunes), [[compactNavGraph]] rewrites the
  * pruned graph into the next version, publishes behind the atomic
  * pointer, and retries are read-side safe because node and edge rows
  * are FACTS every reader distincts (node facts level-aware: the max
  * level per id wins, so a bootstrap promotion survives a replayed
  * law-level append). The q238 contract runs
  * build → append → compact → search against an analytically-known
  * neighbor set; [[navRecallFrame]] is the production tuning read
  * (measured recall vs exact brute force on a query sample, the
  * ivfRecallFrame / lshRecallFrame pattern).
  *
  * Reference frame: the reference engine ships no ANN at all
  * (/root/reference/src has only the geo surface); this family extends
  * the training-data-pipeline side of the library. */
object NavGraph {

  /** Deterministic layer law: the base-4 valuation of the id, capped —
    * level >= L for one id in 4^L when ids are dense sequence numbers
    * (and in expectation for hash-valued ids). No RNG state to persist;
    * rebuilds and appends level identically. */
  private def levelOf(id: org.apache.spark.sql.Column, maxLevel: Int) =
    // fold ASCENDING so the highest level's test is the outermost branch
    // (folding the other way would let the level-1 check shadow deeper
    // valuations down to 1)
    (1 to maxLevel).foldLeft(lit(0)) { (acc, l) =>
      when(pmod(id, lit(math.pow(4, l).toLong)) === 0, lit(l)).otherwise(acc)
    }

  // ---- automatic sizing laws --------------------------------------------
  // The caller can leave `maxLevel` / `nlist` at their -1 sentinels and
  // the build derives both from the data, so the default path carries no
  // quadratic footgun (volume stays LINEAR in the layer; linear still
  // crosses a fixed box's physics eventually — the volume pre-check
  // below then fails loudly with the real remedies):
  //  * maxLevel ~ ceil(log4(n / EntryTarget)) keeps the search's entry
  //    scan at ~EntryTarget rows REGARDLESS of corpus size (a fixed
  //    maxLevel leaves it at n/4^maxLevel — linearly worse forever);
  //  * nlist ~ max(16, layerRows / TargetListRows) keeps inverted lists
  //    at ~TargetListRows rows, so the layer's candidate join stays at
  //    ~layerRows · nProbe · TargetListRows scored rows (linear in the
  //    layer) instead of the quadratic blow-up a habitual small nlist
  //    causes (nlist = 16 at n = 1M is a 2.5e11-row join).
  // Explicit values are honored verbatim — the q238/q239 exactness
  // fixtures pin nProbe = nlist = 8 — but every IVF-probed layer pass
  // first runs a loud volume pre-check (see [[knnAmong]]).
  private val EntryTarget = 256L
  private val TargetListRows = 400L
  // The cap exists only so levelOf's 4^L stays well inside a BIGINT
  // (4^30 = 2^60): the entry-stays-~256-rows law therefore holds up to
  // n = 256·4^30 ≈ 3e20 vectors — past any addressable corpus — instead
  // of silently breaking at the old min(12, ...) ≈ 4.3e9 boundary.
  private[graft] def autoMaxLevel(n: Long): Int = {
    val lvl = math.ceil(math.log(math.max(n, 1L).toDouble / EntryTarget) /
      math.log(4.0)).toInt
    math.min(30, math.max(1, lvl))
  }
  // clamped: layerRows past ~8.6e11 would wrap a bare toInt negative and
  // feed a nonsense list count into centroid training instead of failing
  private[graft] def autoNlist(layerRows: Long): Int =
    math.min(Int.MaxValue.toLong,
      math.max(16L, layerRows / TargetListRows)).toInt

  /** Loud pre-check on an IVF-probed layer pass: the candidate join
    * materializes ~ probeRows · nProbe · (corpusRows / lists) scored
    * rows (probe side × probed-list occupancy — NOT corpus², so a
    * batch-sized append against a grown layer passes trivially). Past
    * the cap that volume is a measured executor-killer, so fail BEFORE
    * the join with the actual remedies instead of mid-shuffle. The cap
    * is per-core (rows-per-core is what kills an executor, not total
    * rows): 1.5e7 · defaultParallelism — set BELOW the repo's measured
    * OOM point (a 100k self-join with 1.5k-row lists, ~6e8 scored rows
    * on 32 cores ≈ 2e7/core, OOMed a 128 GiB local[32] box) and above
    * every green ScaleSmoke build (auto 100k ≈ 5e6/core). The auto law
    * keeps volume LINEAR (≈ nProbe · 400 · rows) but linear still
    * crosses a single box's physics eventually (~300k-row self-join on
    * 32 cores): the remedy then is more cores, a smaller list target
    * (explicit nlist ABOVE the rows/400 law), a lower nProbe, or a
    * sharded build — all named in the message. Override the per-core
    * budget with the `candRowsPerCore` argument (preferred: threads
    * through the API, no global state) or
    * -Dgraft.nav.candRowsPerCore=N after measuring your executors. */
  private def resolvePerCore(candRowsPerCore: Double): Double =
    if (candRowsPerCore > 0) candRowsPerCore
    else sys.props.get("graft.nav.candRowsPerCore")
      .map(_.toDouble).getOrElse(1.5e7)

  private def checkCandidateVolume(spark: org.apache.spark.sql.SparkSession,
      probeRows: Long, corpusRows: Long, lists: Int, nProbe: Int,
      frozen: Boolean, candRowsPerCore: Double): Unit = {
    val perCore = resolvePerCore(candRowsPerCore)
    val cap = perCore * spark.sparkContext.defaultParallelism
    val est = probeRows.toDouble * nProbe * (corpusRows.toDouble / lists)
    val remedy =
      if (frozen)
        "The layer's FROZEN codebook fixes the list count (the nlist " +
          "argument is ignored here): lower nProbe, add cores, or " +
          "compact + rebuild the graph to re-size its lists."
      else
        "Raise nlist (smaller inverted lists carry less volume: this " +
          "estimate is linear in corpusRows/nlist), lower nProbe, add " +
          "cores, or shard the build."
    require(est <= cap,
      f"nav-graph candidate join would materialize ~$est%.2e scored rows " +
        f"(probe rows = $probeRows, corpus rows = $corpusRows, lists = " +
        f"$lists, nProbe = $nProbe; cap $cap%.1e = 1.5e7/core x " +
        f"${spark.sparkContext.defaultParallelism} cores, override with " +
        s"candRowsPerCore / -Dgraft.nav.candRowsPerCore). $remedy")
  }

  /** The brute branch's own pre-check: broadcast-NLJ volume is simply
    * left × right. It only ever exceeds the budget when a caller RAISES
    * `bruteMax` past the default 4096 — but a raised bruteMax on a large
    * append used to broadcast the whole batch with no guard at all, so
    * fail loudly here too. Volumes inside the DEFAULT bruteMax's square
    * are exempt unconditionally: 4096² ≈ 1.7e7 rows is a trivially safe
    * broadcast NLJ on any box, but a 1-core session's per-core cap
    * (1.5e7) sits just UNDER it — without the exemption the documented
    * default build of a ~4096-row layer would fail on small local
    * sessions, a guard misfiring on the exact case it was sized for. */
  private val DefaultBruteMax = 4096L
  private def checkBruteVolume(spark: org.apache.spark.sql.SparkSession,
      leftCount: Long, rightCount: Long, candRowsPerCore: Double): Unit = {
    val perCore = resolvePerCore(candRowsPerCore)
    val cap = perCore * spark.sparkContext.defaultParallelism
    val est = leftCount.toDouble * rightCount
    if (est <= DefaultBruteMax.toDouble * DefaultBruteMax) return
    require(est <= cap,
      f"nav-graph brute-force pass would materialize ~$est%.2e scored rows " +
        f"($leftCount x $rightCount; cap $cap%.1e, override with " +
        s"candRowsPerCore / -Dgraft.nav.candRowsPerCore — volumes at or " +
        s"under DefaultBruteMax^2 = ${DefaultBruteMax}^2 rows are always " +
        s"admitted regardless of the knob). Lower bruteMax " +
        s"to route this layer through the IVF-probed path, shrink the " +
        s"batch, or add cores.")
  }

  // The node table is partitioned by (level, pt): the search's entry
  // scan prunes to the top level's directories, and each beam round's
  // candidate-scoring scan prunes to the candidate ids' hash buckets —
  // a small query batch touches a handful of pt directories instead of
  // the whole corpus-sized table (the IVF list-pruning discipline).
  private val NodeBuckets = 64
  private def withPt(df: DataFrame): DataFrame =
    df.withColumn("pt", pmod(xxhash64(col("nid")), lit(NodeBuckets)).cast("int"))

  // The EDGE table gets the same treatment keyed by src: partitioned by
  // (level, ept) so each beam round's expansion prunes to the FRONTIER's
  // src hash buckets at plan time instead of scanning the whole ~n·m-row
  // level-0 edge partition for a 10-query frontier (at 1 B nodes that is
  // the difference between a frontier-sized round and a 16 B-row scan).
  // Same bucket law as the node table so a frontier's pt set IS its ept
  // set. Readers stay compatible with pre-bucketing graphs through the
  // stored DDL: no `ept` column → no partition filter (compaction
  // upgrades the layout).
  private def withEpt(df: DataFrame): DataFrame =
    df.withColumn("ept", pmod(xxhash64(col("src")), lit(NodeBuckets)).cast("int"))
  private val EdgeDdl =
    "`src` BIGINT,`dst` BIGINT,`cos` DOUBLE,`level` INT,`ept` INT"

  /** Dynamic-partition writes MUST cluster rows by the partition key
    * first: an unsorted write holds one open parquet writer PER
    * (level, bucket) combination per task — up to (maxLevel+1)·64
    * writers each buffering a row group, which is a measured
    * executor-killer (the first bucketed auto-build, maxLevel = 5,
    * OOMed exactly here). Hash-repartitioning on the key sends each
    * output directory to ONE task (one file per directory — no
    * small-file explosion at 64 buckets/level either) and the
    * in-task sort makes writers open one at a time. */
  private def writeClustered(df: DataFrame, keys: Seq[String], dir: String,
      mode: String = "error", sortExtra: Seq[String] = Nil): Unit =
    df.repartition(keys.map(col): _*)
      .sortWithinPartitions((keys ++ sortExtra).map(col): _*)
      .write.mode(mode).partitionBy(keys: _*).parquet(dir)
  private def writeEdges(edges: DataFrame, dir: String,
      mode: String = "error"): Unit =
    // the in-bucket sort by `src` is load-bearing, the writeAssign
    // recipe applied to edges: it gives every row group tight `src`
    // min/max stats, so beamCore's frontier-src data filter prunes
    // row groups WITHIN the surviving (level, ept) directories — the
    // search-side twin of the append fix that took the assign-scan
    // slope 1.27x -> 0.93x (r20); without it each beam round reads the
    // frontier's whole buckets, which grow with the corpus at fixed
    // bucket count (the r20 search slope was 1.45x at 3x corpus)
    writeClustered(withEpt(edges), Seq("level", "ept"), dir, mode,
      sortExtra = Seq("src"))
  private def writeNodes(nodes: DataFrame, dir: String,
      mode: String = "error"): Unit =
    writeClustered(nodes, Seq("level", "pt"), dir, mode)

  private def topPerSrc(scored: DataFrame, m: Int): DataFrame = {
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst").asc)
    scored.withColumn("__rk", row_number().over(w)).where(col("__rk") <= m)
      .select("src", "dst", "cos")
  }

  /** Brute-force top-`m` of `left` among `right` (both (nid, nv)):
    * broadcast-left NLJ, pair-deduped — duplicate node FACTS on the
    * right (a replayed append's copies) would otherwise occupy two
    * candidate ranks and crowd real neighbors out of the top-m;
    * vectors are deterministic per id, so pair-dedup is exact. */
  private def knnBrute(left: DataFrame, right: DataFrame,
      leftCount: Long, rightCount: Long, m: Int,
      candRowsPerCore: Double): DataFrame = {
    checkBruteVolume(left.sparkSession, leftCount, rightCount,
      candRowsPerCore)
    val scored =
      broadcast(left.select(col("nid").as("src"), col("nv").as("sv")))
        .join(right.select(col("nid").as("dst"), col("nv").as("dv")),
          col("src") =!= col("dst"))
        .select(col("src"), col("dst"), vec_cosine(col("sv"), col("dv")).as("cos"))
        .dropDuplicates("src", "dst")
    topPerSrc(scored, m)
  }

  /** Prune the persisted assignment table to a probe frame's lists, at
    * TWO granularities. Always: the probed lists' `lb` hash-bucket
    * directories fall out at plan time (a STATIC partition filter — a
    * small batch reads a handful of directories of the corpus-sized
    * table). Additionally, when the batch probes at most
    * [[ListPushLimit]] distinct lists, the list ids themselves are
    * pushed as a `list` DATA filter: [[writeAssign]] sorts rows by
    * `list` within each bucket directory, so parquet row-group min/max
    * stats prune WITHIN the surviving buckets — the fix for the
    * wide-batch case where the probes touch all [[ListBuckets]]
    * directories and the `lb` filter alone degrades to a full
    * assign-table read. Past the limit (a corpus-sized "batch") the id
    * list would be the collect bottleneck itself, so fall back to a
    * `list` RANGE push: rows are list-sorted within each bucket
    * directory, so `list BETWEEN min AND max` of the probed lists
    * still prunes row groups even when the exact id set is too big to
    * ship. The range is global, not per-bucket, deliberately: with
    * `lb = list mod ListBuckets` every bucket holds an interleaved
    * arithmetic progression of the list space, so per-bucket (min,
    * max) collapse to the global pair anyway — and a per-bucket
    * OR-of-(lb AND list) predicate would mix partition and data
    * columns in one disjunction, which defeats BOTH the static `lb`
    * partition prune and the parquet pushdown. Collects: one bounded
    * id collect (≤ ListPushLimit+1 ints) on the push path; that plus
    * one ≤ [[ListBuckets]]-row (lb, min, max) aggregate collect on the
    * fallback path. */
  private[graft] val ListPushLimit = 4096

  /** Cap on the frontier-id `src` data-filter push in [[beamCore]]'s
    * edge scans — the edge-table twin of [[ListPushLimit]], sized for
    * its own collect: the frontier is ≤ |Q|·(ef+1) rows BY
    * CONSTRUCTION (each round's topEf re-prunes it), already
    * checkpointed, so collecting its (nid, ept) pairs is reading back
    * driver-bounded state, not a corpus scan — 32k pairs ≈ 0.5 MB.
    * A 200-query ef=32 batch is ~6.6k ids; batches past the cap fall
    * back to the `ept` partition filter alone (the documented
    * whole-bucket read). */
  private[graft] val SrcPushLimit = 32768
  private[graft] def pruneAssignForProbe(assigned: DataFrame,
      probed: DataFrame): DataFrame = {
    val lists = probed.select(col("list").cast("int").as("list"))
      .distinct().limit(ListPushLimit + 1).collect().map(_.getInt(0))
    if (lists.length <= ListPushLimit) {
      val lbs = lists.map(l => math.floorMod(l, ListBuckets)).distinct
      assigned.where(col("lb").isin(lbs.map(Int.box): _*) &&
        col("list").isin(lists.map(Int.box): _*))
    } else {
      val byBucket = probed
        .select(col("list").cast("int").as("list"),
          pmod(col("list").cast("long"), lit(ListBuckets)).cast("int").as("lb"))
        .groupBy(col("lb"))
        .agg(min(col("list")).as("mn"), max(col("list")).as("mx"))
        .collect()
      val lbs = byBucket.map(_.getInt(0))
      val gMin = byBucket.map(_.getInt(1)).min
      val gMax = byBucket.map(_.getInt(2)).max
      assigned.where(col("lb").isin(lbs.map(Int.box): _*) &&
        col("list") >= gMin && col("list") <= gMax)
    }
  }

  /** IVF-probed top-`m` of `left` among an ASSIGNMENT table
    * (nid, cv, list[, lb]) — exact when nProbe = nlist, the documented
    * approximation otherwise. With `pruneBuckets` (the append path,
    * where `left` is a batch and `assigned` a persisted table) the
    * batch's probe pairs are materialized once and the assign scan is
    * pruned by [[pruneAssignForProbe]] — the `lb` partition filter
    * plus, for batches probing ≤ ListPushLimit lists, a `list`
    * row-group filter, the beamCore discipline applied to
    * construction. Duplicate assign facts (replayed appends) are
    * absorbed by the pair dedup. */
  private def knnProbed(left: DataFrame, assigned: DataFrame,
      cents: Array[Array[Float]], nProbe: Int, m: Int,
      pruneBuckets: Boolean): DataFrame = {
    val probed0 = Ann.probeAssignmentsBcast(Ann.IvfIndex(cents, assigned),
      left.select(col("nid").as("vec_id"), col("nv").as("embedding")), nProbe)
    // only checkpoint BATCH-sized probe sides: a build's probe side is
    // the whole layer and is consumed once anyway
    val probed = if (pruneBuckets) probed0.localCheckpoint() else probed0
    val sliced =
      if (!pruneBuckets) assigned
      else pruneAssignForProbe(assigned, probed)
    val scored = probed.join(sliced, Seq("list"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid").as("src"), col("nid").as("dst"),
        vec_cosine(col("qv"), col("cv")).as("cos"))
      .dropDuplicates("src", "dst")
    topPerSrc(scored, m)
  }

  // ---- per-level codebook persistence: the frozen-centroid append ----

  private def centsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("list",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("vec",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false),
      nullable = false)))

  private def writeCents(spark: org.apache.spark.sql.SparkSession,
      dir: String, cents: Array[Array[Float]]): Unit = {
    val rows = cents.zipWithIndex.map { case (v, i) =>
      org.apache.spark.sql.Row(i, v.toSeq) }
    spark.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toSeq).asJava,
        centsSchema)
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  private def readCents(spark: org.apache.spark.sql.SparkSession,
      dir: String): Option[Array[Array[Float]]] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(spark.read.schema(centsSchema).parquet(dir).collect()
      .sortBy(_.getInt(0)).map(_.getSeq[Float](1).toArray))
  }

  // ---- persisted per-level assignments: appends never re-assign ------
  // The layer's (nid, vector, list) assignment is a pure function of
  // (vector, frozen codebook), so it persists WITH the graph: an append
  // assigns only its BATCH and appends the rows as facts, and candidate
  // generation probes the stored table through an `lb` partition filter
  // instead of re-assigning the corpus per batch (the pre-r19 shape paid
  // two corpus-wide map passes per append; now only the layer's FIRST
  // IVF pass — at build, or the bootstrap when a brute-built layer
  // crosses bruteMax — ever touches every row).
  private val ListBuckets = 64
  private val AssignDdl = "`nid` BIGINT,`cv` ARRAY<FLOAT>,`list` INT,`lb` INT"

  private def writeAssign(assigned: DataFrame, dir: String,
      mode: String = "error"): Unit =
    // the in-bucket sort by `list` is load-bearing: it gives every row
    // group tight `list` min/max stats, so [[pruneAssignForProbe]]'s
    // `list` data filter prunes WITHIN the lb directories (the
    // wide-batch append's I/O bound) instead of only across them
    writeClustered(
      assigned.select(col("nid").cast("long").as("nid"), col("cv"),
          col("list").cast("int").as("list"))
        .withColumn("lb",
          pmod(col("list").cast("long"), lit(ListBuckets)).cast("int")),
      Seq("lb"), dir, mode, sortExtra = Seq("list"))

  private def readAssign(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    spark.read.schema(
        org.apache.spark.sql.types.StructType.fromDDL(AssignDdl))
      .parquet(dir)

  private def hasDir(spark: org.apache.spark.sql.SparkSession,
      dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def writeSidecars(spark: org.apache.spark.sql.SparkSession,
      ver: org.apache.hadoop.fs.Path, nodesDdl: String, edgesDdl: String,
      m: Int, maxLevel: Int): Unit = {
    graft.util.FsIO.writeStringAtomic(spark,
      new org.apache.hadoop.fs.Path(ver, "_schema_nodes.ddl"), nodesDdl)
    graft.util.FsIO.writeStringAtomic(spark,
      new org.apache.hadoop.fs.Path(ver, "_schema_edges.ddl"), edgesDdl)
    graft.util.FsIO.writeStringAtomic(spark,
      new org.apache.hadoop.fs.Path(ver, "_nav_params.json"),
      s"""{"m":$m,"maxLevel":$maxLevel,"appends":0}""")
  }

  /** Structural parse of the flat integer-valued sidecar — split on the
    * JSON object's own delimiters rather than regex-scanning for a key
    * substring (a regex would silently mis-read a later key whose name
    * overlaps an earlier one). Malformed content throws with the
    * offending text in the message. */
  private def parseFlatIntJson(dataDir: String, json: String): Map[String, Long] = {
    val body = json.trim
    if (!body.startsWith("{") || !body.endsWith("}"))
      throw new java.io.IOException(
        s"nav graph sidecar at $dataDir is not a JSON object: $json")
    body.substring(1, body.length - 1).split(",").iterator
      .map(_.trim).filter(_.nonEmpty).map { kv =>
        kv.split(":", 2) match {
          case Array(k, v) if k.trim.startsWith("\"") && k.trim.endsWith("\"") =>
            try k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toLong
            catch { case _: NumberFormatException =>
              throw new java.io.IOException(
                s"nav graph sidecar at $dataDir has a non-integer value: $kv") }
          case _ => throw new java.io.IOException(
            s"nav graph sidecar at $dataDir has a malformed entry: $kv")
        }
      }.toMap
  }

  private def navParamsAll(spark: org.apache.spark.sql.SparkSession,
      dataDir: String): Map[String, Long] = {
    val json = graft.util.FsIO.readString(spark,
        new org.apache.hadoop.fs.Path(dataDir, "_nav_params.json"))
      .getOrElse(throw new java.io.IOException(
        s"nav graph at $dataDir has no readable _nav_params.json sidecar"))
    val kv = parseFlatIntJson(dataDir, json)
    Seq("m", "maxLevel").foreach(k => if (!kv.contains(k))
      throw new java.io.IOException(
        s"nav graph sidecar at $dataDir lacks $k: $json"))
    kv
  }

  private def navParams(spark: org.apache.spark.sql.SparkSession,
      dataDir: String): (Int, Int) = {
    val kv = navParamsAll(spark, dataDir)
    (kv("m").toInt, kv("maxLevel").toInt)
  }

  /** Bump the version's append counter (the compaction-cadence state;
    * pre-counter sidecars read as 0) and return the new count. Atomic
    * rename write, same as every sidecar. Re-serializes the FULL parsed
    * key-value map, not a fixed key template — a newer writer version
    * may have added sidecar keys this version doesn't know, and a bump
    * that dropped them would silently strip state in a mixed-version
    * deployment. */
  private def bumpAppendCount(spark: org.apache.spark.sql.SparkSession,
      dataDir: String): Long = {
    val kv = navParamsAll(spark, dataDir)
    val n = kv.getOrElse("appends", 0L) + 1L
    val body = kv.updated("appends", n).toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    graft.util.FsIO.writeStringAtomic(spark,
      new org.apache.hadoop.fs.Path(dataDir, "_nav_params.json"), body)
    n
  }

  private def readTable(spark: org.apache.spark.sql.SparkSession,
      dataDir: String, name: String): DataFrame = {
    val ddl = graft.util.FsIO.readString(spark,
        new org.apache.hadoop.fs.Path(dataDir, s"_schema_$name.ddl"))
      .getOrElse(throw new java.io.IOException(
        s"nav graph at $dataDir has no readable _schema_$name.ddl sidecar"))
    spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
      .parquet(s"$dataDir/$name")
  }

  /** Node reads keep the MAX level per id: node rows are facts, and a
    * bootstrap-promoted id legitimately carries TWO level facts once a
    * replayed append re-derives its law level — an arbitrary
    * (partition-dependent) pick could drop the graph's only entry-layer
    * node and blank every search. Max-level wins because layer
    * membership is cumulative (level L means member of layers 0..L), so
    * the higher fact strictly contains the lower one. */
  private def dedupNodesMaxLevel(nodes: DataFrame): DataFrame = {
    val w = Window.partitionBy("nid").orderBy(col("level").desc)
    nodes.withColumn("__rk", row_number().over(w)).where(col("__rk") === 1)
      .drop("__rk")
  }

  /** Build and publish the layered graph for `corpus` (vec_id,
    * embedding) under `path`'s versioned root. Per layer L the members
    * are the nodes with level >= L and the edges are each member's
    * top-`m` cosine neighbors among the layer — layer sizes shrink 4x
    * per level, so the level-0 pass dominates and the build costs one
    * IVF knn-graph.
    *
    * SIZING IS AUTOMATIC at the `-1` defaults: `maxLevel` derives from
    * the corpus count (ceil(log4(n / 256)) — the entry scan stays at
    * ~256 rows at any scale) and `nlist` from each layer's row count
    * (max(16, rows / 400) — inverted lists stay ~400 rows, so the
    * level-0 candidate join is ~1600 · n scored rows, linear). Explicit
    * values are honored verbatim for exactness fixtures (nProbe =
    * nlist), but every IVF-probed pass pre-checks the estimated join
    * volume and fails loudly with the law instead of OOMing
    * mid-shuffle. Auto-`maxLevel` costs one extra map-only corpus
    * count. */
  def buildNavGraph(corpus: DataFrame, path: String, m: Int = 16,
      maxLevel: Int = -1, nlist: Int = -1, nProbe: Int = 4, iters: Int = 5,
      seed: Long = 42L, bruteMax: Long = 4096L, keepVersions: Int = 1,
      candRowsPerCore: Double = -1): Unit = {
    val spark = corpus.sparkSession
    require(m >= 1 && (maxLevel >= 0 || maxLevel == -1) && bruteMax >= 1,
      s"need m >= 1, maxLevel >= 0 or -1 (auto), bruteMax >= 1 (got $m, $maxLevel, $bruteMax)")
    require(nlist > 0 || nlist == -1,
      s"nlist must be positive or -1 (auto, the rows/400 law); got $nlist")
    val lvl = if (maxLevel >= 0) maxLevel else autoMaxLevel(corpus.count())
    // ids are normalized to BIGINT: the edge sidecar schema, the pt
    // hash (xxhash64 is type-width-sensitive), and the search's
    // entry/candidate joins all assume one id width
    val leveled = corpus
      .select(col("vec_id").cast("long").as("nid"), col("embedding").as("nv"))
      .withColumn("level", levelOf(col("nid"), lvl))
    val ver = graft.util.FsIO.nextVersionDir(spark, path)
    writeNodes(withPt(leveled), s"$ver/nodes")
    val nodeSchema = withPt(leveled).schema
    def nodesNow() = spark.read.schema(nodeSchema).parquet(s"$ver/nodes")
    // BOOTSTRAP PROMOTION: the search enters through level == maxLevel,
    // and the valuation law can leave that layer EMPTY (hash-valued ids
    // miss it with probability (1 - 4^-maxLevel)^n; dense ids 1..63
    // have no multiple of 64) — promote the minimum id deterministically
    // so every built graph is searchable. Decided from the WRITTEN node
    // table (a nondeterministic corpus — sample/limit — could otherwise
    // promote an id absent from the rows actually written) and stored
    // as an EXTRA node fact at the top level; every node read keeps the
    // max level per id, so the duplicate is the normal fact shape.
    // Appends re-derive law levels only; the promotion travels as the
    // stored fact.
    val topCnt = nodesNow().where(col("level") === lvl).count()
    if (topCnt == 0L) {
      val mnRow = nodesNow().orderBy("nid").limit(1).collect()
      if (mnRow.nonEmpty) {
        val r = mnRow(0)
        writeNodes(withPt(spark.createDataFrame(
            java.util.Arrays.asList(org.apache.spark.sql.Row(
              r.getLong(0), r.getSeq[Float](1), lvl)),
            org.apache.spark.sql.types.StructType(nodeSchema.take(3)))),
          s"$ver/nodes", mode = "append")
      }
    }
    // edge passes re-read the just-written nodes: no corpus-sized
    // checkpoint, one scan per layer; dedupe by id because a promoted
    // id carries two level facts
    val nodesR = nodesNow()
    val edges = (0 to lvl).flatMap { l =>
      val sub = nodesR.where(col("level") >= l).select("nid", "nv")
        .dropDuplicates("nid")
      val cnt = sub.count()
      if (cnt < 2L) None
      else {
        val e =
          if (cnt <= bruteMax) knnBrute(sub, sub, cnt, cnt, m, candRowsPerCore)
          else {
            val nl = if (nlist > 0) nlist else autoNlist(cnt)
            checkCandidateVolume(spark, cnt, cnt, nl, nProbe,
              frozen = false, candRowsPerCore)
            val subCorpus = sub.select(col("nid").as("vec_id"),
              col("nv").as("embedding"))
            val cents = Ann.trainCentroids(subCorpus, nl, iters, seed = seed)
            // persist the layer's codebook AND its assignments so
            // appends reuse both FROZEN (the IVF-family append
            // contract: no per-batch retraining, no per-batch corpus
            // re-assignment)
            writeCents(spark, s"$ver/cents_l$l", cents)
            writeAssign(Ann.assignToCentroids(cents, subCorpus).assigned,
              s"$ver/assign_l$l")
            knnProbed(sub, readAssign(spark, s"$ver/assign_l$l"), cents,
              nProbe, m, pruneBuckets = false)
          }
        Some(e.withColumn("level", lit(l)))
      }
    }.reduceLeftOption(_ unionByName _)
      // 0/1-row corpora have no pairs on any layer: still publish an
      // EMPTY edge table (readers need the directory + schema), never
      // throw after the nodes were written
      .getOrElse(spark.range(0).selectExpr("id AS src", "id AS dst",
        "CAST(0.0 AS DOUBLE) AS cos", "CAST(0 AS INT) AS level"))
    writeEdges(edges, s"$ver/edges")
    writeSidecars(spark, ver, nodeSchema.toDDL, EdgeDdl, m, lvl)
    graft.util.FsIO.publishVersion(spark, path, ver, keepVersions)
  }

  /** Link a batch into the persisted graph WITHOUT a rebuild: levels
    * from the same deterministic law, per touched layer the new nodes'
    * top-`m` neighbors among (existing ∪ batch), appended as forward
    * edges PLUS back-edges (neighbor → new) so the batch is reachable
    * from the existing graph — neighbor lists exceed `m` until
    * [[compactNavGraph]] re-prunes them, exactly HNSW's
    * insert-then-shrink, amortized to the compaction cadence.
    *
    * `nlist` follows the same -1-auto law as the build (sized to each
    * layer's (existing ∪ batch) row count) and is only consulted for a
    * layer that has NO frozen codebook yet.
    *
    * FROZEN codebooks: a layer whose candidate join needs IVF probing
    * reuses the codebook persisted at build time (`cents_l<L>`) — no
    * per-append retraining, and the candidate sets are a pure function
    * of (vectors, stored codebook), the same frozen-centroid argument
    * as [[Ann.appendToIvfIndex]]. A layer built on the brute path that
    * only later outgrows `bruteMax` trains once here and persists for
    * subsequent appends. As with IVF: if appended vectors drift from
    * the trained distribution, probe recall decays — watch
    * [[navRecallFrame]] and rebuild when it sags.
    *
    * Retry-safe the facts way: a replayed append duplicates node and
    * edge rows that every read distincts (node facts level-aware — a
    * replayed law-level row never demotes a bootstrap promotion).
    * Post-append pointer check makes a racing compaction loud. A
    * CRASHED-and-abandoned append is also bounded: the assign delta is
    * written before the node/edge writes (candidate generation must see
    * the batch's own rows), so a crash in between leaves GHOST
    * (nid, cv, list) facts for ids absent from the node table. Ghosts
    * can win candidate top-m slots in later appends (their edges then
    * point at ids the search's node join drops — wasted list slots, a
    * bounded recall tax, never wrong results), and [[compactNavGraph]]
    * folds them away: it semi-joins the assign table and both edge
    * endpoints against the stored node ids, so the degradation lasts at
    * most one compaction window, like every other replay artifact.
    *
    * COST SHAPE: batch-cost, full stop. Candidate generation probes
    * the PERSISTED per-level assignment table (`assign_l<L>`, written
    * at build and appended per batch — assignment is a pure function
    * of (vector, frozen codebook), so stored rows are exact): the
    * batch's probe pairs prune the table to their probed lists' hash
    * buckets at plan time AND, for batches probing ≤ 4096 distinct
    * lists, to the probed lists' row groups within those buckets (rows
    * are list-sorted per bucket, so parquet min/max stats bite) — an
    * append reads probed lists, never the layer, even when a wide
    * batch's buckets cover all 64 directories. The only corpus-sized
    * pass a layer EVER pays is its first
    * IVF assignment (at build, or the bootstrap when a brute-built
    * layer crosses bruteMax — once, persisted). Nothing corpus-sized
    * shuffles: the brute/bootstrap (existing ∪ batch) frame is a
    * map-only anti-join of the layer against the BROADCAST batch ids,
    * and the layer row counts used for sizing come from one
    * map-side-combined groupBy over the partition column, never from
    * counting a shuffled union. (Fact duplicates from earlier replays
    * inflate the sizing estimates slightly — harmless: they feed only
    * the nlist law, the volume pre-check and the brute-vs-IVF
    * routing.)
    *
    * CADENCE IS MANAGED, not a footgun (the cluster snapshot's
    * `autoCompactAfter` contract): each append bumps a counter in the
    * params sidecar and, once it reaches `autoCompactAfter`, runs
    * [[compactNavGraph]] itself right after the append — safe under the
    * single-writer rule (the append IS the writer), and readers survive
    * because the self-compaction publishes with
    * `max(keepVersions, 2)` — the PRIOR version a concurrent reader may
    * be mid-scan of always outlives the flip (a bare keepVersions = 1
    * would delete it under the reader). Without the cadence, an
    * append-heavy corpus accumulates
    * over-length neighbor lists (wider beam joins) and duplicate facts
    * until someone remembers to compact. Pass `autoCompactAfter <= 0`
    * to disable and own the cadence. */
  def appendToNavGraph(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, nlist: Int = -1, nProbe: Int = 4,
      iters: Int = 5, seed: Long = 42L, bruteMax: Long = 4096L,
      autoCompactAfter: Int = 16, keepVersions: Int = 1,
      candRowsPerCore: Double = -1): Unit = {
    require(nlist > 0 || nlist == -1,
      s"nlist must be positive or -1 (auto, the rows/400 law); got $nlist")
    val dataDir = graft.util.FsIO.indexDataDir(spark, path)
    val (m, maxLevel) = navParams(spark, dataDir)
    val nodes = readTable(spark, dataDir, "nodes")
    val lawLeveled = withPt(batch
      .select(col("vec_id").cast("long").as("nid"), col("embedding").as("nv"))
      .withColumn("level", levelOf(col("nid"), maxLevel)))
      .localCheckpoint() // batch-sized
    // top-layer repair mirrors the build's bootstrap promotion: if the
    // stored graph has NO entry row (built empty, appended into ever
    // since), promote the batch's minimum id so the graph becomes
    // searchable — the top-level check is a partition-pruned scan of
    // the n/4^maxLevel entry rows only
    val topCnt = nodes.where(col("level") === maxLevel).count()
    val newNodes =
      if (topCnt > 0L || lawLeveled.isEmpty) lawLeveled
      else {
        val mn = lawLeveled.agg(min(col("nid"))).collect()(0).getLong(0)
        lawLeveled.withColumn("level",
          when(col("nid") === mn, lit(maxLevel)).otherwise(col("level")))
          .localCheckpoint()
      }
    // per-level batch occupancy from ONE batch-sized aggregation —
    // level L's membership is levels >= L, so cumulative sums replace
    // maxLevel+1 per-level isEmpty jobs
    val lvlCounts = newNodes.groupBy("level").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // existing per-level FACT counts from one map-side-combined pass over
    // the partition column (the sizing input; never a corpus shuffle)
    val oldLvlCounts = nodes.groupBy("level").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val perLevel = (0 to maxLevel).flatMap { l =>
      val newSub = newNodes.where(col("level") >= l).select("nid", "nv")
      val newSubCnt = (l to maxLevel).map(lvlCounts.getOrElse(_, 0L)).sum
      if (newSubCnt == 0L) None
      else {
        val oldSub = nodes.where(col("level") >= l).select("nid", "nv")
        // (existing ∪ batch) as a MAP-ONLY frame: a replayed append
        // finds its own batch already in the node table, so the
        // existing copies of the batch's ids are dropped with an
        // anti-join against the broadcast (batch-sized) id list, never
        // by hash-shuffling the whole layer through a dropDuplicates
        // (at 10 B rows that shuffle IS the append's cost). Exact
        // because vectors are deterministic per id; fact duplicates
        // WITHIN the old layer survive, and the scored-pair dedup
        // keeps them off the candidate ranks. Only the brute and the
        // once-per-layer bootstrap paths ever evaluate it.
        def union = oldSub
          .join(broadcast(newSub.select("nid")), Seq("nid"), "left_anti")
          .unionByName(newSub)
        def unionCorpus = union.select(col("nid").as("vec_id"),
          col("nv").as("embedding"))
        // sizing ESTIMATE from the count maps (old + new overestimates
        // replayed overlap — fine for the nlist law / volume pre-check)
        val unionCnt =
          (l to maxLevel).map(oldLvlCounts.getOrElse(_, 0L)).sum + newSubCnt
        val fwd =
          if (unionCnt <= bruteMax)
            knnBrute(newSub, union, newSubCnt, unionCnt, m, candRowsPerCore)
          else {
            val frozen = readCents(spark, s"$dataDir/cents_l$l")
            // a frozen codebook defines the REAL list count regardless
            // of the nlist argument; probe side = the BATCH's rows at
            // this level, so the volume pre-check sees the append's
            // real (batch x occupancy) cost, not a corpus² phantom
            val nl = frozen.map(_.length).getOrElse(
              if (nlist > 0) nlist else autoNlist(unionCnt))
            checkCandidateVolume(spark, newSubCnt, unionCnt, nl, nProbe,
              frozen.isDefined, candRowsPerCore)
            // a layer that first crosses bruteMax HERE trains once over
            // the union and persists the codebook, so later appends
            // probe frozen too
            val cents = frozen.getOrElse(
              Ann.trainCentroids(unionCorpus, nl, iters, seed = seed))
            if (frozen.isEmpty)
              writeCents(spark, s"$dataDir/cents_l$l", cents)
            val aDir = s"$dataDir/assign_l$l"
            if (!hasDir(spark, aDir))
              // bootstrap (brute-built or pre-assignment-table layer):
              // the LAST corpus-sized assignment this layer ever pays
              writeAssign(Ann.assignToCentroids(cents, unionCorpus).assigned,
                aDir)
            else
              // batch-cost: assign ONLY the batch and append the rows
              // as facts (a replay duplicates rows the scored-pair
              // dedup absorbs; compaction folds them)
              writeAssign(Ann.assignToCentroids(cents,
                  newSub.select(col("nid").as("vec_id"),
                    col("nv").as("embedding"))).assigned,
                aDir, mode = "append")
            knnProbed(newSub, readAssign(spark, aDir), cents, nProbe, m,
              pruneBuckets = true)
          }
        val rev = fwd.select(col("dst").as("src"), col("src").as("dst"), col("cos"))
        Some(fwd.unionByName(rev).dropDuplicates("src", "dst")
          .withColumn("level", lit(l)))
      }
    }
    // write in the layout the stored DDL declares: (level, ept) for
    // bucketed graphs, legacy (level) for pre-bucketing ones (compaction
    // upgrades those)
    val bucketed = graft.util.FsIO.readString(spark,
        new org.apache.hadoop.fs.Path(dataDir, "_schema_edges.ddl"))
      .exists(_.contains("`ept`"))
    if (perLevel.nonEmpty) {
      val all = perLevel.reduceLeft(_ unionByName _)
      if (bucketed) writeEdges(all, s"$dataDir/edges", mode = "append")
      else
        all.write.mode("append").partitionBy("level").parquet(s"$dataDir/edges")
    }
    writeNodes(newNodes, s"$dataDir/nodes", mode = "append")
    graft.util.FsIO.assertStillCurrent(spark, path, dataDir)
    val nAppends = bumpAppendCount(spark, dataDir)
    // the self-compaction retains AT LEAST two versions regardless of
    // the append's own keepVersions: publishVersion deletes pruned
    // version dirs, so a concurrent reader mid-scan of the current
    // version would fail right after the cadence fires if only the new
    // version survived — the scaladoc's readers-survive promise is a
    // promise about THIS path, so this path must fund it
    if (autoCompactAfter > 0 && nAppends >= autoCompactAfter)
      compactNavGraph(spark, path, math.max(keepVersions, 2))
  }

  /** Fold appends away: distinct the fact rows (nodes level-aware —
    * max level per id, so a bootstrap promotion survives replayed
    * law-level rows), fold ORPHANS (edge endpoints and assign rows
    * whose id never made it into the node table — the residue of a
    * crashed-and-abandoned append, which writes assign facts before
    * node facts), re-prune every node's list to its top-`m`
    * (cos desc, dst asc — HNSW's shrink), rewrite into the next
    * version, flip the pointer. Search-visible results are unchanged
    * wherever the pruned lists still cover the searched neighborhoods
    * (the q238 contract pins the fixture's case). Cost: the orphan
    * fold is three id semi-joins against the raw node-id column
    * (duplicates don't matter to a semi-join, so no pre-dedup) — the
    * same keyed-shuffle cost class as the fact dedup this pass already
    * pays, and it runs BEFORE the top-m window so a ghost endpoint
    * can never crowd a real neighbor out of a compacted list. */
  def compactNavGraph(spark: org.apache.spark.sql.SparkSession,
      path: String, keepVersions: Int = 1): Unit = {
    val dataDir = graft.util.FsIO.indexDataDir(spark, path)
    val (m, maxLevel) = navParams(spark, dataDir)
    val rawNodes = readTable(spark, dataDir, "nodes")
    val nodeIds = rawNodes.select("nid")
    val nodes = dedupNodesMaxLevel(rawNodes)
    // ghost fold BEFORE the fact dedup: a semi-join is indifferent to
    // duplicates, so filtering orphan endpoints first means ghost edges
    // never enter the dedup's (level, src, dst)-keyed shuffle at all —
    // strictly less I/O for the same result (r21, the r20 verdict's
    // reorder note)
    val edges = readTable(spark, dataDir, "edges")
      .join(nodeIds.withColumnRenamed("nid", "src"), Seq("src"), "left_semi")
      .join(nodeIds.withColumnRenamed("nid", "dst"), Seq("dst"), "left_semi")
      .dropDuplicates("level", "src", "dst")
    val w = Window.partitionBy("level", "src")
      .orderBy(col("cos").desc, col("dst").asc)
    val pruned = edges.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= m).select("src", "dst", "cos", "level")
    val ver = graft.util.FsIO.nextVersionDir(spark, path)
    writeNodes(nodes, s"$ver/nodes")
    // always writes the (level, ept)-bucketed layout — compaction is the
    // upgrade path for pre-bucketing graphs
    writeEdges(pruned, s"$ver/edges")
    // the frozen codebooks carry over unchanged — they are the append
    // contract, not derived state — and the assignment tables carry
    // over FACT-DEDUPED (replayed appends leave duplicate rows; any
    // copy per id is correct — assignment is a pure function of
    // (vector, frozen codebook)) and ORPHAN-FOLDED (ghost rows from
    // abandoned appends would otherwise win candidate slots forever)
    for (l <- 0 to maxLevel; c <- readCents(spark, s"$dataDir/cents_l$l"))
      writeCents(spark, s"$ver/cents_l$l", c)
    for (l <- 0 to maxLevel if hasDir(spark, s"$dataDir/assign_l$l"))
      writeAssign(readAssign(spark, s"$dataDir/assign_l$l")
        .dropDuplicates("nid").join(nodeIds, Seq("nid"), "left_semi")
        .select("nid", "cv", "list"),
        s"$ver/assign_l$l")
    writeSidecars(spark, ver, nodes.schema.toDDL, EdgeDdl, m, maxLevel)
    graft.util.FsIO.publishVersion(spark, path, ver, keepVersions)
  }

  /** Beam search the persisted graph: top-`k` (qid, nid, rnk) per query
    * by exact cosine over the visited set. With `selfExclude` (the
    * default) corpus rows whose nid equals the query's qid are excluded
    * (the self-match convention shared with [[Ann.bruteForceTopK]]) —
    * so query ids must either BE corpus ids (the dedup/co-member reads)
    * or come from an id space disjoint from the corpus's; pass
    * `selfExclude = false` for an external query-id space that may
    * collide with corpus ids, where the collision would otherwise
    * silently drop one legitimate neighbor. One beam slot beyond `ef`
    * is reserved for the self-match when excluding, so ef = k is safe
    * for corpus-member queries. `ef` is the per-query beam width
    * (recall knob, >= k), `rounds` the layer-0 expansion count —
    * each round reaches one more hop, so `rounds` >= the expected hop
    * distance from an entry's neighborhood to the true neighbors
    * (2 covers near-duplicate workloads where true neighbors are
    * mutually linked; raise it for sparse manifolds, it only adds
    * bounded map-only rounds). Every round touches the edge table
    * through its layer partition and the node table through a
    * candidate-id semi-join: map-only scans, frontier-sized shuffles,
    * nothing history-sized ever shuffles.
    *
    * Best-of-visited law: each round keeps the top-`ef` of
    * (frontier ∪ new candidates), so by induction the final frontier
    * contains the true top-`ef` of EVERYTHING ever visited — with
    * ef >= k, the returned top-`k` is exactly HNSW's
    * best-of-all-visited result, no separate visited accumulator
    * needed. */
  def navSearch(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, ef: Int = 32, rounds: Int = 2,
      selfExclude: Boolean = true): DataFrame =
    beamCore(spark, path, queries, k, ef, rounds, selfExclude, None)

  /** [[navSearch]] under a PRE-filter: top-`k` per query among the
    * `allowed` ids only (the [[Ann.ivfSearchWhere]] semantics — a
    * post-filtered unfiltered top-k would return fewer than k rows on
    * selective predicates). The beam TRAVERSES the full graph — a
    * frontier restricted to allowed nodes could disconnect from allowed
    * regions reachable only through disallowed ones — while a parallel
    * accumulator keeps the best `ef` ALLOWED rows ever visited per
    * query (the allow-set touches candidates through an id semi-join,
    * ids only, no vectors). The returned top-k is therefore exactly the
    * best allowed rows of the unfiltered search's visited set: filtered
    * recall can never fall below unfiltered recall on the same
    * neighborhoods. Raise `ef`/`rounds` when the allow-set is sparse —
    * the beam must route through disallowed regions to reach distant
    * allowed ones. */
  def navSearchWhere(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, allowed: DataFrame,
      allowedIdCol: String = "vec_id", ef: Int = 32, rounds: Int = 2,
      selfExclude: Boolean = true): DataFrame = {
    // no distinct(): LEFT SEMI is set-semantied on the probe side
    // already (the ivfSearchWhere argument). localCheckpoint ONCE —
    // the beam touches the allow-set every round, and re-evaluating an
    // arbitrary caller plan (often a filter over a wide cached corpus,
    // whose size estimate blocks the broadcast) per round measured 7x
    // the unfiltered search in ScaleSmoke; the materialized ids-only
    // frame joins at its real (small) size instead
    val allowIds = allowed.select(col(allowedIdCol).cast("long").as("nid"))
      .localCheckpoint()
    beamCore(spark, path, queries, k, ef, rounds, selfExclude, Some(allowIds))
  }

  /** Prune one beam round's edge scan to the frontier, at TWO
    * granularities (the [[pruneAssignForProbe]] recipe on the search
    * path, r21). Always (bucketed graphs): the frontier's `ept` hash
    * buckets fall out as a STATIC partition filter. Additionally, for
    * frontiers within [[SrcPushLimit]] ids — every sane |Q|·beam, the
    * frontier is ≤ |Q|·(ef+1) rows by construction — the frontier's
    * node ids are pushed as a `src` DATA filter: [[writeEdges]] sorts
    * rows by `src` within each (level, ept) directory, so parquet
    * row-group min/max stats prune WITHIN the surviving buckets
    * instead of scanning them whole (whole-bucket reads grow with the
    * corpus at fixed bucket count — the r20 1.45× search slope at 3×
    * corpus). ONE bounded collect serves both granularities; past the
    * cap the second collect's bucket-only filter is the documented
    * fallback. Pre-bucketing graphs scan the level partition whole
    * until compaction upgrades the layout. */
  private[graft] def pruneEdgesForFrontier(base: DataFrame,
      frontier: DataFrame, bucketed: Boolean): DataFrame = {
    if (!bucketed) base
    else {
      val pairs = frontier.select(col("nid"),
          pmod(xxhash64(col("nid")), lit(NodeBuckets)).cast("int").as("ept"))
        .distinct().limit(SrcPushLimit + 1).collect()
      if (pairs.length <= SrcPushLimit) {
        val epts = pairs.map(_.getInt(1)).distinct
        val srcs = pairs.map(_.getLong(0))
        base.where(col("ept").isin(epts.map(Int.box): _*) &&
          col("src").isin(srcs.map(Long.box): _*))
      } else {
        val epts = frontier.select(pmod(xxhash64(col("nid")),
            lit(NodeBuckets)).cast("int").as("ept"))
          .distinct().collect().map(_.getInt(0))
        base.where(col("ept").isin(epts.map(Int.box): _*))
      }
    }
  }

  private def beamCore(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, ef: Int, rounds: Int,
      selfExclude: Boolean, allow: Option[DataFrame]): DataFrame = {
    require(k >= 1 && ef >= k && rounds >= 1,
      s"need 1 <= k <= ef and rounds >= 1 (got k=$k ef=$ef rounds=$rounds)")
    val dataDir = graft.util.FsIO.indexDataDir(spark, path)
    val (_, maxLevel) = navParams(spark, dataDir)
    val nodes = readTable(spark, dataDir, "nodes")
    val edges = readTable(spark, dataDir, "edges")
    val q = broadcast(queries
      .select(col("vec_id").cast("long").as("qid"), col("embedding").as("qv")))
    // one beam slot is RESERVED beyond ef when self-excluding: a
    // corpus-member query's own node (cos = 1.0) always wins a slot and
    // is excluded only in the final top-k, so without the reserve
    // ef == k would silently return k-1 rows; keeping self IN the beam
    // is deliberate — its edge list is the best frontier seed for its
    // own neighborhood
    val beam = if (selfExclude) ef + 1 else ef
    def topEf(df: DataFrame): DataFrame = {
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
      df.withColumn("__rk", row_number().over(w)).where(col("__rk") <= beam)
        .select("qid", "qv", "nid", "cos")
    }
    def keepAllowed(scored: DataFrame): DataFrame =
      allow.map(ids => scored.join(ids, Seq("nid"), "left_semi"))
        .getOrElse(scored)
    // entry layer: one map-only scan of the n/4^maxLevel top-level rows
    // against the broadcast query batch. dropDuplicates FIRST — node
    // rows are facts, and replayed appends leave copies that would
    // otherwise occupy beam slots (the read-side-distincts invariant)
    // filtered runs consume each round's scored frame TWICE (frontier
    // update + allowed accumulator), so materialize it once per round —
    // without this the node-slice scan and its joins re-execute per
    // consumer and the filtered search measured 7x the unfiltered one
    def onceIfFiltered(df: DataFrame): DataFrame =
      if (allow.isEmpty) df else df.localCheckpoint()
    val entryScored = onceIfFiltered(
      q.join(nodes.where(col("level") === maxLevel)
          .select("nid", "nv").dropDuplicates("nid"), lit(true))
        .select(col("qid"), col("qv"), col("nid"),
          vec_cosine(col("qv"), col("nv")).as("cos")))
    var frontier = topEf(entryScored).localCheckpoint()
    // filtered runs keep a SEPARATE best-allowed-of-visited accumulator;
    // unfiltered runs never build it (the frontier IS the accumulator)
    var acc =
      if (allow.isEmpty) frontier
      else topEf(keepAllowed(entryScored)).localCheckpoint()
    // bucketed graphs (the stored DDL carries `ept`) prune each round's
    // edge scan to the frontier — `ept` partition filter + `src`
    // row-group data filter, see [[pruneEdgesForFrontier]]; decided at
    // plan time from the checkpointed frontier. Pre-bucketing graphs
    // skip the filter until compaction upgrades them.
    val edgeBucketed = edges.columns.contains("ept")
    for (l <- maxLevel to 0 by -1; _ <- 1 to (if (l == 0) rounds else 1)) {
      val lvlEdges = pruneEdgesForFrontier(
        edges.where(col("level") === l), frontier, edgeBucketed)
      val cand = frontier.select(col("qid"), col("qv"), col("nid").as("src"))
        .join(lvlEdges.select("src", "dst"), Seq("src"))
        .select(col("qid"), col("qv"), col("dst").as("nid"))
        .dropDuplicates("qid", "nid")
        .localCheckpoint()
      // two-stage node prune: a STATIC partition filter on the
      // candidates' pt buckets (a small batch touches a handful of the
      // NodeBuckets directories — decided at plan time from the
      // checkpointed candidates, the probedPairs discipline), then the
      // id semi-join within the surviving partitions
      val pts = cand.select(pmod(xxhash64(col("nid")), lit(NodeBuckets))
          .cast("int").as("pt")).distinct().collect().map(_.getInt(0))
      val ids = cand.select("nid").distinct()
      val slice = nodes.where(col("pt").isin(pts.map(Int.box): _*))
        .select(col("nid"), col("nv"))
        .join(ids, Seq("nid"), "left_semi")
      val scored = onceIfFiltered(cand.join(slice, Seq("nid"))
        .select(col("qid"), col("qv"), col("nid"),
          vec_cosine(col("qv"), col("nv")).as("cos")))
      frontier = topEf(frontier.unionByName(scored).dropDuplicates("qid", "nid"))
        .localCheckpoint()
      if (allow.nonEmpty)
        acc = topEf(acc.unionByName(keepAllowed(scored))
          .dropDuplicates("qid", "nid")).localCheckpoint()
    }
    val outFrame = if (allow.isEmpty) frontier else acc
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    (if (selfExclude) outFrame.where(col("qid") =!= col("nid")) else outFrame)
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("qid", "nid", "rnk")
  }

  /** Measured recall vs exact brute force on a query sample — the
    * ivfRecallFrame / lshRecallFrame pattern for tuning (m, ef,
    * rounds): one row (n_true, n_found, recall). Run it on a sample
    * whenever the corpus drifts; rebuild or raise ef when it sags.
    * (The by-id node dedupe here can keep EITHER level fact of a
    * promoted id — vectors are deterministic per id, so the corpus it
    * reconstructs is identical either way.) */
  def navRecallFrame(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, ef: Int = 32, rounds: Int = 2): DataFrame = {
    val found = navSearch(spark, path, queries, k, ef, rounds)
    recallVs(spark, path, queries, k, found, None)
  }

  /** [[navRecallFrame]] for the FILTERED search: measured recall of
    * [[navSearchWhere]] vs exact brute force over the ALLOWED
    * sub-corpus — the tuning read for (ef, rounds) against an
    * allow-set's sparsity (a sparse allow-set forces the beam through
    * disallowed regions, so filtered recall is the number to watch as
    * selectivity tightens, not the unfiltered frame). */
  def navRecallFrameWhere(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int, allowed: DataFrame,
      allowedIdCol: String = "vec_id", ef: Int = 32, rounds: Int = 2)
      : DataFrame = {
    val found = navSearchWhere(spark, path, queries, k, allowed,
      allowedIdCol, ef, rounds)
    val allowIds = allowed
      .select(col(allowedIdCol).cast("long").as("vec_id"))
    recallVs(spark, path, queries, k, found, Some(allowIds))
  }

  /** Per-level degree profile of the persisted graph — the
    * [[navRecallFrame]] pattern for graph HEALTH: one row per level with
    * (n_nodes, avg_deg, max_deg, n_over_m, m) over the fact-distinct
    * edge table. Appends grow neighbor lists past `m` (forward + back
    * edges) until compaction re-prunes, so `n_over_m` is the
    * compaction-due signal an append-heavy pipeline watches (the
    * `autoCompactAfter` cadence bounds it automatically); a level whose
    * max_deg runs far past `m` is also the early warning for widening
    * beam joins before any recall drop shows. Cost: a full edge-table
    * SHUFFLE — the fact dedup (dropDuplicates over the (level, src,
    * dst) facts, partially combined map-side but still an edge-keyed
    * exchange) plus a second, (level, src)-keyed exchange of the
    * already-deduped rows; output ≤ maxLevel+1 rows. At 16 B edges
    * this is a shuffle-the-edges read: the right cost for an EXACT
    * periodic health audit (duplicate facts from replayed appends
    * would otherwise inflate every degree), but a read to schedule
    * with compactions, not to poll per batch. */
  def navDegreeFrame(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val dataDir = graft.util.FsIO.indexDataDir(spark, path)
    val (m, _) = navParams(spark, dataDir)
    readTable(spark, dataDir, "edges")
      .dropDuplicates("level", "src", "dst")
      .groupBy("level", "src").agg(count(lit(1)).as("deg"))
      .groupBy("level").agg(
        count(lit(1)).as("n_nodes"),
        round(avg(col("deg")), 6).as("avg_deg"),
        max(col("deg")).as("max_deg"),
        sum(when(col("deg") > m, 1L).otherwise(0L)).as("n_over_m"))
      .withColumn("m", lit(m))
  }

  private def recallVs(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int, found: DataFrame,
      allowIds: Option[DataFrame]): DataFrame = {
    val dataDir = graft.util.FsIO.indexDataDir(spark, path)
    // the by-id dedupe can keep EITHER level fact of a promoted id —
    // vectors are deterministic per id, so the reconstructed corpus is
    // identical either way
    val corpus0 = readTable(spark, dataDir, "nodes").dropDuplicates("nid")
      .select(col("nid").as("vec_id"), col("nv").as("embedding"))
    val corpus = allowIds.map(ids => corpus0.join(ids, Seq("vec_id"), "left_semi"))
      .getOrElse(corpus0)
    val truth = Ann.bruteForceTopK(queries, corpus, k)
    val nTrue = truth.agg(count(lit(1)).as("n_true"))
    val nFound = found.join(truth.select("qid", "nid"), Seq("qid", "nid"), "left_semi")
      .agg(count(lit(1)).as("n_found"))
    nTrue.crossJoin(nFound)
      .select(col("n_true"), col("n_found"),
        round(col("n_found").cast("double") / col("n_true"), 6).as("recall"))
  }
}
