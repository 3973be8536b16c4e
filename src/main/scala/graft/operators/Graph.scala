package graft.operators

import graft.util.Round6.rz6
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph operators for corpus curation — the URL/host quality
  * priors (PageRank-family centrality over a crawl's link structure)
  * that large-scale web-corpus pipelines mix into document quality
  * scores.
  *
  * Scale design: everything is edge-relation algebra — each PageRank
  * iteration is one join of the edge list with the current rank
  * vector (shuffle keyed by source) and one hash aggregation to the
  * destination (shuffle keyed by destination), both of which Spark
  * plans with partial aggregation; the dangling-node mass rides a
  * broadcast one-row frame, and the driver holds only the iteration
  * counter. `localCheckpoint` after each iteration cuts the growing
  * lineage (the connected-components precedent). Nothing corpus-sized
  * is ever collected.
  *
  * Determinism: every per-edge term, per-node sum, and update is
  * snapped under the 6dp law ([[graft.util.Round6]]), so DuckDB
  * replays all iterations as unrolled materialized CTEs and the q176
  * gate hash-matches every rank. */
object Graph {

  /** Damped PageRank over a directed edge list, `iters` synchronous
    * iterations from the uniform vector. Duplicate edges collapse
    * (link-once semantics); nodes = sources ∪ destinations; dangling
    * mass (ranks of nodes with no out-edges) redistributes uniformly,
    * the standard correction. Update per node v:
    * `r'(v) = rz6(rz6((1-d)/N) + d · (S(v) + rz6(D/N)))` with
    * `S(v) = rz6(Σ_in rz6(r(u)/deg(u)))` and `D = rz6(Σ_dangling r)`.
    * Output: (node, rank). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0 (got $iters)")
    require(damping > 0 && damping < 1, s"damping must be in (0,1) (got $damping)")
    val e = edges
      .select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
      .where(col("s").isNotNull && col("d").isNotNull)
      .distinct().localCheckpoint()
    val nodes = e.select(col("s").as("v"))
      .unionByName(e.select(col("d").as("v"))).distinct().localCheckpoint()
    // N is a genuine scalar of the computation (it appears inside
    // per-node literals); one count job, not per-row state
    val n = nodes.count().toDouble
    if (n == 0) return nodes.select(col("v").as("node"), lit(0.0).as("rank"))
    val deg = e.groupBy("s").agg(count(lit(1)).as("deg")).localCheckpoint()
    var ranks = nodes.select(col("v"), rz6(lit(1.0 / n)).as("r"))
    for (_ <- 1 to iters) {
      val dangling = broadcast(
        ranks.join(deg, ranks("v") === deg("s"), "left_anti")
          .agg(coalesce(rz6(sum(col("r"))), lit(0.0)).as("__dang")))
      val sums = e.join(ranks, e("s") === ranks("v"))
        .join(deg, "s")
        .select(col("d").as("v"), rz6(col("r") / col("deg")).as("__c"))
        .groupBy("v").agg(rz6(sum("__c")).as("__cs"))
      ranks = nodes.join(sums, Seq("v"), "left").crossJoin(dangling)
        .select(col("v"),
          rz6(rz6(lit((1.0 - damping) / n)) +
            lit(damping) * (coalesce(col("__cs"), lit(0.0)) +
              rz6(col("__dang") / lit(n)))).as("r"))
        .localCheckpoint()
    }
    ranks.select(col("v").as("node"), col("r").as("rank"))
  }

  /** Minimum hop distance from a seed set over an undirected simple
    * graph, `maxHops` synchronous BFS rounds — the crawl-depth /
    * link-distance prior ("how many hops from a trusted domain") that
    * complements [[pageRank]]'s stationary mass. Seeds get distance 0;
    * each round relaxes `d(v) = min(d(v), min over neighbors d(u)+1)`;
    * nodes not reached within `maxHops` are reported with NULL
    * distance (reachability beyond the horizon is unknown, not
    * infinite).
    *
    * Scale design: per round ONE adjacency hash join against the
    * current frontier-distance frame and one min hash-agg
    * (partial-aggregated — a hub's incoming candidates combine
    * map-side), then a min-merge with the previous distances;
    * `localCheckpoint` cuts lineage per round. Driver state: the loop
    * counter. Deterministic: integer distances, min-merge. */
  def hopDistance(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0 (got $maxHops)")
    val und = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    val adj = und.select(explode(array(
        struct(col("a").as("v"), col("b").as("u")),
        struct(col("b").as("v"), col("a").as("u")))).as("__e"))
      .select(col("__e.v").as("v"), col("__e.u").as("u"))
      .localCheckpoint()
    val nodes = adj.select(col("v")).distinct()
    var dist = nodes
      .join(seeds.select(col(seedCol).as("v")).distinct()
        .withColumn("d", lit(0L)), Seq("v"), "left")
      .localCheckpoint()
    for (_ <- 1 to maxHops) {
      val relaxed = adj
        .join(dist.where(col("d").isNotNull)
          .select(col("v").as("u"), col("d")), Seq("u"))
        .groupBy("v").agg(min(col("d") + 1).as("nd"))
      dist = dist.join(relaxed, Seq("v"), "left")
        .select(col("v"), least(col("d"), col("nd")).as("d"))
        .localCheckpoint()
    }
    dist.select(col("v").as("node"), col("d").as("hops"))
  }

  /** Per-vertex triangle counts and local clustering coefficient over
    * an UNDIRECTED simple graph (self-loops dropped, duplicate and
    * reversed edges collapsed). Output one row per vertex:
    * `(vertex, degree, triangles, lcc)` with
    * `lcc = rz6(2·triangles / (degree·(degree−1)))` (0.0 below degree
    * 2) — the link-farm / spam-cluster structure signal that
    * complements [[pageRank]]'s centrality prior.
    *
    * Scale design (100 TB of edges): the naive wedge join explodes on
    * hubs (a degree-10^6 vertex yields 10^12 wedges). Standard fix —
    * DEGREE ORIENTATION (Cohen's MapReduce triangle recipe; also the
    * GraphX/Spark `TriangleCount` strategy): direct every edge from
    * its lower-(degree, id) endpoint to the higher one, making every
    * out-degree O(√m) on any graph; wedges are generated only at each
    * triangle's unique lowest apex, so each triangle materializes
    * exactly once. The plan is pure edge-relation algebra — distinct,
    * one degree hash-agg, two degree-attach hash joins, the
    * apex-keyed wedge self-join, and the (v,w)-keyed closure hash
    * join — partial-aggregated and AQE-skew-splittable, with no
    * cartesian anywhere. Per-vertex counts explode each triangle to
    * its three corners and hash-aggregate.
    *
    * Determinism: counts are integers; `lcc` is the one derived
    * double, snapped under the 6dp law so DuckDB's
    * `round(2.0·t/(d·(d−1)), 6)` replays it bit-for-bit. */
  /** Synchronous label propagation over an undirected simple graph:
    * every node starts labeled with its own id; each of `iters` rounds
    * relabels every node with the most frequent label among its
    * neighbors, ties broken by the SMALLEST label — a fully
    * deterministic update law (no randomized visit order), so the same
    * communities emerge on any engine, partitioning, or rerun, and an
    * unrolled SQL replay can gate every round. The cheap
    * community-detection pass (near-dup cluster naming, link-farm
    * grouping) when connected components are too coarse and modularity
    * methods too heavy.
    *
    * Output after `iters` rounds: `(node, label)` for every endpoint
    * of the normalized graph (self-loops dropped, duplicate/reversed
    * edges collapsed; isolated ids never appear — they have no
    * neighbors to vote).
    *
    * Scale design (100 TB of edges): each round is ONE join of the
    * adjacency list with the current |V|-row label frame (hash,
    * key-partitioned) and TWO hash aggregations — (node, label) vote
    * counts, then per-node argmax folded as `max(struct(count,
    * −label))` so it partial-aggregates map-side (no per-node window
    * sort anywhere). `localCheckpoint` cuts lineage per round (the
    * [[pageRank]]/connected-components precedent); driver state is
    * the loop counter. Tie law requires labels > Long.MinValue (ids
    * here), since argmax-of-(−label) realizes min-label. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0 (got $iters)")
    val und = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    val adj = und.select(explode(array(
        struct(col("a").as("v"), col("b").as("u")),
        struct(col("b").as("v"), col("a").as("u")))).as("__e"))
      .select(col("__e.v").as("v"), col("__e.u").as("u"))
      .localCheckpoint()
    var labels = adj.select(col("v")).distinct()
      .withColumn("lbl", col("v"))
    for (_ <- 1 to iters) {
      labels = adj
        .join(labels.select(col("v").as("u"), col("lbl")), Seq("u"))
        .groupBy("v", "lbl").agg(count(lit(1)).as("c"))
        .groupBy("v")
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("v"), (-col("m.nl")).as("lbl"))
        .localCheckpoint()
    }
    labels.select(col("v").as("node"), col("lbl").as("label"))
  }

  /** k-core peeling — the web-graph robustness prior of corpus
    * curation (pages outside a decent core are disproportionately spam
    * and link farms; see Kumar et al. / the Common Crawl link-quality
    * literature): repeatedly delete every vertex whose CURRENT degree
    * is below `k`, `rounds` times, and return the surviving vertices
    * with their residual degrees. With `rounds` at least the peel
    * depth the result is the true k-core (every survivor has degree
    * >= k in the subgraph — the fixpoint); fewer rounds give the
    * deterministic partial peel, which is what the fixed-round
    * contract (q211) replays as unrolled CTEs. Convergence is
    * checkable from the output (`min(degree) >= k`).
    *
    * Scale design: each round is one degree hash-agg over the live
    * edge set plus two semi-joins against the >= k survivor ids — all
    * key-partitioned hash operations, nothing collected driver-side;
    * `localCheckpoint` per round cuts the growing lineage (the
    * [[pageRank]] / connected-components precedent). Edges are
    * normalized first (self-loops dropped, duplicates/reversals
    * collapsed), so degree means distinct-neighbor count. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    require(rounds >= 1, s"rounds must be >= 1 (got $rounds)")
    var e = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct().localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = e.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy("v").agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k)
        .select("v")
      e = e.join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint()
    }
    e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("degree"))
      .select(col("v").as("node"), col("degree"))
  }

  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    // endpoint fan-out via explode, NOT unionAll: each unionAll branch
    // duplicates the whole edge-builder subtree in the plan (the caller
    // may pass a derived frame — q189 feeds a self-join — and only the
    // exchanges under the copies reuse at runtime; the operators above
    // them re-execute per branch). One explode keeps one copy. (r21)
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // orient a->b when (deg(a), a) < (deg(b), b): u = the edge's apex
    val ord = und
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), Seq("a"))
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), Seq("b"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("w"))
    // each unordered out-neighbor pair once (id order), closed against
    // the canonical edge set (a < b, so (v, w) with v < w keys directly)
    val e1 = ord.select(col("u"), col("w").as("v"))
    val e2 = ord.select(col("u"), col("w"))
    val tri = e1.join(e2, Seq("u")).where(col("v") < col("w"))
      .join(und, col("v") === col("a") && col("w") === col("b"))
      .select("u", "v", "w")
    // same explode-over-unionAll rationale as `deg`, and it matters
    // 3× more here: each of the three unionAll branches re-ran the
    // whole wedge-join + closing-join pipeline above its reused
    // exchanges (r21: the q189 plan carried three copies of the
    // triangle subtree; now one)
    val perVertex = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("triangles"))
    deg.join(perVertex, col("v") === col("x"), "left")
      .select(col("v").as("vertex"), col("deg").as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("deg") >= 2,
          rz6(lit(2.0) * coalesce(col("triangles"), lit(0L)) /
            (col("deg") * (col("deg") - 1))))
          .otherwise(lit(0.0)).as("lcc"))
  }
}
