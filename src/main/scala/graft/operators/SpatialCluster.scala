package graft.operators

import graft.functions.GeoFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed single-linkage spatial clustering — the PostGIS
  * `ST_ClusterWithin` semantics (any two members within `dist` of each
  * other connect their clusters, transitively) as a scale-out operator
  * instead of a window/aggregate over collected geometry.
  *
  * Scale design (100 TB): candidate pairs come from a grid self-join —
  * cell size = `dist`, ONE side's envelope expanded by `dist`, so any
  * qualifying pair provably shares a cell (expanded-envelope overlap ⇒
  * common covering cell) — one shuffle keyed by cell, exact `ST_DWithin`
  * refine inside buckets, then the large-star/small-star connected
  * components from [[Dedup.connectedComponents]] (O(log² n) rounds of
  * min-aggregates, no neighbor lists, no driver-side geometry). PostGIS
  * itself evaluates ST_ClusterWithin on a single node over an aggregated
  * array — this shape is what survives a 1000-executor corpus.
  */
object SpatialCluster {

  /** (id, cluster) for every row; cluster = min id of the connected
    * group, rows with no neighbor within `dist` map to themselves.
    *
    * Duplicate-heavy inputs: co-located rows all pair with each other
    * (k rows at one point ⇒ k²/2 edges), so cluster DISTINCT geometries
    * and join the assignment back by geometry when the data has heavy
    * point multiplicity — same guidance as PostGIS users aggregating
    * before ST_ClusterWithin. */
  def clusterWithin(df: DataFrame, idCol: String, geomCol: String,
      dist: Double): DataFrame = {
    require(dist > 0, "dist must be positive")
    GeoFunctions.register(df.sparkSession)
    val l = df.select(col(idCol).as("__ida"), col(geomCol).as("__ga"))
      .withColumn("__cell", explode(GeoFunctions.grid_cells(col("__ga"), dist, dist)))
    val r = df.select(col(idCol).as("__idb"), col(geomCol).as("__gb"))
      .withColumn("__cell", explode(GeoFunctions.grid_cells(col("__gb"), dist, 0.0)))
    val pairs = l.join(r, "__cell")
      .where(col("__ida") < col("__idb") &&
        GeoFunctions.st_dwithin(col("__ga"), col("__gb"), lit(dist)))
      .select("__ida", "__idb").distinct()
    Dedup.dedupClusters(df, idCol, pairs, "__ida", "__idb")
      .withColumnRenamed("component", "cluster")
  }

  /** Transitive clusters of INTERSECTING geometries (PostGIS
    * ST_ClusterIntersecting/ST_ClusterIntersectingWin): any two members
    * that intersect (interiors or boundaries touch) connect their
    * clusters. Geometries that intersect nothing map to themselves.
    *
    * Scale: same shape as [[clusterWithin]] with the distance refine
    * replaced by `ST_Intersects` — intersecting geometries have
    * overlapping envelopes, so a grid self-join (cell size `cellSize`,
    * one side expanded by 0) over envelope cells is a complete candidate
    * filter; one shuffle on the cell key, exact JTS refine in buckets,
    * then large-star/small-star connected components. `cellSize` should
    * sit near the median envelope size: too small multiplies cells per
    * geometry, too large piles unrelated geometries into shared buckets
    * (AQE skew-join splitting bounds the damage either way, asserted in
    * `SkewJoinSpec`). */
  def clusterIntersecting(df: DataFrame, idCol: String, geomCol: String,
      cellSize: Double): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    GeoFunctions.register(df.sparkSession)
    val l = df.select(col(idCol).as("__ida"), col(geomCol).as("__ga"))
      .withColumn("__cell", explode(GeoFunctions.grid_cells(col("__ga"), cellSize, 0.0)))
    val r = df.select(col(idCol).as("__idb"), col(geomCol).as("__gb"))
      .withColumn("__cell", explode(GeoFunctions.grid_cells(col("__gb"), cellSize, 0.0)))
    val pairs = l.join(r, "__cell")
      .where(col("__ida") < col("__idb") &&
        GeoFunctions.st_intersects(col("__ga"), col("__gb")))
      .select("__ida", "__idb").distinct()
    Dedup.dedupClusters(df, idCol, pairs, "__ida", "__idb")
      .withColumnRenamed("component", "cluster")
  }

  /** Distributed DBSCAN (PostGIS ST_ClusterDBSCAN semantics): a point
    * with at least `minPts` neighbors within `eps` (counting itself) is
    * CORE; core points within `eps` of each other share a cluster; a
    * non-core point within `eps` of a core is a BORDER member of a core
    * neighbor's cluster; everything else is noise (null cluster).
    *
    * Determinism: classic DBSCAN assigns a border point to whichever
    * core reached it first (scan-order dependent); here a border point
    * joins the MINIMUM cluster id among its core neighbors, so results
    * are reproducible across partitionings and runs — the property every
    * other operator in this library guarantees. Output has one row per
    * distinct id; noise rows carry a null cluster.
    *
    * Scale: one grid self-join produces all eps-neighbor pairs (same
    * expanded-envelope cell trick as [[clusterWithin]]); a count
    * aggregate marks cores; CC runs ONLY on core-core edges (the
    * candidate graph minus borders/noise); borders attach with one more
    * join. No step materializes a neighborhood list. */
  def dbscan(df: DataFrame, idCol: String, geomCol: String,
      eps: Double, minPts: Int): DataFrame = {
    require(eps > 0 && minPts >= 1, "eps must be positive, minPts >= 1")
    GeoFunctions.register(df.sparkSession)
    val l = df.select(col(idCol).as("__ida"), col(geomCol).as("__ga"))
      .withColumn("__cell", explode(GeoFunctions.grid_cells(col("__ga"), eps, eps)))
    val r = df.select(col(idCol).as("__idb"), col(geomCol).as("__gb"))
      .withColumn("__cell", explode(GeoFunctions.grid_cells(col("__gb"), eps, 0.0)))
    // all ordered eps-neighbor pairs (both directions), self excluded
    val nbrs = l.join(r, "__cell")
      .where(col("__ida") =!= col("__idb") &&
        GeoFunctions.st_dwithin(col("__ga"), col("__gb"), lit(eps)))
      .select("__ida", "__idb").distinct()
      .localCheckpoint() // reused three times below; cut the grid-join lineage
    val degrees = nbrs.groupBy(col("__ida").as("id"))
      .agg(count(lit(1)).as("__deg"))
    // core: minPts neighbors INCLUDING self. Derived from ALL ids, not
    // from the neighbor-pair table — a point with zero eps-neighbors has
    // no degree row, yet minPts = 1 (degree >= 0) makes every point core
    // in PostGIS ST_ClusterDBSCAN: isolated points are singleton
    // clusters, not noise.
    val cores = df.select(col(idCol).as("id")).distinct()
      .join(degrees, Seq("id"), "left")
      .where(coalesce(col("__deg"), lit(0L)) >= minPts - 1).select("id")
    val coreEdges = nbrs
      .join(cores.select(col("id").as("__ida")), "__ida")
      .join(cores.select(col("id").as("__idb")), "__idb")
      .where(col("__ida") < col("__idb"))
    val coreClusters = Dedup
      .dedupClusters(cores.toDF(), "id", coreEdges, "__ida", "__idb")
      .withColumnRenamed("component", "cluster")
    // border: non-core with a core neighbor → min core neighbor's cluster
    val borderClusters = nbrs
      .join(coreClusters.select(col("id").as("__idb"), col("cluster")), "__idb")
      .join(cores.select(col("id").as("__ida")), Seq("__ida"), "left_anti")
      .groupBy(col("__ida").as("id")).agg(min(col("cluster")).as("cluster"))
    val assigned = coreClusters.union(borderClusters)
    df.select(col(idCol).as("id")).distinct()
      .join(assigned, Seq("id"), "left")
      .select(col("id"), col("cluster")) // noise keeps null
  }

  /** PostGIS `ST_ClusterKMeans` as a distributed operator: (id, cluster)
    * with cluster ∈ [0, k) — Lloyd's algorithm over the geometry
    * CENTROIDS (PostGIS uses the 2-D centroid for non-point input).
    *
    * Determinism contract (same as [[Ann.kmeans]]): seeding is RNG-free —
    * the centroids of the k lowest-id rows, numbered in id order — and
    * assignment is an exact argmin with index tie-break. On
    * integer-valued coordinates the Lloyd means are exact in double
    * regardless of aggregation order, so runs replay bit-identically
    * across partitionings; on arbitrary doubles the means are
    * float-order-sensitive in the last ulp, like every distributed mean.
    *
    * Scale: assignment is a map-only pass (k·2 doubles broadcast inside
    * the plan as literals — no join, no shuffle); each Lloyd step is one
    * codegen'd partial+final average keyed by the k cluster ids; the
    * driver holds k pairs of doubles, never rows. Empty clusters keep
    * their previous center. */
  def clusterKMeans(df: DataFrame, idCol: String, geomCol: String, k: Int,
      iters: Int = 5): DataFrame = {
    require(k > 0, "k must be positive")
    GeoFunctions.register(df.sparkSession)
    // cached: seeding + `iters` Lloyd averages + the final assignment all
    // re-read these projected points; without the persist each pass would
    // replay df's full upstream lineage (scan, joins, geometry decode)
    val pts = df.select(col(idCol).as("id"),
      GeoFunctions.st_x(GeoFunctions.st_centroid(col(geomCol))).as("__x"),
      GeoFunctions.st_y(GeoFunctions.st_centroid(col(geomCol))).as("__y"))
      .cache()
    try {
      // fail fast on null/empty geometries (null centroid coordinates) —
      // they would NPE during seeding and silently produce null clusters
      // in the assignment pass, mirroring nothing PostGIS does
      val bad = pts.where(col("__x").isNull || col("__y").isNull)
        .limit(1).collect()
      require(bad.isEmpty,
        s"clusterKMeans: input has null/empty geometries (e.g. id=${if (bad.nonEmpty) bad(0).get(0) else ""}); filter them out first")
      var cents: Array[(Double, Double)] = pts.orderBy("id").limit(k)
        .collect().map(r => (r.getDouble(1), r.getDouble(2)))
      require(cents.length == k, s"input has ${cents.length} rows < k=$k")
      def assigned = pts.withColumn("cluster",
        nearestCenter(col("__x"), col("__y"), cents))
      for (_ <- 0 until iters) {
        val m = assigned.groupBy("cluster")
          .agg(avg("__x").as("cx"), avg("__y").as("cy"))
          .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2))))
          .toMap
        cents = cents.indices.map(i => m.getOrElse(i, cents(i))).toArray
      }
      assigned.select(col("id"), col("cluster"))
    } finally {
      // non-blocking: the returned plan still references pts and will
      // recompute its (cheap, map-only) projection if evaluated later —
      // the expensive repeated passes above all hit the cache
      pts.unpersist(false)
    }
  }

  /** Exact argmin over the k centers: array_min over (distance², index)
    * structs — lexicographic struct ordering breaks exact-distance ties
    * toward the LOWEST center index, and the whole expression stays
    * inside WholeStageCodegen (no UDF, no join). */
  private def nearestCenter(x: Column, y: Column,
      cents: Array[(Double, Double)]): Column = {
    val candidates = cents.zipWithIndex.map { case ((cx, cy), i) =>
      struct(
        ((x - lit(cx)) * (x - lit(cx)) + (y - lit(cy)) * (y - lit(cy))).as("d"),
        lit(i).as("i"))
    }
    array_min(array(candidates.toIndexedSeq: _*)).getField("i")
  }
}
