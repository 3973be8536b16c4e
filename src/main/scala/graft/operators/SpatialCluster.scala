package graft.operators

import graft.functions.GeoFunctions
import org.apache.spark.sql.DataFrame
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
}
