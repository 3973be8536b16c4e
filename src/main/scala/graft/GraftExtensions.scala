package graft

import graft.functions.GeoFunctions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Cluster-grade installer: `spark.sql.extensions=graft.GraftExtensions`
  * injects the ENTIRE function surface — every scalar function and both
  * UDAFs (st_extent is a DeclarativeAggregate, st_collect goes through
  * the ScalaAggregator shim) — into each new session, the same way a
  * deployed library would ship: a fresh session configured with only the
  * extensions conf can run any contract query, no per-session
  * `GeoFunctions.register` call needed.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GeoFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    // ST_Intersects joins: small build side -> physical broadcast STRtree
    // join; big-big -> grid equi-join rewrite (never BroadcastNestedLoopJoin)
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.SpatialJoinRewrite)
    ext.injectPlannerStrategy(s => new org.apache.spark.sql.graft.SpatialJoinStrategy(s))
  }
}
