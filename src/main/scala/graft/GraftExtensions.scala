package graft

import graft.functions.GeoFunctions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Cluster-grade installer: `spark.sql.extensions=graft.GraftExtensions`
  * injects every scalar geo function into each new session, the same way a
  * deployed library would ship (no per-session register() call needed).
  * The st_extent UDAF still needs `GeoFunctions.register(spark)` because
  * SparkSessionExtensions has no UDAF injection hook.
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
