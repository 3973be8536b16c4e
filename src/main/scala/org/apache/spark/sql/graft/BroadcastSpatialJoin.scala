package org.apache.spark.sql.graft

import graft.functions.GeoKernels

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.locationtech.jts.index.strtree.STRtree

/** Physical broadcast spatial join: the build side (right by default, left
  * when `buildRight` is false) is collected, bulk-loaded into a JTS
  * STRtree, and broadcast; the streamed side probes bbox candidates and
  * refines with the exact predicate — a map-only join, no shuffle of the
  * streamed side. Output column order is always left ++ right regardless
  * of which side builds.
  *
  * `leftOuter` (valid only with `buildRight`, i.e. the outer side
  * streams) emits a null-padded right side for unmatched left rows —
  * the "point with its region, NULL if none" shape.
  *
  * This is the physical twin of [[graft.operators.SpatialJoin.broadcastJoin]]
  * planned automatically by [[SpatialJoinStrategy]] whenever either side
  * fits under the broadcast threshold (dimension tables, region polygons,
  * tile grids — the common shape at 100 TB).
  */
case class BroadcastSpatialJoinExec(left: SparkPlan, right: SparkPlan,
    leftGeom: Expression, rightGeom: Expression, extraCond: Option[Expression],
    probeExpand: Double = 0.0, buildRight: Boolean = true,
    leftOuter: Boolean = false)
    extends BinaryExecNode {

  require(!leftOuter || buildRight,
    "left-outer spatial join requires the left (outer) side to stream")

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan) =
    copy(left = l, right = r)

  override protected def doExecute(): RDD[InternalRow] = {
    val (build, stream) = if (buildRight) (right, left) else (left, right)
    val (buildGeom, streamGeom) = if (buildRight) (rightGeom, leftGeom) else (leftGeom, rightGeom)
    val buildRows = build.executeCollect().map(_.copy())
    val bgBound = BindReferences.bindReference(buildGeom, build.output)
    val tree = new STRtree()
    var i = 0
    while (i < buildRows.length) {
      val bytes = bgBound.eval(buildRows(i))
      if (bytes != null) {
        val env = GeoKernels.geom(bytes.asInstanceOf[Array[Byte]]).getEnvelopeInternal
        if (!env.isNull) tree.insert(env, Integer.valueOf(i))
      }
      i += 1
    }
    tree.build()
    val bc = sparkContext.broadcast((tree, buildRows))
    val sgBound = BindReferences.bindReference(streamGeom, stream.output)
    val condBound = extraCond.map(BindReferences.bindReference(_, output))
    val br = buildRight

    val outer = leftOuter
    val nBuildCols = build.output.length

    stream.execute().mapPartitionsInternal { iter =>
      val (t, brows) = bc.value
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(output, output)
      val nullRow: InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(nBuildCols)
      iter.flatMap { srow =>
        val bytes = sgBound.eval(srow)
        if (bytes == null) {
          if (outer) Iterator.single(proj(joined(srow, nullRow)).copy())
          else Iterator.empty
        } else {
          val g = GeoKernels.geom(bytes.asInstanceOf[Array[Byte]])
          val env = new org.locationtech.jts.geom.Envelope(g.getEnvelopeInternal)
          // the dwithin bbox expansion is symmetric, so expanding the
          // streamed probe envelope is sound for either build side
          if (probeExpand > 0) env.expandBy(probeExpand)
          val cands = t.query(env)
          val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
          val it = cands.iterator()
          while (it.hasNext) {
            val idx = it.next().asInstanceOf[Integer].intValue()
            val brow = brows(idx)
            // output order is left ++ right whichever side streams
            val jr = if (br) joined(srow, brow) else joined(brow, srow)
            // bbox probe was only the prefilter; the bound condition holds
            // the exact spatial predicate plus any extra conjuncts
            if (condBound.forall(c => c.eval(jr) == true))
              out += proj(jr).copy()
          }
          if (outer && out.isEmpty)
            out += proj(joined(srow, nullRow)).copy()
          out.iterator
        }
      }
    }
  }
}

/** Plans [[BroadcastSpatialJoinExec]] for Inner joins whose condition
  * carries an ST_Intersects between the two sides and where EITHER side
  * fits under `spark.sql.autoBroadcastJoinThreshold` (the smaller
  * broadcastable side builds the STRtree; the other streams map-only).
  * Bigger joins are left to [[SpatialJoinRewrite]]'s grid partitioning. */
class SpatialJoinStrategy(spark: SparkSession)
    extends org.apache.spark.sql.execution.SparkStrategy {

  private def conf = org.apache.spark.sql.internal.SQLConf.get

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, joinType @ (Inner | LeftOuter), Some(cond), _)
        if conf.getConfString("spark.graft.spatialJoin.broadcast", "true").toBoolean =>
      val conjuncts = SpatialJoinRewrite.splitConjuncts(cond)
      if (BboxPredicate.hasEquiJoinKey(conjuncts, left, right)) return Nil
      val leftOuter = joinType == LeftOuter
      conjuncts.collectFirst {
        case p @ BboxPredicate(lg, rg, ex)
            if lg.references.subsetOf(left.outputSet) &&
               rg.references.subsetOf(right.outputSet) => (p, lg, rg, ex)
        case p @ BboxPredicate(rg, lg, ex)
            if lg.references.subsetOf(left.outputSet) &&
               rg.references.subsetOf(right.outputSet) => (p, lg, rg, ex)
      } match {
        // LEFT OUTER requires the outer (left) side to stream, i.e. the
        // right side must be the broadcast build
        case Some((_, lg, rg, expand)) if leftOuter && buildable(right) =>
          BroadcastSpatialJoinExec(planLater(left), planLater(right), lg, rg,
            Some(cond), expand, buildRight = true, leftOuter = true) :: Nil
        case Some((_, lg, rg, expand))
            if !leftOuter && (buildable(right) || buildable(left)) =>
          // the STRtree bbox probe is only a prefilter: the FULL condition
          // (spatial predicate included) is evaluated on each candidate
          // pair, so any bbox-implying predicate plans here soundly.
          // Build on the smaller broadcastable side; output stays l ++ r.
          val buildRight =
            if (!buildable(left)) true
            else if (!buildable(right)) false
            else right.stats.sizeInBytes <= left.stats.sizeInBytes
          BroadcastSpatialJoinExec(planLater(left), planLater(right), lg, rg,
            Some(cond), expand, buildRight) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }

  private def buildable(p: LogicalPlan): Boolean = {
    val threshold = conf.autoBroadcastJoinThreshold
    threshold > 0 && p.stats.sizeInBytes >= 0 && p.stats.sizeInBytes <= threshold
  }
}
