package org.apache.spark.sql.graft

import graft.functions.GeoKernels

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** grid_cells(geom, cellSize, expand) → packed ids of cells covering the
  * bbox (expanded by `expand` — nonzero only for ST_DWithin joins). */
case class GridCells(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType, DoubleType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "grid_cells"
  override protected def nullSafeEval(g: Any, cs: Any, ex: Any): Any =
    new GenericArrayData(GeoKernels.gridCells(g.asInstanceOf[Array[Byte]],
      cs.asInstanceOf[Double], ex.asInstanceOf[Double]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, cs, ex) => s"""
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        ${GeoExpr.K}.gridCells($g, $cs, $ex));""")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** grid_anchor_cell(a, b, cellSize, expandA) → canonical dedup cell. */
case class GridAnchorCell(children: Seq[Expression])
    extends Expression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, BinaryType, DoubleType, DoubleType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "grid_anchor_cell"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else GeoKernels.gridAnchorCell(vs(0).asInstanceOf[Array[Byte]],
      vs(1).asInstanceOf[Array[Byte]], vs(2).asInstanceOf[Double],
      vs(3).asInstanceOf[Double])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evs = children.map(_.genCode(ctx))
    val anyNull = evs.map(e => e.isNull.toString).mkString(" || ")
    val childCode = evs.map(_.code.toString).mkString("\n")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        ${ev.value} = ${GeoExpr.K}.gridAnchorCell(${evs(0).value}, ${evs(1).value},
          ${evs(2).value}, ${evs(3).value});
      }""")
  }
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]) =
    copy(children = newChildren)
}

/** Spatial predicates for which a bbox-grid prefilter (or an STRtree bbox
  * probe) is sound. ST_DWithin participates with distance-expanded
  * bboxes when its distance is a foldable literal. */
object BboxPredicate {
  /** (geomA, geomB, bboxExpansion) — expansion nonzero only for DWithin
    * with a foldable distance. */
  def unapply(e: Expression): Option[(Expression, Expression, Double)] = e match {
    case StIntersects(a, b) => Some((a, b, 0.0))
    case StContains(a, b) => Some((a, b, 0.0))
    case StWithin(a, b) => Some((a, b, 0.0))
    case StCovers(a, b) => Some((a, b, 0.0))
    case StCoveredBy(a, b) => Some((a, b, 0.0))
    case StEquals(a, b) => Some((a, b, 0.0))
    case StDWithin(a, b, d) if d.foldable =>
      val dist = d.eval(null)
      // negative distance: the exact predicate is false everywhere, so an
      // unexpanded (clamped) prefilter is sound and cannot crash gridCells
      if (dist == null) None
      else Some((a, b, math.max(0.0, dist.asInstanceOf[Double])))
    case _ => None
  }

  /** An equi-join conjunct between the two sides means Spark's hash join
    * is the better plan — spatial planning should stand down and let the
    * spatial predicate run as a post-join filter. */
  def hasEquiJoinKey(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(l, r) =>
        (l.references.nonEmpty && r.references.nonEmpty) &&
          ((l.references.subsetOf(left.outputSet) && r.references.subsetOf(right.outputSet)) ||
           (r.references.subsetOf(left.outputSet) && l.references.subsetOf(right.outputSet)))
      case _ => false
    }
}

/** Rewrites `a JOIN b ON ST_Intersects(a.geom, b.geom)` — which Spark can
  * only plan as an O(|a|·|b|) BroadcastNestedLoopJoin — into a
  * grid-partitioned equi-join:
  *
  * {{{
  * Project(join output)
  *   Filter(ST_Intersects(lg, rg) AND __gcell_l == grid_anchor_cell(lg, rg)
  *          AND <other conjuncts>)
  *     Join Inner (__gcell_l == __gcell_r)
  *       Generate(explode(grid_cells(lg, cs)))  <- left
  *       Generate(explode(grid_cells(rg, cs)))  <- right
  * }}}
  *
  * The equi-join hash-partitions both sides by covering cell — shuffle
  * volume Σ cells-per-geometry instead of a full cross product — and the
  * anchor-cell conjunct dedups multi-cell pairs without a distinct. AQE
  * handles cell skew like any other shuffle key.
  *
  * Confs: `spark.graft.spatialJoin.rewrite` (default true),
  * `spark.graft.spatialJoin.cellSize` (default 10.0, in coordinate units —
  * pick ~the median geometry bbox size).
  */
object SpatialJoinRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.spatialJoin.rewrite", "true").toBoolean) return plan
    val cellSize = conf.getConfString("spark.graft.spatialJoin.cellSize", "10.0").toDouble
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if j.resolved && !alreadyRewritten(left, right) &&
            !broadcastable(right) && !broadcastable(left) =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (BboxPredicate.hasEquiJoinKey(conjuncts, left, right)) j
        else conjuncts.collectFirst {
          case p @ BboxPredicate(x, y, ex)
              if x.references.subsetOf(left.outputSet) &&
                 y.references.subsetOf(right.outputSet) => (p, x, y, ex)
          case p @ BboxPredicate(y, x, ex) // swapped argument order
              if x.references.subsetOf(left.outputSet) &&
                 y.references.subsetOf(right.outputSet) => (p, x, y, ex)
        } match {
          case Some((pred, lg, rg, expand)) =>
            val rest = conjuncts.filterNot(_ eq pred)
            rewrite(j, left, right, pred, lg, rg, rest, cellSize, expand)
          case None => j
        }
    }
  }

  private def alreadyRewritten(left: LogicalPlan, right: LogicalPlan): Boolean =
    // covers both this rule's __gcell_* attrs and operators.SpatialJoin's
    // __cell_l/__cell_r columns — predicate pushdown can re-expose either
    (left.output ++ right.output).exists(a =>
      a.name.startsWith("__gcell") || a.name.startsWith("__cell"))

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjunctivePredicates(a) ++ splitConjunctivePredicates(b)
    case other => Seq(other)
  }

  private[graft] def splitConjuncts(e: Expression): Seq[Expression] =
    splitConjunctivePredicates(e)

  /** Small build sides are left alone — SpatialJoinStrategy plans them as
    * a physical broadcast STRtree join, which beats the grid shuffle. */
  private def broadcastable(p: LogicalPlan): Boolean = {
    val threshold = conf.autoBroadcastJoinThreshold
    threshold > 0 && p.stats.sizeInBytes <= threshold &&
      conf.getConfString("spark.graft.spatialJoin.broadcast", "true").toBoolean
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      pred: Expression, lg: Expression, rg: Expression,
      rest: Seq[Expression], cellSize: Double, expand: Double): LogicalPlan = {
    val cellL = AttributeReference("__gcell_l", LongType, nullable = false)()
    val cellR = AttributeReference("__gcell_r", LongType, nullable = false)()
    val genL = Generate(ExplodeBase(GridCells(lg, Literal(cellSize), Literal(expand))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(cellL), child = left)
    val genR = Generate(ExplodeBase(GridCells(rg, Literal(cellSize), Literal(0.0))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(cellR), child = right)
    val joined = Join(genL, genR, Inner, Some(EqualTo(cellL, cellR)), JoinHint.NONE)
    val anchor = EqualTo(cellL,
      GridAnchorCell(Seq(lg, rg, Literal(cellSize), Literal(expand))))
    // anchor first: the cheap long comparison discards duplicate cell-pairs
    // before the exact JTS predicate (and any other conjuncts) runs
    val filtered = Filter((Seq(anchor, pred) ++ rest).reduce(And), joined)
    Project(j.output, filtered)
  }

  private def ExplodeBase(child: Expression): Explode = Explode(child)
}
