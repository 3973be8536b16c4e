package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** env_bound(geom, which) → one envelope bound of the geometry
  * (0=minX, 1=minY, 2=maxX, 3=maxY); NULL for empty geometries. The
  * per-bound building block of the declarative st_extent — decode hits
  * the kernel LRU, so four bounds per row cost one parse. */
case class GeoEnvBound(child: Expression, which: Int)
    extends UnaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "env_bound"
  override protected def nullSafeEval(g: Any): Any = {
    val v = graft.functions.GeoKernels.envBound(g.asInstanceOf[Array[Byte]], which)
    if (v == null) null else v.doubleValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => s"""
      if (${GeoExpr.K}.envMissing($g)) { ${ev.isNull} = true; }
      else { ${ev.value} = ${GeoExpr.K}.envBoundPrim($g, $which); }""")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** st_extent as a DeclarativeAggregate: the buffer is four primitive
  * double slots (xmin, ymin, xmax, ymax) updated with Least/Greatest
  * expressions, so the whole aggregate stays inside codegen'd
  * HashAggregate — no Aggregator/encoder round-trip per row, and only
  * 32 bytes per group cross the partial/final shuffle.
  *
  * Semantics mirror the reference's ExtentAccumulator
  * (src/function/extent.rs:29-155): null/empty geometries leave the
  * buffer untouched, and an empty group evaluates to the sentinel box
  * {MAX, MAX, MIN, MIN} (src/geo/box.rs:19-26).
  */
case class StExtentAgg(child: Expression)
    extends DeclarativeAggregate with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def prettyName: String = "st_extent"
  override def dataType: DataType = StructType(Seq(
    StructField("xmin", DoubleType, nullable = false),
    StructField("ymin", DoubleType, nullable = false),
    StructField("xmax", DoubleType, nullable = false),
    StructField("ymax", DoubleType, nullable = false)))

  private lazy val xmin = AttributeReference("xmin", DoubleType, nullable = false)()
  private lazy val ymin = AttributeReference("ymin", DoubleType, nullable = false)()
  private lazy val xmax = AttributeReference("xmax", DoubleType, nullable = false)()
  private lazy val ymax = AttributeReference("ymax", DoubleType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(xmin, ymin, xmax, ymax)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(Double.MaxValue), Literal(Double.MaxValue),
    Literal(Double.MinValue), Literal(Double.MinValue))

  // a null/empty geometry contributes NULL bounds; Least/Greatest ignore
  // nulls, so the buffer passes through unchanged — exactly update_batch
  override lazy val updateExpressions: Seq[Expression] = Seq(
    Least(Seq(xmin, GeoEnvBound(child, 0))),
    Least(Seq(ymin, GeoEnvBound(child, 1))),
    Greatest(Seq(xmax, GeoEnvBound(child, 2))),
    Greatest(Seq(ymax, GeoEnvBound(child, 3))))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Least(Seq(xmin.left, xmin.right)),
    Least(Seq(ymin.left, ymin.right)),
    Greatest(Seq(xmax.left, xmax.right)),
    Greatest(Seq(ymax.left, ymax.right)))

  override lazy val evaluateExpression: Expression = CreateNamedStruct(Seq(
    Literal("xmin"), xmin, Literal("ymin"), ymin,
    Literal("xmax"), xmax, Literal("ymax"), ymax))

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}
