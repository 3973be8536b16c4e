package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** hilbert_d(x, y, bits) → Hilbert-curve index on the 2^bits grid.
  * Codegen'd call into [[graft.functions.CurveKernels.hilbertD]];
  * null-intolerant, integer-exact. The write-side companion to the
  * Morton interleave: tighter range→blob locality for multi-dimension
  * data skipping (see [[graft.operators.ZOrder.clusterByHilbert]]). */
case class HilbertIndex(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  private val CK = "graft.functions.CurveKernels"
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_d"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else third match {
      case e if e.foldable =>
        val v = e.eval(null)
        if (v == null || v.asInstanceOf[Int] < 1 || v.asInstanceOf[Int] > 31)
          TypeCheckResult.TypeCheckFailure(
            s"hilbert_d bits must be a literal in [1, 31] (got $v)")
        else TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("hilbert_d bits must be a literal")
    }
  }

  override protected def nullSafeEval(x: Any, y: Any, b: Any): Any =
    graft.functions.CurveKernels.hilbertD(
      b.asInstanceOf[Int], x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, b) => s"$CK.hilbertD($b, $x, $y)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): HilbertIndex = copy(f, s, t)
}
