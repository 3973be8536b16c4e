package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, SparkSession}

/** Bridges into `private[sql]` Spark internals that a library legitimately
  * needs: wrapping a Catalyst Expression as a user-facing Column, and
  * registering expression builders in the session FunctionRegistry (the
  * same mechanism Spark's own `functions._` uses). Lives under
  * org.apache.spark.sql.* solely for access; contains no logic.
  */
object Shims {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def registry(spark: SparkSession): FunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry

  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    registry(spark).createOrReplaceTempFunction(name, builder, "built-in")

  /** Aggregator-backed UDAF as a Catalyst expression, so it can go
    * through the same FunctionRegistry/injectFunction path as every
    * other function (spark.udf.register is session-bound and has no
    * SparkSessionExtensions hook). The analyzer wraps the returned
    * AggregateFunction in an AggregateExpression exactly as it does for
    * built-in aggregates. */
  def udafExpression[IN, BUF, OUT](
      agg: org.apache.spark.sql.expressions.Aggregator[IN, BUF, OUT],
      inputEncoder: org.apache.spark.sql.Encoder[IN],
      children: Seq[Expression]): Expression =
    org.apache.spark.sql.execution.aggregate.ScalaAggregator(
      org.apache.spark.sql.expressions.UserDefinedAggregator(agg, inputEncoder),
      children)

  /** Spark's internal bloom-filter aggregate (the engine uses it for
    * runtime join pruning; there is no public SQL surface). Returns the
    * serialized filter as one binary scalar. Values are pre-hashed with
    * XxHash64 exactly as InjectRuntimeFilter does. */
  def bloomAgg(child: Expression, estItems: Long, numBits: Long): Expression =
    new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(child)),
      org.apache.spark.sql.catalyst.expressions.Literal(estItems),
      org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression()

  /** Probe companion to [[bloomAgg]] — stays inside whole-stage codegen. */
  def bloomMightContain(bloom: Expression, value: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      bloom, new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(value)))

  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
