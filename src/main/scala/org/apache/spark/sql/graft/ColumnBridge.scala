package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters, needed
  * to wire custom Catalyst expressions into the public Column API
  * (the same technique Spark extension libraries use). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DEEP conversion of a Column's node tree to a raw Catalyst
    * Expression — [[expression]] returns a lazy `ColumnNodeExpression`
    * wrapper that only resolves through the Dataset analyzer and fails
    * inside a `FunctionRegistry` builder ("columnnodeexpression() of
    * type VOID" — the round-5 lesson); this one runs the classic
    * converter over the whole tree, so SQL function builders can
    * compose the Column API (shared operator chains like
    * `Web.normalizeUrl`) instead of hand-duplicating Catalyst trees. */
  def expressionDeep(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a session-scoped SQL function backed by an Expression
    * builder — the `FunctionRegistry` hook `SparkSessionExtensions`
    * uses, reached directly so the graft kernels are callable from
    * `spark.sql(...)` text, not just the Column API. */
  def registerTempFunction(spark: org.apache.spark.sql.SparkSession,
      name: String, builder: Seq[Expression] => Expression): Unit =
    registry(spark).createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Current builder registered under `name`, if any — lets a scoped
    * registrar save what it is about to replace and restore it later. */
  def lookupTempFunction(spark: org.apache.spark.sql.SparkSession,
      name: String): Option[Seq[Expression] => Expression] =
    registry(spark).lookupFunctionBuilder(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name))

  def dropTempFunction(spark: org.apache.spark.sql.SparkSession,
      name: String): Unit =
    registry(spark).dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name))

  private def registry(spark: org.apache.spark.sql.SparkSession) =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
}
