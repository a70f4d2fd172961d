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
