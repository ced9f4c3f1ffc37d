package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters — the
  * standard pattern for libraries that ship custom Catalyst expressions
  * (Spark 4 removed the public `Column(expr)` constructor in favor of
  * ColumnNodes; `classic.ExpressionUtils` is the supported internal shim).
  */
package object graftx {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function into a LIVE session's registry — the complement of
    * `spark.sql.extensions` (which only applies at session construction). */
  def registerFunction(
      spark: SparkSession,
      name: String,
      info: catalyst.expressions.ExpressionInfo,
      builder: Seq[catalyst.expressions.Expression] => catalyst.expressions.Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      catalyst.FunctionIdentifier(name), info, builder)
}
