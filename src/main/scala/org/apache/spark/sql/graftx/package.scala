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
}
