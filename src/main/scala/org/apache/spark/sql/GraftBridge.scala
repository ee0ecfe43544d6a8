package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for graft's native Catalyst expressions.
  * Lives in the spark.sql package to reach the classic converters (the same
  * technique frameless/delta use); the rest of the engine never touches
  * Spark internals directly.
  */
object GraftBridge {
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toCol(e: Expression): Column = classic.ExpressionUtils.column(e)
}
