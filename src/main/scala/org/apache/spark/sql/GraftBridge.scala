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

  /** Wrap an already-computed RDD of InternalRows as a DataFrame (the
    * private[sql] internalCreateDataFrame). Re-consuming the SAME RDD
    * instance is what lets an operator pin one exchange's partitioning
    * across several jobs — Spark reuses the computed shuffle files — with
    * nothing persisted. */
  def internalDf(spark: SparkSession,
                 rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
                 schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)

  /** The session's function registry — the post-hoc doorway for
    * [[graft.GraftExtensions.install]] on sessions built without
    * `spark.sql.extensions`. */
  def functionRegistry(spark: SparkSession): org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
}
