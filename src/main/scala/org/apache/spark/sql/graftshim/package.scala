package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column ↔ Expression converters
  * (Spark 4 removed the public `Column(expr)` constructor in the classic API).
  * Lives in the org.apache.spark.sql namespace solely for access; contains no
  * Spark code.
  */
package object graftshim {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a temp SQL function on a live session (the runtime counterpart
    * of SparkSessionExtensions.injectFunction, which only applies at session
    * build time). */
  def registerTempFunction(spark: SparkSession, name: String,
                           builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
