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
}
