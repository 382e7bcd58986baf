package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Accessor for the `private[sql]` Expression↔Column converters — the
  * standard bridge pattern for extension libraries that build `Column`s
  * from native Catalyst expressions without a session-bound function
  * registry (Spark 4 removed the public `new Column(expr)` constructor).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
