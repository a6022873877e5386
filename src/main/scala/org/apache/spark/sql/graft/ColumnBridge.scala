package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> Expression converters.
  *
  * Spark 4 routes `Column` through ColumnNode (Spark Connect refactor), so
  * third-party Catalyst expressions need these two hops to surface as
  * user-facing `Column`s. Lives under `org.apache.spark.sql` purely for
  * `private[sql]` access; contains no logic of its own.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
