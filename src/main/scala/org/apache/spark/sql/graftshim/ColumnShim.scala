package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between `Column` and Catalyst `Expression` for Spark 4, where
  * the constructor-side conversion became `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Lives in an
  * `org.apache.spark.sql` subpackage purely for access; all engine
  * logic stays in `graft.*`.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
