package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` classic Column <-> Expression converters,
  * needed to expose native Catalyst expressions (graft.functions.DotProduct)
  * as Columns without going through the SQL parser. Standard extension-point
  * technique for libraries shipping custom expressions on Spark 4.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
