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

  /** Column → full expression TREE, for SQL-function builders that compose
    * `functions._` columns ([[graft.functions.GraftExtensions]]'s
    * graft_hash_split / graft_mixture_keep): unlike [[expression]] — which
    * wraps a composed column as one opaque, unevaluable
    * ColumnNodeExpression leaf — this converts the column node graph into
    * an ordinary analyzable tree whose UnresolvedFunction nodes the
    * analyzer resolves like any parsed SQL. */
  def tree(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
