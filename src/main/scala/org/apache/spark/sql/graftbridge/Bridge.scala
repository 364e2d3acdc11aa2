package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal accessor for the `private[sql]` Column ⇄ Expression bridge in
 * Spark 4 (org.apache.spark.sql.classic.ExpressionUtils). Spark 4 removed
 * the public `new Column(expr)` constructor when Column became
 * ColumnNode-backed; a library defining native Catalyst Expressions (see
 * graft.functions) needs exactly these two hops and nothing else from the
 * internal API.
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
