package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column ⇄ Expression bridge `private[sql]`
  * (columnNodeSupport.scala); third-party Catalyst extensions reach it by
  * living in a subpackage of org.apache.spark.sql — the established pattern
  * for expression libraries. This is the only file outside the graft
  * namespace. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
