package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column↔Expression conversion `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils). Custom Catalyst
  * expressions still need it; this shim re-exports the two converters from
  * inside the sql package namespace. No Spark internals are modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
