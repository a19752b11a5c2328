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

  /** DSv1 streaming `Source.getBatch` must return a DataFrame with
    * `isStreaming = true` (MicroBatchExecution asserts it); the only way to
    * stamp that on a computed plan is `internalCreateDataFrame`, which is
    * `private[sql]` — re-exported here like the converters above.
    */
  def streamingDataFrame(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
