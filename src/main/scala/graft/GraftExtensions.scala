package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `spark.sql.extensions=graft.GraftExtensions` entry point — injects the
  * same custom-function builder set as [[graft.functions.GraftFunctions
  * .register]] at session build, so external spark-submit / spark-sql
  * sessions resolve `pg_text_array`, `rolling_min64`, … with no graft code
  * in the app (verified end-to-end through `spark-submit --conf`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name), b))
    }
}
