package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{GtfsTimeToSeconds, VectorDot}

/** Library entry point for `spark.sql.extensions`: users add
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` at
  * session build and every custom expression is available in SQL
  * without imperative registration calls — the idiomatic way to ship
  * Catalyst extensions in a library jar.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("gtfs_time_to_seconds"),
      new ExpressionInfo(classOf[GtfsTimeToSeconds].getName, "gtfs_time_to_seconds"),
      (exprs: Seq[Expression]) => GtfsTimeToSeconds(exprs.head)))
    extensions.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (exprs: Seq[Expression]) => VectorDot(exprs.head, exprs(1))))
  }
}
