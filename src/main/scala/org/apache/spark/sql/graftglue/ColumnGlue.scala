package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge. Spark 4 made the converters
  * `private[sql]` (`classic.ExpressionUtils`); extensions that add
  * native Catalyst expressions need this two-line glue inside the sql
  * package namespace — the documented pattern for third-party
  * expression libraries.
  */
object ColumnGlue {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
