package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one sanctioned crossing of the Spark-private API boundary: builds a
  * [[Column]] from a raw Catalyst [[Expression]] (and back), so graft's
  * native aggregates are usable from the DataFrame API in ANY session — not
  * only ones that registered [[graft.GraftExtensions]] SQL names.
  * `ExpressionUtils` is `private[sql]`, hence this shim lives inside an
  * `org.apache.spark.sql` subpackage; everything else in the repo stays on
  * public API.
  */
object ColumnGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
