package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` ColumnNode conversion layer.
  *
  * Spark 4 moved `Column` onto an API-agnostic ColumnNode tree; the
  * catalyst `Expression <-> Column` converters
  * (`classic.ExpressionUtils`) became `private[sql]`, so a library
  * shipping its own native expressions (e.g.
  * `graft.functions.WordShingles`) needs this one-file shim in the
  * `org.apache.spark.sql` package — the same pattern Spark connectors
  * use. No Spark behavior is altered; this only re-exports the two
  * converters.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
