package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Expression converters.
  *
  * Spark 4 decoupled `Column` from catalyst (`ColumnNode`); the
  * supported conversion (`classic.ExpressionUtils`) is package-private
  * to `org.apache.spark.sql`, so libraries adding custom catalyst
  * expressions expose it through a same-package object. JVM-public,
  * Scala `private[sql]` — this is the conventional extension shim.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
