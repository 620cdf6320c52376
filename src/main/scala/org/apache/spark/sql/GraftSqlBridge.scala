package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ catalyst Expression bridge. Spark 4 split the public Column
  * API from catalyst and made the converters private[sql]; third-party
  * engines adding native expressions use an sql-package bridge object
  * (the pattern frameworks like Delta use for the same need). */
object GraftSqlBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
