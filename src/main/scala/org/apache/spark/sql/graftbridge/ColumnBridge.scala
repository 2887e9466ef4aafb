package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge. Spark 4 keeps these
  * conversions `private[sql]` (`org.apache.spark.sql.classic.
  * ExpressionUtils`), so like other third-party Catalyst extensions we
  * expose them from a package under `org.apache.spark.sql`. This is the
  * only place the library reaches into Spark-private API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
