package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge: `Column ⇄ Expression` conversion lives in
  * `private[sql]` scope in Spark 4 (`classic.ExpressionUtils`). This object
  * sits under `org.apache.spark.sql` so graft's custom Catalyst
  * expressions (graft.functions.*) can be exposed as public `Column`s —
  * the same technique third-party Spark extension libraries use.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
