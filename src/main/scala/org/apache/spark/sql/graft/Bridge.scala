package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ↔ Column conversion for custom Catalyst expressions.
  *
  * Spark 4's Column API is connect-agnostic, so the classic conversion
  * lives behind `private[sql]` (`org.apache.spark.sql.classic
  * .ExpressionUtils`). This bridge re-exports exactly the two conversions
  * from a `sql` subpackage — the standard pattern for libraries that ship
  * native expressions without a session extension.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
