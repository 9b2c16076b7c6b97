package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ↔ Column conversion for custom Catalyst expressions.
  *
  * Spark 4's Column API is connect-agnostic, so the classic conversion
  * lives behind `private[sql]` (`org.apache.spark.sql.classic
  * .ExpressionUtils`). This bridge re-exports exactly the two conversions
  * from a `sql` subpackage — the standard pattern for libraries that ship
  * native expressions without a session extension — plus live-session
  * function registration (`sessionState` is likewise `private[sql]`).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder into an already-running classic
    * session's registry (the `spark.sql.extensions` config is consulted
    * only at session construction).
    */
  def registerFunction(spark: SparkSession, id: FunctionIdentifier,
      info: ExpressionInfo, builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)
}
