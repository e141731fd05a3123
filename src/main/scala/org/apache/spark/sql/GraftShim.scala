package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. Spark 4 made these conversions
  * `private[sql]` (they live in `classic.ExpressionUtils`); a library
  * defining native Catalyst expressions needs exactly these two hooks, so
  * this shim re-exports them from inside the package. Public Spark API
  * only — no internal behavior is altered.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Post-hoc SQL function registration on a live session (the config-time
    * path is `spark.sql.extensions=graft.GraftExtensions`).
    */
  def registerFunction(
      spark: SparkSession, name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
