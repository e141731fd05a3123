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

  /** Unpersist the cached RDD backing a checkpoint-produced frame (the
    * `LogicalRDD` a `localCheckpoint(true)` returns). Iterative trainers
    * checkpoint per round; without this the superseded round's blocks
    * accumulate in the block manager for the session's lifetime
    * (round-17, ADVICE r16). Safe ONLY once nothing will read the frame
    * again — a locally-checkpointed RDD has no recompute path. No-op
    * for frames whose backing RDD holds no storage (e.g. reliable
    * checkpoints, whose data lives in the checkpoint dir).
    */
  def unpersistCheckpointBacking(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach { rdd =>
      if (rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
        rdd.unpersist(blocking = false)
    }

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
