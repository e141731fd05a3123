package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Post-execution shuffle accounting — the measured form of the engine's
  * "minimize shuffles" design claims. Where `PlanShapeSpec` pins plan
  * SHAPES (which exchanges exist), this reads the executed plan's
  * metrics to pin plan COSTS (how many records/bytes those exchanges
  * actually carried), so a statement like "the bucketed join shuffles
  * only aggregate partials" is asserted in records, not prose.
  *
  * Walks through AQE wrappers and query stages; broadcast exchanges are
  * intentionally excluded (broadcasting a dimension IS the engine's
  * preferred alternative to shuffling a fact).
  */
object PlanMetrics {

  final case class ShuffleStats(exchanges: Int, recordsWritten: Long,
                                bytesWritten: Long)

  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a) ++ walk(a.executedPlan)
    case q: QueryStageExec => Seq(q) ++ walk(q.plan)
    case other => Seq(other) ++ other.children.flatMap(walk)
  }

  /** Shuffle totals of an ALREADY-EXECUTED frame (metrics are zero until
    * an action has run the plan). Round-robin exchanges are excluded by
    * default: the only ones the engine plans are `Tables.fanOut`'s
    * single-row-group scan spreading — test-environment plumbing that is
    * a documented no-op on real multi-split tables — and counting them
    * would charge every query a full input-cardinality shuffle that
    * doesn't exist at scale.
    */
  def shuffleStats(df: DataFrame,
                   includeRoundRobin: Boolean = false): ShuffleStats = {
    import org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning
    val shuffles = walk(df.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeLike => s }
      .filter(s => includeRoundRobin || (s.outputPartitioning match {
        case _: RoundRobinPartitioning => false
        case _ => true
      }))
    ShuffleStats(
      shuffles.size,
      shuffles.map(_.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)).sum,
      shuffles.map(_.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)).sum)
  }

  /** Run the frame and return (row count, shuffle stats). Executes via
    * `collect()` on the frame's OWN QueryExecution — `count()` would
    * plan a separate aggregate on top and leave this plan's metrics
    * untouched.
    */
  def measure(df: DataFrame): (Long, ShuffleStats) = {
    val n = df.collect().length.toLong
    (n, shuffleStats(df))
  }
}
