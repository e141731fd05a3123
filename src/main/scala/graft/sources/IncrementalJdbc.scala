package graft.sources

import java.util.Properties
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental "timestamp-mode" table polling — the engine's analog of the
  * reference's Kafka Connect JDBC source (`connect_postgres.config:4-14`:
  * `mode=timestamp`, `timestamp.column.name=dt_update`,
  * `poll.interval.ms=500`).
  *
  * Semantics copied from the reference (README.md:136): every poll emits
  * rows whose timestamp column is strictly greater than the last seen
  * maximum — new inserts only, updates to old rows are not re-captured.
  * The offset is the max timestamp of emitted rows, exactly the Connect
  * task's stored offset.
  *
  * Design: the snapshot provider is pluggable so the polling/offset logic
  * is testable offline (no Postgres in the sandbox, SURVEY.md §7.5.1) —
  * production wires [[jdbcProvider]], tests wire any DataFrame factory.
  * The incremental filter is applied INSIDE the provider's frame, so with
  * the JDBC provider it becomes a pushed-down WHERE in the remote query
  * (dt_update > offset), not a full-table scan per poll — the property
  * that keeps 500 ms polling viable on a large table.
  *
  * @param delayIntervalMs rows newer than `now - delay` are left for a
  *   later poll — Kafka Connect's `timestamp.delay.interval.ms`. Without
  *   it, a transaction that commits AFTER a poll but with a dt_update
  *   at or below the already-advanced offset is lost forever (the classic
  *   timestamp-mode race). 0 keeps polling deterministic for tests.
  * @param nowMillis clock the delay is measured against. MUST be the
  *   DATABASE's clock in production (e.g. `SELECT current_timestamp` over
  *   the same connection) — measuring against the driver's wall clock
  *   silently erodes the delay by any driver-ahead skew, which is exactly
  *   the window the parameter exists to protect.
  */
class IncrementalJdbc(
    provider: () => DataFrame,
    timestampCol: String = "dt_update",
    delayIntervalMs: Long = 0L,
    nowMillis: () => Long = () => System.currentTimeMillis()) {

  /** Last emitted watermark (epoch micros); None before the first poll. */
  @volatile private var offset: Option[java.sql.Timestamp] = None
  private val stopped = new AtomicBoolean(false)

  def currentOffset: Option[java.sql.Timestamp] = offset

  /** One poll: rows with ts > offset, and the offset advance. Returns the
    * incremental batch (possibly empty).
    *
    * The batch is MATERIALIZED before the offset advances: a lazy frame
    * would re-run the remote query at every downstream action, so rows
    * inserted between the offset computation and the sink's evaluation
    * would be delivered twice (this poll re-reads them, the next poll's
    * filter matches them again). Incremental batches are bounded by
    * ingest-rate × poll-interval, so the local materialization is small
    * by construction.
    */
  def poll(): DataFrame = {
    val snap = provider()
    val spark = snap.sparkSession
    val lower = offset match {
      case Some(ts) => snap.filter(col(timestampCol) > lit(ts))
      case None => snap
    }
    val batch =
      if (delayIntervalMs > 0)
        lower.filter(col(timestampCol) <= lit(
          new java.sql.Timestamp(nowMillis() - delayIntervalMs)))
      else lower
    val rows = batch.collect()
    val stable = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), batch.schema)
    val tsIdx = batch.schema.fieldIndex(timestampCol)
    val newMax = rows.iterator
      .filterNot(_.isNullAt(tsIdx)).map(_.getTimestamp(tsIdx))
      .foldLeft(Option.empty[java.sql.Timestamp]) {
        case (acc, t) => Some(acc.filter(_.after(t)).getOrElse(t))
      }
    newMax.foreach(m => offset = Some(m))
    stable
  }

  /** Poll loop at `intervalMs` (reference default 500 ms), invoking `sink`
    * per non-empty batch, until [[stop]] — the pragmatic micro-batch loop
    * of SURVEY.md §7.4. Runs on the calling thread; callers wrap in a
    * Future/Thread for background use.
    */
  def run(intervalMs: Long = 500L, maxPolls: Long = Long.MaxValue)
         (sink: DataFrame => Unit): Unit = {
    var polls = 0L
    while (!stopped.get() && polls < maxPolls) {
      val batch = poll()
      if (!batch.isEmpty) sink(batch)
      polls += 1
      if (!stopped.get() && polls < maxPolls) Thread.sleep(intervalMs)
    }
  }

  def stop(): Unit = stopped.set(true)
}

object IncrementalJdbc {

  /** Production provider: a JDBC relation (reference
    * `connect_postgres.config:6-8,11` — url/user/password + table
    * whitelist). Filters composed on this frame push down into the remote
    * SQL via Spark's JDBC predicate pushdown.
    */
  def jdbcProvider(spark: SparkSession, url: String, table: String,
                   props: Properties): () => DataFrame =
    () => spark.read.jdbc(url, table, props)

  /** K5: the generator's append write (reference `make_fake_data.py:76`). */
  def appendJdbc(df: DataFrame, url: String, table: String,
                 props: Properties): Unit =
    df.write.mode("append").jdbc(url, table, props)
}
