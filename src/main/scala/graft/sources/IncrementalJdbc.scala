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
  * @param maxRowsPerPoll chunk cap: a poll that would exceed it instead
  *   delivers the oldest `maxRowsPerPoll` rows (by timestamp) and advances
  *   the offset to the chunk boundary, so the next poll resumes there.
  *   This bounds the driver-side materialization of the INITIAL backfill
  *   against a large pre-existing table (the reference's Connect task
  *   streams that snapshot through a JDBC cursor; we stream it across
  *   polls). The limit reaches the remote as `ORDER BY ts LIMIT n` via
  *   Spark's sort+limit pushdown (a top-k, never a full scan collect).
  * @param initialOffset seed watermark — Connect's `timestamp.initial`
  *   analog. `Some(ts)` skips the backfill of rows at or before `ts`;
  *   None starts from the beginning of the table.
  */
class IncrementalJdbc(
    provider: () => DataFrame,
    timestampCol: String = "dt_update",
    delayIntervalMs: Long = 0L,
    nowMillis: () => Long = () => System.currentTimeMillis(),
    maxRowsPerPoll: Int = Int.MaxValue,
    initialOffset: Option[java.sql.Timestamp] = None) {
  require(maxRowsPerPoll > 0, "maxRowsPerPoll must be positive")

  /** Last emitted watermark; `initialOffset` before the first poll. */
  @volatile private var offset: Option[java.sql.Timestamp] = initialOffset
  private val stopped = new AtomicBoolean(false)

  def currentOffset: Option[java.sql.Timestamp] = offset

  /** One poll: rows with ts > offset (at most ~[[maxRowsPerPoll]] of them),
    * and the offset advance. Returns the incremental batch (possibly
    * empty).
    *
    * Rows with a NULL timestamp are never captured — Connect's
    * timestamp-mode WHERE clause has the same property (NULL compares
    * UNKNOWN), and emitting them would re-deliver them on every backfill
    * poll since the offset can never advance past them.
    *
    * The batch is MATERIALIZED before the offset advances: a lazy frame
    * would re-run the remote query at every downstream action, so rows
    * inserted between the offset computation and the sink's evaluation
    * would be delivered twice (this poll re-reads them, the next poll's
    * filter matches them again). Steady-state batches are bounded by
    * ingest-rate × poll-interval; the initial backfill is bounded by
    * [[maxRowsPerPoll]] per chunk (the materialize-before-advance
    * invariant holds per chunk).
    *
    * Chunk boundaries land on TIMESTAMP boundaries: pure timestamp mode
    * resumes with a strictly-greater filter, so splitting a run of
    * equal-timestamp rows across chunks would silently skip the tail of
    * the run. When the cap cuts mid-timestamp we back off to the previous
    * distinct timestamp; if every collected row shares ONE timestamp the
    * whole equal-ts run is delivered in this chunk (possibly exceeding the
    * cap — the unavoidable pure-timestamp-mode case, same as Connect).
    */
  def poll(): DataFrame = {
    val snap = provider()
    val spark = snap.sparkSession
    val lower = offset match {
      case Some(ts) => snap.filter(col(timestampCol) > lit(ts))
      case None => snap.filter(col(timestampCol).isNotNull)
    }
    val bounded =
      if (delayIntervalMs > 0)
        lower.filter(col(timestampCol) <= lit(
          new java.sql.Timestamp(nowMillis() - delayIntervalMs)))
      else lower
    // Over-fetch by one row so "exactly the cap" is distinguishable from
    // "truncated at the cap".
    val probe =
      if (maxRowsPerPoll < Int.MaxValue)
        bounded.sort(col(timestampCol).asc).limit(maxRowsPerPoll + 1)
      else bounded
    val fetched = probe.collect()
    val tsIdx = probe.schema.fieldIndex(timestampCol)
    val rows =
      if (fetched.length <= maxRowsPerPoll) fetched
      else {
        val chunkMax = fetched.last.getTimestamp(tsIdx) // sorted asc
        val beforeMax = fetched.filter(r =>
          !r.isNullAt(tsIdx) && r.getTimestamp(tsIdx).before(chunkMax))
        if (beforeMax.nonEmpty) beforeMax
        // Every fetched row shares chunkMax: deliver the full equal-ts
        // run so the strictly-greater resume filter cannot skip its tail.
        else bounded.filter(col(timestampCol) <= lit(chunkMax)).collect()
      }
    val stable = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), probe.schema)
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
