package graft.sources

import java.sql.Timestamp
import java.util.Properties
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Resume position of an incremental table poll.
  *
  * Pure timestamp mode carries only `ts` (Connect's `mode=timestamp`,
  * reference `connect_postgres.config:9-10`); composite mode additionally
  * carries the incrementing id of the last delivered row (Connect's
  * `mode=timestamp+incrementing` — its documented escape hatch for
  * coarse-granularity timestamp columns, where many rows share one
  * timestamp value).
  */
final case class JdbcOffset(ts: Timestamp, id: Option[Long] = None)

/** A bounded, ordered slice of the source table. Implementations MUST
  * apply the bounds, ordering and limit AT THE SOURCE (remote SQL for
  * JDBC): the whole point of chunked polling is that a poll never
  * transfers more than ~`limit` rows from the database.
  *
  * Contract of [[ChunkSource.chunk]]:
  *  - rows strictly past `lower`: `ts > lower.ts` in pure timestamp mode;
  *    `ts > lower.ts OR (ts = lower.ts AND id > lower.id)` when
  *    [[ChunkSource.incrementingCol]] is set,
  *  - `ts <= upper` when `upper` is given (the delay bound),
  *  - rows with a NULL timestamp are never returned (Connect's WHERE
  *    clause has the same property — NULL compares UNKNOWN — and emitting
  *    them would re-deliver them every poll since the offset can never
  *    advance past them),
  *  - ascending `(ts)` / `(ts, id)` order, at most `limit` rows.
  */
trait ChunkSource {
  def timestampCol: String
  def incrementingCol: Option[String]
  def chunk(lower: Option[JdbcOffset], upper: Option[Timestamp],
            limit: Option[Int]): DataFrame

  /** Keys-only probe: the (ts[, id]) keys of the chunk's rows, in chunk
    * order — what the parallel planner materializes on the driver instead
    * of full rows, so the driver's footprint per poll is two narrow
    * columns regardless of row width. The default derives from [[chunk]]
    * with a keys projection (the column pruning reaches a V1 JDBC scan's
    * remote SELECT list; over parquet/memory frames only the key columns
    * are read).
    */
  def chunkKeys(lower: Option[JdbcOffset], upper: Option[Timestamp],
                limit: Option[Int]): Array[JdbcOffset] = {
    val keyCols = col(timestampCol) +: incrementingCol.map(col).toSeq
    chunk(lower, upper, limit).select(keyCols: _*).collect().map { r =>
      JdbcOffset(r.getTimestamp(0), incrementingCol.map(_ => r.getLong(1)))
    }
  }

  /** Serializable executor-side fetcher for `(lower, upper]` row ranges.
    * When present, the `graft-jdbc` stream plans range partitions (tasks
    * read their own slices); None (the default) keeps the single-task
    * driver-stash delivery path.
    */
  def rangeFetcher: Option[ChunkFetcher] = None
}

/** [[ChunkSource]] over any snapshot-frame factory — the offline/test
  * implementation (no database in the build sandbox, SURVEY.md §7.5.1),
  * and the fallback for sources that cannot accept injected SQL.
  *
  * Bounds are applied as DataFrame predicates on the provided frame: over
  * a parquet/memory frame they evaluate where the data lives; over a V1
  * `spark.read.jdbc` frame the PREDICATES push into the remote WHERE but
  * the sort+limit do NOT (V1 JDBC pushes filters only — the top-k runs as
  * a local TakeOrderedAndProject over everything past the offset, so a
  * full backfill re-scans the remainder each chunk: O(N²/cap) remote rows
  * read). Production JDBC polling should use
  * [[IncrementalJdbc.jdbcChunkSource]], which inlines the whole chunk
  * query — bounds, order AND limit — into the remote statement.
  */
final class SnapshotChunkSource(
    provider: () => DataFrame,
    val timestampCol: String = "dt_update",
    val incrementingCol: Option[String] = None,
    fetcher: Option[ChunkFetcher] = None) extends ChunkSource {

  override def rangeFetcher: Option[ChunkFetcher] = fetcher

  override def chunk(lower: Option[JdbcOffset], upper: Option[Timestamp],
                     limit: Option[Int]): DataFrame = {
    val ts = col(timestampCol)
    val lowerBounded = (lower, incrementingCol) match {
      case (Some(o), Some(idCol)) =>
        val idBound = o.id.map(i => (ts === lit(o.ts)) && (col(idCol) > lit(i)))
          .getOrElse(lit(false))
        provider().filter(ts > lit(o.ts) || idBound)
      case (Some(o), None) => provider().filter(ts > lit(o.ts))
      case (None, _) => provider().filter(ts.isNotNull)
    }
    val bounded = upper.map(u => lowerBounded.filter(ts <= lit(u)))
      .getOrElse(lowerBounded)
    val ordered = incrementingCol match {
      case Some(idCol) => bounded.sort(ts.asc, col(idCol).asc)
      case None => bounded.sort(ts.asc)
    }
    limit.map(ordered.limit).getOrElse(ordered)
  }
}

/** Incremental "timestamp-mode" table polling — the engine's analog of the
  * reference's Kafka Connect JDBC source (`connect_postgres.config:4-14`:
  * `mode=timestamp`, `timestamp.column.name=dt_update`,
  * `poll.interval.ms=500`).
  *
  * Semantics copied from the reference (README.md:136): every poll emits
  * rows strictly past the last seen offset — new inserts only, updates to
  * old rows are not re-captured. The offset is the position of the last
  * emitted row, exactly the Connect task's stored offset.
  *
  * @param source where chunks come from: [[SnapshotChunkSource]] offline,
  *   [[IncrementalJdbc.jdbcChunkSource]] against a database (bounds +
  *   ORDER BY + LIMIT all execute remotely via an inlined subquery).
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
  *   delivers the oldest `maxRowsPerPoll` rows and advances the offset to
  *   the chunk boundary, so the next poll resumes there. This bounds the
  *   driver-side materialization of the INITIAL backfill against a large
  *   pre-existing table (the reference's Connect task streams that
  *   snapshot through a JDBC cursor; we stream it across polls). The
  *   default is finite on purpose: an uncapped first poll against a big
  *   table is an unbounded driver collect. Pass `Int.MaxValue` explicitly
  *   to disable chunking (tests, known-small tables).
  * @param initialOffset seed watermark — Connect's `timestamp.initial`
  *   analog. `Some(o)` skips the backfill of rows at or before `o`;
  *   None starts from the beginning of the table.
  */
class IncrementalJdbc(
    source: ChunkSource,
    delayIntervalMs: Long = 0L,
    nowMillis: () => Long = () => System.currentTimeMillis(),
    maxRowsPerPoll: Int = IncrementalJdbc.DefaultMaxRowsPerPoll,
    initialOffset: Option[JdbcOffset] = None) {
  require(maxRowsPerPoll > 0, "maxRowsPerPoll must be positive")

  /** Last emitted position; `initialOffset` before the first poll. */
  @volatile private var offset: Option[JdbcOffset] = initialOffset
  private val stopped = new AtomicBoolean(false)

  def currentOffset: Option[JdbcOffset] = offset

  /** One poll: the next chunk of at most ~[[maxRowsPerPoll]] rows past the
    * current offset, and the offset advance. Returns the incremental batch
    * (possibly empty).
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
    * Chunk-boundary semantics by mode:
    *  - COMPOSITE (`incrementingCol` set, Connect's
    *    `timestamp+incrementing`): `(ts, id)` totally orders rows, so the
    *    cap cuts anywhere — every chunk is exactly ≤ cap rows, including
    *    runs of equal timestamps larger than the cap (they span chunks,
    *    resumed by the id tiebreak). Prefer this mode for
    *    coarse-granularity timestamp columns (second-precision at high
    *    ingest), where a single equal-ts run can be arbitrarily large.
    *  - PURE TIMESTAMP: resume is a strictly-greater ts filter, so a
    *    boundary may only land on a DISTINCT-timestamp edge — splitting an
    *    equal-ts run would silently skip its tail. When the cap cuts
    *    mid-run we back off to the previous distinct timestamp; if every
    *    fetched row shares ONE timestamp the whole run is delivered in
    *    this chunk, EXCEEDING the cap via an unbounded collect — the
    *    unavoidable pure-timestamp corner (same as Connect). With a
    *    coarse timestamp column this re-opens the OOM the cap exists to
    *    prevent: use composite mode there.
    *
    * The over-fetch of one row (cap+1) distinguishes "exactly the cap"
    * from "truncated at the cap" without a second round-trip.
    */
  def poll(): DataFrame = {
    val upper =
      if (delayIntervalMs > 0) Some(new Timestamp(nowMillis() - delayIntervalMs))
      else None
    val (rows, schema, newOffset) =
      IncrementalJdbc.chunkRows(source, offset, upper, maxRowsPerPoll)
    val stable = SparkSession.active.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
    newOffset.foreach(o => offset = Some(o))
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

  /** Finite by default: an uncapped poll is an unbounded driver collect on
    * the initial backfill. 100k rows ≈ tens of MB for a typical row.
    */
  val DefaultMaxRowsPerPoll: Int = 100000

  /** One materialized chunk past `lower`: the shared probe + boundary
    * logic behind both [[IncrementalJdbc.poll]] and the DSv2
    * [[GraftJdbcMicroBatchStream]]. Returns the delivered rows (ascending
    * (ts[, id]) order), their schema, and the advanced offset (None when
    * the chunk is empty). See [[IncrementalJdbc.poll]]'s scaladoc for the
    * chunk-boundary semantics per mode.
    */
  def chunkRows(source: ChunkSource, lower: Option[JdbcOffset],
                upper: Option[Timestamp], maxRows: Int)
      : (Array[org.apache.spark.sql.Row], org.apache.spark.sql.types.StructType,
         Option[JdbcOffset]) = {
    val capped = maxRows < Int.MaxValue
    val probe = source.chunk(lower, upper, if (capped) Some(maxRows + 1) else None)
    val schema = probe.schema
    val tsIdx = schema.fieldIndex(source.timestampCol)
    val idIdx = source.incrementingCol.map(schema.fieldIndex)
    val fetched = probe.collect()
    val rows =
      if (!capped || fetched.length <= maxRows) fetched
      else idIdx match {
        case Some(_) => fetched.take(maxRows)
        case None =>
          val chunkMax = fetched.last.getTimestamp(tsIdx) // sorted asc
          val beforeMax = fetched.filter(_.getTimestamp(tsIdx).before(chunkMax))
          if (beforeMax.nonEmpty) beforeMax
          // Every fetched row shares chunkMax: deliver the full equal-ts
          // run so the strictly-greater resume filter cannot skip its
          // tail (unbounded by design; composite mode is the escape).
          else source.chunk(lower, Some(chunkMax), None).collect()
      }
    val next = rows.lastOption.map(last => // ascending (ts[, id]) order
      JdbcOffset(last.getTimestamp(tsIdx), idIdx.map(i => last.getLong(i))))
    (rows, schema, next)
  }

  /** Keys-only analog of [[chunkRows]]: identical chunk-boundary
    * semantics (cap, composite cut-anywhere, pure-timestamp distinct-ts
    * backoff and equal-run fallback), but only (ts[, id]) keys cross to
    * the driver — the probe behind parallel range planning. Returns the
    * chunk's keys and the advanced offset (None when empty).
    */
  def chunkKeysProbe(source: ChunkSource, lower: Option[JdbcOffset],
                     upper: Option[Timestamp], maxRows: Int)
      : (Array[JdbcOffset], Option[JdbcOffset]) = {
    val capped = maxRows < Int.MaxValue
    val fetched = source.chunkKeys(lower, upper,
      if (capped) Some(maxRows + 1) else None)
    val keys =
      if (!capped || fetched.length <= maxRows) fetched
      else if (source.incrementingCol.isDefined) fetched.take(maxRows)
      else {
        val chunkMax = fetched.last.ts // ascending order
        val beforeMax = fetched.filter(_.ts.before(chunkMax))
        if (beforeMax.nonEmpty) beforeMax
        // every fetched key shares chunkMax: deliver the full equal-ts
        // run (see chunkRows — the strictly-greater resume filter must
        // not skip its tail)
        else source.chunkKeys(lower, Some(chunkMax), None)
      }
    (keys, keys.lastOption)
  }

  /** The executor-side range statement: all rows in `(lower, upper]` by
    * (ts[, id]) order — [[chunkSql]]'s WHERE shape with an INCLUSIVE
    * upper KEY in place of the LIMIT, so each of N tasks streams exactly
    * its planned slice of one micro-batch straight from the database.
    * Pure function, golden-tested without a database.
    */
  def rangeSql(table: String, timestampCol: String,
               incrementingCol: Option[String],
               lower: Option[JdbcOffset], upper: JdbcOffset): String = {
    def tsLit(t: Timestamp) = s"TIMESTAMP '${t.toString}'"
    val lowerPred = lower.map { o =>
      (incrementingCol, o.id) match {
        case (Some(idCol), Some(i)) =>
          s"($timestampCol > ${tsLit(o.ts)} OR ($timestampCol = ${tsLit(o.ts)} AND $idCol > $i))"
        case _ => s"$timestampCol > ${tsLit(o.ts)}"
      }
    }
    val upperPred = (incrementingCol, upper.id) match {
      case (Some(idCol), Some(i)) =>
        s"($timestampCol < ${tsLit(upper.ts)} OR ($timestampCol = ${tsLit(upper.ts)} AND $idCol <= $i))"
      case _ => s"$timestampCol <= ${tsLit(upper.ts)}"
    }
    val preds = (Seq(s"$timestampCol IS NOT NULL") ++ lowerPred) :+ upperPred
    val order = (Seq(timestampCol) ++ incrementingCol)
      .map(_ + " ASC").mkString(", ")
    s"SELECT * FROM $table WHERE ${preds.mkString(" AND ")} ORDER BY $order"
  }

  /** Offline/test construction over a snapshot-frame factory. */
  def ofSnapshot(provider: () => DataFrame,
                 timestampCol: String = "dt_update",
                 incrementingCol: Option[String] = None,
                 delayIntervalMs: Long = 0L,
                 nowMillis: () => Long = () => System.currentTimeMillis(),
                 maxRowsPerPoll: Int = DefaultMaxRowsPerPoll,
                 initialOffset: Option[JdbcOffset] = None): IncrementalJdbc =
    new IncrementalJdbc(
      new SnapshotChunkSource(provider, timestampCol, incrementingCol),
      delayIntervalMs, nowMillis, maxRowsPerPoll, initialOffset)

  /** The remote chunk statement, inlined as a dbtable subquery. Pure
    * function so the exact SQL a poll ships to the database is
    * unit-testable without a database.
    *
    * Timestamp literals use the ANSI `TIMESTAMP '...'` form with
    * `java.sql.Timestamp.toString` bodies (microsecond-precise,
    * quote-free); `LIMIT n` is the PostgreSQL/MySQL spelling — the
    * reference's database is Postgres (`connect_postgres.config:6`).
    * Other dialects (SQL Server TOP, Oracle FETCH FIRST) would swap this
    * builder, same as Connect's per-dialect query builders.
    */
  def chunkSql(table: String, timestampCol: String,
               incrementingCol: Option[String],
               lower: Option[JdbcOffset], upper: Option[Timestamp],
               limit: Option[Int]): String = {
    def tsLit(t: Timestamp) = s"TIMESTAMP '${t.toString}'"
    val lowerPred = lower.map { o =>
      (incrementingCol, o.id) match {
        case (Some(idCol), Some(i)) =>
          s"($timestampCol > ${tsLit(o.ts)} OR ($timestampCol = ${tsLit(o.ts)} AND $idCol > $i))"
        case _ => s"$timestampCol > ${tsLit(o.ts)}"
      }
    }
    val preds = Seq(s"$timestampCol IS NOT NULL") ++ lowerPred ++
      upper.map(u => s"$timestampCol <= ${tsLit(u)}")
    val order = (Seq(timestampCol) ++ incrementingCol)
      .map(_ + " ASC").mkString(", ")
    val lim = limit.map(n => s" LIMIT $n").getOrElse("")
    s"(SELECT * FROM $table WHERE ${preds.mkString(" AND ")} ORDER BY $order$lim) __graft_chunk"
  }

  /** Production provider (reference `connect_postgres.config:6-8,11` —
    * url/user/password + table whitelist): each chunk is ONE remote
    * statement carrying the WHERE bounds, the ORDER BY and the LIMIT via
    * [[chunkSql]], so the database streams at most `limit` rows per poll —
    * a true remote top-k, never a full scan. (Spark's V1 JDBC relation
    * pushes only predicates, which is why the limit is inlined into the
    * dbtable subquery instead of composed as `.sort.limit` on the frame.)
    */
  def jdbcChunkSource(spark: SparkSession, url: String, table: String,
                      props: Properties,
                      timestampColName: String = "dt_update",
                      incrementingColName: Option[String] = None): ChunkSource =
    new ChunkSource {
      val timestampCol: String = timestampColName
      val incrementingCol: Option[String] = incrementingColName
      def chunk(lower: Option[JdbcOffset], upper: Option[Timestamp],
                limit: Option[Int]): DataFrame =
        spark.read.jdbc(url,
          chunkSql(table, timestampCol, incrementingCol, lower, upper, limit),
          props)
      override def rangeFetcher: Option[ChunkFetcher] = {
        import scala.jdk.CollectionConverters._
        val propMap = props.stringPropertyNames().asScala
          .map(k => k -> props.getProperty(k)).toMap
        Some(JdbcRangeFetcher(url, table, propMap))
      }
    }

  /** K5: the generator's append write (reference `make_fake_data.py:76`). */
  def appendJdbc(df: DataFrame, url: String, table: String,
                 props: Properties): Unit =
    df.write.mode("append").jdbc(url, table, props)
}
