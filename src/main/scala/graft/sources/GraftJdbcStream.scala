package graft.sources

import java.sql.Timestamp
import java.util.Properties

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.readStream.format("graft-jdbc")` — the incremental JDBC source
  * as a REAL Structured Streaming source (DSv2 `MicroBatchStream`),
  * SURVEY.md §2.1 S1 option (b): offsets are the (timestamp[, id])
  * watermark of [[IncrementalJdbc]], checkpointed as JSON by the engine,
  * so restarts resume exactly where the last committed batch ended and a
  * replayed batch re-reads exactly its own (start, end] range — the
  * delivery guarantees Connect stores in its offset topic, inherited here
  * from the Structured Streaming commit log for free.
  *
  * Chunk probing happens ON THE DRIVER at `latestOffset()` time, bounded
  * by `maxRowsPerPoll`. Two delivery paths:
  *
  *  - PARALLEL (default whenever the source provides a
  *    [[ChunkSource.rangeFetcher]] — always true for the JDBC path): the
  *    probe materializes only (ts[, id]) KEYS
  *    ([[IncrementalJdbc.chunkKeysProbe]]), picks split keys every
  *    `rowsPerPartition` rows, and plans one [[GraftJdbcRangePartition]]
  *    per `(lo, hi]` slice. Each task then fetches its own slice where it
  *    runs — for JDBC, a remote range statement
  *    ([[IncrementalJdbc.rangeSql]]) over the task's own connection. The
  *    driver never holds a batch's rows; a 100 TB backfill streams
  *    through N executor connections.
  *  - STASH (fallback, `parallelReads=false` or no fetcher): the probe
  *    collects the rows themselves (the same materialize-before-advance
  *    probe as [[IncrementalJdbc.poll]]) and ships them inside the
  *    partitions — the reference Connect source's single-task shape
  *    (`tasks.max=1`, `connect_postgres.config:5`).
  *
  * Either way a replay after restart re-derives the checkpointed
  * (start, end] range from the source — correct under timestamp-mode's
  * append-only assumption (rows at or before a committed offset never
  * change; README.md:136), which also makes the two paths deliver
  * identical batches.
  *
  * Options:
  *  - `url`, `table`, `user`, `password`: the JDBC path (builds
  *    [[IncrementalJdbc.jdbcChunkSource]], remote-pushed chunk SQL).
  *  - `sourceHandle`: key into [[GraftJdbcStream.registry]] — a
  *    driver-registered [[ChunkSource]], the offline/test path (no
  *    database in the sandbox; the streaming machinery is identical).
  *  - `timestampColumn` (default dt_update), `incrementingColumn`
  *    (enables composite mode), `maxRowsPerPoll` (default 100k),
  *    `delayIntervalMs` (Connect's timestamp.delay), `rowsPerPartition`
  *    (split granularity of both paths, default 10k), `parallelReads`
  *    (default true; set false to force the stash path).
  */
class GraftJdbcStream extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jdbc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftJdbcStream.resolveSource(options).chunk(None, None, Some(1)).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new GraftJdbcTable(schema, new CaseInsensitiveStringMap(properties))
}

object GraftJdbcStream {
  /** Driver-side [[ChunkSource]] handles for the `sourceHandle` option. */
  val registry = new java.util.concurrent.ConcurrentHashMap[String, ChunkSource]()

  private[graft] def resolveSource(options: CaseInsensitiveStringMap): ChunkSource = {
    val handle = options.get("sourceHandle")
    if (handle != null) {
      val src = registry.get(handle)
      require(src != null, s"no ChunkSource registered under '$handle'")
      src
    } else {
      val url = options.get("url")
      require(url != null, "graft-jdbc needs either 'sourceHandle' or 'url'")
      val props = new Properties()
      Option(options.get("user")).foreach(props.setProperty("user", _))
      Option(options.get("password")).foreach(props.setProperty("password", _))
      IncrementalJdbc.jdbcChunkSource(SparkSession.active, url,
        options.get("table"), props,
        options.getOrDefault("timestampColumn", "dt_update"),
        Option(options.get("incrementingColumn")))
    }
  }
}

private[graft] class GraftJdbcTable(tableSchema: StructType,
                                      options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    Option(options.get("table")).orElse(Option(options.get("sourceHandle")))
      .map("graft-jdbc:" + _).getOrElse("graft-jdbc")
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftJdbcMicroBatchStream(tableSchema, options)
      }
    }
}

/** JSON-checkpointable stream offset: None = beginning of table. */
private[graft] case class GraftJdbcOffset(pos: Option[JdbcOffset]) extends Offset {
  override def json(): String = pos match {
    case None => """{"start":true}"""
    case Some(o) =>
      val id = o.id.map(i => s""","id":$i""").getOrElse("")
      s"""{"ms":${o.ts.getTime},"ns":${o.ts.getNanos}$id}"""
  }
}

private[graft] object GraftJdbcOffset {
  private val Ms = """"ms":(-?\d+)""".r
  private val Ns = """"ns":(\d+)""".r
  private val Id = """"id":(-?\d+)""".r
  def fromJson(json: String): GraftJdbcOffset =
    if (json.contains("\"start\"")) GraftJdbcOffset(None)
    else {
      val ts = new Timestamp(Ms.findFirstMatchIn(json).get.group(1).toLong)
      Ns.findFirstMatchIn(json).foreach(m => ts.setNanos(m.group(1).toInt))
      GraftJdbcOffset(Some(JdbcOffset(ts,
        Id.findFirstMatchIn(json).map(_.group(1).toLong))))
    }
}

private[graft] class GraftJdbcMicroBatchStream(
    schema: StructType, options: CaseInsensitiveStringMap) extends MicroBatchStream {

  private val source = GraftJdbcStream.resolveSource(options)
  private val maxRows = options.getInt("maxRowsPerPoll",
    IncrementalJdbc.DefaultMaxRowsPerPoll)
  private val delayMs = options.getLong("delayIntervalMs", 0L)
  private val rowsPerPartition = options.getInt("rowsPerPartition", 10000)
  private val fetcher: Option[ChunkFetcher] =
    if (options.getBoolean("parallelReads", true)) source.rangeFetcher else None

  /** Furthest probed offset; a stash serves exactly (stashStart, latest]. */
  @volatile private var latest: GraftJdbcOffset = GraftJdbcOffset(None)
  @volatile private var stash: Option[(GraftJdbcOffset, GraftJdbcOffset, Array[Row])] = None
  /** Parallel path: the probed chunk's KEYS (not rows) for split planning. */
  @volatile private var keysStash: Option[(GraftJdbcOffset, GraftJdbcOffset, Array[JdbcOffset])] = None

  /** Total order of offsets ((ts, id), None = beginning) — used to bump
    * [[latest]] to the checkpointed position after a restart, so the next
    * probe resumes where the offset log ended instead of re-reading the
    * table from the beginning.
    */
  private def isAfter(a: GraftJdbcOffset, b: GraftJdbcOffset): Boolean =
    (a.pos, b.pos) match {
      case (Some(x), Some(y)) =>
        x.ts.after(y.ts) || (x.ts == y.ts &&
          x.id.getOrElse(Long.MinValue) > y.id.getOrElse(Long.MinValue))
      case (Some(_), None) => true
      case _ => false
    }

  private def bump(seen: GraftJdbcOffset): Unit =
    this.synchronized { if (isAfter(seen, latest)) latest = seen }

  override def initialOffset(): Offset = GraftJdbcOffset(None)

  override def deserializeOffset(json: String): Offset = {
    val o = GraftJdbcOffset.fromJson(json)
    bump(o) // a logged offset marks delivered rows — never probe below it
    o
  }

  override def latestOffset(): Offset = this.synchronized {
    val upper =
      if (delayMs > 0) Some(new Timestamp(System.currentTimeMillis() - delayMs))
      else None
    if (fetcher.isDefined) {
      val (keys, next) =
        IncrementalJdbc.chunkKeysProbe(source, latest.pos, upper, maxRows)
      next.foreach { o =>
        val end = GraftJdbcOffset(Some(o))
        keysStash = Some((latest, end, keys))
        latest = end
      }
    } else {
      val (rows, _, next) =
        IncrementalJdbc.chunkRows(source, latest.pos, upper, maxRows)
      next.foreach { o =>
        val end = GraftJdbcOffset(Some(o))
        stash = Some((latest, end, rows))
        latest = end
      }
    }
    latest
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[GraftJdbcOffset], end.asInstanceOf[GraftJdbcOffset])
    bump(e)
    fetcher match {
      case Some(f) =>
        val keys = this.synchronized {
          keysStash match {
            case Some((ss, se, k)) if ss == s && se == e => k
            case _ => replayKeys(s, e) // restart: re-derive (start, end]
          }
        }
        rangePartitions(f, s, keys)
      case None =>
        val rows = this.synchronized {
          stash match {
            case Some((ss, se, r)) if ss == s && se == e => r
            case _ => replay(s, e) // checkpoint restart: re-read (start, end]
          }
        }
        rows.grouped(rowsPerPartition).map(g =>
          GraftJdbcInputPartition(g, schema): InputPartition).toArray
    }
  }

  /** Split one batch's keys into ~`rowsPerPartition` slices: a boundary
    * key every `rowsPerPartition` rows plus the batch end, deduplicated
    * to strictly-increasing under the mode's ordering. Pure-timestamp
    * ranges bound by ts alone, so an equal-ts run spanning a boundary
    * lands WHOLE in the earlier partition (skew, never duplication or
    * loss — the next partition's `ts > boundary` excludes the run);
    * composite (ts, id) keys cut exactly.
    */
  private def rangePartitions(f: ChunkFetcher, s: GraftJdbcOffset,
                              keys: Array[JdbcOffset]): Array[InputPartition] = {
    if (keys.isEmpty) return Array.empty
    val composite = source.incrementingCol.isDefined
    def after(a: JdbcOffset, b: JdbcOffset): Boolean =
      a.ts.after(b.ts) || (composite && a.ts.equals(b.ts) &&
        a.id.getOrElse(Long.MinValue) > b.id.getOrElse(Long.MinValue))
    val raw = (rowsPerPartition to keys.length by rowsPerPartition)
      .map(p => keys(p - 1)) :+ keys.last
    val bounds = raw.foldLeft(Vector.empty[JdbcOffset]) { (acc, k) =>
      if (acc.isEmpty || after(k, acc.last)) acc :+ k else acc
    }
    val lowers = s.pos +: bounds.init.map(Option(_))
    lowers.zip(bounds).map { case (lo, hi) =>
      GraftJdbcRangePartition(f, source.timestampCol, source.incrementingCol,
        lo, hi): InputPartition
    }.toArray
  }

  /** Restart path of the parallel planner: re-derive the committed
    * range's keys (not rows) so the replayed batch re-plans the same
    * splits' worth of work — deterministic under append-only.
    */
  private def replayKeys(s: GraftJdbcOffset, e: GraftJdbcOffset): Array[JdbcOffset] =
    e.pos match {
      case None => Array.empty
      case Some(endPos) =>
        val all = source.chunkKeys(s.pos, Some(endPos.ts), None)
        (endPos.id, source.incrementingCol) match {
          case (Some(endId), Some(_)) =>
            all.filter(k => k.ts.before(endPos.ts) || k.id.exists(_ <= endId))
          case _ => all
        }
    }

  /** Bounded re-read of a committed range — timestamp mode's append-only
    * assumption makes this deterministic (rows at or before a committed
    * offset never change). The stash fallback must never hold an
    * UNBOUNDED chunk on the driver: a committed range is probe-sized
    * (≤ maxRowsPerPoll plus an equal-timestamp run) under append-only,
    * so the re-read is capped at 2×maxRowsPerPoll and anything past the
    * cap fails LOUDLY — it means the append-only assumption broke (rows
    * inserted below a committed offset), and silently stashing an
    * arbitrarily large range would OOM the driver instead of naming the
    * misconfiguration.
    *
    * The cap counts only rows the COMMITTED RANGE itself holds — what
    * the forward path could legitimately have delivered in one poll:
    *
    *  - COMPOSITE mode: the fetch's upper bound is the coarse `ts`, so
    *    boundary-timestamp rows appended AFTER the commit (id > endId —
    *    the regime composite mode exists for) land in the fetch but are
    *    beyond the range. They trim away BEFORE the length check; the
    *    (ts, id) ordering makes the committed range a PREFIX of the
    *    fetch, so a trimmed prefix within the cap is complete whenever
    *    the fetch was not truncated or saw a beyond-range row.
    *  - PURE-TIMESTAMP mode: an offset may only land on a distinct-ts
    *    edge, and the forward path delivers an equal-ts boundary run
    *    UNCAPPED by design (the unavoidable pure-ts corner — see
    *    [[IncrementalJdbc.chunkRows]]). The replay honors the same
    *    contract: only rows STRICTLY before the committed ts count
    *    against the cap; an over-cap fetch re-reads the range unbounded
    *    and fails only if the strictly-before prefix itself exceeds it.
    */
  private def replay(s: GraftJdbcOffset, e: GraftJdbcOffset): Array[Row] =
    e.pos match {
      case None => Array.empty
      case Some(endPos) =>
        val cap = 2 * maxRows
        def capMsg =
          s"graft-jdbc stash replay exceeded its driver cap ($cap rows) for " +
            s"range (${s.json()}, ${e.json()}]: the source violated the " +
            "append-only assumption or maxRowsPerPoll was lowered across a " +
            "restart; use a rangeFetcher source (parallelReads=true) or " +
            "restore the original maxRowsPerPoll"
        val fetched = source.chunk(s.pos, Some(endPos.ts), Some(cap + 1)).collect()
        val tsIdx = schema.fieldIndex(source.timestampCol)
        (endPos.id, source.incrementingCol) match {
          case (Some(endId), Some(idCol)) =>
            val idIdx = schema.fieldIndex(idCol)
            val trimmed = fetched.filter(r =>
              r.getTimestamp(tsIdx).before(endPos.ts) ||
                r.getLong(idIdx) <= endId)
            require(trimmed.length <= cap, capMsg)
            trimmed
          case _ =>
            if (fetched.length <= cap) fetched
            else {
              // chunk() is (ts)-ordered, so a truncated cap+1 fetch whose
              // rows are ALL strictly before endPos.ts already proves the
              // strictly-before prefix exceeds the cap — fail HERE, before
              // the unbounded re-fetch collect()s the very range the cap
              // exists to keep off the driver. Only when the overflow row
              // is the equal-ts boundary run (the documented uncapped
              // pure-ts contract) does the unbounded read proceed, and the
              // prefix re-check after it stays as the exact gate.
              require(fetched.count(_.getTimestamp(tsIdx).before(endPos.ts)) <= cap,
                capMsg)
              val all = source.chunk(s.pos, Some(endPos.ts), None).collect()
              require(all.count(_.getTimestamp(tsIdx).before(endPos.ts)) <= cap,
                capMsg)
              all
            }
        }
    }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftJdbcReaderFactory(schema)

  override def commit(end: Offset): Unit = this.synchronized {
    stash = stash.filterNot(_._2 == end) // batch served; free the rows
    keysStash = keysStash.filterNot(_._2 == end)
  }

  override def stop(): Unit = ()
}

/** Stash-path partition: rows ride to executors as plain serializable
  * [[Row]]s, already materialized on the driver by the chunk probe — the
  * Connect single-task shape, kept as the fallback for sources without a
  * [[ChunkFetcher]].
  */
private[graft] case class GraftJdbcInputPartition(rows: Array[Row],
                                                    schema: StructType)
    extends InputPartition

/** Parallel-path partition: NO rows ride along — only the `(lower,
  * upper]` bounds plus the serialized fetcher; the task reads its own
  * slice where it runs (a remote range statement for JDBC).
  */
private[graft] case class GraftJdbcRangePartition(
    fetcher: ChunkFetcher, timestampCol: String,
    incrementingCol: Option[String],
    lower: Option[JdbcOffset], upper: JdbcOffset)
    extends InputPartition

private[graft] case class GraftJdbcReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: GraftJdbcInputPartition => reader(p.rows.iterator)
      case p: GraftJdbcRangePartition =>
        reader(p.fetcher.fetch(schema, p.timestampCol, p.incrementingCol,
          p.lower, p.upper))
    }

  private def reader(rows: Iterator[Row]): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val conv = CatalystTypeConverters.createToCatalystConverter(schema)
      private var cur: Row = _
      override def next(): Boolean =
        if (rows.hasNext) { cur = rows.next(); true } else false
      override def get(): InternalRow = conv(cur).asInstanceOf[InternalRow]
      override def close(): Unit = ()
    }
}
