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
  * Chunk probing happens ON THE DRIVER at `latestOffset()` time (the same
  * materialize-before-advance probe as [[IncrementalJdbc.poll]], bounded
  * by `maxRowsPerPoll`), and the probed rows are stashed to serve the
  * batch that plans against that exact offset range. The reference's
  * Connect JDBC source is itself a single-task poller (`tasks.max=1`,
  * `connect_postgres.config:5`) with the same shape. A replay after
  * restart re-queries the source for the checkpointed (start, end] range
  * instead — correct under timestamp-mode's append-only assumption (rows
  * at or before a committed offset never change; README.md:136).
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
  *    (batch split granularity, default 10k).
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

  /** Furthest probed offset; the stash serves exactly (stashStart, latest]. */
  @volatile private var latest: GraftJdbcOffset = GraftJdbcOffset(None)
  @volatile private var stash: Option[(GraftJdbcOffset, GraftJdbcOffset, Array[Row])] = None

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
    val (rows, _, next) =
      IncrementalJdbc.chunkRows(source, latest.pos, upper, maxRows)
    next.foreach { o =>
      val end = GraftJdbcOffset(Some(o))
      stash = Some((latest, end, rows))
      latest = end
    }
    latest
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[GraftJdbcOffset], end.asInstanceOf[GraftJdbcOffset])
    bump(e)
    val rows = this.synchronized {
      stash match {
        case Some((ss, se, r)) if ss == s && se == e => r
        case _ => replay(s, e) // checkpoint restart: re-read (start, end]
      }
    }
    rows.grouped(rowsPerPartition).map(g =>
      GraftJdbcInputPartition(g, schema): InputPartition).toArray
  }

  /** Bounded re-read of a committed range — timestamp mode's append-only
    * assumption makes this deterministic (rows at or before a committed
    * offset never change).
    */
  private def replay(s: GraftJdbcOffset, e: GraftJdbcOffset): Array[Row] =
    e.pos match {
      case None => Array.empty
      case Some(endPos) =>
        val all = source.chunk(s.pos, Some(endPos.ts), None).collect()
        (endPos.id, source.incrementingCol) match {
          case (Some(endId), Some(idCol)) =>
            val tsIdx = schema.fieldIndex(source.timestampCol)
            val idIdx = schema.fieldIndex(idCol)
            all.filter(r => r.getTimestamp(tsIdx).before(endPos.ts) ||
              r.getLong(idIdx) <= endId)
          case _ => all
        }
    }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftJdbcReaderFactory(schema)

  override def commit(end: Offset): Unit = this.synchronized {
    stash = stash.filterNot(_._2 == end) // batch served; free the rows
  }

  override def stop(): Unit = ()
}

/** Rows ride to executors as plain serializable [[Row]]s — they are
  * ALREADY materialized on the driver by the chunk probe (the Connect
  * single-task shape); a multi-task production variant would instead push
  * per-partition range predicates into the remote query.
  */
private[graft] case class GraftJdbcInputPartition(rows: Array[Row],
                                                    schema: StructType)
    extends InputPartition

private[graft] case class GraftJdbcReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftJdbcInputPartition]
    new PartitionReader[InternalRow] {
      private val conv = CatalystTypeConverters.createToCatalystConverter(schema)
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.rows.length }
      override def get(): InternalRow = conv(p.rows(i)).asInstanceOf[InternalRow]
      override def close(): Unit = ()
    }
  }
}
