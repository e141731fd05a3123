package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ksqlDB statement front-end — the last mile of "a reference user can
  * run every statement they run today": the reference's README drives the
  * pipeline entirely through ksqlDB DDL/queries (`/root/reference/
  * README.md:186-277`), and the SELECT bodies already run through
  * `spark.sql` once [[GraftSqlFunctions]] is installed. This object
  * translates the WRAPPERS — exactly the grammar subset the reference
  * exercises:
  *
  *  - `CREATE STREAM s WITH (kafka_topic='t', value_format='AVRO');`
  *    binds a topic to a named stream (README.md:186). The topic resolver
  *    supplies the frame: batch views in the sandbox, `readStream` frames
  *    against a real broker — the translation is mode-agnostic because
  *    `spark.sql` over a streaming temp view yields a streaming frame.
  *  - `CREATE STREAM|TABLE x WITH (...) AS SELECT ... EMIT CHANGES;`
  *    (CSAS/CTAS, README.md:233-239, 258-265, 271-277) runs the translated
  *    select and registers the result under `x`.
  *  - `WINDOW TUMBLING (SIZE n SECONDS)` (README.md:274) is rewritten into
  *    the GROUP BY as Spark's `window(ROWTIME, 'n seconds')`, with the
  *    window bounds surfaced as `window_start`/`window_end` (ksqlDB keys
  *    its changelog by group-key × window — these columns are that key).
  *  - `EMIT CHANGES` is the push-query marker — semantically Spark's
  *    streaming evaluation mode, so it is stripped (the caller picks the
  *    output mode when starting the sink).
  *  - `SHOW STREAMS` / `SHOW TOPICS` (README.md:155,192) list the DDL
  *    registry.
  *
  * ROWTIME: ksqlDB exposes the record timestamp as the ROWTIME pseudo
  * column and windows over it. Binding attaches `ROWTIME` from the
  * `dt_update` epoch-millis column when present (the Connect JDBC source
  * stamps records from that column's walk — SURVEY §2.1); CSAS
  * registration re-attaches the source's ROWTIME so derived streams stay
  * windowable, exactly ksqlDB's propagation.
  */
object KsqlDdl {

  /** One bound/derived stream, for SHOW STREAMS parity. */
  final case class StreamInfo(name: String, topic: String,
                              valueFormat: String, derived: Boolean)

  final class Session(spark: SparkSession,
                      topics: String => Option[DataFrame]) {
    GraftSqlFunctions.install(spark)
    private val registry =
      new scala.collection.mutable.LinkedHashMap[String, StreamInfo]

    private val createHeadRe =
      """(?is)^\s*create\s+(stream|table)\s+(\w+)\s+with\s*\(""".r
    private val showRe = """(?is)^\s*show\s+(streams|topics)\s*;?\s*$""".r
    private val printRe = """(?is)^\s*print\s+'?([\w.-]+)'?\s*;?\s*$""".r
    private val selectRe = """(?is)^\s*select\s+.*$""".r
    private val emitRe = """(?is)\s+emit\s+changes\s*;?\s*$"""
    private val windowRe =
      """(?is)\s+window\s+tumbling\s*\(\s*size\s+(\d+)\s+seconds?\s*\)""".r
    private val groupByRe = """(?is)\bgroup\s+by\s+""".r

    /** Execute one statement; returns the statement's frame (query result,
      * the newly registered stream/table, or the SHOW/PRINT frame).
      */
    def execute(statement: String): DataFrame = statement match {
      case showRe(what) if what.equalsIgnoreCase("topics") =>
        // the reference CLI's listing shape (README.md:155-162): topic
        // name + partition geometry. Offline, topics are whatever the
        // registry has bound; partitions mirror the reference's
        // single-partition defaults (BASELINE.md).
        import spark.implicits._
        registry.values.map(_.topic).toSeq.distinct.sorted
          .map(t => (t, 1, 1))
          .toDF("kafka_topic", "partitions", "partition_replicas")
      case showRe(_) =>
        import spark.implicits._
        registry.values.toSeq
          .map(s => (s.name.toUpperCase, s.topic, s.valueFormat.toUpperCase, s.derived))
          .toDF("stream_name", "kafka_topic", "value_format", "derived")
      case printRe(topic) =>
        // `print <topic>;` (README.md:180) — the CLI's raw topic tail,
        // mapped to the console sink: streaming frames start a console
        // writeStream (caller manages the handle via spark.streams);
        // batch views print a bounded head. Either way the topic's frame
        // is returned for further composition.
        val df = topics(topic).getOrElse(throw new IllegalArgumentException(
          s"unknown topic '$topic'"))
        if (df.isStreaming)
          df.writeStream.format("console").option("truncate", "false").start()
        else df.show(20, truncate = false)
        df
      case s if createHeadRe.findFirstMatchIn(s).isDefined =>
        executeCreate(s)
      case s if selectRe.pattern.matcher(s).matches() =>
        spark.sql(translateSelect(s))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported ksql statement: ${other.take(60)}")
    }

    private def executeCreate(statement: String): DataFrame = {
      val head = createHeadRe.findFirstMatchIn(statement).get
      val (kind, name) = (head.group(1), head.group(2))
      val (p, remainder) = scanProps(statement, head.end)
      val as = remainder.trim.stripSuffix(";").trim match {
        case "" => None
        case rest if rest.toLowerCase.startsWith("as") &&
          rest.length > 2 && Character.isWhitespace(rest.charAt(2)) =>
          Some(rest.substring(3).trim)
        case rest => throw new IllegalArgumentException(
          s"unexpected text after WITH clause: ${rest.take(60)}")
      }
      val topic = p.getOrElse("kafka_topic",
        throw new IllegalArgumentException(s"missing kafka_topic in: $statement"))
      val fmt = p.getOrElse("value_format", "AVRO")
      val df = as match {
        case None => // bind a source topic
          val src = topics(topic).getOrElse(throw new IllegalArgumentException(
            s"unknown topic '$topic'"))
          withRowtime(src)
        case Some(select) => // CSAS / CTAS
          val translated = translateSelect(select)
          val out = spark.sql(translated)
          // propagate ROWTIME through un-windowed derived streams
          // (ksqlDB does implicitly; windowed tables have no row time)
          if (kind.equalsIgnoreCase("stream")
            && !out.columns.contains("ROWTIME")
            && sourceHasRowtime(select))
            spark.sql(translateSelect(appendRowtime(select)))
          else out
      }
      df.createOrReplaceTempView(name)
      registry.put(name.toLowerCase,
        StreamInfo(name.toLowerCase, topic, fmt, as.isDefined))
      df
    }

    /** The translated Spark SQL text for a ksqlDB select (exposed for
      * inspection/tests).
      */
    def translateSelect(select: String): String = {
      val noEmit = select.replaceAll(emitRe, "").stripSuffix(";").trim
      windowRe.findFirstMatchIn(noEmit) match {
        case None => noEmit
        case Some(m) =>
          val secs = m.group(1).toInt
          val stripped = windowRe.replaceFirstIn(noEmit, "")
          require(groupByRe.findFirstIn(stripped).isDefined,
            "WINDOW TUMBLING requires a GROUP BY")
          // group by the tumbling window first, and surface its bounds —
          // ksqlDB's changelog key is (group key, window start)
          val grouped = groupByRe.replaceFirstIn(stripped,
            s"GROUP BY window(ROWTIME, '$secs seconds'), ")
          grouped.replaceFirst("(?is)^\\s*select\\s+",
            "SELECT window.start AS window_start, window.end AS window_end, ")
      }
    }

    /** Quote-aware scan of the WITH(...) property list starting at `from`
      * (the character after the opening paren). Legal ksqlDB property
      * values are single-quoted string literals that may contain commas,
      * parens and doubled-quote escapes (`''`) — the things a naive
      * regex/split mis-parses. Returns the parsed props and the statement
      * remainder after the closing paren (empty or `AS SELECT ...`).
      * Malformed input fails LOUDLY with the offending text.
      */
    private def scanProps(s: String, from: Int): (Map[String, String], String) = {
      val parts = scala.collection.mutable.ListBuffer[String]()
      val cur = new StringBuilder
      var i = from
      var inQ = false
      var close = -1
      while (i < s.length && close < 0) {
        val c = s.charAt(i)
        c match {
          case '\'' => inQ = !inQ; cur += c
          case ',' if !inQ => parts += cur.toString; cur.clear()
          case ')' if !inQ => parts += cur.toString; close = i
          case _ => cur += c
        }
        i += 1
      }
      if (close < 0 || inQ) throw new IllegalArgumentException(
        s"unterminated WITH property list: ${s.substring(from).take(60)}")
      val props = parts.iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
        val eq = kv.indexOf('=')
        if (eq <= 0) throw new IllegalArgumentException(
          s"malformed WITH property (expected key='value'): '$kv'")
        kv.substring(0, eq).trim.toLowerCase -> unquote(kv.substring(eq + 1).trim)
      }.toMap
      (props, s.substring(close + 1))
    }

    /** Strip a single-quoted literal's quotes and fold `''` escapes. */
    private def unquote(v: String): String =
      if (v.length >= 2 && v.head == '\'' && v.last == '\'')
        v.substring(1, v.length - 1).replace("''", "'")
      else v

    private def withRowtime(df: DataFrame): DataFrame =
      if (df.columns.contains("ROWTIME")) df
      else if (df.columns.contains("dt_update"))
        df.withColumn("ROWTIME", timestamp_millis(col("dt_update")))
      else df

    private val fromRe = """(?is)\bfrom\s+(\w+)""".r

    private def sourceHasRowtime(select: String): Boolean =
      fromRe.findFirstMatchIn(select).exists { m =>
        try spark.table(m.group(1)).columns.contains("ROWTIME")
        catch { case _: Exception => false }
      }

    /** `select a, b from s ...` → `select a, b, ROWTIME from s ...` */
    private def appendRowtime(select: String): String =
      fromRe.replaceFirstIn(select.replaceAll(emitRe, "").stripSuffix(";"),
        ", ROWTIME from " + fromRe.findFirstMatchIn(select).get.group(1))

    /** SHOW STREAMS-registered names, for the catalog surface. */
    def streams: Seq[StreamInfo] = registry.values.toSeq
  }

  def session(spark: SparkSession,
              topics: String => Option[DataFrame]): Session =
    new Session(spark, topics)
}
