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

    private val createRe =
      """(?is)^\s*create\s+(stream|table)\s+(\w+)\s+with\s*\(([^)]*)\)\s*(?:as\s+(.+?))?\s*;?\s*$""".r
    private val showRe = """(?is)^\s*show\s+(streams|topics)\s*;?\s*$""".r
    private val selectRe = """(?is)^\s*select\s+.*$""".r
    private val emitRe = """(?is)\s+emit\s+changes\s*;?\s*$"""
    private val windowRe =
      """(?is)\s+window\s+tumbling\s*\(\s*size\s+(\d+)\s+seconds?\s*\)""".r
    private val groupByRe = """(?is)\bgroup\s+by\s+""".r

    /** Execute one statement; returns the statement's frame (query result,
      * the newly registered stream/table, or the SHOW listing).
      */
    def execute(statement: String): DataFrame = statement match {
      case showRe(_) =>
        import spark.implicits._
        registry.values.toSeq
          .map(s => (s.name.toUpperCase, s.topic, s.valueFormat.toUpperCase, s.derived))
          .toDF("stream_name", "kafka_topic", "value_format", "derived")
      case createRe(kind, name, props, as) =>
        val p = parseProps(props)
        val topic = p.getOrElse("kafka_topic",
          throw new IllegalArgumentException(s"missing kafka_topic in: $props"))
        val fmt = p.getOrElse("value_format", "AVRO")
        val df = Option(as) match {
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
          StreamInfo(name.toLowerCase, topic, fmt, Option(as).isDefined))
        df
      case s if selectRe.pattern.matcher(s).matches() =>
        spark.sql(translateSelect(s))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported ksql statement: ${other.take(60)}")
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

    private def parseProps(props: String): Map[String, String] =
      props.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k.trim.toLowerCase -> v.trim.stripPrefix("'").stripSuffix("'")
      }.toMap

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
