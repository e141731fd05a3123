package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

import scala.jdk.CollectionConverters._

/** Per-batch latency/rate capture for the streaming pipelines — the
  * streaming twin of [[graft.PlanMetrics]]. Where PlanMetrics reads an
  * executed BATCH plan's shuffle metrics, this listens to the engine's
  * streaming progress bus and keeps one record per micro-batch: input
  * rows, input/processed rows-per-second, trigger latency and its
  * addBatch component, and total state-store rows. That is the
  * operational envelope the reference pipeline is shaped by — its
  * connectors poll every 500 ms and ksqlDB emits per record
  * (reference `connect_postgres.config`, `docker-compose.yml` ksqldb
  * cache settings), so batch-duration vs poll-interval is THE latency
  * figure a user migrating from it will ask for.
  *
  * Events arrive asynchronously on Spark's listener bus, so readers
  * poll via [[awaitBatches]] rather than assuming delivery after
  * `processAllAvailable()`. One instance can watch any number of
  * concurrent queries; records are grouped by query name.
  */
final class StreamMetrics extends StreamingQueryListener {
  import StreamMetrics._

  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[BatchMetric]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  override def onQueryIdle(event: QueryIdleEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    def dur(k: String): Long =
      Option(p.durationMs.get(k)).map(_.longValue).getOrElse(0L)
    def rate(v: Double): Double = if (v.isNaN || v.isInfinite) 0.0 else v
    buf.add(BatchMetric(
      query = Option(p.name).getOrElse(p.id.toString),
      batchId = p.batchId,
      numInputRows = p.numInputRows,
      inputRowsPerSecond = rate(p.inputRowsPerSecond),
      processedRowsPerSecond = rate(p.processedRowsPerSecond),
      triggerMs = dur("triggerExecution"),
      addBatchMs = dur("addBatch"),
      stateRows = Option(p.stateOperators)
        .map(_.map(_.numRowsTotal).sum).getOrElse(0L)))
    ()
  }

  /** All captured batches, oldest first. */
  def batches: Seq[BatchMetric] = buf.iterator().asScala.toSeq

  /** Block until `query` has at least `n` batch records (listener-bus
    * delivery is async) or `timeoutMs` elapses; returns the records seen.
    */
  def awaitBatches(query: String, n: Int,
                   timeoutMs: Long = 10000L): Seq[BatchMetric] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var seen = batches.filter(_.query == query)
    while (seen.size < n && System.nanoTime() < deadline) {
      Thread.sleep(50)
      seen = batches.filter(_.query == query)
    }
    seen
  }

  /** Per-query rollup over the captured batches. */
  def summaries: Seq[QuerySummary] =
    batches.groupBy(_.query).toSeq.sortBy(_._1).map { case (q, bs) =>
      val triggers = bs.map(_.triggerMs)
      QuerySummary(
        query = q,
        nBatches = bs.size.toLong,
        totalRows = bs.map(_.numInputRows).sum,
        minTriggerMs = triggers.min,
        meanTriggerMs = triggers.sum.toDouble / triggers.size,
        maxTriggerMs = triggers.max,
        meanProcessedRowsPerSec = {
          val rs = bs.map(_.processedRowsPerSecond).filter(_ > 0)
          if (rs.isEmpty) 0.0 else rs.sum / rs.size
        },
        lastStateRows = bs.maxBy(_.batchId).stateRows)
    }

  /** Render summaries + raw batches as one JSON document (hand-rolled —
    * flat numeric/string fields only, nothing to escape beyond quotes).
    */
  def toJson: String = {
    def s(v: String) = "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def d(v: Double) = if (v.isNaN || v.isInfinite) "0" else f"$v%.3f"
    val sums = summaries.map { m =>
      s(m.query) + ":{" +
        s"""\"n_batches\":${m.nBatches},\"total_rows\":${m.totalRows},""" +
        s"""\"min_trigger_ms\":${m.minTriggerMs},\"mean_trigger_ms\":${d(m.meanTriggerMs)},""" +
        s"""\"max_trigger_ms\":${m.maxTriggerMs},""" +
        s"""\"mean_processed_rows_per_sec\":${d(m.meanProcessedRowsPerSec)},""" +
        s"""\"last_state_rows\":${m.lastStateRows}}"""
    }.mkString(",")
    val raw = batches.map { b =>
      "{" + s"""\"query\":${s(b.query)},\"batch_id\":${b.batchId},""" +
        s"""\"rows\":${b.numInputRows},\"trigger_ms\":${b.triggerMs},""" +
        s"""\"add_batch_ms\":${b.addBatchMs},""" +
        s"""\"processed_rows_per_sec\":${d(b.processedRowsPerSecond)},""" +
        s"""\"state_rows\":${b.stateRows}}"""
    }.mkString(",")
    s"""{"pipelines":{$sums},"batches":[$raw]}"""
  }
}

object StreamMetrics {

  /** One micro-batch as reported on the progress bus. */
  final case class BatchMetric(query: String, batchId: Long,
                               numInputRows: Long,
                               inputRowsPerSecond: Double,
                               processedRowsPerSecond: Double,
                               triggerMs: Long, addBatchMs: Long,
                               stateRows: Long)

  /** Per-query rollup. */
  final case class QuerySummary(query: String, nBatches: Long,
                                totalRows: Long, minTriggerMs: Long,
                                meanTriggerMs: Double, maxTriggerMs: Long,
                                meanProcessedRowsPerSec: Double,
                                lastStateRows: Long)

  /** The per-round streaming micro-bench (invoked from [[graft.Bench]]):
    * drives the reference's two pipeline shapes — the stateless `jovens`
    * derivation and the stateful windowed `idadecont` changelog — from
    * the rate-source generator at the reference's 500 ms poll cadence,
    * captures every micro-batch, and writes the artifact. Memory sinks:
    * the subject is per-batch engine latency, not file-format overhead.
    */
  def microBench(spark: SparkSession, outPath: String = "STREAM_METRICS.json",
                 rowsPerSecond: Int = 5000, runMs: Long = 4000L): Unit = {
    val listener = new StreamMetrics
    spark.streams.addListener(listener)
    try {
      val src = graft.sources.FakeData.customerStream(spark, rowsPerSecond)
      val q1 = Pipelines.jovens(src).writeStream
        .queryName("sm_jovens")
        .format("memory")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
        .start()
      val q2 = Pipelines.idadecont(
        graft.sources.FakeData.customerStream(spark, rowsPerSecond)).writeStream
        .queryName("sm_idadecont")
        .format("memory")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
        .start()
      // third topology: the composed reference-topology analog
      // ([[Pipelines.startReferenceTopology]]) — evolving Avro decode →
      // curation gates → CDC COW snapshot + manifest — driven from the
      // rate source through a REAL Avro encode, so the per-batch rows
      // here include the whole write path (snapshot merge + manifest),
      // not just in-memory transforms
      import org.apache.spark.sql.types._
      import org.apache.spark.sql.functions._
      val docWire = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("source", StringType),
        StructField("dt_update", LongType)))
      val reader = docWire.add(StructField("lang", StringType))
      val registry = graft.functions.StaticRegistry(Map(7 -> docWire))
      val tmp = java.nio.file.Files
        .createTempDirectory("sm_reftopo").toString
      // a tenth of the in-memory pipelines' rate: every micro-batch here
      // pays real parquet writes (dead letter + manifest + snapshot COW),
      // and the point is per-batch write-path latency at a sustainable
      // rate (still 250x the reference's 2 rows/s design load), not
      // backlog growth that outruns the capture window
      val docs = spark.readStream.format("rate")
        .option("rowsPerSecond", math.max(1, rowsPerSecond / 10).toString).load()
        .select(graft.functions.AvroCodec.avroEncode(
          struct(
            col("value").as("doc_id"),
            concat(repeat(lit("the quick brown fox jumps over the lazy dog "), 8),
              lit("and this is document "), col("value").cast("string"))
              .as("text"),
            concat(lit("src_"), pmod(col("value"), lit(4)).cast("string"))
              .as("source"),
            unix_millis(col("timestamp")).as("dt_update")),
          docWire, Some(7)).as("value"))
      val q3 = Pipelines.startReferenceTopology(
        docs, reader, registry, Seq(7), tmp, s"$tmp/ckpt",
        buckets = 8, queryName = "sm_reference_topology",
        trigger = org.apache.spark.sql.streaming.Trigger
          .ProcessingTime("500 milliseconds"))
      Thread.sleep(runMs)
      q1.stop(); q2.stop()
      // the composed topology's batch 0 is the rate source's empty
      // immediate trigger and still pays full codegen + empty writes
      // (~3-6 s); keep it running until a real cold batch AND a warm
      // batch are captured (bounded), so the artifact carries the number
      // that matters — warm per-batch write-path latency
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (listener.batches.count(_.query == "sm_reference_topology") < 3 &&
          System.nanoTime() < deadline)
        Thread.sleep(200)
      q3.stop()
      listener.awaitBatches("sm_jovens", 2)
      listener.awaitBatches("sm_idadecont", 2)
      // batch 0 is the rate source's empty immediate trigger; wait for a
      // real warm batch too (events land async after q3.stop())
      listener.awaitBatches("sm_reference_topology", 2)
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        listener.toJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ()
    } finally {
      spark.streams.removeListener(listener)
      // memory-sink tables would otherwise accumulate across invocations
      Seq("sm_jovens", "sm_idadecont").foreach { t =>
        try spark.catalog.dropTempView(t) catch { case _: Exception => () }
      }
    }
  }
}
