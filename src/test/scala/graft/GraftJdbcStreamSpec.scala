package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import graft.sources.{ArrayChunkFetcher, ChunkFetcher, GraftJdbcStream, IncrementalJdbc, JdbcOffset, SnapshotChunkSource}

/** The DSv2 `graft-jdbc` streaming source end-to-end: real
  * `spark.readStream` queries over a registered ChunkSource — offsets,
  * chunked backfill across micro-batches, and checkpointed restart
  * (SURVEY.md §2.1 S1 option (b)).
  */
class GraftJdbcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def table(rows: (Long, Long)*): DataFrame =
    rows.map { case (id, ms) => (id, new Timestamp(ms)) }
      .toDF("id", "dt_update")

  private var n = 0
  private def handle(src: SnapshotChunkSource): String = {
    n += 1
    val key = s"spec_src_$n"
    GraftJdbcStream.registry.put(key, src)
    key
  }

  private def readStream(key: String, extra: (String, String)*) = {
    val r = spark.readStream.format("graft-jdbc").option("sourceHandle", key)
    extra.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("streams a table incrementally: snapshot first, then only new rows") {
    @volatile var snap = table((1L, 1000L), (2L, 2000L))
    val key = handle(new SnapshotChunkSource(() => snap))
    val q = graft.streaming.Pipelines.startMemorySink(readStream(key), "gjs_t1")
    try {
      q.processAllAvailable()
      assert(spark.table("gjs_t1").select("id").as[Long].collect().toSet == Set(1L, 2L))
      // a new insert and a backdated update: only the insert arrives
      snap = table((1L, 500L), (2L, 2000L), (3L, 3000L))
      q.processAllAvailable()
      assert(spark.table("gjs_t1").select("id").as[Long].collect().sorted.toSeq
        == Seq(1L, 2L, 3L)) // no re-delivery, no backdated row
    } finally q.stop()
  }

  test("capped backfill spans micro-batches, composite mode, exactly-once total") {
    val snap = table((1L to 23L).map(i => (i, 5000L)): _*) // one equal-ts run
    val key = handle(new SnapshotChunkSource(() => snap,
      incrementingCol = Some("id")))
    val q = graft.streaming.Pipelines.startMemorySink(
      readStream(key, "maxRowsPerPoll" -> "5", "incrementingColumn" -> "id"),
      "gjs_t2")
    try {
      q.processAllAvailable()
      // the whole equal-ts run arrives exactly once, in >= 5 chunked batches
      assert(spark.table("gjs_t2").select("id").as[Long].collect().sorted.toSeq
        == (1L to 23L))
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 5, s"expected chunked delivery, got $batches batches")
    } finally q.stop()
  }

  test("checkpointed restart resumes from the committed offset, exactly once") {
    @volatile var snap = table((1L, 1000L), (2L, 2000L))
    val src = new SnapshotChunkSource(() => snap)
    val key = handle(src)
    val ckp = Files.createTempDirectory("gjs_ckp_").toString
    val out = Files.createTempDirectory("gjs_out_").toString

    def start() = readStream(key).writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckp).start()

    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() == 2)
    } finally q1.stop()

    // rows inserted while the stream is DOWN, then restart from checkpoint
    snap = table((1L, 1000L), (2L, 2000L), (3L, 3000L), (4L, 4000L))
    val q2 = start()
    try {
      q2.processAllAvailable()
      // the restart resumes past the checkpointed offset: rows 1-2 are
      // NOT re-read or re-delivered; the sink holds each row exactly once
      assert(spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
        == Seq(1L, 2L, 3L, 4L))
    } finally q2.stop()
  }

  test("parallel range reads: tasks fetch their own slices, multi-partition batch") {
    val snap = table((1L to 40L).map(i => (i, 1000L * i)): _*)
    val key = handle(new SnapshotChunkSource(() => snap,
      incrementingCol = Some("id"),
      fetcher = Some(ArrayChunkFetcher(snap.collect().toIndexedSeq))))
    @volatile var maxParts = 0
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = readStream(key, "rowsPerPartition" -> "7")
      .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
        val ids = b.select("id").as[Long].collect()
        seen.synchronized { seen ++= ids }
        maxParts = math.max(maxParts, b.rdd.getNumPartitions)
      }.start()
    try {
      q.processAllAvailable()
      // exactly once (a Seq, not a Set: duplicates would show)
      assert(seen.sorted.toSeq == (1L to 40L))
      assert(maxParts == 6, // ceil(40/7) range slices in the one batch
        s"expected 6 range partitions, got $maxParts")
    } finally q.stop()
  }

  test("parallel pure-ts mode: equal-ts runs stay whole across range boundaries") {
    // three equal-ts runs; rowsPerPartition=3 wants to cut inside each
    val snap = table(((1L to 10L).map((_, 1000L)) ++
      (11L to 20L).map((_, 2000L)) ++ (21L to 25L).map((_, 3000L))): _*)
    val key = handle(new SnapshotChunkSource(() => snap,
      fetcher = Some(ArrayChunkFetcher(snap.collect().toIndexedSeq))))
    @volatile var maxParts = 0
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = readStream(key, "rowsPerPartition" -> "3")
      .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
        val ids = b.select("id").as[Long].collect()
        seen.synchronized { seen ++= ids }
        maxParts = math.max(maxParts, b.rdd.getNumPartitions)
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.sorted.toSeq == (1L to 25L)) // no loss, no duplication
      // ts-only bounds collapse to the three distinct-ts edges
      assert(maxParts == 3, s"expected 3 deduped range partitions, got $maxParts")
    } finally q.stop()
  }

  test("parallel restart replans range partitions from keys (stash gone)") {
    val snap = table((1L to 20L).map(i => (i, 1000L * i)): _*)
    val key = handle(new SnapshotChunkSource(() => snap,
      fetcher = Some(ArrayChunkFetcher(snap.collect().toIndexedSeq))))
    val stream = new graft.sources.GraftJdbcMicroBatchStream(snap.schema,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("sourceHandle", key, "rowsPerPartition", "4")))
    // a fresh stream instance planning a checkpointed range it never
    // probed — the restart/replay path — must still split in parallel
    val parts = stream.planInputPartitions(
      graft.sources.GraftJdbcOffset(None),
      graft.sources.GraftJdbcOffset(Some(JdbcOffset(new Timestamp(20000L)))))
    assert(parts.length == 5)
    val factory = stream.createReaderFactory()
    val got = parts.flatMap { p =>
      val r = factory.createReader(p)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (r.next()) buf += r.get().getLong(0)
      buf
    }
    assert(got.sorted.toSeq == (1L to 20L))
  }

  test("parallel reads: checkpointed restart resumes exactly once") {
    val k = "spec_shared_rows"
    def setRows(df: DataFrame): Unit =
      GraftJdbcStreamSpecRows.data.put(k, df.collect().toIndexedSeq)
    @volatile var snap = table((1L, 1000L), (2L, 2000L))
    setRows(snap)
    val key = handle(new SnapshotChunkSource(() => snap,
      fetcher = Some(SharedRowsFetcher(k))))
    val ckp = Files.createTempDirectory("gjs_pckp_").toString
    val out = Files.createTempDirectory("gjs_pout_").toString
    def start() = readStream(key, "rowsPerPartition" -> "1").writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckp).start()

    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() == 2)
    } finally q1.stop()

    snap = table((1L, 1000L), (2L, 2000L), (3L, 3000L), (4L, 4000L))
    setRows(snap)
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
        == Seq(1L, 2L, 3L, 4L))
    } finally q2.stop()
  }

  test("stash replay is hard-capped: oversized committed range fails loudly") {
    // the round-10 advisory retirement: the driver-stash fallback used to
    // re-read a committed range UNCAPPED onto the driver on restart; it
    // now fetches at most 2×maxRowsPerPoll rows and refuses past that —
    // an oversized range means the append-only assumption broke, and the
    // failure names the fix instead of OOMing the driver
    val snap = table((1L to 50L).map(i => (i, 1000L * i)): _*)
    val key = handle(new SnapshotChunkSource(() => snap)) // no fetcher → stash
    val stream = new graft.sources.GraftJdbcMicroBatchStream(snap.schema,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("sourceHandle", key, "maxRowsPerPoll", "10")))
    val e = intercept[IllegalArgumentException] {
      stream.planInputPartitions(
        graft.sources.GraftJdbcOffset(None),
        graft.sources.GraftJdbcOffset(Some(JdbcOffset(new Timestamp(50000L)))))
    }
    assert(e.getMessage.contains("driver cap"), e.getMessage)
    // a probe-sized committed range still replays through the same path
    val parts = stream.planInputPartitions(
      graft.sources.GraftJdbcOffset(None),
      graft.sources.GraftJdbcOffset(Some(JdbcOffset(new Timestamp(15000L)))))
    val factory = stream.createReaderFactory()
    val got = parts.flatMap { p =>
      val r = factory.createReader(p)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (r.next()) buf += r.get().getLong(0)
      buf
    }
    assert(got.sorted.toSeq == (1L to 15L))
  }

  test("oversized pure-ts replay fails from the truncated fetch, before any unbounded read") {
    // r12 advisory: when the capped cap+1 fetch already proves the
    // strictly-before prefix exceeds the cap (every fetched row is
    // strictly before the committed ts), the cap error must fire THERE —
    // the unbounded re-fetch would collect() onto the driver exactly the
    // range the cap exists to keep off it
    val snap = table((1L to 50L).map(i => (i, 1000L * i)): _*)
    val inner = new SnapshotChunkSource(() => snap)
    var unbounded = 0
    val counting = new graft.sources.ChunkSource {
      override def timestampCol: String = inner.timestampCol
      override def incrementingCol: Option[String] = inner.incrementingCol
      override def chunk(lower: Option[graft.sources.JdbcOffset],
                         upper: Option[Timestamp],
                         limit: Option[Int]): DataFrame = {
        if (limit.isEmpty && upper.isDefined) unbounded += 1
        inner.chunk(lower, upper, limit)
      }
    }
    GraftJdbcStream.registry.put("spec_precheck", counting)
    val stream = new graft.sources.GraftJdbcMicroBatchStream(snap.schema,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("sourceHandle", "spec_precheck", "maxRowsPerPoll", "10")))
    val e = intercept[IllegalArgumentException] {
      stream.planInputPartitions(
        graft.sources.GraftJdbcOffset(None),
        graft.sources.GraftJdbcOffset(Some(JdbcOffset(new Timestamp(50000L)))))
    }
    assert(e.getMessage.contains("driver cap"), e.getMessage)
    assert(unbounded == 0,
      "the cap must fail from the truncated fetch; an unbounded re-read ran first")
    // the equal-ts boundary run (the documented uncapped contract) still
    // reaches the unbounded read and replays completely
    val run = table((1L to 30L).map(i => (i, 1000L)): _*)
    val runInner = new SnapshotChunkSource(() => run)
    GraftJdbcStream.registry.put("spec_precheck_run", runInner)
    val runStream = new graft.sources.GraftJdbcMicroBatchStream(run.schema,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("sourceHandle", "spec_precheck_run",
          "maxRowsPerPoll", "10")))
    val parts = runStream.planInputPartitions(
      graft.sources.GraftJdbcOffset(None),
      graft.sources.GraftJdbcOffset(Some(JdbcOffset(new Timestamp(1000L)))))
    val factory = runStream.createReaderFactory()
    val got = parts.flatMap { p =>
      val r = factory.createReader(p)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (r.next()) buf += r.get().getLong(0)
      buf
    }
    assert(got.sorted.toSeq == (1L to 30L))
  }

  test("stash replay cap counts only the committed range (round-11 advisory)") {
    def drain(stream: graft.sources.GraftJdbcMicroBatchStream,
              parts: Array[org.apache.spark.sql.connector.read.InputPartition]): Seq[Long] = {
      val factory = stream.createReaderFactory()
      parts.flatMap { p =>
        val r = factory.createReader(p)
        val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (r.next()) buf += r.get().getLong(0)
        buf
      }.sorted.toSeq
    }
    // COMPOSITE: rows appended at the boundary timestamp AFTER the commit
    // (the coarse-ts regime composite mode exists for) land in the ts<=end
    // fetch but are beyond the committed range — they must not trip the
    // cap. 15 strict-before rows + 25 boundary-ts rows, committed id=20:
    // the range is 20 rows (== cap), the fetch is 40.
    val comp = table(((1L to 15L).map(i => (i, 1000L * i)) ++
      (16L to 40L).map(i => (i, 16000L))): _*)
    val compStream = new graft.sources.GraftJdbcMicroBatchStream(comp.schema,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("sourceHandle",
          handle(new SnapshotChunkSource(() => comp, incrementingCol = Some("id"))),
          "maxRowsPerPoll", "10")))
    val compParts = compStream.planInputPartitions(
      graft.sources.GraftJdbcOffset(None),
      graft.sources.GraftJdbcOffset(
        Some(JdbcOffset(new Timestamp(16000L), Some(20L)))))
    assert(drain(compStream, compParts) == (1L to 20L))
    // PURE-TS: an equal-ts run is delivered uncapped by design on the
    // forward path (an offset can only land on a distinct-ts edge), so a
    // committed 30-row run past the 20-row cap must stay replayable.
    val run = table((1L to 30L).map(i => (i, 1000L)): _*)
    val runStream = new graft.sources.GraftJdbcMicroBatchStream(run.schema,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("sourceHandle",
          handle(new SnapshotChunkSource(() => run)),
          "maxRowsPerPoll", "10")))
    val runParts = runStream.planInputPartitions(
      graft.sources.GraftJdbcOffset(None),
      graft.sources.GraftJdbcOffset(Some(JdbcOffset(new Timestamp(1000L)))))
    assert(drain(runStream, runParts) == (1L to 30L))
  }

  test("offset json round-trips both modes") {
    import graft.sources.JdbcOffset
    val src = new SnapshotChunkSource(() => table((1L, 1000L)))
    GraftJdbcStream.registry.put("spec_off", src)
    val ts = new Timestamp(1704067200123L); ts.setNanos(123456789)
    // reflective access via the spec package is deliberate: offset
    // serialization is the restart contract
    val stream = new graft.sources.GraftJdbcMicroBatchStream(
      table((1L, 1000L)).schema,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("sourceHandle", "spec_off")))
    val composite = graft.sources.GraftJdbcOffset(Some(JdbcOffset(ts, Some(42L))))
    assert(stream.deserializeOffset(composite.json()) == composite)
    val pure = graft.sources.GraftJdbcOffset(Some(JdbcOffset(ts, None)))
    assert(stream.deserializeOffset(pure.json()) == pure)
    val begin = graft.sources.GraftJdbcOffset(None)
    assert(stream.deserializeOffset(begin.json()) == begin)
  }
}

/** Mutable row store behind [[SharedRowsFetcher]] — lets a restart test
  * insert rows "into the table" while the stream is down without
  * reserializing the fetcher (same JVM in local mode).
  */
object GraftJdbcStreamSpecRows {
  val data = new java.util.concurrent.ConcurrentHashMap[
    String, IndexedSeq[org.apache.spark.sql.Row]]()
}

case class SharedRowsFetcher(key: String) extends ChunkFetcher {
  override def fetch(schema: org.apache.spark.sql.types.StructType,
                     timestampCol: String, incrementingCol: Option[String],
                     lower: Option[JdbcOffset], upper: JdbcOffset) =
    ArrayChunkFetcher(GraftJdbcStreamSpecRows.data.get(key))
      .fetch(schema, timestampCol, incrementingCol, lower, upper)
}
