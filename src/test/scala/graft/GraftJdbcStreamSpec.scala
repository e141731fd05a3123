package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import graft.sources.{GraftJdbcStream, IncrementalJdbc, SnapshotChunkSource}

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
