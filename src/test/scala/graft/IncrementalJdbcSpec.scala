package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import graft.sources.{IncrementalJdbc, JdbcOffset, SnapshotChunkSource}

class IncrementalJdbcSpec extends SparkSpec {
  import spark.implicits._

  private def table(rows: (Long, Long)*): DataFrame =
    rows.map { case (id, ms) => (id, new Timestamp(ms)) }
      .toDF("id", "dt_update")

  private def tableWithNulls(rows: (Long, Option[Long])*): DataFrame =
    rows.map { case (id, ms) => (id, ms.map(new Timestamp(_)).orNull) }
      .toDF("id", "dt_update")

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().toSeq

  test("timestamp-mode polling: first poll full snapshot, then strict increments") {
    @volatile var snap = table((1L, 1000L), (2L, 2000L))
    val src = IncrementalJdbc.ofSnapshot(() => snap)

    val b1 = src.poll()
    assert(b1.count() == 2)
    assert(src.currentOffset.contains(JdbcOffset(new Timestamp(2000L))))

    // nothing new → empty batch, offset unchanged
    assert(src.poll().isEmpty)
    assert(src.currentOffset.contains(JdbcOffset(new Timestamp(2000L))))

    // an insert and a *backdated* update: only the insert is captured
    // (reference README.md:136 — timestamp mode misses non-advancing rows)
    snap = table((1L, 1000L), (2L, 2000L), (3L, 3000L))
    assert(ids(src.poll()) == Seq(3L))
    assert(src.currentOffset.contains(JdbcOffset(new Timestamp(3000L))))
  }

  test("run loop drains batches into the sink and stops") {
    @volatile var snap = table((1L, 1000L))
    val src = IncrementalJdbc.ofSnapshot(() => snap)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    src.run(intervalMs = 1L, maxPolls = 3) { b =>
      seen ++= ids(b)
      snap = table((1L, 1000L), (2L, 2000L)) // next poll sees an insert
    }
    assert(seen.take(2) == Seq(1L, 2L))
  }

  test("capped backfill reassembles a large table across polls, offsets strictly advance") {
    val snap = table((1L to 25L).map(i => (i, i * 1000L)): _*)
    val src = IncrementalJdbc.ofSnapshot(() => snap, maxRowsPerPoll = 10)
    var offsets = Vector.empty[Timestamp]
    var all = Vector.empty[Seq[Long]]
    for (_ <- 1 to 3) {
      all :+= ids(src.poll())
      offsets :+= src.currentOffset.get.ts
    }
    assert(all.map(_.size) == Vector(10, 10, 5))
    // lossless reassembly: the union of chunks IS the table, no dup/loss
    assert(all.flatten.sorted == (1L to 25L))
    // each chunk is the next ascending slice (ordered delivery)
    assert(all.flatten == (1L to 25L))
    // offsets strictly advance chunk over chunk
    assert(offsets.sliding(2).forall { case Seq(a, b) => b.after(a) })
    // backfill done: further polls are empty and do not move the offset
    assert(src.poll().isEmpty)
    assert(src.currentOffset.get.ts == offsets.last)
  }

  test("pure timestamp mode: an equal-ts run larger than the cap is delivered whole") {
    val snap = table((1L to 12L).map(i => (i, 5000L)): _*)
    val src = IncrementalJdbc.ofSnapshot(() => snap, maxRowsPerPoll = 5)
    // the strictly-greater resume filter cannot split the run, so the
    // whole run arrives in one chunk even though it exceeds the cap
    assert(ids(src.poll()).sorted == (1L to 12L))
    assert(src.currentOffset.contains(JdbcOffset(new Timestamp(5000L))))
    assert(src.poll().isEmpty)
  }

  test("pure timestamp mode: a cap cutting mid-run backs off to the previous distinct ts") {
    val snap = table((1L, 1000L), (2L, 1000L), (3L, 1000L), (4L, 2000L), (5L, 2000L))
    val src = IncrementalJdbc.ofSnapshot(() => snap, maxRowsPerPoll = 4)
    // 4 fetched rows would split the ts=2000 run → back off to ts=1000
    assert(ids(src.poll()).sorted == Seq(1L, 2L, 3L))
    assert(src.currentOffset.contains(JdbcOffset(new Timestamp(1000L))))
    assert(ids(src.poll()).sorted == Seq(4L, 5L))
    assert(src.currentOffset.contains(JdbcOffset(new Timestamp(2000L))))
  }

  test("composite timestamp+incrementing mode: equal-ts runs split losslessly at the cap") {
    val snap = table((1L to 12L).map(i => (i, 5000L)): _*)
    val src = IncrementalJdbc.ofSnapshot(() => snap,
      incrementingCol = Some("id"), maxRowsPerPoll = 5)
    val c1 = ids(src.poll())
    assert(c1 == (1L to 5L))
    // the offset carries the id tiebreak, so the run resumes MID-timestamp
    assert(src.currentOffset.contains(JdbcOffset(new Timestamp(5000L), Some(5L))))
    val c2 = ids(src.poll())
    val c3 = ids(src.poll())
    assert(c2 == (6L to 10L) && c3 == (11L to 12L))
    assert(src.currentOffset.contains(JdbcOffset(new Timestamp(5000L), Some(12L))))
    assert(src.poll().isEmpty)
  }

  test("composite mode also chunks across distinct timestamps") {
    val snap = table((1L, 1000L), (2L, 1000L), (3L, 2000L), (4L, 2000L), (5L, 3000L))
    val src = IncrementalJdbc.ofSnapshot(() => snap,
      incrementingCol = Some("id"), maxRowsPerPoll = 2)
    assert(ids(src.poll()) == Seq(1L, 2L))
    assert(ids(src.poll()) == Seq(3L, 4L))
    assert(ids(src.poll()) == Seq(5L))
    assert(src.currentOffset.contains(JdbcOffset(new Timestamp(3000L), Some(5L))))
  }

  test("initialOffset skips rows at or before the seed, delivers the rest") {
    val snap = table((1L, 1000L), (2L, 2000L), (3L, 3000L), (4L, 4000L))
    val src = IncrementalJdbc.ofSnapshot(() => snap,
      initialOffset = Some(JdbcOffset(new Timestamp(2000L))))
    // rows at (2000) or before (1000) never appear — Connect's
    // timestamp.initial semantics
    assert(ids(src.poll()).sorted == Seq(3L, 4L))
    assert(src.poll().isEmpty)
  }

  test("NULL-timestamp rows are never delivered, capped or not") {
    val snap = tableWithNulls(
      (1L, Some(1000L)), (2L, None), (3L, Some(2000L)), (4L, None))
    val uncapped = IncrementalJdbc.ofSnapshot(() => snap)
    assert(ids(uncapped.poll()).sorted == Seq(1L, 3L))
    assert(uncapped.poll().isEmpty) // NULL rows don't re-deliver either

    val capped = IncrementalJdbc.ofSnapshot(() => snap, maxRowsPerPoll = 1)
    assert((ids(capped.poll()) ++ ids(capped.poll())).sorted == Seq(1L, 3L))
    assert(capped.poll().isEmpty)
  }

  test("delay interval holds back rows newer than now - delay") {
    val snap = table((1L, 1000L), (2L, 2000L), (3L, 3000L))
    @volatile var now = 2500L
    val src = IncrementalJdbc.ofSnapshot(() => snap,
      delayIntervalMs = 500L, nowMillis = () => now)
    assert(ids(src.poll()).sorted == Seq(1L, 2L)) // 3000 > 2500-500
    now = 4000L
    assert(ids(src.poll()) == Seq(3L))
  }

  test("chunkSql inlines bounds, order and limit into the remote statement") {
    val t0 = new Timestamp(1704067200000L) // 2024-01-01 00:00:00 UTC
    // first poll, pure timestamp mode
    assert(IncrementalJdbc.chunkSql("public.customers", "dt_update", None,
      None, None, Some(101)) ==
      "(SELECT * FROM public.customers WHERE dt_update IS NOT NULL " +
        "ORDER BY dt_update ASC LIMIT 101) __graft_chunk")
    // resume with delay bound, pure timestamp mode
    val sql = IncrementalJdbc.chunkSql("t", "ts", None,
      Some(JdbcOffset(t0)), Some(new Timestamp(t0.getTime + 1000)), Some(11))
    assert(sql.contains("ts IS NOT NULL"))
    assert(sql.contains(s"ts > TIMESTAMP '${t0.toString}'"))
    assert(sql.contains("ORDER BY ts ASC LIMIT 11"))
    // composite resume: the id tiebreak reopens the boundary timestamp
    val comp = IncrementalJdbc.chunkSql("t", "ts", Some("id"),
      Some(JdbcOffset(t0, Some(42L))), None, Some(11))
    assert(comp.contains(
      s"(ts > TIMESTAMP '${t0.toString}' OR (ts = TIMESTAMP '${t0.toString}' AND id > 42))"))
    assert(comp.contains("ORDER BY ts ASC, id ASC LIMIT 11"))
  }

  test("rangeSql bounds a slice by inclusive upper key, both modes") {
    val t0 = new Timestamp(1704067200000L) // 2024-01-01 00:00:00 UTC
    val t1 = new Timestamp(t0.getTime + 3600000L)
    // pure timestamp: (lo.ts, hi.ts] on ts alone
    assert(IncrementalJdbc.rangeSql("t", "ts", None,
      Some(JdbcOffset(t0)), JdbcOffset(t1)) ==
      s"SELECT * FROM t WHERE ts IS NOT NULL AND ts > TIMESTAMP '${t0.toString}' " +
        s"AND ts <= TIMESTAMP '${t1.toString}' ORDER BY ts ASC")
    // composite: lexicographic (ts, id) bounds, upper id INCLUSIVE
    val comp = IncrementalJdbc.rangeSql("t", "ts", Some("id"),
      Some(JdbcOffset(t0, Some(7L))), JdbcOffset(t1, Some(9L)))
    assert(comp.contains(
      s"(ts > TIMESTAMP '${t0.toString}' OR (ts = TIMESTAMP '${t0.toString}' AND id > 7))"))
    assert(comp.contains(
      s"(ts < TIMESTAMP '${t1.toString}' OR (ts = TIMESTAMP '${t1.toString}' AND id <= 9))"))
    assert(comp.endsWith("ORDER BY ts ASC, id ASC"))
    // batch start (lower = None): only the NULL guard and the upper bound
    assert(IncrementalJdbc.rangeSql("t", "ts", None, None, JdbcOffset(t1)) ==
      s"SELECT * FROM t WHERE ts IS NOT NULL AND ts <= TIMESTAMP '${t1.toString}' ORDER BY ts ASC")
  }

  test("chunkKeys probes only the key columns, same order and cap") {
    val snap = table((3L, 3000L), (1L, 1000L), (2L, 2000L))
    val src = new SnapshotChunkSource(() => snap, incrementingCol = Some("id"))
    val keys = src.chunkKeys(None, None, Some(2))
    assert(keys.toSeq == Seq(JdbcOffset(new Timestamp(1000L), Some(1L)),
      JdbcOffset(new Timestamp(2000L), Some(2L))))
  }
}
