package graft

import java.sql.Timestamp

import graft.operators.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, typ: String, ms: Long) =
    (id, new Timestamp(ms), user, typ, 1.0, "{}")

  private lazy val events = Seq(
    ev(1, 10, "view", 1000L),
    ev(2, 10, "click", 5000L),
    ev(3, 10, "purchase", 5000L),   // same instant as click → click counts (<=)
    ev(4, 10, "purchase", 9000L),   // latest prior is click@5000
    ev(5, 20, "purchase", 2000L),   // no prior for user 20 → nulls
    ev(6, 20, "view", 3000L),
    ev(7, 30, "view", 1000L),
    ev(8, 30, "view", 1000L)        // tie on ts → larger event_id wins
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("as-of join: <= semantics, per-user isolation, deterministic ties") {
    val got = Temporal.purchaseAttribution(events).collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(got(3L).contains("click"))  // same-instant build row counts
    assert(got(4L).contains("click"))  // latest prior, not first
    assert(got(5L).isEmpty)            // nothing prior → null
  }

  test("as-of join ties broken by tie column (largest prior event id)") {
    val probe = Seq((100L, 40L, new Timestamp(2000L)))
      .toDF("event_id", "user_id", "ts")
    val build = Seq(
      (7L, 40L, new Timestamp(1000L), "a"),
      (8L, 40L, new Timestamp(1000L), "b"))
      .toDF("event_id", "user_id", "ts", "tag")
    val got = Temporal.asofJoin(probe, build, "user_id", "ts", "event_id", Seq("tag"))
      .select("tag").as[String].collect()
    assert(got.toSeq == Seq("b"))
  }

  test("session windows: gap >= threshold splits; end = last + gap") {
    val df = Seq(
      ev(1, 1, "view", 0L),
      ev(2, 1, "view", 200_000L),     // < 5 min after → same session
      ev(3, 1, "view", 500_001L),     // 300 001 ms gap → new session
      ev(4, 2, "view", 0L)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Temporal.sessionCounts(df)
      .as[(Long, String, String, Long)].collect().toSet
    assert(got == Set(
      (1L, "1970-01-01 00:00:00.000000", "1970-01-01 00:08:20.000000", 2L),
      (1L, "1970-01-01 00:08:20.001000", "1970-01-01 00:13:20.001000", 1L),
      (2L, "1970-01-01 00:00:00.000000", "1970-01-01 00:05:00.000000", 1L)))
  }

  test("hopping windows: every event lands in exactly length/slide windows") {
    val total = Temporal.hoppingCounts(events)
      .agg(org.apache.spark.sql.functions.sum("cnt")).as[Long].collect()(0)
    assert(total == events.count() * 2) // 60s/30s → 2 windows per event
  }
}
