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

  test("as-of with tolerance: stale matches null out, fresh ones survive") {
    // tolerance 3 s: purchase@5000 is 0 ms after click@5000 (fresh);
    // purchase@9000 is 4 s after click@5000 (stale -> both payloads null);
    // user 20's purchase has no prior at all (null either way)
    val got = Temporal.purchaseAttributionWithin(events, 3)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(2)), Option(r.getString(3))))).toMap
    assert(got(3L) == ((Some("click"), Some("1970-01-01 00:00:05.000000"))))
    assert(got(4L) == ((None, None)))
    assert(got(5L) == ((None, None)))
    // a huge tolerance degrades to the unbounded as-of
    val unbounded = Temporal.purchaseAttribution(events)
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    val wide = Temporal.purchaseAttributionWithin(events, 1000000L)
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(wide == unbounded)
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

  test("bucketed range join: boundary-exact window counts, zero kept, no nested loop") {
    import org.apache.spark.sql.functions._
    val w = 300000000L // 5 min in µs
    def ev(id: Long, user: Long, tpe: String, ms: Long) =
      (id, user, tpe, new java.sql.Timestamp(ms))
    val events = Seq(
      // times in ms; user 1: purchase at 600s — window [300s, 600s)
      ev(1, 1, "purchase", 600000L),
      ev(2, 1, "click", 300000L),    // exactly ts-w → INCLUDED
      ev(3, 1, "view", 599999L),     // just inside
      ev(4, 1, "click", 600000L),    // exactly ts → EXCLUDED
      ev(5, 1, "view", 299999L),     // just before window
      ev(6, 2, "click", 500000L),    // other user → excluded
      // user 2: purchase with NOTHING prior → kept with 0
      ev(7, 2, "purchase", 100000L),
      // user 3: purchase whose window spans a bucket boundary
      ev(8, 3, "purchase", 650000L), // window [350s, 650s)
      ev(9, 3, "click", 400000L),    // previous bucket, in window
      ev(10, 3, "click", 640000L)    // same bucket, in window
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Temporal.priorActivityCounts(events, w)
      .select("event_id", "n_prior_events").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 7L -> 0L, 8L -> 2L))
    // the whole point: an interval join WITHOUT the nested-loop plan
    val p = Temporal.priorActivityCounts(events, w)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }
}
