package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators beyond the reference's single tumbling window —
  * as-of join, session windows, hopping windows (north-star extension;
  * SURVEY.md §2.8 lists all three as absent from the reference).
  *
  * Scale design: the as-of join is the union + ordered-window formulation —
  * ONE shuffle + sort on (key, time) regardless of build/probe skew, no
  * inequality join (Spark would otherwise plan an inequality theta-join as
  * a broadcast nested loop or worse). Session/hopping windows are plain
  * hash aggregations; hopping fan-out is bounded by length/slide.
  */
object Temporal {

  val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** As-of join: for each probe row, the latest build payload with
    * build.ts <= probe.ts for the same key (equal timestamps count as
    * prior — build rows order before probe rows at the same instant).
    *
    * `tie` must be a column present in both frames that makes the
    * (ts, side, tie) ordering total, so results are deterministic when
    * several build rows share one timestamp.
    *
    * Implementation: tag both sides, union by position, one running
    * `last(ignoreNulls)` window per payload column over
    * (key ORDER BY ts, side, tie), keep probe rows. Payload columns on
    * probe rows enter as typed nulls, so the running last() always holds
    * the most recent build value.
    */
  def asofJoin(probe: DataFrame, build: DataFrame, key: String, ts: String,
               tie: String, payload: Seq[String]): DataFrame = {
    val pCols = probe.columns.toSeq
    require(!pCols.exists(payload.contains),
      "payload column names must not collide with probe columns")
    val passthrough = Set(key, ts, tie)
    val probeSide = probe.select(
      pCols.map(col) ++
        payload.map(c => lit(null).cast(build.schema(c).dataType).as(c)) :+
        lit(1).as("__side"): _*)
    val buildSide = build.select(
      pCols.map(c => if (passthrough(c)) col(c)
        else lit(null).cast(probe.schema(c).dataType).as(c)) ++
        payload.map(col) :+ lit(0).as("__side"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc, col(tie).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attributed = payload.foldLeft(probeSide.unionAll(buildSide)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    attributed.filter(col("__side") === 1)
      .select(pCols.map(col) ++ payload.map(col): _*)
  }

  /** Attribution demo over the events table: each purchase joined as-of to
    * the latest prior non-purchase event of the same user.
    */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val probe = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val build = events.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type").as("prev_type"), col("ts").as("prev_ts"))
    asofJoin(probe, build, key = "user_id", ts = "ts", tie = "event_id",
      payload = Seq("prev_type", "prev_ts"))
      .select(col("event_id"), col("user_id"), col("prev_type"),
        date_format(col("prev_ts"), TsFmt).as("prev_ts"))
  }

  /** As-of attribution WITH TOLERANCE — the feature-store / point-in-time
    * standard the unbounded as-of lacks: a prior event older than
    * `tolSec` is STALE and must null out rather than leak arbitrarily
    * old state into the joined row (an unbounded as-of happily attributes
    * a purchase to a click from last year). Same single
    * shuffle+sort as [[purchaseAttribution]] — the staleness gate is a
    * per-row integer comparison AFTER the running-last window, not a
    * second join; both payload columns null together so a row is either
    * attributed or cleanly bare.
    */
  def purchaseAttributionWithin(events: DataFrame, tolSec: Long = 600): DataFrame = {
    val probe = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val build = events.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type").as("prev_type"), col("ts").as("prev_ts"))
    val fresh = col("prev_ts").isNotNull &&
      unix_micros(col("ts")) - unix_micros(col("prev_ts")) <= tolSec * 1000000L
    asofJoin(probe, build, key = "user_id", ts = "ts", tie = "event_id",
      payload = Seq("prev_type", "prev_ts"))
      .select(col("event_id"), col("user_id"),
        when(fresh, col("prev_type")).as("prev_type"),
        date_format(when(fresh, col("prev_ts")), TsFmt).as("prev_ts"))
  }

  /** Per-user session windows (5-minute inactivity gap): a new session
    * starts when the gap to the previous event is >= the gap; session end
    * is last event + gap (Spark `session_window` semantics, usable
    * unchanged in Structured Streaming).
    */
  def sessionCounts(events: DataFrame, gap: String = "5 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), TsFmt).as("session_start"),
        date_format(col("session_window.end"), TsFmt).as("session_end"),
        col("n_events"))

  /** Hopping (sliding) windows: 60 s length, 30 s slide — each event lands
    * in length/slide windows; counts per (window, event_type).
    */
  def hoppingCounts(events: DataFrame, length: String = "60 seconds",
                    slide: String = "30 seconds"): DataFrame =
    events
      .groupBy(window(col("ts"), length, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("cnt"))

  /** BUCKETED RANGE JOIN: per purchase, how many of the same user's
    * events fall in the half-open window [purchase.ts − window,
    * purchase.ts). Semantically an interval (theta) join — which Spark
    * would plan as a nested-loop — executed instead as an EQUI-join on
    * (user, time-bucket): activities key by their bucket
    * (⌊µs / windowµs⌋); each purchase window spans at most two buckets
    * (its own and the previous, since bucket width = window length), so
    * the purchase side explodes to exactly 2 keys and the range predicate
    * verifies inside the join. An activity's single bucket matches at
    * most one of the two exploded keys, so matches are exact with no
    * dedup pass. One narrow shuffle on (user, bucket) per side at any
    * scale — the standard bucketed-range-join pattern.
    *
    * Purchases with no prior activity keep cnt = 0 via the left join
    * (count over the activity-side key counts non-null matches only).
    */
  def priorActivityCounts(events: DataFrame, windowUs: Long = 300000000L): DataFrame = {
    val acts = events.select(col("user_id").as("a_user"),
      unix_micros(col("ts")).as("a_us"))
      .withColumn("bucket", floor(col("a_us") / windowUs))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("p_us"))
      .withColumn("bucket", explode(array(
        floor(col("p_us") / windowUs) - 1, floor(col("p_us") / windowUs))))
    purchases.join(acts,
        purchases("user_id") === acts("a_user")
          && purchases("bucket") === acts("bucket")
          && acts("a_us") >= purchases("p_us") - windowUs
          && acts("a_us") < purchases("p_us"),
        "left")
      .groupBy(col("event_id"), col("user_id"))
      .agg(count(col("a_user")).as("n_prior_events"))
  }
}
