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
}
