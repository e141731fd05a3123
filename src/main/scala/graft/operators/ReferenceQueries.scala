package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** The four ksqlDB queries of the reference (`/root/reference/README.md:204-277`),
  * re-expressed as composable DataFrame transforms.
  *
  * Each transform is written against a *schema contract*, not a concrete
  * source, so the same function runs over (a) the deterministic fake-customer
  * generator ([[graft.sources.FakeData]]), (b) the driver's `events` table
  * (the batch analog used for the DuckDB oracle), and (c) a streaming
  * DataFrame from MemoryStream/Kafka — the plan is identical; only the
  * source/sink differ (SURVEY.md §3.3).
  *
  * Scale notes: all four are narrow transforms except the windowed count,
  * whose only shuffle is the hash partition on (window, key) — exactly the
  * repartition-topic the reference's Kafka Streams topology performs
  * (reference README.md:275). Partial aggregation (map-side combine) comes
  * free from Catalyst's HashAggregateExec.
  */
object ReferenceQueries {

  // -------------------------------------------------------------------
  // Over the fake-customers schema (reference parity; column-for-column)
  // -------------------------------------------------------------------

  /** `custstream` projection — reference README.md:210-213: select with
    * DATETOSTRING/TIMESTAMPTOSTRING conversions.
    */
  def custProjection(cust: DataFrame): DataFrame =
    cust.select(
      col("nome"), col("telefone"), col("email"),
      dateToString(col("nascimento"), "yyyy-MM-dd").as("dt_nascimento"),
      timestampToString(col("dt_update"), "yyyy-MM-dd HH:mm:ss.SSS").as("dt_updt_conv"))

  /** `jovens` — reference README.md:233-239: projection + WHERE on the
    * *formatted* date string (lexicographic compare ≡ date compare).
    */
  def jovens(cust: DataFrame, threshold: String = "2000-01-01"): DataFrame =
    custProjection(cust)
      .filter(dateToString(col("nascimento"), "yyyy-MM-dd") >= lit(threshold))

  /** `idadeclass` — reference README.md:258-265: searched CASE classifying
    * JOVEM vs ADULTO by birthdate threshold.
    */
  def idadeclass(cust: DataFrame, threshold: String = "2000-01-01"): DataFrame =
    cust.select(
      col("nome"), col("email"),
      when(dateToString(col("nascimento"), "yyyy-MM-dd") >= lit(threshold), lit("JOVEM"))
        .otherwise(lit("ADULTO")).as("idadecat"),
      col("dt_update"))

  /** `idadecont` — reference README.md:271-277: 30-second tumbling window
    * count per idadecat. Window start/end kept as explicit columns (the
    * ksqlDB changelog key carries the window; SURVEY.md §7.5.4).
    */
  def idadecont(classified: DataFrame, tsCol: String = "dt_update",
                windowLen: String = "30 seconds"): DataFrame =
    classified
      .groupBy(window(col(tsCol), windowLen), col("idadecat"))
      .agg(count(col("idadecat")).as("contagem"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("idadecat"), col("contagem"))

  // -------------------------------------------------------------------
  // Batch analogs over the driver's `events` table (oracle-checkable).
  // Same operator chains (P1,P2,P4,F1-F4,A1-A3), different column names.
  // -------------------------------------------------------------------

  private def tsDay(c: Column): Column = dateToString(c, "yyyy-MM-dd")

  /** P1/F1/F2: projection with date→string conversions over events. */
  def eventsProjection(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), col("user_id"), col("event_type"),
      tsDay(col("ts")).as("dt"),
      timestampToString(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS").as("dt_full"))

  /** P2/F3: `jovens`-shaped filter — keep "young" (recent) events by
    * lexicographic compare of the formatted date.
    */
  def eventsJovens(events: DataFrame, threshold: String = "2024-01-15"): DataFrame =
    eventsProjection(events).filter(col("dt") >= lit(threshold))

  /** P4: CASE WHEN classification (JOVEM/ADULTO by recency). */
  def eventsClass(events: DataFrame, threshold: String = "2024-01-15"): DataFrame =
    events.select(
      col("event_id"), col("user_id"), col("event_type"), col("ts"),
      when(tsDay(col("ts")) >= lit(threshold), lit("JOVEM"))
        .otherwise(lit("ADULTO")).as("idadecat"))

  /** A1-A3: tumbling-window count per class. Window bounds emitted as
    * formatted strings (events.ts is ns-precision parquet; strings keep the
    * oracle compare precision-independent).
    */
  def eventsWindowCount(events: DataFrame, threshold: String = "2024-01-15",
                        windowLen: String = "30 seconds"): DataFrame =
    eventsClass(events, threshold)
      .groupBy(window(col("ts"), windowLen), col("idadecat"))
      .agg(count(lit(1)).as("contagem"))
      .select(
        timestampToString(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("idadecat"), col("contagem"))
}
