package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Introspection surface (SURVEY.md §2.7): the engine's analog of the
  * reference's `show topics` / `show streams` / `show connectors` CLI
  * inspection — backed by the session catalog and the active
  * StreamingQuery registry.
  */
object EngineCatalog {

  /** Register the full testdata star schema as temp views (S3-shape:
    * stream/table registration).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    Tables.registerAll(spark, dir)

  /** I1 `show topics` ≈ registered relations. */
  def listTables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables()
      .select($"name", $"tableType", $"isTemporary")
  }

  /** I2/I3 `show streams` / `show connectors` ≈ active streaming queries. */
  def listStreams(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.streams.active.toSeq
      .map(q => (Option(q.name).getOrElse(""), q.id.toString, q.isActive))
      .toDF("name", "id", "is_active")
  }
}
