package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet testdata tables (TESTDATA.md).
  *
  * Scale notes: the parquet scan is the only data entry point the engine
  * uses in batch mode, so every query benefits from Spark's vectorized
  * reader, predicate pushdown and column pruning automatically. At 100 TB
  * the same loaders work unchanged — partition parallelism comes from
  * `spark.sql.files.maxPartitionBytes`, not from anything here.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Fact-sized tables that deserve compute parallelism even when the
    * testdata ships as a single unsplittable row group. Dimension tables
    * (region/nation/supplier) stay as-is — they broadcast anyway.
    */
  private val factTables = Set(
    "lineitem", "orders", "events", "documents", "embeddings", "customer", "part")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver's generator has shipped events.ts in two physical forms
    // across rounds; normalize both to TimestampType so every downstream
    // plan sees one schema:
    //  - timestamp[us] (current): reads natively as TIMESTAMP_NTZ; under
    //    the engine's pinned UTC session zone the NTZ→TIMESTAMP cast is
    //    value-identical (and matches what DuckDB sees as naive µs).
    //  - TIMESTAMP(NANOS) (older rounds): no native Spark type. If the
    //    session-wide nanosAsLong flag happens to be set (another thread
    //    mid-nanosEvents), the plain read SUCCEEDS with ts as LongType —
    //    dispatching on the resolved schema (not on whether the read threw)
    //    keeps that path correct: long nanos are truncated to µs here too.
    //    Integer `div` (not `/`, which is double and loses precision above
    //    2^53 — epoch-nanos are ~1.7e18) keeps this exact. Only when the
    //    flag is unset does the read throw (at schema conversion), and only
    //    that specific failure falls back to the legacy-flag read; anything
    //    else (missing file, IO error) propagates as the real root cause.
    val raw =
      if (name == "events") {
        import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
        try {
          val df = spark.read.parquet(s"$dir/$name.parquet")
          df.schema("ts").dataType match {
            case org.apache.spark.sql.types.LongType =>
              df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
            case _ =>
              df.withColumn("ts",
                col("ts").cast(org.apache.spark.sql.types.TimestampType))
          }
        } catch {
          case e: Exception if isNanosSchemaError(e) => nanosEvents(spark, dir)
        }
      } else spark.read.parquet(s"$dir/$name.parquet")
    fanOut(spark, dir, name, raw)
  }

  /** True only for the schema-conversion failure Spark raises when a parquet
    * TIMESTAMP(NANOS) column is read without the legacy nanosAsLong flag
    * (PARQUET_TYPE_ILLEGAL / "Illegal Parquet type"). Every other failure —
    * missing file, corrupt footer, IO — must surface as-is, not be masked
    * by a retry through the legacy path.
    */
  private def isNanosSchemaError(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).exists { t =>
      val m = Option(t.getMessage).getOrElse("")
      m.contains("PARQUET_TYPE_ILLEGAL") || m.contains("Illegal Parquet type") ||
        m.contains("TIMESTAMP(NANOS")
    }

  /** Fallback read for older testdata where events.ts is TIMESTAMP(NANOS),
    * which Spark has no native type for — read it as long nanos under the
    * legacy flag and truncate to µs TimestampType.
    *
    * nanosAsLong is a SESSION-WIDE flag, so it is restored to its prior
    * value once the relation is resolved: leaving it set would silently
    * change how any later TIMESTAMP(NANOS) parquet column is read
    * elsewhere in the session. Scan execution is unaffected by the
    * restore — the scan captures its Hadoop conf (including this flag)
    * when the relation is created, not when the query later runs.
    * The set→resolve→restore window is serialized under a lock: two
    * concurrent events loads otherwise race (one restores while the
    * other is mid-resolution → PARQUET_TYPE_ILLEGAL), which Verify's
    * 4-way pool hits in practice.
    */
  private def nanosEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.synchronized {
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try {
        spark.read.parquet(s"$dir/events.parquet")
          .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      } finally {
        prior match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      }
    }

  /** The testdata parquet files are one row group each, so a scan yields a
    * single partition and all downstream per-row compute serializes on one
    * core. Round-robin the scan across the cluster when (and only when) the
    * scan has fewer partitions than the configured parallelism — at
    * production scale a fact table has thousands of splits and this is a
    * no-op, so no shuffle is ever added where the scan already parallelizes.
    *
    * The partition probe (`df.rdd.getNumPartitions` — it builds a physical
    * plan) runs once per (dir, table): the verdict is memoized, so repeated
    * loads of the same table don't re-pay the RDD conversion.
    */
  private val fanOutNeeded =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Boolean]()

  private def fanOut(spark: SparkSession, dir: String, name: String,
                     df: DataFrame): DataFrame = {
    val p = spark.sparkContext.defaultParallelism
    val needed = factTables(name) && fanOutNeeded.computeIfAbsent(
      (dir, name), _ => df.rdd.getNumPartitions < p)
    if (needed) df.repartition(p) else df
  }

  /** Register every table as a temp view so spark.sql(...) works. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Per-session root for write-time-persisted derived tables (bucketed
    * fact tables, the partitioned ANN index). The applicationId in the
    * path keeps concurrent JVMs/users from colliding on one shared
    * tmpdir location — the in-process locks only serialize one JVM.
    */
  def persistedTableRoot(spark: SparkSession): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_persisted_" +
      spark.sparkContext.applicationId

  /** Ensure-once for a persisted derived table: reuse the catalog entry
    * only if its data is actually readable and non-empty (a persistent
    * metastore can outlive a cleaned tmpdir, leaving an entry whose files
    * are gone — that must trigger a rebuild, not an empty scan). Our
    * derived tables are never legitimately empty, so `limit(1)` doubles
    * as the files-exist probe while reading at most one row.
    */
  def ensurePersisted(spark: SparkSession, name: String)
                     (write: String => Unit): DataFrame = {
    val healthy = spark.catalog.tableExists(name) &&
      (try spark.table(name).limit(1).count() == 1
       catch { case _: Exception => false })
    if (!healthy) {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      write(s"${persistedTableRoot(spark)}/$name")
    }
    spark.table(name)
  }
}
