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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet stores ts as TIMESTAMP(NANOS), which Spark has no
    // native type for — read it as long nanos and truncate to µs
    // TimestampType. Integer `div` (not `/`, which is double and loses
    // precision above 2^53 — epoch-nanos are ~1.7e18) keeps this exact.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so spark.sql(...) works. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
