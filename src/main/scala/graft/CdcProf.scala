package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for cdc_merge_apply_bucketed at the 100x dir. */
object CdcProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/tmp/graft_scale_sf10"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("layout build (untimed in probe)") {
      graft.operators.Relational.cdcBucketedLayout(spark, dir, 32)
    }
    t("full query 1st") {
      graft.operators.Relational.cdcMergeApplyBucketed(spark, dir, 32).count()
    }
    t("full query 2nd") {
      graft.operators.Relational.cdcMergeApplyBucketed(spark, dir, 32).count()
    }
    val (snap, _, changes) =
      graft.operators.Relational.cdcBucketedLayout(spark, dir, 32)
    t("staged changes count") { changes.count() }
    t("touched collect") {
      changes.select(pmod(col("key"), lit(32)).cast("int").as("bucket"))
        .distinct().collect()
    }
    t("touched rows scan") {
      snap.filter(col("bucket").isin(0, 1)).count()
    }
    spark.stop()
  }
}
