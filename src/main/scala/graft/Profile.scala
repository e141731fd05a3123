package graft
import org.apache.spark.sql.SparkSession
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.load(spark, sf, "lineitem").count()
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[profile] $name%-24s ${(System.nanoTime()-t0)/1e9}%8.2f s")
    }
    for (n <- Seq("dedup_exact", "text_quality", "dedup_embedding_pairs", "join_orders_by_region", "sim_bucket_histogram", "ref_window_count", "q1_pricing_summary", "mm_decode_features", "dedup_jaccard_pairs", "dedup_lsh_pairs"))
      time(n)(SparkEntry.queries(n)(spark, sf).count())
    spark.stop()
  }
}
