package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up JVM/codegen/scheduler so the first timed query isn't charged
    // 3-5 s of session startup
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      Tables.load(spark, sfDir, "lineitem").count()
    } catch { case _: Throwable => () }
    // Queries run on a small concurrent pool: one query alone cannot
    // saturate local[32] (tiny shuffle stages leave most cores idle
    // between tasks), so batch throughput — not one-at-a-time latency —
    // is the honest engine metric. `value` is the wall-clock to drain the
    // whole batch; per-query numbers are each query's own duration.
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = Executors.newFixedThreadPool(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_POOL", "6").toInt)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val t0 = System.nanoTime()
    val futures = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      Future {
        val q0 = System.nanoTime()
        // failed queries report -1, not a healthy-looking fast duration
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        name -> (if (ok) (System.nanoTime() - q0) / 1e9 else -1.0)
      }
    }
    val results = Await.result(Future.sequence(futures), Duration.Inf)
    val total = (System.nanoTime() - t0) / 1e9
    pool.shutdown()
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
