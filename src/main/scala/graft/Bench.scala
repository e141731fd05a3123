package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Five passes over every registered query:
  *
  *  1. COLD sequential (pool=1): first execution of each plan, charged
  *     its one-time janino/codegen compilation (~1-9 s for the big fused
  *     plans — constant work, amortized to nothing at 100 TB). Reported
  *     under `queries_cold` for visibility, NOT as the headline.
  *  2-4. WARM sequential ×3 (pool=1): repeated execution of the same
  *     plans — per-row work only. The headline `queries` map is the
  *     PER-QUERY MIN across the passes (round 6 lost a day to
  *     seven untouched queries "regressing" 1.3-2.1× on a contended
  *     box; one noisy pass can no longer masquerade as a regression).
  *     `seq_total` is the fastest whole-pass wall-clock. Every raw
  *     pass lands in BENCH_DETAIL.json with its PRE-PASS 1-minute load
  *     average and two fixed CALIBRATION probe times (single-thread
  *     xorshift; fixed 64-partition Spark range-sum) — round 9's whole
  *     registry read uniformly ~1.38× slower with unchanged code/plans
  *     and the artifact couldn't prove it was box contention; the
  *     calibration ratio now separates "box slower" from "plan worse".
  *     (Round 10 ran the experiments: the drift is within-JVM
  *     accumulated-state tax, not contention or plan regressions —
  *     evidence chain in BENCH_DRIFT.md.)
  *     If fewer than 2 of the base passes ran uncontended (pre-pass
  *     load over the gate, or calibration >1.5× the best), up to 2
  *     replacement passes run.
  *  5. CONCURRENT drain (pool=6): batch throughput. One tiny query alone
  *     cannot saturate local[32] (small shuffle stages leave cores idle
  *     between tasks), so the drain wall-clock `value` is the honest
  *     engine-throughput metric, directly comparable to earlier rounds.
  *
  * Output contract: the LAST stdout line is one compact JSON object —
  * values rounded to ms, warm `queries` map only — sized to fit entirely
  * inside a 2 000-character tail capture (the full-precision line with
  * both maps was ~5.5 kB and was truncated out of every prior round's
  * harvested artifact). The full detail (cold / warm / per-query drain,
  * full precision) goes to `BENCH_DETAIL.json` in the working directory.
  *
  * Semantics note (recorded in the JSON itself as `headline`): from round
  * 4 on, `queries` is the WARM second run; rounds 1-3 published cold
  * first-run numbers, so cross-round per-query deltas vs r1-r3 include
  * the removed one-time codegen compile (~1-9 s on the big fused plans).
  */
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

    // optional comma-separated name filter for local iteration (the
    // driver never sets it — full set)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // failed queries report -1, not a healthy-looking fast duration
    def timed(name: String, fn: SparkEntry.Q): Double = {
      val q0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - q0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0 }
    }

    def loadAvg: Double =
      java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadAvg

    // CALIBRATION workload (round-9 verdict: the whole registry read
    // ~1.38× slower than round 8 with unchanged code, plans, and
    // fixtures, and the artifact couldn't distinguish sandbox contention
    // from a real global regression). Two fixed probes, run before every
    // pass, whose ONLY variable is the environment:
    //  - calib_jvm: single-thread xorshift loop — pure CPU, no Spark, no
    //    allocation; tracks per-core speed (noisy-neighbor steal, cgroup
    //    throttling, thermal clamps).
    //  - calib_spark: fixed 64-partition range-sum through the same
    //    session — adds scheduler + codegen'd task execution; tracks
    //    JVM-internal drift (GC pressure, JIT state) on top.
    // Cross-round, per-query ratios divided by the calibration ratio
    // separate "the box was slower" from "the plan got worse".
    def calibJvm(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9e3779b97f4a7c15L; var acc = 0L; var i = 0
      while (i < 200000000) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17; acc += x; i += 1
      }
      if (acc == 42L) println("") // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e9
    }
    def calibSpark(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 200000000L, 1, 64)
        .selectExpr("sum(id * 3 % 1000)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    calibJvm(); calibSpark() // JIT/codegen warm-up, untimed
    // cumulative GC time + live heap alongside the calibration: round 10
    // traced the uniform r8→r9 "drift" to JVM-state accumulation across
    // the ~700 plan executions of a full run (the fixed Spark probe
    // degrades ~0.24 s → ~0.40 s within one run; a fresh JVM on the same
    // box recovers round-8 times), and these two series show directly
    // whether collector pressure tracks that degradation
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime.max(0L)).sum
    }
    def heapMb: Long = {
      val r = Runtime.getRuntime
      (r.totalMemory() - r.freeMemory()) / (1024 * 1024)
    }
    case class PassMeta(label: String, load: Double, cj: Double, cs: Double,
                        gc: Long, heap: Long)
    def meta(label: String) =
      PassMeta(label, loadAvg, calibJvm(), calibSpark(), gcMs, heapMb)

    // pass 1: cold sequential (codegen compile included — reported apart)
    val coldMeta = meta("cold")
    val cold = named.map { case (name, fn) => name -> timed(name, fn) }

    // warm sequential passes — headline = per-query MIN, so a transient
    // box-contention spike in one pass cannot read as a regression of an
    // untouched query. Base 3 passes; a pass whose pre-pass 1-minute
    // load average exceeds LoadGate (external work — this process is
    // between passes, so its own executors are quiesced) or whose
    // calibration runs >1.5× the best observed gets one replacement
    // pass, up to 2 extras, so a fully-contended trio can't silently
    // become the round's headline.
    val loadGate = sys.env.getOrElse("SPARK_GRAFT_LOAD_GATE",
      (cpus.toInt / 2).toString).toDouble
    def contended(m: PassMeta, bestCj: Double, bestCs: Double): Boolean =
      m.load > loadGate || m.cj > bestCj * 1.5 || m.cs > bestCs * 1.5
    var passes = Vector.empty[(PassMeta, Seq[(String, Double)], Double)]
    def runPass(label: String): Unit = {
      val m = meta(label)
      val s0 = System.nanoTime()
      val run = named.map { case (name, fn) => name -> timed(name, fn) }
      passes :+= ((m, run, (System.nanoTime() - s0) / 1e9))
    }
    (1 to 3).foreach(i => runPass(s"warm_$i"))
    var extras = 0
    while (extras < 2 && {
      val bestCj = passes.map(_._1.cj).min
      val bestCs = passes.map(_._1.cs).min
      passes.count(p => !contended(p._1, bestCj, bestCs)) < 2
    }) { extras += 1; runPass(s"warm_extra_$extras") }
    val warmPasses = passes.map(p => (p._2, p._3))
    val seq = named.indices.map { i =>
      val ts = warmPasses.map(_._1(i)._2).filter(_ >= 0)
      named(i)._1 -> (if (ts.isEmpty) -1.0 else ts.min)
    }
    val seqTotal = warmPasses.map(_._2).min
    val calibBest = (passes.map(_._1.cj).min, passes.map(_._1.cs).min)

    // pass 3: concurrent drain (plans/codegen warm from passes 1-2, so
    // this measures scheduling + execution throughput, not compilation)
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = Executors.newFixedThreadPool(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_POOL", "6").toInt)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val t0 = System.nanoTime()
    val futures = named.map { case (name, fn) => Future(name -> timed(name, fn)) }
    val drain = Await.result(Future.sequence(futures), Duration.Inf)
    val drainTotal = (System.nanoTime() - t0) / 1e9
    pool.shutdown()

    // centiseconds are plenty for second-scale headline queries, and the
    // rounding keeps the line inside the 2000-char tail-capture window as
    // the query count grows (full precision lives in BENCH_DETAIL.json)
    def ms(v: Double) = math.rint(v * 100) / 100
    def jsonMap(m: Seq[(String, Double)], f: Double => Double = identity) = m
      .map { case (k, v) => s"\"" + k + "\":" + f(v) }.mkString("{", ",", "}")

    // full-precision detail artifact (not size-constrained); every pass
    // carries its pre-pass load average + calibration probe times so a
    // contended run is visible per-pass, and cross-round comparisons can
    // normalize by the environment instead of guessing
    val loadEnd = loadAvg
    def metaJson(m: PassMeta) =
      s""""load_pre":${m.load},"calib_jvm_s":${m.cj},"calib_spark_s":${m.cs},"gc_total_ms":${m.gc},"heap_used_mb":${m.heap}"""
    val warmRuns = passes
      .map { case (m, run, total) =>
        s""""${m.label}":{"total":$total,${metaJson(m)},"queries":${jsonMap(run)}}""" }
      .mkString(",")
    val detail =
      s"""{"sf":"$sfDir","drain_total":$drainTotal,"seq_total":$seqTotal,
         |"load_avg_start":$loadStart,"load_avg_end":$loadEnd,
         |"load_gate":$loadGate,"extra_passes":$extras,
         |"calib_jvm_best_s":${calibBest._1},"calib_spark_best_s":${calibBest._2},
         |"cold_meta":{${metaJson(coldMeta)}},
         |"queries_warm":${jsonMap(seq)},
         |$warmRuns,
         |"queries_cold":${jsonMap(cold)},
         |"queries_drain":${jsonMap(drain)}}""".stripMargin
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      detail.getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] detail write failed: ${e.getMessage}") }

    // streaming micro-bench: per-batch latency/rate of the reference's two
    // pipeline shapes at its 500 ms poll cadence → STREAM_METRICS.json
    // (the streaming twin of BENCH_DETAIL; never disturbs the stdout
    // contract — the headline line below stays LAST)
    try graft.streaming.StreamMetrics.microBench(spark)
    catch { case e: Throwable =>
      System.err.println(s"[bench] stream micro-bench failed: ${e.getMessage}") }

    // Quiesce and stop Spark BEFORE emitting the result lines. Round 8's
    // driver artifact lost the JSON because asynchronous shutdown ERROR
    // stacktraces (TaskResultGetter RejectedExecutionException) printed
    // after it and pushed it out of the tail capture. Silencing the
    // loggers and stopping first makes the JSON the true last stdout.
    //
    // TWO result lines, full first, COMPACT LAST: the driver keeps a
    // ~2000-char stdout tail and parses the end of it, and at 135
    // registered queries the full per-query map is ~3.5 kB — a single
    // full line gets its HEAD (metric/value) truncated out of the tail,
    // which is why every prior round's harvested bench artifact parsed
    // null. The last line now carries the headline numbers alone (~200
    // chars, always inside the tail); the full map precedes it for log
    // readers and lands in BENCH_HEADLINE.json + BENCH_DETAIL.json.
    val calib = s""""calib_jvm_s":${ms(calibBest._1)},"calib_spark_s":${ms(calibBest._2)}"""
    val headline = s"""{"metric":"total","value":${ms(drainTotal)},"unit":"sec","queries":${jsonMap(seq, ms)},"seq_total":${ms(seqTotal)},"load_avg":${ms(loadStart)},$calib,"headline":"warm min-of-3+ (passes in BENCH_DETAIL.json)","sf":"$sfDir"}"""
    // schema-true subset: the 25 slowest warm queries (all-float values,
    // ~900 chars) so any consumer iterating `queries` sees real numbers
    val slowest = seq.sortBy(-_._2).take(25).sortBy(_._1)
    val compact = s"""{"metric":"total","value":${ms(drainTotal)},"unit":"sec","queries":${jsonMap(slowest, ms)},"n_queries":${seq.size},"queries_note":"${slowest.size} slowest of ${seq.size}; full map in BENCH_DETAIL.json","seq_total":${ms(seqTotal)},"load_avg":${ms(loadStart)},$calib,"sf":"$sfDir"}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_HEADLINE.json"), headline.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    try {
      spark.sparkContext.setLogLevel("OFF")
      spark.stop()
    } catch { case _: Throwable => () }
    println(headline)
    println(compact)
    System.out.flush()
  }
}
