package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — PER-QUERY JVM ISOLATION from round 12 on.
  *
  * Round 10 proved (BENCH_DRIFT.md) that a JVM hosting many plan
  * executions accumulates state whose tax inflates every later
  * measurement. Round 11 sharded the registry into 4 fresh JVMs; round
  * 12 first tried 12 — and measured that THE TAX SATURATES DURING THE
  * SHARD'S OWN COLD PASS: the fixed Spark calibration probe doubles
  * (0.17 → 0.43 s) after as few as ~13 first executions and never
  * recovers, because each generated whole-stage-codegen class pollutes
  * the JIT profiles of the shared Spark runtime paths it calls into
  * (inline caches at UnsafeRow/writer call sites go megamorphic). No
  * shard size fixes that — only a JVM whose profile holds a single
  * query's code measures that query at full speed.
  *
  * So the round-12 protocol isolates COMPLETELY:
  *
  *  1. WARM (headline `queries` map): one fresh child JVM per query,
  *     sequential. Each child starts a session, runs an untimed
  *     warm-up, the query COLD (codegen charged, reported under
  *     `queries_cold`), then 3 timed warm passes (min wins; up to 2
  *     extra passes if the per-pass calibration probes flag
  *     contention). The committed number IS the fresh-JVM number by
  *     construction — the quantity BENCH_DRIFT.md's hand spot-checks
  *     measured. `seq_total` = sum of per-query warm minima.
  *  2. DRAIN (`drain_total`, the compact line's "value"): ONE shared
  *     JVM runs the whole registry — cold compile pass, quiesce, then
  *     a pool-6 concurrent drain. This restores the pre-round-11
  *     single-JVM whole-registry drain semantics that sharding had
  *     silently changed (the r11 advisory): it measures scheduler +
  *     execution throughput with warm plans, where accumulated-state
  *     effects are part of the workload being modeled (a real driver
  *     hosting a query mix).
  *  3. STREAMING micro-bench once, after all timed children, in the
  *     orchestrator's own session (STREAM_METRICS.json).
  *
  * Children never run concurrently — timing runs never share the box.
  * In warm children the inter-pass quiesce is System.gc() only: the
  * predecessors are dead processes, so the 1-minute load average is
  * stale information and waiting on it would add minutes of idle per
  * round for nothing.
  *
  * Output contract (unchanged): the LAST stdout line is one compact
  * JSON object sized for the driver's ~2000-char tail capture; full
  * detail goes to BENCH_DETAIL.json (per-query child details under
  * "singles", the drain child under "drain_shard"), the full headline
  * to BENCH_HEADLINE.json.
  *
  * Child mode is selected by SPARK_GRAFT_BENCH_SHARD="i/K" (set only
  * by the orchestrator): the child runs the queries whose sorted index
  * ≡ i (mod K) — the orchestrator sets K = registry size so each warm
  * child gets exactly one. SPARK_GRAFT_BENCH_PHASE picks the protocol:
  * "warm" (cold + warm passes, no drain), "drain" (cold + drain, no
  * warm passes), "full" (all phases — the default, for direct local
  * invocations).
  */
object Bench {

  def main(args: Array[String]): Unit =
    sys.env.get("SPARK_GRAFT_BENCH_SHARD") match {
      case Some(spec) =>
        val Array(i, k) = spec.split("/").map(_.toInt)
        runShard(i, k, sys.env.getOrElse("SPARK_GRAFT_BENCH_PHASE", "full"))
      case None => orchestrate()
    }

  // ------------------------------------------------------------ orchestrator

  private def orchestrate(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bench_singles")
    import scala.jdk.CollectionConverters._
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
      .filterNot(_.startsWith("-agentlib")) // no debugger hand-me-downs
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")

    // the same sorted+filtered list the children compute — the index a
    // warm child selects by is the position in THIS list
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val n = names.size

    // children run SEQUENTIALLY — concurrent children would contend for
    // the box and the per-pass load/calibration gates would replace
    // every pass
    def runChild(env: Map[String, String], detailPath: String,
                 logPath: String, what: String): org.json4s.JValue = {
      val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, "graft.Bench")
      val pb = new ProcessBuilder(cmd.asJava)
      env.foreach { case (k, v) => pb.environment().put(k, v) }
      pb.environment().put("SPARK_GRAFT_BENCH_DETAIL", detailPath)
      // child stdout must not pollute the parent's last-line contract
      pb.redirectOutput(new java.io.File(logPath))
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      System.err.println(s"[bench] $what starting")
      val rc = pb.start().waitFor()
      require(rc == 0 && java.nio.file.Files.exists(
        java.nio.file.Paths.get(detailPath)),
        s"bench child $what failed (rc=$rc); log: $logPath")
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(detailPath)), "UTF-8")
      org.json4s.jackson.JsonMethods.parse(txt)
    }

    val singleDetails = (0 until n).map { i =>
      names(i) -> runChild(
        Map("SPARK_GRAFT_BENCH_SHARD" -> s"$i/$n",
            "SPARK_GRAFT_BENCH_PHASE" -> "warm"),
        s"$tmp/single_$i.json", s"$tmp/single_$i.log",
        s"warm ${i + 1}/$n ${names(i)}")
    }
    val drainDetail = runChild(
      Map("SPARK_GRAFT_BENCH_SHARD" -> "0/1",
          "SPARK_GRAFT_BENCH_PHASE" -> "drain"),
      s"$tmp/drain.json", s"$tmp/drain.log", "drain full-registry")

    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    def mapOf(j: JValue, field: String): Map[String, Double] =
      (j \ field) match {
        case JObject(fs) => fs.map { case (k, v) => k -> v.extract[Double] }.toMap
        case _ => Map.empty
      }
    def num(j: JValue, field: String): Double = (j \ field).extract[Double]
    val allDetails = singleDetails.map(_._2) :+ drainDetail
    val warm = singleDetails.map(s => mapOf(s._2, "queries_warm"))
      .reduce(_ ++ _).toSeq.sortBy(_._1)
    // cold from the singles: the true fresh-JVM first execution incl.
    // codegen (the drain child's cold pass is its plan-compile warm-up)
    val cold = singleDetails.map(s => mapOf(s._2, "queries_cold"))
      .reduce(_ ++ _).toSeq.sortBy(_._1)
    val drain = mapOf(drainDetail, "queries_drain").toSeq.sortBy(_._1)
    val seqTotal = warm.map(_._2).filter(_ >= 0).sum
    val drainTotal = num(drainDetail, "drain_total")
    val calibJvmBest = allDetails.map(num(_, "calib_jvm_best_s")).min
    val calibSparkBest = allDetails.map(num(_, "calib_spark_best_s")).min
    // max over children (ADVICE r11): the first child's pre-run load
    // alone would hide the load later children started under
    val loadStart = allDetails.map(num(_, "load_avg_start")).max

    def jsonMap(m: Seq[(String, Double)], f: Double => Double = identity) = m
      .map { case (k, v) => s"\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val singlesJson = singleDetails.map { case (name, j) =>
      s""""$name":${org.json4s.jackson.JsonMethods.compact(j)}"""
    }.mkString(",")
    val detail =
      s"""{"sf":"$sfDir","isolation":"one fresh JVM per query ($n) + one shared drain JVM, sequential","drain_total":$drainTotal,"seq_total":$seqTotal,
         |"calib_jvm_best_s":$calibJvmBest,"calib_spark_best_s":$calibSparkBest,
         |"queries_warm":${jsonMap(warm)},
         |"queries_cold":${jsonMap(cold)},
         |"queries_drain":${jsonMap(drain)},
         |"singles":{$singlesJson},
         |"drain_shard":${org.json4s.jackson.JsonMethods.compact(drainDetail)}}""".stripMargin
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"), detail.getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] detail write failed: ${e.getMessage}") }

    // streaming micro-bench once, in this process's own session, AFTER
    // every timed child has exited (never concurrent with timing)
    try {
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        // the orchestrator's session is COLD (the children did the query
        // work in their own JVMs), so the first streaming trigger pays
        // 2-3 s of codegen and a 4 s capture window would record empty
        // batches. One discarded warm-up invocation compiles the
        // pipelines; the recorded run then measures warm per-batch
        // latency like the pre-sharding bench did.
        try graft.streaming.StreamMetrics.microBench(spark,
          outPath = s"$tmp/stream_warmup.json")
        catch { case _: Throwable => () }
        graft.streaming.StreamMetrics.microBench(spark)
      } finally {
        spark.sparkContext.setLogLevel("OFF")
        spark.stop()
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] stream micro-bench failed: ${e.getMessage}") }

    def ms(v: Double) = math.rint(v * 100) / 100
    val calib = s""""calib_jvm_s":${ms(calibJvmBest)},"calib_spark_s":${ms(calibSparkBest)}"""
    val headline = s"""{"metric":"total","value":${ms(drainTotal)},"unit":"sec","queries":${jsonMap(warm, ms)},"seq_total":${ms(seqTotal)},"sharded":$n,"isolation":"per-query","load_avg":${ms(loadStart)},$calib,"headline":"warm min-of-3+ per query, one fresh JVM per query; seq_total = sum of per-query warm minima; drain_total (value) = pool-6 concurrent drain of the full registry in one shared JVM (pre-r11 semantics); load_avg = max child start load (detail in BENCH_DETAIL.json)","sf":"$sfDir"}"""
    val slowest = warm.sortBy(-_._2).take(25).sortBy(_._1)
    val compact = s"""{"metric":"total","value":${ms(drainTotal)},"unit":"sec","queries":${jsonMap(slowest, ms)},"n_queries":${warm.size},"queries_note":"${slowest.size} slowest of ${warm.size}; full map in BENCH_DETAIL.json","seq_total":${ms(seqTotal)},"sharded":$n,"isolation":"per-query","load_avg":${ms(loadStart)},$calib,"sf":"$sfDir"}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_HEADLINE.json"), headline.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(headline)
    println(compact)
    System.out.flush()
  }

  // ------------------------------------------------------------ child

  private def runShard(shardIdx: Int, shardCount: Int, phase: String): Unit = {
    val doWarm = phase != "drain"
    val doDrain = phase != "warm"
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
      .zipWithIndex
      .filter { case (_, i) => i % shardCount == shardIdx }
      .map(_._1)
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

    // CALIBRATION probes (round-9 verdict): two fixed workloads run
    // before every pass whose ONLY variable is the environment —
    // calib_jvm (single-thread xorshift: per-core speed) and calib_spark
    // (fixed 64-partition range-sum: scheduler + JVM-internal drift).
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
                        gc: Long, heap: Long, quiesceS: Double)
    def meta(label: String, quiesceS: Double = 0.0) =
      PassMeta(label, loadAvg, calibJvm(), calibSpark(), gcMs, heapMb, quiesceS)

    // LOAD-DECAY QUIESCE between phases: only meaningful when THIS JVM
    // ran a previous heavy phase (full/drain protocol) — gc() pulls
    // ContextCleaner work forward and the bounded wait lets writeback
    // drain. A warm child is a fresh JVM whose predecessors are dead
    // processes: its 1-minute load average is stale information, so it
    // gc()s but never waits on load.
    val quiesceTarget = math.max(2.0, cpus.toInt / 4.0)
    val quiesceMaxMs =
      if (doWarm && !doDrain) 0L
      else sys.env.getOrElse("SPARK_GRAFT_QUIESCE_MS", "20000").toLong
    def quiesce(): Double = {
      val t0 = System.nanoTime()
      System.gc()
      var waited = 0L
      while (loadAvg > quiesceTarget && waited < quiesceMaxMs) {
        Thread.sleep(2000); waited += 2000
      }
      (System.nanoTime() - t0) / 1e9
    }

    // pass 1: cold sequential (codegen compile included — reported apart)
    val coldMeta = meta("cold")
    val cold = named.map { case (name, fn) => name -> timed(name, fn) }

    // warm sequential passes — headline = per-query MIN; contended passes
    // (pre-pass load over the gate, or calibration >1.5× best) get up to
    // 2 replacements
    val loadGate = sys.env.getOrElse("SPARK_GRAFT_LOAD_GATE",
      (cpus.toInt / 2).toString).toDouble
    def contended(m: PassMeta, bestCj: Double, bestCs: Double): Boolean =
      m.load > loadGate || m.cj > bestCj * 1.5 || m.cs > bestCs * 1.5
    var passes = Vector.empty[(PassMeta, Seq[(String, Double)], Double)]
    def runPass(label: String): Unit = {
      val q = quiesce()
      val m = meta(label, q)
      val s0 = System.nanoTime()
      val run = named.map { case (name, fn) => name -> timed(name, fn) }
      passes :+= ((m, run, (System.nanoTime() - s0) / 1e9))
    }
    // A fresh single-query JVM is still JIT-compiling ITS OWN hot paths
    // well past the third execution (first full run: 94/145 children had
    // warm_3 fastest, 81 strictly declining), so 3 passes under-measures
    // fast queries. Default 6 passes with early exit once a pass stops
    // improving the min by >2% — converged children stop at ~4, slow
    // movers get their tail measured.
    val warmPassTarget =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "6").toInt.max(1)
    // sum of per-query minima so far — the quantity the headline commits
    // (a plain min over one query for the orchestrator's warm children)
    def bestWarm: Double = named.indices.map { i =>
      val ts = passes.map(_._2(i)._2).filter(_ >= 0)
      if (ts.isEmpty) Double.MaxValue else ts.min
    }.sum
    if (doWarm) {
      (1 to 3).foreach(i => runPass(s"warm_$i"))
      var i = 3
      while (i < warmPassTarget && {
        val before = bestWarm
        runPass(s"warm_${i + 1}")
        i += 1
        bestWarm < before * 0.98
      }) ()
      var extras = 0
      while (extras < 2 && {
        val bestCj = passes.map(_._1.cj).min
        val bestCs = passes.map(_._1.cs).min
        passes.count(p => !contended(p._1, bestCj, bestCs)) < 2
      }) { extras += 1; runPass(s"warm_extra_$extras") }
    }
    val warmPasses = passes.map(p => (p._2, p._3))
    val seq = named.indices.map { i =>
      val ts = warmPasses.map(_._1(i)._2).filter(_ >= 0)
      named(i)._1 -> (if (ts.isEmpty) -1.0 else ts.min)
    }
    val seqTotal =
      if (warmPasses.isEmpty) 0.0 else warmPasses.map(_._2).min
    val calibBest =
      if (passes.isEmpty) (coldMeta.cj, coldMeta.cs)
      else ((passes.map(_._1.cj) :+ coldMeta.cj).min,
            (passes.map(_._1.cs) :+ coldMeta.cs).min)

    // concurrent drain (plans/codegen warm from the cold pass, so this
    // measures scheduling + execution throughput, not compilation)
    val (drain, drainTotal, drainQuiesce) =
      if (!doDrain) (Seq.empty[(String, Double)], 0.0, 0.0)
      else {
        val dq = quiesce()
        import java.util.concurrent.Executors
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = Executors.newFixedThreadPool(
          sys.env.getOrElse("SPARK_GRAFT_BENCH_POOL", "6").toInt)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        val t0 = System.nanoTime()
        val futures = named.map { case (name, fn) => Future(name -> timed(name, fn)) }
        val d = Await.result(Future.sequence(futures), Duration.Inf)
        val total = (System.nanoTime() - t0) / 1e9
        pool.shutdown()
        (d, total, dq)
      }

    def jsonMap(m: Seq[(String, Double)]) = m
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")

    val loadEnd = loadAvg
    def metaJson(m: PassMeta) =
      s""""load_pre":${m.load},"quiesce_wait_s":${m.quiesceS},"calib_jvm_s":${m.cj},"calib_spark_s":${m.cs},"gc_total_ms":${m.gc},"heap_used_mb":${m.heap}"""
    val warmRuns = passes
      .map { case (m, run, total) =>
        s""""${m.label}":{"total":$total,${metaJson(m)},"queries":${jsonMap(run)}}""" }
      .mkString(",")
    val extraPasses = (passes.size - 3).max(0)
    val detail =
      s"""{"sf":"$sfDir","shard":"$shardIdx/$shardCount","phase":"$phase","drain_total":$drainTotal,"seq_total":$seqTotal,
         |"load_avg_start":$loadStart,"load_avg_end":$loadEnd,"drain_quiesce_s":$drainQuiesce,
         |"load_gate":$loadGate,"extra_passes":$extraPasses,"quiesce_target":$quiesceTarget,
         |"calib_jvm_best_s":${calibBest._1},"calib_spark_best_s":${calibBest._2},
         |"cold_meta":{${metaJson(coldMeta)}},
         |"queries_warm":${jsonMap(seq)},
         |${if (warmRuns.nonEmpty) warmRuns + "," else ""}
         |"queries_cold":${jsonMap(cold)},
         |"queries_drain":${jsonMap(drain)}}""".stripMargin
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    try {
      spark.sparkContext.setLogLevel("OFF")
      spark.stop()
    } catch { case _: Throwable => () }
    java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      detail.getBytes("UTF-8"))
    ()
  }
}
