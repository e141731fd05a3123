package graft

import org.apache.spark.sql.functions._
import graft.functions.{DetHash, KmvSketch}
import graft.operators.Relational

class SketchAndBloomSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- bloom

  test("bloom-filtered join is row-identical to the plain join") {
    val bloomed = Relational.revenueByPriorityBloom(spark, sf)
    val cust = Tables.load(spark, sf, "customer")
      .filter($"c_mktsegment" === "AUTOMOBILE").select($"c_custkey")
    val plain = Tables.load(spark, sf, "orders")
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_cnt"),
        sum($"o_totalprice".cast("decimal(12,4)")).cast("double").as("revenue"))
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }

  test("bloom probe has no false negatives and actually prunes") {
    val orders = Tables.load(spark, sf, "orders")
    val cust = Tables.load(spark, sf, "customer")
      .filter($"c_mktsegment" === "AUTOMOBILE").select($"c_custkey")
    val bloom = Relational.bloomBuild(cust, $"c_custkey")
    val survivors = orders.crossJoin(broadcast(bloom))
      .filter(Relational.bloomMightContain($"o_custkey", $"bloom"))
      .count()
    val total = orders.count()
    val matching = orders
      .join(cust, $"o_custkey" === $"c_custkey", "left_semi").count()
    // no false negatives: every truly-matching row survives;
    // pruning: the pre-filter removes a real fraction of the fact side
    assert(survivors >= matching)
    assert(survivors < total)
    // with m = 65536 bits and ~300 keys, false positives are ≪ the
    // pruned mass — survivors stay close to the true match count
    assert(survivors - matching < total / 10)
  }

  test("bloom width tracks the build side: floor, ~8 bits/key growth, cap") {
    import Relational.bloomWords
    assert(bloomWords(0) == 1024 && bloomWords(6000) == 1024) // sf0.1 regime
    assert(bloomWords(1000000) == 125000) // 8 bits/key past the floor
    assert(bloomWords(100000000) == 12500000)
    assert(bloomWords(Long.MaxValue) == (1 << 24)) // broadcast-sanity cap
    // a filter sized by the formula keeps pruning at 100x the keys the old
    // fixed default was tuned for: no false negatives, real rejection
    val keys = (0L until 50000L).map(Tuple1(_)).toDF("k")
    val w = bloomWords(50000)
    val bloom = Relational.bloomBuild(keys, $"k", w)
    val probes = (0L until 100000L).map(Tuple1(_)).toDF("k")
      .crossJoin(broadcast(bloom))
      .filter(Relational.bloomMightContain($"k", $"bloom", w))
      .count()
    assert(probes >= 50000, "false negative: a member was rejected")
    assert(probes <= 55000, s"FPR blown: $probes of 100000 passed") // ~3% target on the 50k non-members
  }

  test("segment bloom persists once: width from the dim count, one-row table") {
    val (w1, bloom1) = Relational.segmentBloomTable(spark, sf, "AUTOMOBILE")
    val n = Tables.load(spark, sf, "customer")
      .filter($"c_mktsegment" === "AUTOMOBILE").count()
    assert(w1 == Relational.bloomWords(n), "persisted width drifts from the dim count")
    assert(bloom1.count() == 1)
    // second call reuses the catalog table (ensure-once) — same width,
    // same single row, and the table is visible in the catalog
    val (w2, bloom2) = Relational.segmentBloomTable(spark, sf, "AUTOMOBILE")
    assert(w2 == w1 && bloom2.count() == 1)
    assert(spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_bloom_")))
  }

  test("bloom probe runs before the join in the plan (xxhash64 pre-filter)") {
    val df = Relational.revenueByPriorityBloom(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("xxhash64"), s"expected bloom probe in plan:\n$plan")
  }

  // -------------------------------------------------------------- KMV

  test("KMV sketch is exact below k") {
    val df = (1L to 100L).toDF("id")
    val out = Relational.kmvDistinct(df, $"id", k = 256)
      .select($"n_sketch", $"est_distinct").as[(Long, Double)].head()
    assert(out == ((100L, 100.0)))
  }

  test("KMV sketch deduplicates: repeated keys don't inflate the sketch") {
    val df = (1L to 10000L).map(i => i % 50).toDF("id")
    val out = Relational.kmvDistinct(df, $"id", k = 256)
      .select($"n_sketch", $"est_distinct").as[(Long, Double)].head()
    assert(out == ((50L, 50.0)))
  }

  test("KMV estimate lands within the expected error at 10k distinct keys") {
    val df = (1L to 10000L).toDF("id")
    val est = Relational.kmvDistinct(df, $"id", k = 256)
      .select($"est_distinct").as[Double].head()
    // σ ≈ 1/√(k−2) ≈ 6.3 %; allow 4σ
    assert(math.abs(est - 10000.0) / 10000.0 < 0.25, s"estimate $est")
  }

  test("KMV sketch is partitioning-invariant (merge correctness)") {
    val base = (1L to 5000L).toDF("id")
      .select(DetHash.base60($"id".cast("string")).as("h"))
    val one = base.coalesce(1).agg(KmvSketch.column($"h", 64)).as[Seq[Long]].head()
    val many = base.repartition(7).agg(KmvSketch.column($"h", 64)).as[Seq[Long]].head()
    assert(one == many)
    assert(one.length == 64 && one == one.sorted)
  }

  test("KMV aggregates via ObjectHashAggregate (partial sketches on the exchange)") {
    val df = Relational.kmvDistinct(
      Tables.load(spark, sf, "lineitem"), $"l_orderkey", 256)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"plan:\n$plan")
  }

  // ------------------------------------------------------ Count-Min

  test("CMS estimates never undercount (min-over-depths ≥ exact)") {
    val ev = Tables.load(spark, sf, "events")
    val est = Relational.cmsHeavyHitters(ev, "user_id", 4, 64, 10)
      .select($"exact_cnt", $"est_cnt").as[(Long, Long)].collect()
    assert(est.nonEmpty)
    assert(est.forall { case (exact, e) => e >= exact })
  }

  test("CMS with a wide grid and few keys is exact") {
    // 8 distinct keys into a 4x1024 grid: collisions are (provably, for
    // these derived constants) absent, so estimates equal exact counts
    val df = (1L to 800L).map(i => i % 8).toDF("k")
    val got = Relational.cmsHeavyHitters(df, "k", 4, 1024, 8)
      .select($"exact_cnt", $"est_cnt").as[(Long, Long)].collect()
    assert(got.length == 8)
    assert(got.forall { case (exact, e) => e == exact && exact == 100L })
  }

  test("CMS surfaces a genuinely heavy key at the top") {
    val df = ((1L to 5000L).map(_ => 42L) ++ (1L to 500L).map(i => i % 100))
      .toDF("k")
    val top = Relational.cmsHeavyHitters(df, "k", 4, 64, 1)
      .select($"k").as[Long].head()
    assert(top == 42L)
  }

  test("CMS grid broadcast-joins to the probes (no grid shuffle join)") {
    val df = Relational.cmsHeavyHitters(
      Tables.load(spark, sf, "events"), "user_id", 4, 64, 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"plan:\n$plan")
  }

  test("grouped KMV: per-group sketches are exact below k, independent across groups") {
    // group "big" has 100 distinct keys (> k=16 -> estimated), "small" has
    // 5 (< k -> exact); a shared key must count in both groups
    val df = ((1 to 100).map(i => ("big", i.toLong)) ++
      (1 to 5).map(i => ("small", i.toLong))).toDF("grp", "key")
    val got = Relational.kmvDistinctByGroup(df, "grp", $"key", 16)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_sketch"), r.getAs[Double]("est_distinct"))).toMap
    assert(got("small") == ((5L, 5.0)))
    assert(got("big")._1 == 16L)
    // estimate within a loose band of the truth (k=16 -> ~25% rsd)
    assert(got("big")._2 > 50.0 && got("big")._2 < 200.0, got("big"))
  }

  test("grouped KMV equals running the global sketch per group slice") {
    val ev = Tables.load(spark, sf, "events")
    val grouped = Relational.kmvDistinctByGroup(ev, "event_type", $"user_id", 64)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("est_distinct")).toMap
    grouped.keys.foreach { et =>
      val solo = Relational.kmvDistinct(
        ev.filter($"event_type" === et), $"user_id", 64)
        .head().getAs[Double]("est_distinct")
      assert(grouped(et) == solo, s"group $et drifted from the sliced sketch")
    }
  }

  test("KMV overlap: identical slices estimate jaccard 1, disjoint estimate 0") {
    import graft.operators.CorpusOps
    // same text everywhere -> both slices carry the identical gram set
    val same = (0L until 200L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val r1 = CorpusOps.kmvOverlap(same, 3, 0.5, 16, "split").head()
    assert(r1.getAs[Double]("jaccard_est") == 1.0)
    assert(r1.getAs[Double]("est_shared") == r1.getAs[Double]("est_union"))
    // slice-dependent vocabulary (the REAL hexCell predicate decides the
    // slice) -> gram sets are disjoint across eval/train
    val disjoint = (0L until 200L).toDF("doc_id")
      .withColumn("text",
        when(CorpusOps.hexCell($"doc_id", "split") < lit(CorpusOps.hexThreshold(0.5)),
          lit("alpha beta gamma delta")).otherwise(lit("uno dos tres cuatro")))
    val r2 = CorpusOps.kmvOverlap(disjoint, 3, 0.5, 16, "split").head()
    assert(r2.getAs[Long]("n_both") == 0L)
    assert(r2.getAs[Double]("jaccard_est") == 0.0)
    assert(r2.getAs[Double]("est_shared") == 0.0)
  }

  test("KMV overlap sketch rides a TakeOrderedAndProject, not a global sort") {
    import graft.operators.CorpusOps
    val docs = Tables.load(spark, sf, "documents")
    val plan = CorpusOps.kmvOverlap(docs, 8, 0.05, 256)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("KMV matches the oracle formulation on testdata") {
    // engine-side re-derivation of the oracle SQL's semantics: the k-th
    // smallest distinct hash drives the estimate
    val li = Tables.load(spark, sf, "lineitem")
    val k = 256
    val hashes = li.select(DetHash.base60($"l_orderkey".cast("string")).as("h"))
      .distinct().orderBy($"h").limit(k).as[Long].collect()
    val out = Relational.kmvDistinct(li, $"l_orderkey", k)
      .select($"n_sketch", $"kth_hash").as[(Long, Long)].head()
    assert(out._1 == hashes.length)
    assert(out._2 == hashes.max)
  }
}
