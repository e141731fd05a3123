package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewAndBucketSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("AQE splits a skewed join partition at runtime (the non-salted path)") {
    // one hot key carrying ~100x the median partition size, thresholds
    // lowered so the sf-free fixture trips the skew detector
    val conf = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(200000)
        .select(when($"id" % 2 === 0, 1L).otherwise($"id").as("k"),
          $"id".as(("payload")))
      val dim = spark.range(100000).select($"id".as("bk"), ($"id" * 2).as("v"))
      val joined = fact.join(dim, $"k" === $"bk")
        .groupBy($"k" % 10).count()
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // AQE marked the join skewed and split the hot partition — the
      // runtime answer to skew when write-time salting isn't in the plan
      assert(plan.contains("skew=true"), s"expected a skew-split join:\n$plan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join is row-identical to the plain join") {
    val lineitem = Tables.load(spark, sf, "lineitem")
    val orders = Tables.load(spark, sf, "orders")
    val plain = lineitem.join(orders, $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_linenumber", $"o_orderstatus")
    val salted = Skew.saltedJoin(lineitem, orders,
      "l_orderkey", "o_orderkey", "l_partkey")
      .select($"l_orderkey", $"l_linenumber", $"o_orderstatus")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join keeps fact rows whose salt-seed id is NULL") {
    val fact = Seq((Some(1L), 10L), (None, 20L), (None, 30L))
      .toDF("fid", "k")
    val build = Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("bk", "v")
    val joined = Skew.saltedJoin(fact, build, "k", "bk", "fid", 4)
      .select($"k", $"v").as[(Long, String)].collect().toSet
    // a NULL fid must not drop the row — md5(NULL) is NULL and an
    // un-coalesced NULL salt never equi-matches the replicated side
    assert(joined == Set((10L, "a"), (20L, "b"), (30L, "c")))
  }

  test("salt spreads a hot key over multiple buckets deterministically") {
    val hot = Seq.tabulate(1000)(i => (1L, i.toLong)).toDF("k", "id")
    val spread = hot.select(Skew.salt($"id", 8).as("s"))
      .distinct().count()
    assert(spread == 8) // all 8 buckets hit
    // deterministic: same inputs → same salts
    val a = hot.select(Skew.salt($"id", 8)).as[Int].collect().toSeq
    val b = hot.select(Skew.salt($"id", 8)).as[Int].collect().toSeq
    assert(a == b)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh_").toString
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.load(spark, sf, "lineitem")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    Tables.load(spark, sf, "orders")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord_b").saveAsTable("ord_b")
    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").count()
    joined.collect() // finalize AQE
    val plan = joined.queryExecution.executedPlan.toString
    // bucketing provides the hash distribution: the join itself needs no
    // exchange (only the final 1-group aggregation may)
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"))
    assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"))
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }

  test("ensurePersisted rebuilds when the catalog entry's files are gone") {
    import graft.operators.Similarity
    val idx = Similarity.partitionedAnnIndex(spark, sf)
    val n = idx.count()
    assert(n > 0)
    // simulate a cleaned tmpdir under a persistent metastore: the catalog
    // entry survives but its data directory is gone
    val tag = java.lang.Long.toHexString(
      graft.functions.DetHash.base60(sf) & 0xffffffffL)
    val loc = s"${Tables.persistedTableRoot(spark)}/graft_ann_p4_$tag"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete(); ()
    }
    assert(new java.io.File(loc).isDirectory, s"expected index data at $loc")
    rm(new java.io.File(loc))
    val rebuilt = Similarity.partitionedAnnIndex(spark, sf)
    assert(rebuilt.count() == n, "missing files must trigger a rebuild")
  }
}
