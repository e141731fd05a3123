package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("JVM zkey twin matches the Column ladder bit-for-bit") {
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (255L, 256L), (32768L, 16384L))
    val got = pairs.toDF("x", "y")
      .select(ZOrder.zkey($"x", $"y")).as[Long].collect().toSeq
    assert(got == pairs.map { case (x, y) => ZOrder.zkeyJvm(x, y) })
  }

  test("interleaving puts x on even bits and y on odd bits") {
    assert(ZOrder.zkeyJvm(0xFFFFL, 0L) == 0x55555555L)
    assert(ZOrder.zkeyJvm(0L, 0xFFFFL) == 0xAAAAAAAAL)
    assert(ZOrder.zkeyJvm(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL)
  }

  test("covering buckets are complete over the rectangle") {
    val (xlo, xhi, ylo, yhi) = (100L, 499L, 625L, 9375L)
    val cover = ZOrder.coveringBuckets(xlo, xhi, ylo, yhi).toSet
    // brute-force sample of the rectangle: every point's bucket is covered
    for (x <- xlo to xhi by 57; y <- ylo to yhi by 83) {
      val b = ZOrder.zkeyJvm(x, y) >> ZOrder.BucketShift
      assert(cover.contains(b), s"bucket $b of ($x, $y) not covered")
    }
    // and the cover is a small fraction of the 64-bucket grid
    assert(cover.size <= 4, s"cover too wide: $cover")
  }

  test("out-of-range dims are rejected, not silently wrapped") {
    intercept[IllegalArgumentException] {
      ZOrder.coveringBuckets(0L, 70000L, 0L, 10L)
    }
  }

  test("pruned rectangle equals the plain filter over raw orders") {
    val pruned = ZOrder.prunedRectangle(spark, sf)
    val plain = Tables.load(spark, sf, "orders")
      .filter($"o_custkey".between(100, 499)
        && $"o_totalprice" >= 10000.0 && $"o_totalprice" <= 150000.0)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
    assert(pruned.count() > 0)
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("the covering IN-list reaches the scan as a partition filter") {
    val df = ZOrder.prunedRectangle(spark, sf)
    df.collect()
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("graft_orders_z")).get
    assert(scan.contains("PartitionFilters") && scan.contains("zbucket"),
      s"expected partition pruning on zbucket:\n$scan")
  }
}
