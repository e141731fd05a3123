package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import graft.sources.IncrementalJdbc

class IncrementalJdbcSpec extends SparkSpec {
  import spark.implicits._

  private def table(rows: (Long, Long)*): DataFrame =
    rows.map { case (id, ms) => (id, new Timestamp(ms)) }
      .toDF("id", "dt_update")

  test("timestamp-mode polling: first poll full snapshot, then strict increments") {
    @volatile var snap = table((1L, 1000L), (2L, 2000L))
    val src = new IncrementalJdbc(() => snap)

    val b1 = src.poll()
    assert(b1.count() == 2)
    assert(src.currentOffset.contains(new Timestamp(2000L)))

    // nothing new → empty batch, offset unchanged
    assert(src.poll().isEmpty)
    assert(src.currentOffset.contains(new Timestamp(2000L)))

    // an insert and a *backdated* update: only the insert is captured
    // (reference README.md:136 — timestamp mode misses non-advancing rows)
    snap = table((1L, 1000L), (2L, 2000L), (3L, 3000L))
    val b3 = src.poll().select("id").as[Long].collect().toSeq
    assert(b3 == Seq(3L))
    assert(src.currentOffset.contains(new Timestamp(3000L)))
  }

  test("run loop drains batches into the sink and stops") {
    @volatile var snap = table((1L, 1000L))
    val src = new IncrementalJdbc(() => snap)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    src.run(intervalMs = 1L, maxPolls = 3) { b =>
      seen ++= b.select("id").as[Long].collect()
      snap = table((1L, 1000L), (2L, 2000L)) // next poll sees an insert
    }
    assert(seen.take(2) == Seq(1L, 2L))
  }
}
