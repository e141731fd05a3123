package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}

/** Confluent-S3-sink object layout writers
  * (`/root/reference/connect_s3_sink_jovens.config`,
  * `connect_s3_sink_count.config`): `topics.dir/<topic>/partition=<p>/`
  * directories holding `<topic>+<partition>+<startOffset>.<ext>` objects
  * of at most flush.size records, with optional record-aligned
  * `.keys.<ext>` sidecars (`store.kafka.keys=true`).
  *
  * Off-broker there is no Kafka offset, so startOffset is modeled as
  * `batchId·10⁶ + index-of-first-record` — monotonic within a batch and
  * DETERMINISTIC under micro-batch replay (a replayed batch regenerates
  * the same object names and overwrites, mirroring how the real sink's
  * offset-derived names make S3 writes idempotent).
  */
object ConnectLayout {

  private val OffsetStride = 1000000L

  /** Executor-side JSON object writer for one task's rows (columns
    * `__partition`, `__key`, `__value`). Rows are grouped by Kafka-style
    * partition (hash collisions can co-locate two partitions in one Spark
    * task — each still writes to its own directory), buffered to
    * `flushSize`, and flushed as a data object + aligned keys object.
    * Buffers hold at most flushSize small JSON strings per partition —
    * executor memory is bounded regardless of batch size.
    */
  def writeJsonObjects(rows: Iterator[Row], baseDir: String, topic: String,
                       flushSize: Int, batchId: Long): Unit = {
    val conf = new Configuration()
    var first = true
    var pIdx = 0; var kIdx = 0; var vIdx = 0
    val bufs = scala.collection.mutable.Map
      .empty[Int, (scala.collection.mutable.ArrayBuffer[(String, String)], Long)]
    def flush(p: Int): Unit = bufs.get(p).foreach { case (buf, start) =>
      if (buf.nonEmpty) {
        val dir = new Path(s"$baseDir/partition=$p")
        val fs = dir.getFileSystem(conf)
        fs.mkdirs(dir)
        val offset = batchId * OffsetStride + start
        val data = fs.create(new Path(dir, s"$topic+$p+$offset.json"), true)
        data.write(buf.map(_._2).mkString("", "\n", "\n").getBytes("UTF-8"))
        data.close()
        val keys = fs.create(new Path(dir, s"$topic+$p+$offset.keys.json"), true)
        keys.write(buf.map(_._1).mkString("", "\n", "\n").getBytes("UTF-8"))
        keys.close()
        bufs(p) = (buf.empty, start + buf.length)
      }
    }
    rows.foreach { r =>
      if (first) {
        pIdx = r.fieldIndex("__partition")
        kIdx = r.fieldIndex("__key")
        vIdx = r.fieldIndex("__value")
        first = false
      }
      val p = r.getInt(pIdx)
      val (buf, _) = bufs.getOrElseUpdate(p,
        (scala.collection.mutable.ArrayBuffer.empty[(String, String)], 0L))
      buf += ((r.getString(kIdx), r.getString(vIdx)))
      if (buf.length >= flushSize) flush(p)
    }
    bufs.keys.foreach(flush)
  }

  /** Batch-side parquet object writer: Spark's parquet writer produces
    * flush-size files in a scratch dir, which are then MOVED to their
    * Connect object names under `partition=0` (unkeyed single-partition
    * topic — the `jovens` shape). startOffset per object = batch base +
    * cumulative file index × flushSize (parquet footers are not re-read
    * to count records; within-batch file order stands in for record
    * position — same monotonicity, zero extra IO).
    */
  def writeParquetObjects(batch: DataFrame, topicDir: String, topic: String,
                          flushSize: Int, batchId: Long): Unit = {
    val scratch = s"$topicDir/.scratch-batch-$batchId"
    batch.write.mode("overwrite")
      .option("maxRecordsPerFile", flushSize).parquet(scratch)
    val conf = new Configuration()
    val dir = new Path(s"$topicDir/partition=0")
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val parts = fs.listStatus(new Path(scratch))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    parts.zipWithIndex.foreach { case (src, i) =>
      val offset = batchId * OffsetStride + i.toLong * flushSize
      val dst = new Path(dir, s"$topic+0+$offset.parquet")
      if (fs.exists(dst)) fs.delete(dst, false) // replayed batch overwrites
      fs.rename(src, dst)
    }
    fs.delete(new Path(scratch), true)
  }
}
