package graft

import java.nio.file.{Files, Paths}
import java.sql.{Date, Timestamp}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.{AvroBinary, AvroCodec}
import graft.streaming.Pipelines

/** Parity specs for the Confluent-S3-sink object layout and the Kafka
  * record wire encodings — the broker-free checks of K1-K4's output
  * shapes (reference `connect_s3_sink_jovens.config`,
  * `connect_s3_sink_count.config`, `README.md:233-277`).
  */
class ConnectLayoutSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def mkCust(nome: String, nasc: String, tsMillis: Long) =
    Cust(nome, "(11) 91234-5678", s"$nome@example.org",
      Date.valueOf(nasc), "x", new Timestamp(tsMillis))

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def lines(p: java.nio.file.Path): Seq[String] =
    Files.readAllLines(p).asScala.toSeq

  test("json changelog sink writes topics-dir/partition=N objects with aligned keys sidecars") {
    val mem = MemoryStream[Cust]
    val out = tmpDir("graft_s3_")
    val agg = Pipelines.idadecont(mem.toDF())
      .select($"idadecat", $"window_start", $"contagem")
    // flushSize=2 forces several objects per partition; 2 partitions
    // exercise the key-hash partitioner
    val q = Pipelines.startConnectJsonSink(agg, out, "idadecont",
      keyCols = Seq("idadecat", "window_start"),
      checkpoint = tmpDir("graft_ckp_"), numPartitions = 2, flushSize = 2)
    try {
      mem.addData(
        mkCust("ana", "2001-05-05", 10_000L), mkCust("bia", "1969-12-31", 12_000L),
        mkCust("caio", "2000-01-01", 31_000L), mkCust("davi", "1999-12-31", 59_000L),
        mkCust("eva", "2002-02-02", 61_000L), mkCust("gil", "1950-01-01", 62_000L))
      q.processAllAvailable()
    } finally q.stop()

    val topicDir = Paths.get(out, "raw-data", "kafka", "idadecont")
    assert(Files.isDirectory(topicDir), s"missing topics.dir layout under $out")
    val partDirs = Files.list(topicDir).iterator().asScala.toSeq
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).sorted
    assert(partDirs.nonEmpty && partDirs.forall(_.matches("partition=[01]")))

    val dataFiles = Files.walk(topicDir).iterator().asScala.toSeq
      .filter(p => p.toString.endsWith(".json") && !p.toString.endsWith(".keys.json"))
    assert(dataFiles.nonEmpty)
    dataFiles.foreach { data =>
      val name = data.getFileName.toString
      val p = data.getParent.getFileName.toString.stripPrefix("partition=")
      // Connect object naming: <topic>+<partition>+<startOffset>.json
      assert(name.matches(s"idadecont\\+$p\\+\\d+\\.json"), s"bad object name $name")
      val values = lines(data)
      assert(values.nonEmpty && values.size <= 2, s"$name exceeds flush.size")
      // store.kafka.keys=true: record-aligned sidecar keys object
      val keysFile = data.resolveSibling(name.stripSuffix(".json") + ".keys.json")
      assert(Files.exists(keysFile), s"missing keys sidecar for $name")
      val keys = lines(keysFile)
      assert(keys.size == values.size, "keys object not record-aligned")
      keys.zip(values).foreach { case (k, v) =>
        // the key is the JSON of the key columns; its fields must match
        // the same record's value fields (alignment, not just presence)
        assert(k.startsWith("{\"idadecat\":"), s"unexpected key shape: $k")
        val frag = k.stripPrefix("{").stripSuffix("}")
        assert(v.contains(frag), s"key $k does not align with value $v")
      }
    }

    // every emitted record is on the topic exactly where its key hashes
    val all = dataFiles.flatMap(lines)
    val expected = spark.read.json(all.toDS())
      .select($"idadecat", $"window_start", $"contagem")
    assert(expected.count() >= 4) // update-mode changelog: >= distinct keys
  }

  test("parquet sink writes flush-size objects under partition=0 with Connect names") {
    val mem = MemoryStream[Cust]
    val out = tmpDir("graft_s3p_")
    val q = Pipelines.startConnectParquetSink(
      Pipelines.jovens(mem.toDF()), out, "jovens",
      checkpoint = tmpDir("graft_ckpp_"), flushSize = 2)
    try {
      mem.addData(
        mkCust("ana", "2001-05-05", 10_000L), mkCust("caio", "2000-01-01", 31_000L),
        mkCust("eva", "2002-02-02", 61_000L), mkCust("iza", "2003-03-03", 62_000L),
        mkCust("leo", "2004-04-04", 63_000L))
      q.processAllAvailable()
    } finally q.stop()

    val partDir = Paths.get(out, "raw-data", "kafka", "jovens", "partition=0")
    assert(Files.isDirectory(partDir))
    val objects = Files.list(partDir).iterator().asScala.toSeq
      .map(_.getFileName.toString).filter(_.endsWith(".parquet")).sorted
    assert(objects.nonEmpty && objects.forall(_.matches("jovens\\+0\\+\\d+\\.parquet")),
      s"bad object names: $objects")
    // all 5 JOVEM rows land, flush.size respected per object
    val back = spark.read.parquet(partDir.toString)
    assert(back.count() == 5)
    objects.foreach { o =>
      assert(spark.read.parquet(partDir.resolve(o).toString).count() <= 2)
    }
  }

  test("kafka records: key is the joined key columns, value the JSON row (idadecont shape)") {
    val changelog = Seq(("JOVEM", "2024-01-01 00:00:00", 7L),
      ("ADULTO", "2024-01-01 00:00:30", 3L))
      .toDF("idadecat", "window_start", "contagem")
    val recs = Pipelines.kafkaRecords(changelog, Seq("idadecat", "window_start"))
    assert(recs.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("key", "binary"), ("value", "binary")))
    val got = recs.as[(Array[Byte], Array[Byte])].collect()
      .map { case (k, v) => (new String(k, "UTF-8"), new String(v, "UTF-8")) }.toMap
    // the changelog key: group key + window start, joined — the shape the
    // S3 count sink stores per record (connect_s3_sink_count.config:18)
    assert(got.keySet == Set("JOVEM|2024-01-01 00:00:00", "ADULTO|2024-01-01 00:00:30"))
    assert(got("JOVEM|2024-01-01 00:00:00") ==
      """{"idadecat":"JOVEM","window_start":"2024-01-01 00:00:00","contagem":7}""")
    assert(got("ADULTO|2024-01-01 00:00:30") ==
      """{"idadecat":"ADULTO","window_start":"2024-01-01 00:00:30","contagem":3}""")
  }

  test("kafka avro records: value decodes back to the row via the wire schema") {
    import org.apache.spark.sql.types._
    val wire = StructType(Seq(
      StructField("idadecat", StringType),
      StructField("contagem", LongType)))
    val changelog = Seq(("JOVEM", 7L), ("ADULTO", 3L)).toDF("idadecat", "contagem")
    val recs = Pipelines.kafkaAvroRecords(changelog, Seq("idadecat"), wire, Some(7))
    val byKey = recs.as[(Array[Byte], Array[Byte])].collect()
      .map { case (k, v) => (new String(k, "UTF-8"), v) }.toMap
    val row = AvroBinary.decode(byKey("JOVEM"), wire, confluentFraming = true)
    assert(row != null && row.getUTF8String(0).toString == "JOVEM" && row.getLong(1) == 7L)
    // Confluent framing: magic byte + schema id 7
    assert(byKey("JOVEM")(0) == 0x00 && byKey("JOVEM")(4) == 7)
  }
}
