package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StructType, StructField, StringType, LongType}

import graft.functions.AvroCodec
import graft.streaming.Pipelines

/** The schema-evolution path COMPOSED (VERDICT r7 item 7): two writer
  * versions resolved through the in-process HTTP registry, interleaved on
  * one stream with an unknown-id record and a malformed body, driven
  * through [[Pipelines.startEvolvingIngestSink]] into a parquet sink with
  * a binary dead-letter sidecar — the unit-level codec/registry specs
  * (AvroCodecSpec) exercised as one topology.
  */
class EvolvingIngestSpec extends SparkSpec {
  import spark.implicits._

  private val v1Json =
    """{"type":"record","name":"r","fields":[
      |{"name":"nome","type":"string"},
      |{"name":"dt_update","type":"long"}]}""".stripMargin
  private val v2Json =
    """{"type":"record","name":"r","fields":[
      |{"name":"nome","type":"string"},
      |{"name":"email","type":["null","string"]},
      |{"name":"dt_update","type":"long"}]}""".stripMargin

  test("two writer schemas through the in-process registry into one sink") {
    // Confluent REST stub on an ephemeral loopback port, like AvroCodecSpec
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def body(avroJson: String): String = {
      val node = mapper.createObjectNode()
      node.put("schema", avroJson)
      mapper.writeValueAsString(node)
    }
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/schemas/ids/", new com.sun.net.httpserver.HttpHandler {
      override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
        val (status, payload) = ex.getRequestURI.getPath.split("/").last.toInt match {
          case 7 => (200, body(v1Json))
          case 8 => (200, body(v2Json))
          case _ => (404, """{"error_code":40403,"message":"Schema not found"}""")
        }
        val bytes = payload.getBytes("UTF-8")
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val reg = new graft.functions.HttpSchemaRegistry(
        s"http://127.0.0.1:${server.getAddress.getPort}")
      val v1 = reg.schemaById(7).get
      val v2 = reg.schemaById(8).get
      assert(v2.fieldNames.toSeq == Seq("nome", "email", "dt_update"))

      def enc(df: DataFrame, schema: StructType, id: Int): Seq[Array[Byte]] =
        df.select(AvroCodec.avroEncode(
          struct(df.columns.toIndexedSeq.map(col): _*), schema, Some(id)).as("v"))
          .as[Array[Byte]].collect().toSeq

      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = MemoryStream[Array[Byte]]
      val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
      // id 99 is asked of the registry (404 → dropped from the writer
      // map), so its records dead-letter like any runtime-unknown id
      val q = Pipelines.startEvolvingIngestSink(
        mem.toDF().toDF("value"), v2, reg, Seq(7, 8, 99),
        s"$dir/good", s"$dir/dead", s"$dir/ckpt",
        Trigger.ProcessingTime("50 milliseconds"))
      val zedBytes = enc(Seq(("zed", 9000L)).toDF("nome", "dt_update"), v1, 99)
      val junk = Array[Byte](0x00, 0, 0, 0, 8, 0x42)
      try {
        // batch 1: old-writer records only (the pre-evolution stream)
        mem.addData(enc(Seq(("ana", 1000L), ("bia", 2000L))
          .toDF("nome", "dt_update"), v1, 7): _*)
        q.processAllAvailable()
        // batch 2: new writer + unknown id + malformed body interleaved
        mem.addData(enc(Seq(("caio", "c@example.org", 3000L))
          .toDF("nome", "email", "dt_update"), v2, 8) ++ zedBytes :+ junk: _*)
        q.processAllAvailable()
      } finally q.stop()

      // good rows: both writer versions resolved onto the reader schema
      val good = spark.read.parquet(s"$dir/good")
        .select("nome", "email", "dt_update")
        .collect().map(_.toSeq).toSet
      assert(good == Set(
        Seq("ana", null, 1000L), Seq("bia", null, 2000L),
        Seq("caio", "c@example.org", 3000L)))
      // dead letters: the unknown-id record and the junk body, verbatim
      val dead = spark.read.parquet(s"$dir/dead")
        .select("value").as[Array[Byte]].collect().map(_.toSeq).toSet
      assert(dead == Set(zedBytes.head.toSeq, junk.toSeq))
    } finally server.stop(0)
  }
}
