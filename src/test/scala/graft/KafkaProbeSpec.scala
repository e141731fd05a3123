package graft

import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Pipelines

/** Pins the Kafka-broker probe recorded in KAFKA_PROBE.md: the sandbox
  * ships no Kafka artifact anywhere (neither the spark-sql-kafka
  * connector nor kafka-clients nor a broker), so the engine's four
  * `format("kafka")` builders must fail EAGERLY with an error that names
  * the artifacts to add — not lazily inside DataSource resolution.
  *
  * On a deployment that DOES carry the connector the preflight passes and
  * these assertions flip to a no-op (the builders are then exercised by
  * the cluster, not by this suite) — the spec guards the error contract,
  * not the absence itself.
  */
class KafkaProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val schema = StructType(Seq(StructField("nome", StringType)))

  test("probe: no Kafka client/connector class exists in the sandbox") {
    if (Pipelines.kafkaConnectorAvailable)
      cancel("spark-sql-kafka present on this classpath; probe n/a")
    intercept[ClassNotFoundException] {
      Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
    }
    intercept[ClassNotFoundException] {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
    }
  }

  test("kafka builders fail eagerly, naming the missing artifacts") {
    if (Pipelines.kafkaConnectorAvailable)
      cancel("spark-sql-kafka present on this classpath; probe n/a")
    val sources = Seq[(String, () => Any)](
      "kafkaJsonSource" -> (() =>
        Pipelines.kafkaJsonSource(spark, "t", "localhost:9092", schema)),
      "kafkaAvroSource" -> (() =>
        Pipelines.kafkaAvroSource(spark, "t", "localhost:9092", schema)),
      "kafkaAvroSourceEvolving" -> (() =>
        Pipelines.kafkaAvroSourceEvolving(spark, "t", "localhost:9092",
          schema, Map(1 -> schema))),
      "kafkaSinkWriter" -> (() => {
        import spark.implicits._
        val stream = spark.readStream.format("rate")
          .option("rowsPerSecond", 1).load()
          .selectExpr("cast(value as string) as nome")
        Pipelines.kafkaSinkWriter(stream, "t", "localhost:9092",
          Seq("nome"), "/tmp/unused_ckpt")
      }))
    sources.foreach { case (site, mk) =>
      val e = intercept[IllegalStateException](mk())
      // actionable: names the site, the connector artifact at the running
      // Spark version, and the probe record
      assert(e.getMessage.contains(site), s"$site: message names the site")
      assert(e.getMessage.contains("spark-sql-kafka-0-10_2.13"))
      assert(e.getMessage.contains(org.apache.spark.SPARK_VERSION))
      assert(e.getMessage.contains("KAFKA_PROBE.md"))
    }
  }

  /** Reflected option map of a DataStreamReader/Writer (provider
    * resolution is deferred to load()/start(), so configured instances
    * exist fine without the connector).
    */
  private def extracted(o: AnyRef): Map[String, String] = {
    var c: Class[_] = o.getClass
    var f: Option[java.lang.reflect.Field] = None
    while (f.isEmpty && c != null) {
      f = c.getDeclaredFields.find(_.getName.endsWith("extraOptions"))
      if (f.isEmpty) c = c.getSuperclass
    }
    val field = f.getOrElse(fail(s"no extraOptions field on ${o.getClass}"))
    field.setAccessible(true)
    // CaseInsensitiveMap lower-cases keys on entry; compare normalized
    field.get(o).asInstanceOf[scala.collection.Map[String, String]]
      .map { case (k, v) => k.toLowerCase -> v }.toMap
  }

  private def norm(m: Map[String, String]): Map[String, String] =
    m.map { case (k, v) => k.toLowerCase -> v }

  test("broker-free option contract: the builders configure exactly the reference's option set") {
    // the last untested lines of the §2 Kafka surface — the option maps
    // the four builders would hand the connector. Built through the
    // builders' own seams and extracted without load()/start().
    assert(Pipelines.kafkaSourceOptions("psg-customers", "broker:9092") ==
      Map("kafka.bootstrap.servers" -> "broker:9092",
        "subscribe" -> "psg-customers"))
    assert(Pipelines.kafkaSinkOptions("jovens", "broker:9092", "/ck") ==
      Map("kafka.bootstrap.servers" -> "broker:9092", "topic" -> "jovens",
        "checkpointLocation" -> "/ck"))
    val reader = Pipelines.kafkaReader(spark, "psg-customers", "broker:9092")
    assert(extracted(reader) == norm(Pipelines.kafkaSourceOptions(
      "psg-customers", "broker:9092")), "reader options drifted")
    val writer = Pipelines.kafkaWriter(
      spark.readStream.format("rate").load()
        .selectExpr("cast(value as string) AS value",
          "cast(value as string) AS key"),
      "jovens", "broker:9092", "/ck",
      org.apache.spark.sql.streaming.OutputMode.Append)
    assert(extracted(writer) == norm(Pipelines.kafkaSinkOptions(
      "jovens", "broker:9092", "/ck")), "writer options drifted")
  }
}
