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
}
