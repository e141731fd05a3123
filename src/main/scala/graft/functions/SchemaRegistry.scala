package graft.functions

import org.apache.spark.sql.types._

/** Where writer schemas come from — the seam between [[AvroCodec]]'s
  * evolving decode and a live Confluent Schema Registry (the reference
  * runs one at `docker-compose.yml:40-53`; its AvroConverter resolves the
  * framed schema id against it, `docker-compose.yml:78-79`).
  *
  * The engine's [[AvroDecodeEvolving]] needs every writer schema at
  * ANALYSIS time (its type check enforces the full resolution contract up
  * front), so a client resolves a known id set once at plan-build — the
  * per-record dispatch then happens inside the codegen'd expression with
  * no network on the hot path. Swapping the offline [[StaticRegistry]]
  * for [[HttpSchemaRegistry]] is a construction-site change only.
  */
trait SchemaRegistryClient {
  /** The writer schema registered under `id`; None if the registry does
    * not know the id.
    */
  def schemaById(id: Int): Option[StructType]
}

/** The offline/test registry: a fixed id → schema map (what the sandbox
  * specs and the streaming demo pipelines use).
  */
final case class StaticRegistry(schemas: Map[Int, StructType])
    extends SchemaRegistryClient {
  override def schemaById(id: Int): Option[StructType] = schemas.get(id)
}

/** Live Confluent Schema Registry over its public REST surface:
  * `GET {base}/schemas/ids/{id}` returns `{"schema": "<avro json>"}`.
  * Successful resolutions are cached per id (registry ids are immutable
  * by contract). Negative results are NOT cached: a 404 can be a
  * plan-build racing schema registration — pinning it for the client's
  * lifetime would silently decode every later record framed with that id
  * to null; the next lookup simply re-asks.
  *
  * Spec-exercised against an in-process JDK HttpServer serving the
  * Confluent REST surface (AvroCodecSpec) — resolution, 404 + later
  * registration, malformed payloads, and non-404 error statuses all run
  * through a real local HTTP round-trip. Unknown id (HTTP 404) → None;
  * transport failures THROW — a plan built against a half-reachable
  * registry must fail fast, not silently decode every record to null.
  */
final class HttpSchemaRegistry(baseUrl: String,
                               timeoutMs: Long = 10000L)
    extends SchemaRegistryClient {
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Option[StructType]]()
  private lazy val http = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()

  override def schemaById(id: Int): Option[StructType] = {
    val cached = cache.get(id)
    if (cached != null) return cached
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"${baseUrl.stripSuffix("/")}/schemas/ids/$id"))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .GET().build()
    val resp = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    val out = resp.statusCode() match {
      case 200 =>
        val node = AvroSchemaJson.mapper.readTree(resp.body())
        val schema = node.get("schema")
        require(schema != null, s"registry response for id $id has no schema field")
        Some(AvroSchemaJson.toStructType(schema.asText()))
      case 404 => None
      case other =>
        throw new IllegalStateException(s"schema registry returned $other for id $id")
    }
    if (out.isDefined) cache.putIfAbsent(id, out)
    out
  }
}

/** Avro RECORD schema JSON → the [[AvroBinary.supported]] StructType
  * subset: primitive fields and `["null", primitive]` unions (nullable).
  * Anything else — nested records, arrays, maps, enums, logical-type
  * wrappers beyond their primitive carrier — is rejected loudly; the
  * binary codec could not decode it anyway.
  */
object AvroSchemaJson {
  private[functions] val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def primitive(name: String): DataType = name match {
    case "string" => StringType
    case "bytes" => BinaryType
    case "int" => IntegerType
    case "long" => LongType
    case "boolean" => BooleanType
    case "float" => FloatType
    case "double" => DoubleType
    case other =>
      throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  def toStructType(avroJson: String): StructType = {
    val root = mapper.readTree(avroJson)
    require(root.isObject && root.path("type").asText() == "record",
      s"expected a record schema, got: ${root.path("type").asText()}")
    val fields = root.path("fields")
    require(fields.isArray, "record schema has no fields array")
    val out = Seq.newBuilder[StructField]
    fields.forEach { f =>
      val name = f.path("name").asText()
      val t = f.path("type")
      val field =
        if (t.isTextual) StructField(name, primitive(t.asText()), nullable = false)
        else if (t.isArray && t.size() == 2 && t.get(0).asText() == "null"
          && t.get(1).isTextual)
          StructField(name, primitive(t.get(1).asText()), nullable = true)
        // Connect also emits {"type": primitive, ...} wrappers for fields
        // carrying logical-type annotations (date/timestamp-millis ride
        // int/long carriers, reference README.md:207)
        else if (t.isObject && t.path("type").isTextual)
          StructField(name, primitive(t.path("type").asText()), nullable = false)
        else if (t.isArray && t.size() == 2 && t.get(0).asText() == "null"
          && t.get(1).isObject && t.get(1).path("type").isTextual)
          StructField(name, primitive(t.get(1).path("type").asText()), nullable = true)
        else throw new IllegalArgumentException(
          s"unsupported avro field type for '$name': $t")
      out += field
    }
    StructType(out.result())
  }
}
