package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hand-rolled Avro BINARY encoding for flat records — the reference's
  * only wire format (`/root/reference/README.md:186` `value_format='AVRO'`;
  * AvroConverter in `/root/reference/docker-compose.yml:78-79`). spark-avro
  * is not on the offline classpath, so the binary core is implemented
  * directly from the public Avro 1.11 spec (zigzag varints, length-prefixed
  * strings/bytes, little-endian IEEE floats, union-branch indexes written
  * as Avro ints) and exposed as native codegen'd Catalyst expressions
  * mirroring [[VectorDot]]'s design.
  *
  * Wire schema = a Spark [[StructType]]: field ORDER is the Avro record
  * field order; a NULLABLE field is the Avro union `["null", T]` (what
  * Connect's JDBC source emits for optional columns); types map
  * string/int/long/float/double/boolean/binary ⇄ the Avro primitives.
  * Logical types ride primitives exactly as the reference's topics carry
  * them: DATE = epoch-day int (pre-1970 births are NEGATIVE ints,
  * `README.md:221-224`), TIMESTAMP = epoch-millis long (`README.md:207`)
  * — [[graft.sources.FakeData.toEpochRecords]] /
  * [[graft.sources.FakeData.fromEpochRecords]] are the typed ⇄ wire views.
  *
  * Optional Confluent Schema-Registry framing (magic byte 0x00 + 4-byte
  * big-endian schema id before the Avro body) matches what AvroConverter
  * actually puts on the topic.
  */
object AvroBinary {

  // --------------------------------------------------------- primitives

  /** Avro long: zigzag then base-128 varint, little-end first. */
  def writeLong(out: ByteArrayOutputStream, v: Long): Unit = {
    var n = (v << 1) ^ (v >> 63) // zigzag
    while ((n & ~0x7fL) != 0L) {
      out.write(((n & 0x7f) | 0x80).toInt)
      n >>>= 7
    }
    out.write(n.toInt)
  }

  /** Avro int: 32-bit zigzag, same varint body. */
  def writeInt(out: ByteArrayOutputStream, v: Int): Unit = {
    var n = ((v << 1) ^ (v >> 31)).toLong & 0xffffffffL
    while ((n & ~0x7fL) != 0L) {
      out.write(((n & 0x7f) | 0x80).toInt)
      n >>>= 7
    }
    out.write(n.toInt)
  }

  final class Cursor(val bytes: Array[Byte], var pos: Int)

  def readVarint(c: Cursor): Long = {
    var b = c.bytes(c.pos).toLong & 0xff
    c.pos += 1
    var n = b & 0x7f
    var shift = 7
    while ((b & 0x80) != 0) {
      b = c.bytes(c.pos).toLong & 0xff
      c.pos += 1
      n |= (b & 0x7f) << shift
      shift += 7
    }
    (n >>> 1) ^ -(n & 1) // un-zigzag
  }

  // ------------------------------------------------------------- encode

  /** Encode one struct value against the wire schema. */
  def encode(row: InternalRow, schema: StructType,
             confluentSchemaId: java.lang.Integer): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    if (confluentSchemaId != null) {
      out.write(0x00) // magic
      val id = confluentSchemaId.intValue()
      out.write((id >>> 24) & 0xff); out.write((id >>> 16) & 0xff)
      out.write((id >>> 8) & 0xff); out.write(id & 0xff)
    }
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      if (f.nullable) {
        // union ["null", T]: branch index is written as an Avro int
        if (row.isNullAt(i)) { writeInt(out, 0); i += 1 }
        else { writeInt(out, 1); writeValue(out, row, i, f.dataType); i += 1 }
      } else {
        require(!row.isNullAt(i),
          s"null value for non-nullable avro field '${f.name}'")
        writeValue(out, row, i, f.dataType)
        i += 1
      }
    }
    out.toByteArray
  }

  private def writeValue(out: ByteArrayOutputStream, row: InternalRow,
                         i: Int, t: DataType): Unit = t match {
    case StringType =>
      val b = row.getUTF8String(i).getBytes
      writeLong(out, b.length.toLong); out.write(b, 0, b.length)
    case BinaryType =>
      val b = row.getBinary(i)
      writeLong(out, b.length.toLong); out.write(b, 0, b.length)
    case IntegerType => writeInt(out, row.getInt(i))
    case LongType => writeLong(out, row.getLong(i))
    case BooleanType => out.write(if (row.getBoolean(i)) 1 else 0)
    case FloatType =>
      val bits = java.lang.Float.floatToIntBits(row.getFloat(i))
      out.write(bits & 0xff); out.write((bits >>> 8) & 0xff)
      out.write((bits >>> 16) & 0xff); out.write((bits >>> 24) & 0xff)
    case DoubleType =>
      val bits = java.lang.Double.doubleToLongBits(row.getDouble(i))
      var s = 0
      while (s < 64) { out.write(((bits >>> s) & 0xff).toInt); s += 8 }
    case other =>
      throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  // ------------------------------------------------------------- decode

  /** Decode one record; returns null for malformed/truncated input (the
    * permissive from_json convention — a poison-pill Kafka record must not
    * kill the stream).
    */
  def decode(bytes: Array[Byte], schema: StructType,
             confluentFraming: Boolean): InternalRow =
    try {
      val c = new Cursor(bytes, 0)
      if (confluentFraming) {
        if (bytes.length < 5 || bytes(0) != 0x00) return null
        c.pos = 5 // magic + 4-byte schema id
      }
      val vals = decodeBody(c, schema)
      if (c.pos != bytes.length) return null // trailing garbage
      new GenericInternalRow(vals)
    } catch {
      case _: ArrayIndexOutOfBoundsException | _: IllegalArgumentException |
           _: NegativeArraySizeException => null
    }

  /** Decode a record body at the cursor against one schema. Throws
    * IllegalArgumentException on malformed input (callers map to null).
    */
  private def decodeBody(c: Cursor, schema: StructType): Array[Any] = {
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      val isNull = f.nullable && {
        val branch = readVarint(c)
        if (branch != 0L && branch != 1L) // not a 2-union
          throw new IllegalArgumentException(s"bad union branch $branch")
        branch == 0L
      }
      vals(i) = if (isNull) null else readValue(c, f.dataType)
      i += 1
    }
    vals
  }

  /** Per-record Confluent schema-id dispatch — the registry-backed topic
    * shape where records written under EVOLVING schema versions
    * interleave on one topic (the reference's AvroConverter + registry,
    * `docker-compose.yml:78-79`, permits this; the pinned-schema
    * [[decode]] is ksqlDB's one-subject view). The framed id routes each
    * record to its writer schema; the decoded record then resolves onto
    * `reader` BY FIELD NAME (Avro schema resolution): reader fields the
    * writer lacks read as null, writer fields the reader lacks are
    * dropped. Unframed bytes, unknown ids, and malformed bodies all
    * decode to a NULL row rather than failing the stream.
    */
  def decodeEvolving(bytes: Array[Byte], reader: StructType,
                     writers: scala.collection.immutable.Map[Int, StructType])
      : InternalRow =
    try {
      if (bytes.length < 5 || bytes(0) != 0x00) return null
      val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
        ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
      val writer = writers.getOrElse(id, null)
      if (writer == null) return null
      val c = new Cursor(bytes, 5)
      val vals = decodeBody(c, writer)
      if (c.pos != bytes.length) return null
      val out = new Array[Any](reader.length)
      var i = 0
      while (i < reader.length) {
        val name = reader(i).name
        val w = writer.indexWhere(_.name == name)
        out(i) = if (w >= 0) vals(w) else null
        i += 1
      }
      new GenericInternalRow(out)
    } catch {
      case _: ArrayIndexOutOfBoundsException | _: IllegalArgumentException |
           _: NegativeArraySizeException => null
    }

  private def readValue(c: Cursor, t: DataType): Any = t match {
    case StringType =>
      val len = readVarint(c).toInt
      val s = UTF8String.fromBytes(c.bytes, c.pos, len)
      c.pos += len
      // copy out: fromBytes views the shared buffer
      UTF8String.fromString(s.toString)
    case BinaryType =>
      val len = readVarint(c).toInt
      val b = java.util.Arrays.copyOfRange(c.bytes, c.pos, c.pos + len)
      c.pos += len
      b
    case IntegerType => readVarint(c).toInt
    case LongType => readVarint(c)
    case BooleanType =>
      val b = c.bytes(c.pos); c.pos += 1; b != 0
    case FloatType =>
      var bits = 0; var s = 0
      while (s < 32) { bits |= (c.bytes(c.pos) & 0xff) << s; c.pos += 1; s += 8 }
      java.lang.Float.intBitsToFloat(bits)
    case DoubleType =>
      var bits = 0L; var s = 0
      while (s < 64) { bits |= (c.bytes(c.pos).toLong & 0xff) << s; c.pos += 1; s += 8 }
      java.lang.Double.longBitsToDouble(bits)
    case other =>
      throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  private[functions] def supported(t: DataType): Boolean = t match {
    case StringType | BinaryType | IntegerType | LongType | BooleanType |
         FloatType | DoubleType => true
    case _ => false
  }
}

/** struct → Avro-binary bytes (optionally Confluent-framed with
  * `schemaId`). Field i of the input struct is encoded as field i of
  * `wireSchema` — names are documentation, positions are the contract,
  * exactly like Avro resolution by field order on a schema-less binary.
  */
case class AvroEncode(child: Expression, wireSchema: StructType,
                      schemaId: Option[Int]) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "avro_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == wireSchema.length &&
        s.fields.zip(wireSchema.fields).forall { case (a, w) =>
          a.dataType == w.dataType && AvroBinary.supported(w.dataType) } =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName input ${other.sql} does not match wire schema ${wireSchema.sql}")
  }

  private val idRef: java.lang.Integer =
    schemaId.map(java.lang.Integer.valueOf).orNull

  override def nullSafeEval(v: Any): Any =
    AvroBinary.encode(v.asInstanceOf[InternalRow], wireSchema, idRef)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val schemaRef = ctx.addReferenceObj("wireSchema", wireSchema,
      classOf[StructType].getName)
    val id = ctx.addReferenceObj("schemaId", idRef, "java.lang.Integer")
    nullSafeCodeGen(ctx, ev, row =>
      s"${ev.value} = graft.functions.AvroBinary.encode($row, $schemaRef, $id);")
  }

  override protected def withNewChildInternal(newChild: Expression): AvroEncode =
    copy(child = newChild)
}

/** Avro-binary bytes → struct per `wireSchema` (strips Confluent framing
  * when `confluentFraming`). Malformed records decode to NULL rather than
  * failing the stream — from_json's permissive convention.
  */
case class AvroDecode(child: Expression, wireSchema: StructType,
                      confluentFraming: Boolean) extends UnaryExpression {

  override def dataType: DataType = wireSchema
  override def nullable: Boolean = true
  override def prettyName: String = "avro_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if wireSchema.fields.forall(f => AvroBinary.supported(f.dataType)) =>
      TypeCheckResult.TypeCheckSuccess
    case BinaryType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName wire schema has unsupported field types: ${wireSchema.sql}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    AvroBinary.decode(v.asInstanceOf[Array[Byte]], wireSchema, confluentFraming)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val schemaRef = ctx.addReferenceObj("wireSchema", wireSchema,
      classOf[StructType].getName)
    nullSafeCodeGen(ctx, ev, bytes => s"""
      ${ev.value} = graft.functions.AvroBinary.decode($bytes, $schemaRef, $confluentFraming);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): AvroDecode =
    copy(child = newChild)
}

/** Confluent-framed bytes → struct(`readerSchema`) with PER-RECORD
  * schema-id dispatch over `writerSchemas` (see
  * [[AvroBinary.decodeEvolving]]). The type check enforces the full
  * resolution contract up front, at analysis time: every reader field
  * that some writer version lacks must be nullable (it decodes to null
  * there), a same-named field must have the SAME dataType in writer and
  * reader (values are copied across by name with no Avro promotion), and
  * a nullable writer field may only resolve onto a nullable reader field.
  */
case class AvroDecodeEvolving(child: Expression, readerSchema: StructType,
                              writerSchemas: Map[Int, StructType])
    extends UnaryExpression {

  override def dataType: DataType = readerSchema
  override def nullable: Boolean = true
  override def prettyName: String = "avro_decode_evolving"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType =>
      val allFields = readerSchema.fields ++
        writerSchemas.values.flatMap(_.fields)
      val unsupported = allFields.filterNot(f => AvroBinary.supported(f.dataType))
      val mustBeNullable = readerSchema.fields.filter(f =>
        !f.nullable && writerSchemas.values.exists(w =>
          !w.fieldNames.contains(f.name)))
      // decodeEvolving copies the WRITER-decoded value into the reader row
      // by name, so a same-named field must carry the same dataType in
      // both schemas (no Avro promotions here), and a writer field that
      // can decode to null must land in a nullable reader field
      val typeMismatch = for {
        (id, w) <- writerSchemas.toSeq.sortBy(_._1)
        wf <- w.fields
        rf <- readerSchema.fields.find(_.name == wf.name).toSeq
        if wf.dataType != rf.dataType
      } yield s"${wf.name} (writer $id ${wf.dataType.simpleString} vs reader ${rf.dataType.simpleString})"
      val nullMismatch = for {
        (id, w) <- writerSchemas.toSeq.sortBy(_._1)
        wf <- w.fields if wf.nullable
        rf <- readerSchema.fields.find(_.name == wf.name).toSeq
        if !rf.nullable
      } yield s"${wf.name} (writer $id)"
      if (unsupported.nonEmpty) TypeCheckResult.TypeCheckFailure(
        s"$prettyName unsupported field types: ${unsupported.map(_.dataType).mkString(", ")}")
      else if (writerSchemas.isEmpty) TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs at least one writer schema")
      else if (typeMismatch.nonEmpty) TypeCheckResult.TypeCheckFailure(
        s"$prettyName writer/reader dataType mismatch: ${typeMismatch.mkString("; ")}")
      else if (nullMismatch.nonEmpty) TypeCheckResult.TypeCheckFailure(
        s"$prettyName nullable writer fields need a nullable reader field: " +
          nullMismatch.mkString("; "))
      else if (mustBeNullable.nonEmpty) TypeCheckResult.TypeCheckFailure(
        s"$prettyName reader fields ${mustBeNullable.map(_.name).mkString(", ")} " +
          "are missing from some writer schema and must be nullable")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    AvroBinary.decodeEvolving(v.asInstanceOf[Array[Byte]], readerSchema,
      writerSchemas)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val readerRef = ctx.addReferenceObj("readerSchema", readerSchema,
      classOf[StructType].getName)
    val writersRef = ctx.addReferenceObj("writerSchemas", writerSchemas,
      "scala.collection.immutable.Map")
    nullSafeCodeGen(ctx, ev, bytes => s"""
      ${ev.value} = graft.functions.AvroBinary.decodeEvolving($bytes, $readerRef, $writersRef);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): AvroDecodeEvolving =
    copy(child = newChild)
}

object AvroCodec {

  /** Column API over [[AvroEncode]]. */
  def avroEncode(c: Column, schema: StructType,
                 schemaId: Option[Int] = None): Column =
    GraftShim.column(AvroEncode(GraftShim.expression(c), schema, schemaId))

  /** Column API over [[AvroDecode]]. */
  def avroDecode(c: Column, schema: StructType,
                 confluentFraming: Boolean = false): Column =
    GraftShim.column(AvroDecode(GraftShim.expression(c), schema, confluentFraming))

  /** Column API over [[AvroDecodeEvolving]]. */
  def avroDecodeEvolving(c: Column, readerSchema: StructType,
                         writerSchemas: Map[Int, StructType]): Column =
    GraftShim.column(AvroDecodeEvolving(GraftShim.expression(c), readerSchema,
      writerSchemas))

  /** [[avroDecodeEvolving]] with the writer schemas RESOLVED from a
    * [[SchemaRegistryClient]] at plan-build time — the live-registry
    * entry point (HTTP client or the static test registry, same call).
    * `ids` is the known writer-version set for the topic; ids the
    * registry cannot resolve are dropped (records framed with them decode
    * to null rows, the same contract as an unknown id at runtime).
    */
  def avroDecodeEvolving(c: Column, readerSchema: StructType,
                         registry: SchemaRegistryClient,
                         ids: Seq[Int]): Column =
    avroDecodeEvolving(c, readerSchema,
      ids.flatMap(id => registry.schemaById(id).map(id -> _)).toMap)

  /** The reference customer topic's wire schema (`make_fake_data.py:54-62`
    * field order; date/timestamp as their Avro logical-type primitives).
    * Fields are nullable — Connect's JDBC source emits optional columns as
    * `["null", T]` unions.
    */
  val customerWireSchema: StructType = StructType(Seq(
    StructField("nome", StringType),
    StructField("sexo", StringType),
    StructField("endereco", StringType),
    StructField("telefone", StringType),
    StructField("email", StringType),
    StructField("foto", StringType),
    StructField("nascimento", IntegerType), // epoch days, negative pre-1970
    StructField("profissao", StringType),
    StructField("dt_update", LongType)))    // epoch millis
}
