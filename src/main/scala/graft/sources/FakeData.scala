package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.DetHash
import graft.functions.GraftFunctions.{epochDaysToDate, epochMillisToTimestamp}

/** Deterministic fake-customer generator — the engine's analog of the
  * reference's Faker loop (reference `make_fake_data.py:53-81`, operators
  * G1-G10 in SURVEY.md §2.6).
  *
  * Where the reference draws from Faker's RNG, every field here is a pure
  * function of the row id (md5-salted via [[DetHash]]), so batch and
  * streaming runs are reproducible, partition-order-independent, and
  * oracle-checkable. All generator expressions are codegen'd Column
  * combinators — rows are generated *on the executors* (`spark.range` /
  * rate source), never on the driver, so the generator scales to any row
  * count.
  */
/** Typed view of the generated customer row (SURVEY.md §1.2 schema). */
case class Customer(nome: String, sexo: String, endereco: String,
                    telefone: String, email: String, foto: String,
                    nascimento: java.sql.Date, profissao: String,
                    dt_update: java.sql.Timestamp)

object FakeData {

  // small public-domain-ish lookup pools (G1/G3/G8 analogs)
  val firstNames = Seq("Ana", "Bruno", "Carla", "Diego", "Elisa", "Felipe",
    "Gabriela", "Heitor", "Isabela", "Joao", "Karina", "Lucas", "Mariana",
    "Nelson", "Olivia", "Paulo", "Queila", "Rafael", "Sofia", "Thiago")
  val lastNames = Seq("Almeida", "Barbosa", "Cardoso", "Dias", "Esteves",
    "Ferreira", "Gomes", "Henriques", "Inacio", "Jesus", "Klein", "Lima",
    "Martins", "Nunes", "Oliveira", "Pereira", "Queiroz", "Rocha", "Silva",
    "Teixeira")
  val streets = Seq("Rua das Flores", "Av Paulista", "Rua Augusta",
    "Av Atlantica", "Rua XV de Novembro", "Al Santos", "Rua da Praia",
    "Av Brasil")
  val cities = Seq("Sao Paulo", "Rio de Janeiro", "Belo Horizonte",
    "Curitiba", "Porto Alegre", "Salvador", "Recife", "Fortaleza")
  val jobs = Seq("Engenheiro", "Professora", "Medico", "Advogada",
    "Cientista de Dados", "Arquiteta", "Eletricista", "Enfermeira",
    "Contador", "Designer")

  /** 60-bit salted hash of the id column — the per-field RNG substitute. */
  private def h(id: Column, salt: String): Column =
    DetHash.base60(concat(lit(salt + ":"), id.cast("string")))

  private def pick(id: Column, salt: String, pool: Seq[String]): Column =
    element_at(array(pool.map(lit): _*),
      (pmod(h(id, salt), lit(pool.size)) + 1).cast("int"))

  /** The 9 generated columns of `make_fake_data.py:54-62`, keyed by an id
    * column. `dt_update` advances 500 ms per row from a fixed epoch — the
    * reference's default 2 rows/s cadence (`make_fake_data.py:28-31`).
    */
  def customerColumns(id: Column, baseEpochMillis: Long = 1704067200000L): Seq[Column] = {
    val first = pick(id, "first", firstNames)
    val last = pick(id, "last", lastNames)
    Seq(
      concat(first, lit(" "), last).as("nome"),
      when(pmod(h(id, "sexo"), lit(2)) === 0, lit("M")).otherwise(lit("F")).as("sexo"),
      concat(
        pmod(h(id, "addrnum"), lit(9999)).cast("string"), lit(" "),
        pick(id, "street", streets), lit(", "),
        pick(id, "city", cities)).as("endereco"),
      format_string("(%02d) 9%04d-%04d",
        pmod(h(id, "ddd"), lit(90)) + 10,
        pmod(h(id, "tel1"), lit(10000)),
        pmod(h(id, "tel2"), lit(10000))).as("telefone"),
      concat(lower(first), lit("."), lower(last),
        pmod(h(id, "mailn"), lit(100)).cast("string"),
        lit("@example.org")).as("email"),
      format_string("https://img.example.org/%d/%d",
        pmod(h(id, "imgw"), lit(800)) + 200,
        pmod(h(id, "imgh"), lit(800)) + 200).as("foto"),
      // birthdates 1940..2009 — straddles the 1970 epoch, so negative
      // epoch-day ints exercise the F1 conversion edge (reference
      // README.md:221-224 shows pre-1970 births as negative INTs)
      date_add(lit(java.sql.Date.valueOf("1940-01-01")),
        pmod(h(id, "nasc"), lit(365 * 70)).cast("int")).as("nascimento"),
      pick(id, "job", jobs).as("profissao"),
      epochMillisToTimestamp(lit(baseEpochMillis) + id * 500).as("dt_update"))
  }

  /** Batch generator: n deterministic customers (G1-G9 + K5-shape). */
  def customers(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(customerColumns(col("id")): _*)

  /** Typed Dataset variant — compile-time schema via the [[Customer]]
    * Encoder.
    */
  def typedCustomers(spark: SparkSession, n: Long): org.apache.spark.sql.Dataset[Customer] = {
    import spark.implicits._
    customers(spark, n).as[Customer]
  }

  /** Streaming generator: rate source → same columns (G10; the reference's
    * `--interval`/`-n` loop ≈ rowsPerSecond).
    */
  def customerStream(spark: SparkSession, rowsPerSecond: Int = 2): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(customerColumns(col("value")): _*)

  /** Wire-format view: DATE → epoch-days INT, TIMESTAMP → epoch-millis
    * LONG — exactly how the reference's Avro topic carries them (Connect
    * Date/Timestamp logical types; reference README.md:207).
    */
  def toEpochRecords(customers: DataFrame): DataFrame =
    customers
      .withColumn("nascimento", datediff(col("nascimento"),
        lit(java.sql.Date.valueOf("1970-01-01"))))
      .withColumn("dt_update", unix_millis(col("dt_update")))

  /** Decode the wire format back to typed DATE/TIMESTAMP columns (F1/F2
    * ingestion path).
    */
  def fromEpochRecords(records: DataFrame): DataFrame =
    records
      .withColumn("nascimento", epochDaysToDate(col("nascimento")))
      .withColumn("dt_update", epochMillisToTimestamp(col("dt_update")))
}
