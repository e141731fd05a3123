package graft

import java.sql.{DriverManager, Timestamp}
import java.util.Properties

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.{ArrayChunkFetcher, IncrementalJdbc, JdbcOffset, JdbcRangeFetcher}

/** An in-process JDBC driver speaking exactly the statement grammar the
  * engine emits ([[IncrementalJdbc.rangeSql]]) over in-memory tables —
  * the java.sql twin of the HTTP schema-registry stub: it lets the REAL
  * production code path (`DriverManager.getConnection` → `executeQuery`
  * → `ResultSet` row materialization in [[JdbcRangeFetcher]]) execute
  * offline. Statements outside the recognized grammar fail LOUDLY — this
  * is a protocol stub, not a database.
  */
object GraftMemJdbc {
  val Prefix = "jdbc:graftmem:"
  val opened = new java.util.concurrent.atomic.AtomicInteger
  val closed = new java.util.concurrent.atomic.AtomicInteger
  private val tables =
    scala.collection.concurrent.TrieMap[String, (StructType, IndexedSeq[Row])]()

  def register(table: String, schema: StructType, rows: IndexedSeq[Row]): Unit =
    tables.put(table, (schema, rows))

  private def proxy[T](cls: Class[T])(
      handler: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    java.lang.reflect.Proxy.newProxyInstance(cls.getClassLoader, Array[Class[_]](cls),
      (_, m, args) => {
        val a = if (args == null) Array.empty[AnyRef] else args
        handler.applyOrElse((m.getName, a), (miss: (String, Array[AnyRef])) =>
          throw new UnsupportedOperationException(s"graftmem jdbc: ${miss._1}"))
      }).asInstanceOf[T]

  // ------------------------------------------------- rangeSql evaluation

  private val fromRe = """(?s)SELECT \* FROM (\w+) WHERE (.*) ORDER BY (.*)""".r
  private val lowerCompositeRe =
    """\((\w+) > TIMESTAMP '([^']+)' OR \(\1 = TIMESTAMP '\2' AND (\w+) > (\d+)\)\)""".r
  private val upperCompositeRe =
    """\((\w+) < TIMESTAMP '([^']+)' OR \(\1 = TIMESTAMP '\2' AND (\w+) <= (\d+)\)\)""".r
  private val lowerPlainRe = """(\w+) > TIMESTAMP '([^']+)'""".r
  private val upperPlainRe = """(\w+) <= TIMESTAMP '([^']+)'""".r

  /** Evaluate one recognized range statement against the registry. */
  private def run(sql: String): (StructType, IndexedSeq[Row]) = sql.trim match {
    case fromRe(table, where, order) =>
      val (schema, rows) = tables.getOrElse(table,
        throw new java.sql.SQLException(s"graftmem: unknown table '$table'"))
      val tsCol = order.split(",")(0).trim.split(" ")(0)
      val idCol = order.split(",").drop(1).headOption.map(_.trim.split(" ")(0))
      val tsIdx = schema.fieldIndex(tsCol)
      val idIdx = idCol.map(schema.fieldIndex)
      // the plain lower pattern also occurs INSIDE the composite one, so
      // it is only consulted when the composite pattern is absent (the
      // composite upper contains no '> TIMESTAMP' text, so no false hit)
      val lower =
        lowerCompositeRe.findFirstMatchIn(where)
          .map(m => JdbcOffset(Timestamp.valueOf(m.group(2)), Some(m.group(4).toLong)))
          .orElse(lowerPlainRe.findFirstMatchIn(where)
            .map(m => JdbcOffset(Timestamp.valueOf(m.group(2)), None)))
      val upper =
        upperCompositeRe.findFirstMatchIn(where)
          .map(m => JdbcOffset(Timestamp.valueOf(m.group(2)), Some(m.group(4).toLong)))
          .getOrElse(upperPlainRe.findFirstMatchIn(where)
            .map(m => JdbcOffset(Timestamp.valueOf(m.group(2)), None))
            .getOrElse(throw new java.sql.SQLException(
              s"graftmem: unrecognized statement: $sql")))
      val composite = idIdx.isDefined
      val selected = rows.filter { r =>
        val ts = if (r.isNullAt(tsIdx)) null else r.getTimestamp(tsIdx)
        val id = idIdx.filterNot(r.isNullAt).map(r.getLong)
        graft.sources.ChunkFetcher.inRange(ts, id, lower, upper, composite)
      }.sortBy { r =>
        (r.getTimestamp(tsIdx).getTime, idIdx.map(r.getLong).getOrElse(0L))
      }
      (schema, selected)
    case other => throw new java.sql.SQLException(
      s"graftmem: unrecognized statement: $other")
  }

  private def resultSet(schema: StructType, rows: IndexedSeq[Row]): java.sql.ResultSet = {
    var cursor = -1
    var wasNull = false
    def value(i: Int): AnyRef = {
      val v = rows(cursor).get(i - 1)
      wasNull = v == null
      v.asInstanceOf[AnyRef]
    }
    proxy(classOf[java.sql.ResultSet]) {
      case ("next", _) =>
        cursor += 1; java.lang.Boolean.valueOf(cursor < rows.length)
      case ("wasNull", _) => java.lang.Boolean.valueOf(wasNull)
      case ("close", _) => null
      case ("getTimestamp", a) => value(a(0).asInstanceOf[Integer])
      case ("getString", a) => value(a(0).asInstanceOf[Integer])
      case ("getDate", a) => value(a(0).asInstanceOf[Integer])
      case ("getBytes", a) => value(a(0).asInstanceOf[Integer])
      case ("getBigDecimal", a) => value(a(0).asInstanceOf[Integer])
      case ("getObject", a) => value(a(0).asInstanceOf[Integer])
      case ("getLong", a) =>
        val v = value(a(0).asInstanceOf[Integer])
        java.lang.Long.valueOf(if (v == null) 0L else v.asInstanceOf[java.lang.Long].longValue)
      case ("getInt", a) =>
        val v = value(a(0).asInstanceOf[Integer])
        java.lang.Integer.valueOf(if (v == null) 0 else v.asInstanceOf[java.lang.Integer].intValue)
      case ("getDouble", a) =>
        val v = value(a(0).asInstanceOf[Integer])
        java.lang.Double.valueOf(if (v == null) 0.0 else v.asInstanceOf[java.lang.Double].doubleValue)
      case ("getBoolean", a) =>
        val v = value(a(0).asInstanceOf[Integer])
        java.lang.Boolean.valueOf(v != null && v.asInstanceOf[java.lang.Boolean])
    }
  }

  private def statement(): java.sql.Statement =
    proxy(classOf[java.sql.Statement]) {
      case ("executeQuery", a) =>
        val (schema, rows) = run(a(0).asInstanceOf[String])
        resultSet(schema, rows)
      case ("close", _) => null
    }

  private def connection(): java.sql.Connection = {
    opened.incrementAndGet()
    proxy(classOf[java.sql.Connection]) {
      case ("createStatement", _) => statement()
      case ("close", _) => closed.incrementAndGet(); null
      case ("isClosed", _) => java.lang.Boolean.FALSE
    }
  }

  /** java.sql.Driver is small enough to implement directly. */
  object MemDriver extends java.sql.Driver {
    override def acceptsURL(url: String): Boolean =
      url != null && url.startsWith(Prefix)
    override def connect(url: String, info: Properties): java.sql.Connection =
      if (!acceptsURL(url)) null else connection()
    override def getMajorVersion: Int = 1
    override def getMinorVersion: Int = 0
    override def getPropertyInfo(url: String, info: Properties) = Array.empty
    override def jdbcCompliant(): Boolean = false
    override def getParentLogger =
      throw new java.sql.SQLFeatureNotSupportedException()
  }

  lazy val ensureRegistered: Unit = DriverManager.registerDriver(MemDriver)
}

class GraftMemJdbcSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("nome", StringType),
    StructField("dt_update", TimestampType)))

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)

  private val rows: IndexedSeq[Row] = IndexedSeq(
    Row(1L, "ana", ts(10)),
    Row(2L, "bia", ts(20)),
    Row(3L, "caio", ts(20)), // equal-ts run: composite tiebreak territory
    Row(4L, "dani", ts(30)),
    Row(5L, "eva", null),    // NULL timestamp: never delivered
    Row(6L, "fred", ts(40)))

  GraftMemJdbc.ensureRegistered
  GraftMemJdbc.register("customers", schema, rows)

  private val url = GraftMemJdbc.Prefix + "db"

  test("JdbcRangeFetcher runs its real java.sql path against the in-process driver") {
    val fetcher = JdbcRangeFetcher(url, "customers", Map.empty)
    // composite range (lower exclusive by (ts, id), upper inclusive):
    // splits the equal-ts run on the id tiebreak — the exact boundary
    // the mode exists for
    val got = fetcher.fetch(schema, "dt_update", Some("id"),
      Some(JdbcOffset(ts(20), Some(2L))), JdbcOffset(ts(30), Some(4L))).toVector
    assert(got.map(_.getLong(0)) == Vector(3L, 4L))
    // parity with the in-memory fetcher on the same bounds
    val mem = ArrayChunkFetcher(rows).fetch(schema, "dt_update", Some("id"),
      Some(JdbcOffset(ts(20), Some(2L))), JdbcOffset(ts(30), Some(4L))).toVector
    assert(got == mem)
  }

  test("pure-timestamp range over real JDBC: strict lower, inclusive upper, no NULLs") {
    val fetcher = JdbcRangeFetcher(url, "customers", Map.empty)
    val got = fetcher.fetch(schema, "dt_update", None,
      Some(JdbcOffset(ts(10))), JdbcOffset(ts(40))).toVector
    assert(got.map(_.getLong(0)) == Vector(2L, 3L, 4L, 6L))
    assert(!got.exists(_.getLong(0) == 5L), "NULL-timestamp row leaked")
    // full backfill: no lower bound
    val all = fetcher.fetch(schema, "dt_update", None,
      None, JdbcOffset(ts(40))).toVector
    assert(all.map(_.getLong(0)) == Vector(1L, 2L, 3L, 4L, 6L))
  }

  test("every connection the fetcher opens is closed, even across fetches") {
    val before = (GraftMemJdbc.opened.get, GraftMemJdbc.closed.get)
    val fetcher = JdbcRangeFetcher(url, "customers", Map.empty)
    fetcher.fetch(schema, "dt_update", None, None, JdbcOffset(ts(40))).toVector
    fetcher.fetch(schema, "dt_update", None, None, JdbcOffset(ts(20))).toVector
    val after = (GraftMemJdbc.opened.get, GraftMemJdbc.closed.get)
    assert(after._1 - before._1 == 2)
    assert(after._2 - before._2 == 2, "connection leak")
  }

  test("statements outside the engine's grammar fail loudly (stub, not a database)") {
    GraftMemJdbc.ensureRegistered
    val conn = DriverManager.getConnection(url, new Properties())
    try {
      intercept[java.sql.SQLException] {
        conn.createStatement().executeQuery("SELECT 1")
      }
      intercept[java.sql.SQLException] {
        conn.createStatement().executeQuery(
          IncrementalJdbc.rangeSql("no_such_table", "dt_update", None,
            None, JdbcOffset(ts(1))))
      }
    } finally conn.close()
  }
}
