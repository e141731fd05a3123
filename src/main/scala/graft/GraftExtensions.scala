package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions, GraftShim}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}
import graft.functions.VectorDot

/** SQL-name surface of the engine.
  *
  * The reference's queries are ksqlDB SQL using `DATETOSTRING` /
  * `TIMESTAMPTOSTRING` over the Avro wire types (epoch-days INT,
  * epoch-millis BIGINT — reference `README.md:207,211-212`). Registering
  * those names (plus the engine's vector primitives) lets a ksqlDB user
  * run their query text against `spark.sql` unchanged up to
  * stream/table DDL.
  *
  * Two installation paths:
  *  - config: `spark.sql.extensions=graft.GraftExtensions`
  *  - runtime: `GraftSqlFunctions.install(spark)`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftSqlFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftSqlFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  /** Arity guard for every SQL builder: a clean analysis-time error with
    * the expected signature instead of the builder's raw
    * IndexOutOfBoundsException when called with the wrong argument count
    * (same error style as kmv_sketch's literal check).
    */
  private def arity(sig: String, n: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    arityIn(sig, Set(n))(b)

  private def arityIn(sig: String, ns: Set[Int])(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args =>
      if (ns.contains(args.length)) b(args)
      else throw new IllegalArgumentException(
        s"$sig expects ${ns.toSeq.sorted.mkString(" or ")} arguments, got ${args.length}")

  /** ksqlDB DATETOSTRING: epoch-days INT → formatted string (handles
    * negative pre-1970 days; reference README.md:221-224).
    */
  private def dateToString(args: Seq[Expression]): Expression =
    DateFormatClass(
      Cast(DateFromUnixDate(Cast(args.head, IntegerType)), TimestampType),
      args(1))

  /** ksqlDB TIMESTAMPTOSTRING: epoch-millis BIGINT → formatted string.
    * The reference's 3-arg form names the zone explicitly
    * (`TIMESTAMPTOSTRING(dt_update, 'yyyy-MM-dd HH:mm:ss.SSS', 'UTC')`,
    * README.md:212) — the session zone is pinned UTC, so the optional
    * third argument shifts the RENDERED wall-clock to the named zone
    * (identity for 'UTC').
    */
  private def timestampToString(args: Seq[Expression]): Expression = {
    val ts = MillisToTimestamp(Cast(args.head, LongType))
    val zoned = if (args.length == 3) FromUTCTimestamp(ts, args(2)) else ts
    DateFormatClass(zoned, args(1))
  }

  private def cosine(args: Seq[Expression]): Expression = {
    val (a, b) = (args.head, args(1))
    Divide(VectorDot(a, b),
      Multiply(Sqrt(VectorDot(a, a)), Sqrt(VectorDot(b, b))))
  }

  /** `zorder_key(x, y)` — the Morton key as a native expression tree,
    * folded over the SAME [[graft.operators.ZOrder.SpreadMasks]] ladder
    * the Column form uses (ExtensionsSpec pins SQL == JVM twin, so the
    * two renderings cannot drift).
    */
  private def zorderKey(args: Seq[Expression]): Expression = {
    def spread(v: Expression): Expression =
      operators.ZOrder.SpreadMasks.foldLeft(
        BitwiseAnd(Cast(v, LongType), Literal(0xFFFFL)): Expression) {
        case (acc, (s, m)) =>
          BitwiseAnd(BitwiseOr(acc, ShiftLeft(acc, Literal(s))), Literal(m))
      }
    BitwiseOr(spread(args.head), ShiftLeft(spread(args(1)), Literal(1)))
  }

  /** `kmv_sketch(hash, k)` — the KMV aggregate; `k` must be an integer
    * literal (it sizes the aggregation state).
    */
  private def kmvSketch(args: Seq[Expression]): Expression = {
    val k = args(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"kmv_sketch(hash, k): k must be an integer literal, got ${other.sql}")
    }
    graft.functions.KmvSketchAgg(args.head, k)
  }

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("zorder_key",
      info("zorder_key", "zorder_key(x, y) - 32-bit Morton key interleaving two 16-bit dims"),
      arity("zorder_key(x, y)", 2)(zorderKey)),
    ("kmv_sketch",
      info("kmv_sketch", "kmv_sketch(hash, k) - ascending array of the k smallest distinct hashes (KMV distinct sketch)"),
      arity("kmv_sketch(hash, k)", 2)(kmvSketch)),
    ("datetostring",
      info("datetostring", "datetostring(epochDays, fmt) - format epoch-days int as date string"),
      arity("datetostring(epochDays, fmt)", 2)(dateToString)),
    ("timestamptostring",
      info("timestamptostring", "timestamptostring(epochMillis, fmt[, zone]) - format epoch-millis long as timestamp string"),
      arityIn("timestamptostring(epochMillis, fmt[, zone])", Set(2, 3))(timestampToString)),
    ("vector_dot",
      info("vector_dot", "vector_dot(a, b) - sequential dot product of two float/double arrays"),
      arity("vector_dot(a, b)", 2)(args => VectorDot(args.head, args(1)))),
    ("cosine_similarity",
      info("cosine_similarity", "cosine_similarity(a, b) - cosine similarity of two float/double arrays"),
      arity("cosine_similarity(a, b)", 2)(cosine)),
    ("bounded_levenshtein",
      info("bounded_levenshtein",
        "bounded_levenshtein(a, b, k) - edit distance if <= k else -1 (prefix/suffix strip + Ukkonen band); k must be an integer literal"),
      arity("bounded_levenshtein(a, b, k)", 3)(boundedLev)))

  /** `bounded_levenshtein(a, b, k)` — k must be an integer literal (it
    * sizes the DP band).
    */
  private def boundedLev(args: Seq[Expression]): Expression = {
    val k = args(2) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"bounded_levenshtein(a, b, k): k must be an integer literal, got ${other.sql}")
    }
    graft.functions.BoundedLevenshtein(args.head, args(1), k)
  }

  /** Register all engine functions on a live session. */
  def install(spark: SparkSession): Unit =
    all.foreach { case (name, i, b) =>
      GraftShim.registerFunction(spark, name, i, b)
    }
}
