package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing.
  *
  * Spark's `hash()` is Murmur3 with Spark-specific seeding; DuckDB's
  * `hash()` is different again — so nothing built on either is
  * oracle-checkable. Instead the engine derives a 60-bit integer from the
  * md5 hex digest (md5 exists and agrees everywhere):
  *
  *   Spark : conv(substr(md5(s),1,15),16,10)::long
  *   DuckDB: ('0x'||substr(md5(s),1,15))::BIGINT
  *   JVM   : new BigInteger(md5hex.take(15),16).longValue
  *
  * 15 hex chars = 60 bits < 2^63, so the value is identical in all three.
  * MinHash then uses affine permutations ((a*h+b) mod P) over this base —
  * one md5 per shingle total, the 64 permutations are integer math (the
  * (a,b) constants are JVM-derived and inlined as literals into both the
  * Spark plan and the oracle SQL).
  *
  * P = 2^31-1 (Mersenne prime). h%P < 2^31 and a < 2^31 keep a*h+b < 2^62:
  * no 64-bit overflow in either engine.
  */
object DetHash {
  val P: Long = 2147483647L // 2^31 - 1

  /** 60-bit integer from md5, as a Column — the fused native expression
    * ([[Base60Hash]]): digest bytes → long directly. The composed
    * `conv(substring(md5(c),1,15),16,10)` form allocates a 32-char hex
    * string, a 15-char substring and a BigInteger parse PER HASH; the
    * fused expression is bit-identical (spec-pinned against the composed
    * form) and the oracle SQL keeps the string formulation unchanged.
    */
  def base60(c: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      Base60Hash(org.apache.spark.sql.GraftShim.expression(c)))

  /** Same, JVM-side (for generating constants). */
  def base60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    new java.math.BigInteger(hex.substring(0, 15), 16).longValue
  }

  /** Affine MinHash coefficients for permutation i — deterministic, shared
    * by plan-builder and oracle-SQL-builder.
    */
  def minhashA(i: Int): Long = base60(s"minhash_a_$i") % (P - 1) + 1
  def minhashB(i: Int): Long = base60(s"minhash_b_$i") % P

  /** Polynomial rolling-hash bases for char-gram keys
    * ([[CharGramHashes]]) — md5-derived like every other engine constant,
    * so the oracle-SQL builder shares them and cannot drift. In
    * [256, P−1]: larger than the byte alphabet and small enough that
    * every rolling product stays < 2⁶² (see the overflow audit in
    * [[CharGramHashes]]).
    */
  val GramB1: Long = base60("chargram_b1") % (P - 256) + 256
  val GramB2: Long = base60("chargram_b2") % (P - 256) + 256

  /** b^k mod P — the per-position power-of-base literals the oracle SQL
    * inlines for the direct (non-rolling) per-gram polynomial.
    */
  def gramPow(b: Long, k: Int): Long = {
    var r = 1L
    var i = 0
    while (i < k) { r = r * b % P; i += 1 }
    r
  }

  /** Integer linear-classifier weight for (class, dim) — md5-derived in
    * [-8, 8] like every other engine constant, so the oracle's VALUES
    * relation renders from this same source of truth and the scores are
    * integer-exact in both engines ([[graft.operators.TextAnalysis.domainClassify]]).
    */
  def classifierWeight(cls: Int, dim: Int): Long =
    base60(s"dcls_${cls}_$dim") % 17 - 8

  /** ±1 hyperplane weight for (plane, dim) — random-hyperplane LSH for
    * embeddings (sign-random-projection).
    */
  def hyperplaneWeight(plane: Int, dim: Int): Double =
    if (base60(s"hp_${plane}_$dim") % 2 == 1) 1.0 else -1.0

  def hyperplane(plane: Int, dims: Int): Array[Double] =
    Array.tabulate(dims)(d => hyperplaneWeight(plane, d))
}

/** The engine's 60-bit md5-derived hash as ONE codegen'd expression.
  *
  * Equivalence to the composed string form: the first 15 hex chars of
  * the digest are the first 60 bits, i.e. the big-endian long of bytes
  * 0..7 with the low nibble of byte 7 dropped — `beLong >>> 4`. Always
  * in [0, 2⁶⁰), matching `('0x'||substr(md5(s),1,15))::BIGINT` in the
  * DuckDB oracle byte for byte.
  */
case class Base60Hash(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._

  override def dataType: DataType = LongType
  override def prettyName: String = "base60_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    Base60Hash.compute(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Base60Hash.compute($v);")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): Base60Hash =
    copy(child = newChild)
}

object Base60Hash {
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def compute(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = digest.get().digest(s.getBytes)
    val be =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    be >>> 4
  }
}
