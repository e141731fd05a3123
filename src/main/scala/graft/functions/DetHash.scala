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

  /** 60-bit integer from md5, as a Column. */
  def base60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

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

  /** ±1 hyperplane weight for (plane, dim) — random-hyperplane LSH for
    * embeddings (sign-random-projection).
    */
  def hyperplaneWeight(plane: Int, dim: Int): Double =
    if (base60(s"hp_${plane}_$dim") % 2 == 1) 1.0 else -1.0

  def hyperplane(plane: Int, dims: Int): Array[Double] =
    Array.tabulate(dims)(d => hyperplaneWeight(plane, d))
}
