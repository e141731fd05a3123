package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** All DISTINCT character n-gram hashes of a normalized string in ONE
  * rolling pass — the fused form of
  * `array_distinct(transform(sequence(...), i -> substring(norm, i, n)))`
  * ([[GraftFunctions.charShinglesFromNorm]]), which materializes ~len(doc)
  * short gram STRINGS per document before anything can hash them. On char
  * 7-grams that string churn (allocation + copying, ~2k × 7-char strings
  * per sf0.1 document) was the measured dominant cost of the exact
  * char-jaccard query — not the hashing and not the join.
  *
  * The gram key is a pair of polynomial hashes over the gram's BYTES,
  * packed into one 62-bit long:
  *
  *   h_j(g) = (Σ_k byte(g, k) · B_j^(n-1-k)) mod P     (P = 2³¹−1)
  *   key(g) = h_1(g) · 2³¹ + h_2(g)
  *
  * evaluated as a rolling update (one multiply-add + one slide per window,
  * no per-gram allocation at all). Two independent 31-bit hashes make the
  * key space 2⁶² — collisions are negligible at any corpus size, and
  * because the DuckDB oracle computes the IDENTICAL key (per-gram direct
  * polynomial over `ascii(substr(...))` with the same [[DetHash.gramPow]]
  * power-of-base literals), a collision would affect both engines
  * identically — oracle comparison is bit-exact regardless.
  *
  * Contract: input must be ASCII (the output of
  * [[GraftFunctions.normalizeText]] — `[a-z0-9 ]` only). The JVM side
  * hashes bytes; the oracle hashes `ascii()` code points; the two agree
  * exactly on ASCII.
  *
  * Overflow audit (both engines, signed 64-bit): h < P < 2³¹ and
  * B < P keep every rolling product < 2⁶²; the packed key
  * h₁·2³¹ + h₂ < 2⁶²; the oracle's per-gram term ascii·B^k < 2⁷·2³¹ = 2³⁸,
  * summed over n ≤ 8 grams < 2⁴¹. Nothing wraps.
  *
  * Output order is first occurrence (same as `array_distinct`); downstream
  * treats the array as a set, but a pinned order keeps the expression
  * deterministic under retries.
  */
case class CharGramHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1 && n <= 8, "gram width must be in [1, 8]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    CharGramHashes.compute(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CharGramHashes.compute($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)
}

/** POSITIONAL sibling of [[CharGramHashes]]: the key of EVERY n-gram
  * window in position order, duplicates kept — `posexplode` over the
  * result yields the (position, gram-key) stream that substring-level
  * duplicate detection ([[graft.operators.Dedup.dupSpans]]) needs, where
  * the distinct form would erase both the positions and the within-doc
  * repeats that define a duplicated span.
  *
  * Same rolling update, constants and 62-bit packing as
  * [[CharGramHashes]] (one multiply-add + one slide per window, no
  * per-gram allocation); the DuckDB oracle computes the identical key
  * per position from the direct `ascii()` polynomial, so a (negligible,
  * 2⁻⁶²-scale) hash collision would affect both engines identically and
  * the oracle comparison stays bit-exact regardless.
  *
  * The window may be wider than [[CharGramHashes]]'s 8 (duplicated-SPAN
  * detection wants grams long enough to be meaningful — Lee et al. 2021
  * use 50-token windows; we bound at 64 chars): the rolling products stay
  * < 2⁶² for any n (h < P, B < P), and the oracle's per-position direct
  * polynomial sums n terms each < 2³⁸ — at n = 64 that is < 2⁴⁴, far from
  * wrapping signed 64-bit in either engine.
  */
case class CharGramPosKeys(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1 && n <= 64, "gram width must be in [1, 64]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_pos_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    CharGramPosKeys.compute(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CharGramPosKeys.compute($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharGramPosKeys =
    copy(child = newChild)
}

object CharGramPosKeys {

  /** Column API: every rolling char-gram key of a normalized string, in
    * position order (index i = gram starting at 0-based char i).
    */
  def column(norm: Column, n: Int): Column =
    GraftShim.column(CharGramPosKeys(GraftShim.expression(norm), n))

  def compute(s: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val m = len - n + 1
    val p = DetHash.P
    val b1 = DetHash.GramB1
    val b2 = DetHash.GramB2
    val pow1 = DetHash.gramPow(b1, n - 1)
    val pow2 = DetHash.gramPow(b2, n - 1)
    val out = new Array[Long](m)

    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < n) { // first window
      val c = bytes(i) & 0xff
      h1 = (h1 * b1 + c) % p
      h2 = (h2 * b2 + c) % p
      i += 1
    }
    var w = 0
    while (w < m) {
      out(w) = (h1 << 31) + h2
      if (w + 1 < m) { // slide: drop bytes(w), add bytes(w + n)
        val cOut = bytes(w) & 0xff
        val cIn = bytes(w + n) & 0xff
        h1 = (((h1 - cOut * pow1) % p + p) % p * b1 + cIn) % p
        h2 = (((h2 - cOut * pow2) % p + p) % p * b2 + cIn) % p
      }
      w += 1
    }
    new GenericArrayData(out)
  }
}

object CharGramHashes {

  /** Column API: distinct rolling char-gram keys of a normalized string. */
  def column(norm: Column, n: Int): Column =
    GraftShim.column(CharGramHashes(GraftShim.expression(norm), n))

  /** JVM-side key of one gram string — the constant source of truth shared
    * with the oracle-SQL builder and the equivalence spec.
    */
  def gramKey(g: String): Long = {
    val bytes = g.getBytes("UTF-8")
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i) & 0xff
      h1 = (h1 * DetHash.GramB1 + c) % DetHash.P
      h2 = (h2 * DetHash.GramB2 + c) % DetHash.P
      i += 1
    }
    (h1 << 31) + h2
  }

  def compute(s: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val m = len - n + 1
    val p = DetHash.P
    val b1 = DetHash.GramB1
    val b2 = DetHash.GramB2
    val pow1 = DetHash.gramPow(b1, n - 1)
    val pow2 = DetHash.gramPow(b2, n - 1)

    // open-addressing distinct set over the packed keys (all ≥ 0; -1 = empty)
    val cap = java.lang.Integer.highestOneBit(math.max(4, m * 2 - 1)) << 1
    val table = new Array[Long](cap)
    java.util.Arrays.fill(table, -1L)
    val mask = cap - 1
    val out = new Array[Long](m)
    var cnt = 0

    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < n) { // first window
      val c = bytes(i) & 0xff
      h1 = (h1 * b1 + c) % p
      h2 = (h2 * b2 + c) % p
      i += 1
    }
    var w = 0
    while (w < m) {
      val key = (h1 << 31) + h2
      var slot = (key ^ (key >>> 33)).toInt & mask
      var seen = false
      var probing = true
      while (probing) {
        val t = table(slot)
        if (t == -1L) { table(slot) = key; probing = false }
        else if (t == key) { seen = true; probing = false }
        else slot = (slot + 1) & mask
      }
      if (!seen) { out(cnt) = key; cnt += 1 }
      if (w + 1 < m) { // slide: drop bytes(w), add bytes(w + n)
        val cOut = bytes(w) & 0xff
        val cIn = bytes(w + n) & 0xff
        h1 = (((h1 - cOut * pow1) % p + p) % p * b1 + cIn) % p
        h2 = (((h2 - cOut * pow2) % p + p) % p * b2 + cIn) % p
      }
      w += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }
}
