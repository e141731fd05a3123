package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native forms of the two hottest scalar expressions in the engine
  * (round-16 profiling: the `trim(regexp_replace(lower(text), …))` +
  * `filter(split(text, "\\s+"), …)` chains cost 6-8 s of executor CPU
  * per evaluating stage at sf0.1, re-entered by ~60 registered queries
  * through fingerprints, word shingles, token counts and the text
  * family — java.util.regex per document was the single largest CPU
  * line in the dedup profiles).
  *
  * Both are VALUE-EXACT replacements, not approximations, so every
  * oracle row is unchanged:
  *
  *  - [[WsTokens]] (`split(text, "\\s+")` + drop-empties): Java's `\s`
  *    without UNICODE_CHARACTER_CLASS is exactly the six ASCII bytes
  *    {TAB, LF, VT, FF, CR, SPACE}, and no multi-byte UTF-8 sequence
  *    contains bytes < 0x80 — so emitting maximal runs of non-ws BYTES
  *    reproduces the regex split (with its leading/trailing-empty
  *    filtering) for EVERY input, no fallback needed.
  *  - [[NormalizeText]] (`trim(regexp_replace(lower(text),
  *    "[^a-z0-9]+", " "))`): pure-ASCII inputs (one byte per char) take
  *    a single fused scan — per-byte lowercase, collapse non-alnum runs
  *    to one interior space, implicit trim. Any input with a byte ≥
  *    0x80 falls back to the EXACT original pipeline — the same
  *    `UTF8String.toLowerCase`, the same compiled `[^a-z0-9]+` java
  *    regex, the same `UTF8String.trim` Spark's Lower/RegExpReplace/
  *    StringTrim call — so unicode edge cases (Turkish İ, ß, combining
  *    marks) produce byte-identical output by construction.
  *
  * TextNormEquivalenceSpec pins both against the original expression
  * formulations on adversarial inputs and random unicode strings.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    TextNorm.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextNorm.normalize($v);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

case class WsTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ws_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    TextNorm.tokens(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextNorm.tokens($v);")

  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}

object TextNorm {

  def normalizeColumn(text: Column): Column =
    GraftShim.column(NormalizeText(GraftShim.expression(text)))

  def tokensColumn(text: Column): Column =
    GraftShim.column(WsTokens(GraftShim.expression(text)))

  /** The exact pattern `GraftFunctions.normalizeText` compiled — shared
    * by the non-ASCII fallback so engine semantics cannot drift from the
    * documented original expression.
    */
  private val NonAlnum = java.util.regex.Pattern.compile("[^a-z0-9]+")

  def normalize(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val len = b.length
    var ascii = true
    var i = 0
    while (i < len) { if (b(i) < 0) { ascii = false; i = len }; i += 1 }
    if (!ascii) return normalizeFallback(s)
    // fused lowercase + collapse-runs-to-one-space + trim; output never
    // exceeds input length (a run of k >= 1 separators yields <= 1 byte)
    val out = new Array[Byte](len)
    var o = 0
    var pending = false
    i = 0
    while (i < len) {
      var c = b(i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pending) { out(o) = ' '; o += 1; pending = false }
        out(o) = c; o += 1
      } else if (o > 0) pending = true
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** Byte-identical recreation of
    * `trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))` for inputs
    * with non-ASCII bytes: the same UTF8String.toLowerCase Spark's Lower
    * calls, the same compiled java regex RegExpReplace uses (replacement
    * " " has no $/\ escapes, so replaceAll is the appendReplacement
    * loop's result verbatim), the same UTF8String.trim StringTrim calls.
    */
  private def normalizeFallback(s: UTF8String): UTF8String =
    UTF8String
      .fromString(NonAlnum.matcher(s.toLowerCase.toString).replaceAll(" "))
      .trim()

  private def isWs(c: Byte): Boolean =
    c == 0x20 || (c >= 0x09 && c <= 0x0d)

  /** Structural UTF-8 validity over a byte slice that contains at least
    * one byte >= 0x80 (callers skip the scan for pure-ASCII input).
    * Overlong/surrogate/out-of-range checks included — the same byte
    * sequences `new String(bytes, UTF_8)` would replace with U+FFFD.
    */
  private def isValidUtf8(b: Array[Byte], len: Int): Boolean = {
    var i = 0
    while (i < len) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation byte or overlong C0/C1
      else if (c < 0xe0) { // 2-byte
        if (i + 1 >= len || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) { // 3-byte
        if (i + 2 >= len) return false
        val c1 = b(i + 1) & 0xff
        val lo = if (c == 0xe0) 0xa0 else 0x80 // no overlong
        val hi = if (c == 0xed) 0x9f else 0xbf // no surrogates
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80) return false
        i += 3
      } else if (c < 0xf5) { // 4-byte
        if (i + 3 >= len) return false
        val c1 = b(i + 1) & 0xff
        val lo = if (c == 0xf0) 0x90 else 0x80 // no overlong
        val hi = if (c == 0xf4) 0x8f else 0xbf // <= U+10FFFF
        if (c1 < lo || c1 > hi || (b(i + 1) & 0xc0) != 0x80 ||
          (b(i + 2) & 0xc0) != 0x80 || (b(i + 3) & 0xc0) != 0x80) return false
        i += 4
      } else return false // F5..FF never valid
    }
    true
  }

  def tokens(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val len = b.length
    var n = 0
    var i = 0
    var inTok = false
    var hasHigh = false
    while (i < len) { // count runs first: exact-sized output array
      if (b(i) < 0) hasHigh = true
      val ws = isWs(b(i))
      if (!ws && !inTok) n += 1
      inTok = !ws
      i += 1
    }
    // MALFORMED-UTF-8 fallback (round 17, ADVICE r16): the original
    // split(text, "\\s+") round-trips through java.lang.String, which
    // replaces every invalid byte sequence with U+FFFD before the split
    // re-encodes its tokens — so for invalid input the byte-run tokens
    // would differ from the regex split's. Re-encoding via toString
    // applies the identical replacement; byte-run tokenization of VALID
    // UTF-8 equals the regex split (the `\s` bytes argument above), so
    // recursing on the replaced (always-valid) bytes is value-exact for
    // every input. Valid non-ASCII pays one structural scan, nothing
    // else; pure ASCII skips even that.
    if (hasHigh && !isValidUtf8(b, len))
      return tokens(UTF8String.fromString(s.toString))
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    var k = 0
    i = 0
    while (i < len) {
      if (!isWs(b(i))) {
        val start = i
        while (i < len && !isWs(b(i))) i += 1
        out(k) = UTF8String.fromBytes(b, start, i - start)
        k += 1
      } else i += 1
    }
    new GenericArrayData(out)
  }
}
