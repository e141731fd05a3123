package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.scalacheck.Gen
import graft.functions.TextNorm

/** Round-16 native text normalization ([[graft.functions.TextNorm]]) —
  * pins VALUE EQUALITY against the original Catalyst formulations the
  * natives replaced, evaluated through Spark itself so both sides share
  * the engine's regex/lower/trim semantics exactly:
  *
  *   normalizeText ≡ trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))
  *   tokens        ≡ filter(split(text, "\\s+"), length(_) > 0)
  *
  * on adversarial fixed cases (unicode lowering edge cases incl. Turkish
  * İ and ß, combining marks, emoji, every ASCII whitespace byte, empty
  * and all-separator strings) plus randomized unicode/ASCII corpora.
  */
class TextNormEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private def originalNormalize(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  private def originalTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  private def check(inputs: Seq[String]): Unit = {
    val df = inputs.toDF("text")
    val rows = df.select(
      TextNorm.normalizeColumn(col("text")).as("n_new"),
      originalNormalize(col("text")).as("n_old"),
      TextNorm.tokensColumn(col("text")).as("t_new"),
      originalTokens(col("text")).as("t_old")).collect()
    rows.zip(inputs).foreach { case (r, in) =>
      assert(r.getString(0) == r.getString(1),
        s"normalize mismatch for ${in.getBytes("UTF-8").toSeq}")
      assert(r.getSeq[String](2) == r.getSeq[String](3),
        s"tokens mismatch for ${in.getBytes("UTF-8").toSeq}")
    }
  }

  test("fixed adversarial cases match the original expressions") {
    check(Seq(
      "", " ", "\t\n\u000b\f\r ", "a", "A", "  leading and trailing  ",
      "Hello, World! 123", "a--b__c  d", "ALL CAPS AND   RUNS!!!",
      "\u0130stanbul \u0131 I\u0307", // Turkish İ, dotless ı, I+combining dot
      "STRA\u00dfE gro\u00df", // ß: uppercase lowering identity
      "caf\u00e9 r\u00e9sum\u00e9", "\u00c9L\u00c8VE",
      "\ud83d\ude00 emoji \ud83c\udf89 party", // surrogate pairs
      "tabs\tand\nnewlines\rmixed\u000bwith\fspaces",
      "\u00a0nbsp is not java \\s\u00a0", // U+00A0: not split by \s
      "combining a\u0307 dot", "ｆｕｌｌｗｉｄｔｈ１２３",
      "Ｌａｔｉｎ Ｆｕｌｌ", "Ⅻ roman", "x" * 5000,
      ("word " * 200).trim, "\u0000null byte\u0000", "ended."))
  }

  test("random unicode and ASCII strings match the original expressions") {
    val asciiGen = Gen.listOf(Gen.choose(0.toChar, 127.toChar)).map(_.mkString)
    val uniGen = Gen.listOf(Gen.frequency(
      8 -> Gen.choose(0.toChar, 127.toChar),
      2 -> Gen.choose(0x80.toChar, 0x2fff.toChar))).map(_.mkString)
    val cases = (1 to 200).flatMap { i =>
      val seed = org.scalacheck.rng.Seed(i.toLong * 7919)
      Seq(asciiGen.pureApply(Gen.Parameters.default, seed),
        uniGen.pureApply(Gen.Parameters.default, seed))
    }
    check(cases)
  }

  test("nulls propagate like the originals") {
    val df = Seq[Option[String]](None, Some("a b")).toDF("text")
    val r = df.select(
      TextNorm.normalizeColumn(col("text")).as("n"),
      TextNorm.tokensColumn(col("text")).as("t")).collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))
    assert(r(1).getString(0) == "a b")
  }

  test("malformed UTF-8 takes the replacement-character split semantics") {
    // round 17 (ADVICE r16): the original split(text, "\\s+") round-trips
    // through java.lang.String, replacing invalid byte sequences with
    // U+FFFD before re-encoding its tokens. WsTokens now detects invalid
    // UTF-8 (structural scan, only on non-ASCII input) and recurses on
    // the identically-replaced bytes — these cases can't ride a
    // DataFrame (Java strings are always valid), so they pin the
    // function directly against new String(bytes, UTF_8).split.
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val cases: Seq[Array[Byte]] = Seq(
      Array(0xff.toByte),
      Array('a'.toByte, 0xc3.toByte), // truncated 2-byte tail
      Array('a'.toByte, 0xc3.toByte, ' '.toByte, 'b'.toByte),
      Array(0x80.toByte, 'x'.toByte), // bare continuation byte
      Array(0xe0.toByte, 0x80.toByte, 0x80.toByte), // overlong 3-byte
      Array(0xed.toByte, 0xa0.toByte, 0x80.toByte), // UTF-8-encoded surrogate
      Array(0xf4.toByte, 0x90.toByte, 0x80.toByte, 0x80.toByte), // > U+10FFFF
      Array(0xc0.toByte, 0xaf.toByte), // overlong 2-byte
      Array('h'.toByte, 'i'.toByte, 0xf0.toByte, ' '.toByte, 'y'.toByte),
      // and a VALID non-ASCII neighbour: must NOT take the fallback path
      "café  au\tlait".getBytes("UTF-8"))
    cases.foreach { b =>
      val got = TextNorm.tokens(UTF8String.fromBytes(b))
        .asInstanceOf[GenericArrayData].array.toSeq
        .map(_.asInstanceOf[UTF8String].toString)
      val want = new String(b, java.nio.charset.StandardCharsets.UTF_8)
        .split("\\s+").filter(_.nonEmpty).toSeq
      assert(got == want,
        s"token mismatch for bytes ${b.toSeq}: got $got want $want")
    }
  }
}
