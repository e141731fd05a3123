package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions.{CharGramHashes, DetHash, GraftFunctions}

/** [[graft.functions.CharGramHashes]] — the fused rolling char-gram hash.
  * Pins (a) value equivalence with the composed
  * `array_distinct(transform(... substring ...))` + per-gram JVM polynomial
  * reference, (b) the edge cases the composed form defined (short/empty
  * input → empty set), and (c) the overflow-free constant ranges the
  * cross-engine argument relies on.
  */
class CharGramHashSpec extends SparkSpec {
  import spark.implicits._

  private def composedKeys(text: String, n: Int): Seq[Long] = {
    // reference semantics: normalize, materialize gram strings, distinct
    // in first-occurrence order, then the JVM-side polynomial per gram
    val norm = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
    (1 to math.max(norm.length - (n - 1), 0))
      .map(i => norm.substring(i - 1, i - 1 + n))
      .distinct.map(CharGramHashes.gramKey)
  }

  private def fusedKeys(text: String, n: Int): Seq[Long] =
    Seq(Tuple1(text)).toDF("text")
      .select(CharGramHashes.column(GraftFunctions.normalizeText(col("text")), n)
        .as("ks"))
      .collect()(0).getSeq[Long](0)

  test("fused keys equal composed-form keys, order included") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "The quick brown fox jumps over the lazy dog!",
      "aaaaaaaaaaaaaaaa", // max repetition: one distinct gram
      "a1 b2 c3 %% d4",
      "short",
      "ab", // shorter than n
      "")
    for (t <- texts; n <- Seq(3, 5, 7))
      assert(fusedKeys(t, n) == composedKeys(t, n), s"text='$t' n=$n")
  }

  test("positional keys: every window in order, duplicates kept, wide n ok") {
    import graft.functions.CharGramPosKeys
    def posKeys(text: String, n: Int): Seq[Long] =
      Seq(Tuple1(text)).toDF("text")
        .select(CharGramPosKeys.column(GraftFunctions.normalizeText(col("text")), n)
          .as("ks"))
        .collect()(0).getSeq[Long](0)
    def composedPos(text: String, n: Int): Seq[Long] = {
      val norm = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      (0 to norm.length - n).map(i => CharGramHashes.gramKey(norm.substring(i, i + n)))
    }
    val texts = Seq(
      "abcabcabc", // repeated windows must repeat in the output
      "the quick brown fox jumps over the lazy dog",
      "short", "ab", "")
    for (t <- texts; n <- Seq(3, 7, 30))
      assert(posKeys(t, n) == composedPos(t, n), s"text='$t' n=$n")
    // n beyond CharGramHashes' 8-gram bound: rolling == direct polynomial
    val wide = "a1 b2 c3 d4 e5 f6 g7 h8 i9 j0 k1 l2 m3 n4"
    assert(posKeys(wide, 40) == composedPos(wide, 40))
    assertThrows[IllegalArgumentException](CharGramPosKeys.column(col("text"), 65))
  }

  test("property: random alphanumeric strings match the composed form") {
    val gen = for {
      len <- Gen.choose(0, 60)
      cs <- Gen.listOfN(len, Gen.oneOf(('a' to 'z') ++ ('0' to '9') :+ ' '))
    } yield cs.mkString
    val texts = Gen.listOfN(40, gen).sample.get
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        CharGramHashes.column(GraftFunctions.normalizeText(col("text")), 5).as("ks"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == composedKeys(t, 5), s"text='$t'")
    }
  }

  test("keys are distinct, non-negative, and below 2^62") {
    val ks = fusedKeys("the quick brown fox jumps over the lazy dog", 5)
    assert(ks.nonEmpty && ks.distinct == ks)
    assert(ks.forall(k => k >= 0 && k < (1L << 62)))
  }

  test("null text yields null; bases are in the overflow-safe range") {
    val r = Seq(Tuple1(null: String)).toDF("text")
      .select(CharGramHashes.column(col("text"), 5)).collect()(0)
    assert(r.isNullAt(0))
    for (b <- Seq(DetHash.GramB1, DetHash.GramB2))
      assert(b >= 256 && b < DetHash.P)
    assert(DetHash.GramB1 != DetHash.GramB2)
  }
}
