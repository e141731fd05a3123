package graft

import org.apache.spark.sql.functions._
import graft.functions.{DetHash, GraftFunctions => F}

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("DetHash base60: Spark expression equals JVM computation") {
    val inputs = Seq("", "hello", "the quick brown fox", "água é vida")
    val got = inputs.toDF("s").select(DetHash.base60(col("s"))).as[Long].collect()
    assert(got.toSeq == inputs.map(DetHash.base60))
  }

  test("minhash coefficients are in range and deterministic") {
    (0 until 64).foreach { i =>
      val a = DetHash.minhashA(i)
      val b = DetHash.minhashB(i)
      assert(a >= 1 && a < DetHash.P)
      assert(b >= 0 && b < DetHash.P)
      assert(a == DetHash.minhashA(i)) // stable
    }
  }

  test("dateToString handles pre-1970 dates (negative epoch days)") {
    // reference README.md:221-224: births before 1970 surface as negative INTs
    val got = Seq(-1, 0, 1, 18262).toDF("d")
      .select(F.dateToString(F.epochDaysToDate(col("d")), "yyyy-MM-dd"))
      .as[String].collect().toSeq
    assert(got == Seq("1969-12-31", "1970-01-01", "1970-01-02", "2020-01-01"))
  }

  test("timestampToString millis precision, UTC") {
    val got = Seq(0L, 1704067199999L).toDF("t")
      .select(F.timestampToString(F.epochMillisToTimestamp(col("t")),
        "yyyy-MM-dd HH:mm:ss.SSS"))
      .as[String].collect().toSeq
    assert(got == Seq("1970-01-01 00:00:00.000", "2023-12-31 23:59:59.999"))
  }

  test("tokens filters empties; tokenCount; bpeish counts runs + punct") {
    val df = Seq("  a  b   c ", "", "don't stop, now!").toDF("t")
    assert(df.select(F.tokenCount(col("t"))).as[Int].collect().toSeq == Seq(3, 0, 3))
    // don't stop, now! -> [don][']([t]... runs: don,t,stop,now alnum + ' , !
    assert(df.select(F.bpeishTokenCount(col("t"))).as[Long].collect().toSeq
      == Seq(3, 0, 7))
  }

  test("normalizeText + fingerprint: case/punct-insensitive identity") {
    val df = Seq("Hello,   World!", "hello world", "HELLO WORLD?").toDF("t")
    val fps = df.select(F.fingerprint(col("t"))).as[String].collect().toSeq
    assert(fps.distinct.size == 1)
  }

  test("wordShingles n=3 on 5 tokens gives 3 shingles; short docs degrade") {
    val got = Seq("a b c d e", "a b", "").toDF("t")
      .select(col("t"), F.tokens(F.normalizeText(col("t"))).as("tk"))
      .select(F.shinglesFromTokens(col("tk"), 3))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("a b c", "b c d", "c d e"))
    assert(got(1) == Seq("a b"))
    assert(got(2) == Seq()) // empty doc → empty set, same as char shingles
  }

  test("jaccard of array columns") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val got = df.select(F.jaccard(col("x"), col("y"))).as[Double].collect()(0)
    assert(math.abs(got - 0.5) < 1e-12)
  }

  test("vectorDot edges: length mismatch → null (ragged data), null array → null") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f, 3.0f)), Some(Seq(10.0f, 10.0f))),
      (Some(Seq(1.0f, 2.0f)), Some(Seq(10.0f, 10.0f))),
      (None: Option[Seq[Float]], Some(Seq(1.0f)))).toDF("a", "b")
    val got = df.select(graft.functions.VectorMath.vectorDot(col("a"), col("b")))
      .collect()
    assert(got(0).isNullAt(0))          // ragged → null, not a partial dot
    assert(got(1).getDouble(0) == 30.0)
    assert(got(2).isNullAt(0))          // null-intolerant
  }

  test("vectorDot interpreted eval matches codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val e = graft.functions.VectorDot(
      Literal.create(Seq(0.5f, -1.5f), ArrayType(FloatType)),
      Literal.create(Seq(2.0, 4.0), ArrayType(DoubleType)))
    assert(e.eval(null) == (0.5 * 2.0 + -1.5 * 4.0))
  }

  test("cosineSimilarity: unit parallel = 1, orthogonal = 0") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(2.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 3.0f))).toDF("a", "b")
    val got = df.select(F.cosineSimilarity(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12 && math.abs(got(1)) < 1e-12)
  }

  test("ratios: empty text yields 0, not NaN") {
    val df = Seq("").toDF("t")
    val r = df.select(F.punctRatio(col("t")), F.alphaRatio(col("t")),
      F.stopwordRatio(col("t"))).as[(Double, Double, Double)].collect()(0)
    assert(r == ((0.0, 0.0, 0.0)))
  }
}
