package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** [[graft.operators.TextAnalysis.repetitionSignals]] — Gopher-style
  * repetition filters. Crafted cases pin the signal definitions
  * (excess-duplicate fractions, top-2-gram dominance) and that natural
  * prose passes while templated/looping text trips the flag.
  */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def signals(texts: (Long, String)*) =
    TextAnalysis.repetitionSignals(
      texts.toDF("doc_id", "text").withColumn("lang", lit("en"))
        .withColumn("source", lit("s")))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("duplicate lines: excess fraction counts repeats, trims whitespace") {
    val m = signals(
      (1L, "click here to win\nsome real content\nclick here to win  \nmore content"),
      (2L, "alpha\nbravo\ncharlie"))
    // doc 1: 4 non-empty lines, 3 distinct (trimmed dup) -> 1/4
    assert(m(1L).getAs[Long]("n_lines") == 4L)
    assert(m(1L).getAs[Double]("dup_line_frac") == 0.25)
    assert(m(2L).getAs[Double]("dup_line_frac") == 0.0)
  }

  test("top 2-gram dominance catches a degenerate loop") {
    val loop = Seq.fill(30)("buy now").mkString(" ") // "buy now buy now ..."
    val m = signals((1L, loop), (2L, "the quick brown fox jumps over the lazy dog today"))
    // 60 tokens -> 59 2-gram occurrences; "buy now" appears 30, "now buy" 29
    assert(m(1L).getAs[Double]("top_2gram_frac") > 0.5)
    assert(m(1L).getAs[Boolean]("repetitive"))
    assert(m(2L).getAs[Double]("top_2gram_frac") <= 0.2)
    assert(!m(2L).getAs[Boolean]("repetitive"))
  }

  test("duplicate 3-grams: excess fraction over occurrences") {
    val m = signals(
      (1L, "one two three four one two three four one two three four"),
      (2L, "every token here is entirely different from all the others"))
    // 12 tokens -> 10 3-gram occurrences, 4 distinct -> 6/10
    assert(m(1L).getAs[Double]("dup_3gram_frac") == 0.6)
    assert(m(2L).getAs[Double]("dup_3gram_frac") == 0.0)
  }

  test("empty and single-token docs yield zeros, not division errors") {
    val m = signals((1L, ""), (2L, "word"))
    for (id <- Seq(1L, 2L)) {
      assert(m(id).getAs[Double]("dup_line_frac") == 0.0)
      assert(m(id).getAs[Double]("dup_3gram_frac") == 0.0)
      assert(!m(id).getAs[Boolean]("repetitive"))
    }
    // a lone token yields NO 2-grams (no full window) — a short-remainder
    // gram would read as multiplicity 1-of-1 and flag the doc
    assert(m(2L).getAs[Double]("top_2gram_frac") == 0.0)
  }

  test("max multiplicity equals the direct per-distinct count") {
    // the Spark side counts the longest equal-run after a sort; pin it
    // against a brute-force multiplicity count on the same data
    val texts = Seq(
      (1L, "a b a b a c d c"),
      (2L, "x y z x y z x y"),
      (3L, "solo"))
    val got = signals(texts: _*)
    texts.foreach { case (id, t) =>
      val toks = t.split("\\s+").filter(_.nonEmpty)
      val g2 =
        if (toks.length < 2) Seq.empty[String]
        else (0 to toks.length - 2).map(i => toks.slice(i, i + 2).mkString(" "))
      val expect =
        if (g2.isEmpty) 0.0
        else {
          val top = g2.groupBy(identity).values.map(_.size).max
          val raw = top.toDouble / g2.size
          math.rint(raw * 1e6) / 1e6
        }
      assert(got(id).getAs[Double]("top_2gram_frac") == expect, s"doc $id")
    }
  }

  test("token rarity: df over distinct tokens, hapax count, exact mean") {
    // dfs: shared=3, alpha=2, beta=1, gamma=1, delta=2, "shared shared"
    // in doc 3 counts once (distinct within doc)
    val docs = Seq(
      (1L, "shared alpha beta"),
      (2L, "shared alpha delta"),
      (3L, "shared shared gamma delta"),
      (4L, "")
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
    val got = TextAnalysis.tokenRarity(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((3L, 1L, 1L, 2.0)))    // dfs {3,2,1}
    assert(got(2L) == ((3L, 2L, 0L, 2.3333))) // dfs {3,2,2}, 7/3 rounded
    assert(got(3L) == ((3L, 1L, 1L, 2.0)))    // dfs {3,1,2}
    assert(!got.contains(4L)) // tokenless docs drop out (matches oracle)
  }

  test("unigram surprisal: exact micro-nat totals against a hand unigram LM") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b"),  // common tokens → low surprisal
      (2L, "c"),      // hapax-only → high surprisal
      (3L, "")        // tokenless → drops out
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
    val got = TextAnalysis.unigramSurprisal(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def qln(x: Double): Long = math.floor(math.log(x) * 1e6 + 0.5).toLong
    // tf: a=2, b=1, c=1; T=4
    val d1 = 3 * qln(4) - (2 * qln(2) + qln(1))
    val d2 = 1 * qln(4) - qln(1)
    def r4(x: Double): Double = // Spark round() is HALF_UP, not rint's half-even
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((3L, d1, r4(d1 / 3.0 / 1e6))))
    assert(got(2L) == ((1L, d2, r4(d2 / 1.0 / 1e6))))
    assert(!got.contains(3L))
    // the ordering the filter consumes: rare-token doc is more surprising
    assert(got(2L)._3 > got(1L)._3)
  }

  test("bigram surprisal: exact transition NLL against a hand bigram LM") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"), // transitions: ab, ba, ab
      (2L, "a c"),     // transition: ac
      (3L, "x")        // no transitions → drops out
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
    val got = TextAnalysis.bigramSurprisal(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def qln(x: Double): Long = math.floor(math.log(x) * 1e6 + 0.5).toLong
    // c2: "a b"=2, "b a"=1, "a c"=1; c1p: a=3, b=1
    // doc1: [qln(3)-qln(2)] + [qln(1)-qln(1)] + [qln(3)-qln(2)]
    val d1 = 2 * (qln(3) - qln(2))
    // doc2: qln(3) - qln(1)
    val d2 = qln(3)
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((3L, d1, r4(d1 / 3.0 / 1e6))))
    assert(got(2L) == ((1L, d2, r4(d2 / 1.0 / 1e6))))
    assert(!got.contains(3L))
    // the unseen-ish transition (P=1/3) is more surprising than the
    // dominant one (P=2/3): doc2 outranks doc1
    assert(got(2L)._3 > got(1L)._3)
  }

  test("vocabulary: frequency-ranked top-V with deterministic tie-break") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b b b a a c"), (2L, "a d c")
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
    val got = TextAnalysis.vocabulary(docs, 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // tf: a=3, b=3, c=2, d=1 → top3 = a(1), b(2) [tie broken by token], c(3)
    assert(got.toSeq == Seq(("a", 3L, 1L), ("b", 3L, 2L), ("c", 2L, 3L)))
  }

  test("novelty: shared grams score 0, unique grams score 1, grams hashed once") {
    import spark.implicits._
    // docs 1/2 share their single 3-gram exactly (df=2 → not novel);
    // doc 3's grams appear nowhere else (fully novel); doc 4 mixes: one
    // gram shared with doc 5, two grams unique
    val docs = Seq(
      (1L, "the quick fox"), (2L, "the quick fox"),
      (3L, "entirely unique trigram here"),
      (4L, "alpha beta gamma delta shared tail end"),
      (5L, "wholly other prefix shared tail end")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.novelty(docs, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((1L, 0L, 0.0)) && got(2L) == ((1L, 0L, 0.0)))
    assert(got(3L) == ((2L, 2L, 1.0)))
    // doc 4: grams {alpha beta gamma, beta gamma delta, gamma delta shared,
    // delta shared tail, shared tail end} — only the last is shared (df 2)
    assert(got(4L) == ((5L, 4L, 0.8)))
    // one corpus scan + exactly two exchanges (gram window, doc_id agg)
    // pre-execution plan: single tree (no AQE Final/Initial duplication)
    val q = TextAnalysis.novelty(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), 8)
    val p = q.queryExecution.executedPlan.toString
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(scans == 1, s"corpus scanned $scans times")
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges")
  }
}
