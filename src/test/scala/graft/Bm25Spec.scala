package graft

import graft.operators.TextAnalysis

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("docs containing no query term are excluded") {
    val docs = docsOf(1L -> "vector query", 2L -> "nothing relevant here")
    val got = TextAnalysis.bm25TopK(docs, Seq("vector", "query", "dup"))
      .select($"doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("rare term outweighs common terms (idf ordering)") {
    // "rare" appears in 1 of 5 docs, "common" in all 5 — one "rare" hit
    // must beat one "common" hit at equal length
    val docs = docsOf(
      1L -> "common alpha beta gamma",
      2L -> "common delta epsilon zeta",
      3L -> "rare alpha beta gamma",
      4L -> "common eta theta iota",
      5L -> "common kappa lambda mu")
    val top = TextAnalysis.bm25TopK(docs, Seq("common", "rare"))
      .select($"doc_id").as[Long].head()
    assert(top == 3L)
  }

  test("tfidf: corpus-wide terms score exactly 0, rare terms dominate") {
    val docs = docsOf(
      1L -> "shared unicorn shared",
      2L -> "shared pebble",
      3L -> "shared granite")
    val got = TextAnalysis.tfidfKeywords(docs, 2)
      .select($"doc_id", $"tok", $"score_micro").as[(Long, String, Long)]
      .collect().toSeq.sortBy(r => (r._1, -r._3, r._2))
    // "shared" is in all 3 docs -> qln_n - qln_df = 0 -> score 0
    assert(got.filter(_._2 == "shared").forall(_._3 == 0L))
    // each doc's top keyword is its unique term with score tf * qln(3)
    val qln3 = math.floor(math.log(3.0) * 1e6 + 0.5).toLong
    assert(got.filter(_._1 == 1L).head == ((1L, "unicorn", qln3)))
    assert(got.filter(_._1 == 2L).head == ((2L, "pebble", qln3)))
  }

  test("tfidf: topK bounds output and ties break on token") {
    val docs = docsOf(
      1L -> "zeta alpha beta gamma",
      2L -> "other words here")
    val got = TextAnalysis.tfidfKeywords(docs, 3)
      .filter($"doc_id" === 1L)
      .select($"tok", $"rk").as[(String, Long)].collect().toSeq.sortBy(_._2)
    // all four tokens tie on score (tf=1, df=1) -> rank by token asc
    assert(got == Seq(("alpha", 1L), ("beta", 2L), ("gamma", 3L)))
  }

  test("length normalization: same tf, shorter doc scores higher") {
    val docs = docsOf(
      1L -> "query alpha",
      2L -> ("query " + Seq.fill(40)("filler").mkString(" ")))
    val got = TextAnalysis.bm25TopK(docs, Seq("query"))
      .select($"doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L))
  }

  test("odds-ratio idf agrees with true ln-BM25 at the head of the ranking") {
    val docs = Tables.load(spark, sf, "documents")
    val odds = TextAnalysis.bm25TopK(docs).select($"doc_id").as[Long].collect().toSeq
    val ln = TextAnalysis.bm25TopK(docs, logIdf = true)
      .select($"doc_id").as[Long].collect().toSeq
    // the odds ratio weighs rare terms more aggressively than its log, so
    // deep positions can reorder — but the head (rare-term hits dominate)
    // and the retrieved set must agree
    assert(odds.take(5) == ln.take(5), s"odds=$odds ln=$ln")
    assert(odds.toSet.intersect(ln.toSet).size >= 16, s"odds=$odds ln=$ln")
  }

  test("no per-doc data on any exchange: stats reduce to one broadcast row") {
    val df = TextAnalysis.bm25TopK(Tables.load(spark, sf, "documents"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    // the only join is the broadcast of the 1-row stats frame
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"plan:\n$plan")
  }
}
