package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, TextAnalysis}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("join-free scored projection matches the standalone frames bit-for-bit") {
    val docs = Tables.load(spark, sf, "documents")
    val fused = TextAnalysis.withPredLangAndQuality(docs)
      .select($"doc_id", $"pred_lang", $"quality")
    val joined = TextAnalysis.languageId(docs).select($"doc_id", $"pred_lang")
      .join(TextAnalysis.qualityScores(docs).select($"doc_id", $"quality"), "doc_id")
    assert(fused.exceptAll(joined).isEmpty && joined.exceptAll(fused).isEmpty)
  }

  test("curate == filter-then-dedup composition; filters strictly apply") {
    val docs = Tables.load(spark, sf, "documents")
    val curated = Curation.curate(docs, "en", 0.7)
    // composition equivalence against the join-based formulation
    val survivors = docs
      .join(TextAnalysis.languageId(docs).filter($"pred_lang" === "en").select("doc_id"), "doc_id")
      .join(TextAnalysis.qualityScores(docs).filter($"quality" >= 0.7).select("doc_id"), "doc_id")
    val expected = Dedup.exactDedup(survivors)
    assert(curated.exceptAll(expected).isEmpty && expected.exceptAll(curated).isEmpty)
    // non-trivial on the testdata: something survives AND something drops
    val n = curated.count()
    assert(n > 0 && n < docs.count())
  }

  test("curation filter reaches the scan as one projection (no pre-dedup shuffle)") {
    val docs = Tables.load(spark, sf, "documents")
    val q = Curation.curate(docs, "en", 0.7)
    q.collect()
    val p = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // language+quality filtering must not join the corpus to itself: the
    // only hash exchange is the dedup fingerprint aggregation
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected only the dedup exchange, got $exchanges")
    assert(!p.contains("SortMergeJoin"))
  }
}
