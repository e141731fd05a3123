package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Effectiveness cases for the span scrub on crafted strings — the
  * registered `text_scrub` query proves engine-vs-oracle agreement on the
  * injected-span corpus; these prove the scrub actually does what the
  * placeholders claim (the synthetic corpus alone can't, having no
  * natural spans).
  */
class TextScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrubOne(text: String): (Long, Long, Long, String) = {
    val r = TextAnalysis.scrubbed(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
  }

  test("email spans are replaced and counted") {
    val (u, e, n, s) = scrubOne("mail bob.smith+x@corp.example.org now")
    assert((u, e, n) == (0L, 1L, 0L))
    assert(s == "mail <EMAIL> now")
  }

  test("URL wins over the digit run it contains (chain precedence)") {
    // the 7-digit run sits INSIDE the URL: it is counted (counts are per
    // pattern over the original text) but never separately replaced —
    // the URL collapses to one placeholder first
    val (u, e, n, s) = scrubOne("see https://a.b/c?id=1234567 done")
    assert((u, e, n) == (1L, 0L, 1L))
    assert(s == "see <URL> done")
  }

  test("digit runs: >=6 digits replaced, shorter left alone") {
    val (u, e, n, s) = scrubOne("acct 123456789 pin 12345 ok")
    assert((u, e, n) == (0L, 0L, 1L))
    assert(s == "acct <NUM> pin 12345 ok")
  }

  test("clean text is a byte-exact no-op with zero counts") {
    val t = "just ordinary words, nothing to scrub here."
    val (u, e, n, s) = scrubOne(t)
    assert((u, e, n) == (0L, 0L, 0L))
    assert(s == t)
  }

  test("multiple spans of each kind all collapse") {
    val (u, e, n, s) =
      scrubOne("a@b.co and c.d@e.org via http://x.y/1 https://z.w/2 id 000111222333")
    assert((u, e, n) == (2L, 2L, 1L))
    assert(s == "<EMAIL> and <EMAIL> via <URL> <URL> id <NUM>")
  }

  test("withInjectedSpans makes every synthetic row scrub-effective") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = TextAnalysis.scrubbed(TextAnalysis.withInjectedSpans(docs))
    val m = out.agg(
      min($"n_urls"), min($"n_emails"), min($"n_nums"), count(lit(1))).collect().head
    assert(m.getLong(3) > 0)
    assert(m.getLong(0) >= 1L, "every row needs an injected URL")
    assert(m.getLong(1) >= 1L, "every row needs an injected email")
    assert(m.getLong(2) >= 1L, "every row needs an injected digit run")
    // and the placeholders actually landed
    val one = out.orderBy($"doc_id").select($"scrubbed").limit(1)
      .collect().head.getString(0)
    assert(one.contains("<URL>") && one.contains("<EMAIL>") && one.contains("<NUM>"))
  }
}
