package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** MEASURES the recall trade [[Dedup.containmentPairsLsh]]'s scaladoc
  * states in prose — the banded minhash gate is jaccard-shaped, so a
  * contained doc dwarfed by its container (|B| ≫ |A| ⇒ jaccard ≈ 1/ratio)
  * may never band-collide — and PINS the measured curve the way
  * SimilaritySpec pins `sim_topk_pq`'s recall@20, so the trade the
  * at-scale twin makes is a number, not narrative.
  *
  * Fixture: a quote-in-document sweep. 50 deterministic 60-word quotes;
  * for each size ratio r the quote is embedded verbatim (contiguous, so
  * every quote n-gram survives) in a distinct-filler container of
  * ~60·r words — exact directed containment 1.0 at every ratio, jaccard
  * ≈ 58/(60r−2). With the engine's 4-band × 4-row minhash split the
  * analytic collision probability is 1−(1−j⁴)⁴: ≈ 92% at ratio 1.2,
  * ≈ 21% at 2, ≈ 5% at 3, < 1% past 5 — the measured counts below agree,
  * and everything is deterministic (seeded fixture, seeded minhash), so
  * the pins are exact.
  *
  * What this licenses: the LSH twin is the at-scale gate for
  * duplicate-family-driven corpora (near-identical texts, jaccard near
  * 1), NOT a quote-extraction tool — a pipeline hunting small-quote
  * containment at scale needs the exact pigeonhole form
  * ([[Dedup.containmentPairs]], auto-sliced past the corpus bound) or
  * the persisted-index incremental path, both of which stay registered.
  */
class ContainmentLshRecallSpec extends SparkSpec {
  import spark.implicits._

  private val NQuotes = 50
  private val QuoteWords = 60
  private val Ratios = Seq(1.2, 2.0, 3.0, 5.0, 10.0, 20.0, 50.0)

  // deterministic corpus: quotes + one container per (quote, ratio)
  private lazy val fixture = {
    val rnd = new scala.util.Random(0xC0FFEE)
    def words(k: Int): IndexedSeq[String] =
      IndexedSeq.fill(k)("w" + rnd.nextInt(500))
    val quotes = (0 until NQuotes).map(i => (i.toLong, words(QuoteWords)))
    val containers = for {
      (ri, r) <- Ratios.zipWithIndex.map(_.swap)
      (qi, q) <- quotes
    } yield {
      val total = math.round(QuoteWords * r).toInt
      val filler = words(total - QuoteWords)
      val at = rnd.nextInt(filler.size + 1)
      val text = (filler.take(at) ++ q ++ filler.drop(at)).mkString(" ")
      ((ri + 1) * 10000L + qi, text)
    }
    (quotes.map { case (id, q) => (id, q.mkString(" ")) } ++ containers)
      .toDF("doc_id", "text")
  }
  private def ratioOf(containerId: Long): Double =
    Ratios((containerId / 10000L).toInt - 1)

  test("fixture: every (quote, container) pair is exact containment 1.0 at every ratio") {
    val exact = Dedup.containmentPairs(fixture, 3, 0.9)
      .as[(Long, Long, Double)].collect()
    val quoteInContainer = exact.filter { case (a, b, _) => a < 10000L && b >= 10000L }
    // 50 quotes × 7 ratios, all at containment 1.0 (verbatim embedding)
    assert(quoteInContainer.length == NQuotes * Ratios.size,
      s"expected ${NQuotes * Ratios.size} exact pairs, got ${quoteInContainer.length}")
    assert(quoteInContainer.forall(_._3 == 1.0))
    // and nothing else: quotes don't contain quotes, containers don't
    // contain containers or quotes (fillers are distinct)
    assert(exact.length == quoteInContainer.length,
      s"unexpected extra exact pairs: ${exact.filterNot(quoteInContainer.contains).take(5).toSeq}")
  }

  test("LSH twin is a strict subset of the exact relation (verify is exact — precision 1.0)") {
    val exact = Dedup.containmentPairs(fixture, 3, 0.9)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = Dedup.containmentPairsLsh(fixture, 3, 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(lsh.subsetOf(exact),
      s"LSH emitted pairs outside the exact relation: ${(lsh -- exact).take(5)}")
  }

  test("measured recall curve vs container/contained size ratio (deterministic pins)") {
    val lsh = Dedup.containmentPairsLsh(fixture, 3, 0.9)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => a < 10000L && b >= 10000L }
    val hits: Map[Double, Int] = lsh.groupBy(p => ratioOf(p._2))
      .view.mapValues(_.length).toMap
    val curve = Ratios.map(r => r -> hits.getOrElse(r, 0))
    info("measured recall curve (hits / " + NQuotes + "): " +
      curve.map { case (r, h) => s"ratio $r -> $h" }.mkString(", "))
    val byRatio = curve.toMap
    // the anchor: near-duplicate-shaped containment (ratio 1.2,
    // jaccard ≈ 0.83) is caught almost always — the regime the
    // twin exists for
    assert(byRatio(1.2) >= 44, s"ratio 1.2 recall collapsed: ${byRatio(1.2)}/$NQuotes")
    // the documented decay: jaccard ≈ 1/ratio starves the band gate
    assert(curve.map(_._2).sliding(2).forall(w => w(1) <= w(0) + 2),
      s"recall must decay (noise margin 2) with size ratio: $curve")
    // past ratio 10 the gate is effectively blind — the honest number
    // behind the scaladoc's "recall narrows to bounded size ratios"
    Seq(10.0, 20.0, 50.0).foreach { r =>
      assert(byRatio(r) <= 2, s"ratio $r should be near-blind, got ${byRatio(r)}/$NQuotes")
    }
    // deterministic pins WITH a per-ratio tolerance (r13 advisory):
    // the run is seeded, but the seeding rides Spark's hash internals —
    // a Spark upgrade re-rolling the minhash permutations is binomial
    // re-noise, not a banding change, and the recall GUARANTEE already
    // lives in the >=44 / <=2 bounds above. The tolerance only has to
    // catch structural drift (a band-width or fixture change moves the
    // curve by tens), so it is sized at ~2σ of the binomial the counts
    // are (n = 50, p up to 0.92 → σ up to ~3.5; the r14 advisory: ±3
    // was TIGHTER than the noise it claimed to absorb).
    val drift = Ratios.map(r =>
      r -> math.abs(byRatio(r) - PinnedCurve(r))).filter(_._2 > PinTolerance)
    assert(drift.isEmpty,
      s"measured curve drifted >±$PinTolerance from the pinned one at $drift: $curve vs $PinnedCurve")
  }

  /** The measured curve, pinned to ±[[PinTolerance]] (see the test's
    * info line): recall 92% at size ratio 1.2, 24% at 2, 2% at 3, blind
    * past 5 — the analytic 1−(1−j⁴)⁴ within binomial wobble at every
    * point.
    */
  private val PinnedCurve: Map[Double, Int] =
    Map(1.2 -> 46, 2.0 -> 12, 3.0 -> 1, 5.0 -> 0,
      10.0 -> 0, 20.0 -> 0, 50.0 -> 0)
  private val PinTolerance = 8
}
