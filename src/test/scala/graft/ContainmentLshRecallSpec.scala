package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** MEASURES the recall trade of [[Dedup.containmentPairsLsh]]'s banded
  * gate — and, since round 16, the LIFT the asymmetric size-stratified
  * tier buys over the symmetric-only gate (the r15 verdict: 24% recall
  * at size ratio 2 missed 3 of 4 true quote-in-document pairs in the
  * most common real regime). Both curves are pinned the way
  * SimilaritySpec pins `sim_topk_pq`'s recall@20, so the trade the
  * at-scale twin makes is a number, not narrative.
  *
  * Fixture: a quote-in-document sweep. 50 deterministic 60-word quotes;
  * for each size ratio r the quote is embedded verbatim (contiguous, so
  * every quote n-gram survives) in a distinct-filler container of
  * ~60·r words — exact directed containment 1.0 at every ratio, jaccard
  * ≈ 58/(60r−2).
  *
  * SYMMETRIC-ONLY gate (4-band × 4-row minhash; `maxStratumDistance=0`):
  * analytic collision probability 1−(1−j⁴)⁴ ≈ 92% at ratio 1.2, ≈ 21%
  * at 2, ≈ 5% at 3, < 1% past 5.
  *
  * DEFAULT gate (+ asymmetric tier, 8-band × 2-row keys stratified by
  * gram-set size, probing strata s+1..s+3): the quote (58 grams,
  * stratum 5) probes containers up to stratum 8 (~ratio 8) with
  * per-band collision j², so 1−(1−j²)⁸ ≈ 100% at ratio 1.2/2 (j ≈
  * .83/.49), ≈ 59% at 3, ≈ 27% at 5, blind at 10+ (stratum distance 4
  * > MaxStratumDistance). The measured counts agree; everything is
  * deterministic (seeded fixture, seeded minhash), so the pins are
  * exact up to the documented tolerance.
  *
  * What this licenses: the twin now covers containment up to size
  * ratios ~5-8 — the quote-in-document regime — at a candidate-volume
  * cost this spec pins (zero extra candidates on equal-size corpora:
  * the stratum tag keeps duplicate-family mass out of the narrow
  * 2-row buckets). Unbounded-ratio extraction (needles in 50× books)
  * still needs the exact pigeonhole form ([[Dedup.containmentPairs]],
  * auto-sliced past the corpus bound) or the persisted-index
  * incremental path, both of which stay registered.
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

  private def measuredCurve(maxStratumDistance: Int): Seq[(Double, Int)] = {
    val lsh = Dedup.containmentPairsLsh(fixture, 3, 0.9, maxStratumDistance)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => a < 10000L && b >= 10000L }
    val hits: Map[Double, Int] = lsh.groupBy(p => ratioOf(p._2))
      .view.mapValues(_.length).toMap
    Ratios.map(r => r -> hits.getOrElse(r, 0))
  }

  test("measured recall curve (DEFAULT gate, asymmetric tier on) vs size ratio") {
    val curve = measuredCurve(Dedup.MaxStratumDistance)
    info("measured recall curve (hits / " + NQuotes + "): " +
      curve.map { case (r, h) => s"ratio $r -> $h" }.mkString(", "))
    val byRatio = curve.toMap
    // the anchor: near-duplicate-shaped containment stays caught
    assert(byRatio(1.2) >= 44, s"ratio 1.2 recall collapsed: ${byRatio(1.2)}/$NQuotes")
    // the round-16 bar (r15 verdict asked >= 60% at ratio 2; measured 94%)
    assert(byRatio(2.0) >= 30, s"ratio 2 recall fell under the verdict bar: ${byRatio(2.0)}/$NQuotes")
    // material coverage through the quote-in-document regime
    assert(byRatio(3.0) >= 20, s"ratio 3 recall collapsed: ${byRatio(3.0)}/$NQuotes")
    // the documented decay with ratio still holds
    assert(curve.map(_._2).sliding(2).forall(w => w(1) <= w(0) + 2),
      s"recall must decay (noise margin 2) with size ratio: $curve")
    // past the stratum horizon (distance > MaxStratumDistance at ratio
    // 10+) the gate is honestly blind — the exact/incremental forms own
    // that regime
    Seq(10.0, 20.0, 50.0).foreach { r =>
      assert(byRatio(r) <= 2, s"ratio $r should be near-blind, got ${byRatio(r)}/$NQuotes")
    }
    // deterministic pins WITH a per-ratio tolerance (r13 advisory):
    // the run is seeded, but the seeding rides Spark's hash internals —
    // a Spark upgrade re-rolling the minhash permutations is binomial
    // re-noise, not a banding change; tolerance ~2σ of binomial n=50
    val drift = Ratios.map(r =>
      r -> math.abs(byRatio(r) - PinnedCurve(r))).filter(_._2 > PinTolerance)
    assert(drift.isEmpty,
      s"measured curve drifted >±$PinTolerance from the pinned one at $drift: $curve vs $PinnedCurve")
  }

  test("measured recall curve (symmetric-only gate) — the pre-round-16 baseline, kept as the lift's denominator") {
    val curve = measuredCurve(0)
    info("symmetric-only recall curve (hits / " + NQuotes + "): " +
      curve.map { case (r, h) => s"ratio $r -> $h" }.mkString(", "))
    val byRatio = curve.toMap
    assert(byRatio(1.2) >= 44, s"ratio 1.2 recall collapsed: ${byRatio(1.2)}/$NQuotes")
    Seq(10.0, 20.0, 50.0).foreach { r =>
      assert(byRatio(r) <= 2, s"ratio $r should be near-blind, got ${byRatio(r)}/$NQuotes")
    }
    val drift = Ratios.map(r =>
      r -> math.abs(byRatio(r) - PinnedSymCurve(r))).filter(_._2 > PinTolerance)
    assert(drift.isEmpty,
      s"symmetric-only curve drifted >±$PinTolerance at $drift: $curve vs $PinnedSymCurve")
  }

  test("asymmetric tier's candidate growth is bounded: zero on equal-size corpora, small-multiple on the sweep") {
    // equal-size corpus (the duplicate-family regime the 100x fixture
    // replicates): every doc lands in the same stratum, so the d >= 1
    // probe keys never meet a container key — the tier adds EXACTLY
    // zero candidates and the at-scale bulk path is untouched
    val rnd = new scala.util.Random(0xBEEF)
    val equalSized = (0 until 200).map { i =>
      (i.toLong, IndexedSeq.fill(40)("w" + rnd.nextInt(80)).mkString(" "))
    }.toDF("doc_id", "text")
    val symEq = Dedup.containmentLshCandidates(equalSized, 3, 0).count()
    val asymEq = Dedup.containmentLshCandidates(equalSized, 3,
      Dedup.MaxStratumDistance).count()
    assert(asymEq == symEq,
      s"asym tier added candidates on an equal-size corpus: $asymEq vs $symEq")
    // the sweep fixture: the tier's whole point is admitting more
    // candidates across strata — bound it at a small multiple of the
    // TRUE pair count (350 quote-in-container pairs), so candidate
    // growth stays output-shaped, not corpus-quadratic (400 docs =
    // 79,800 unordered pairs; measured: sym 69, asym 233)
    val symN = Dedup.containmentLshCandidates(fixture, 3, 0).count()
    val asymN = Dedup.containmentLshCandidates(fixture, 3,
      Dedup.MaxStratumDistance).count()
    info(s"fixture candidates: symmetric-only $symN, with asym tier $asymN")
    assert(asymN >= symN, "the asym candidate set must contain the symmetric one")
    assert(asymN <= 4L * NQuotes * Ratios.size,
      s"asym candidates ($asymN) exceeded 4x the true pair count (${NQuotes * Ratios.size})")
  }

  /** The DEFAULT gate's measured curve (see the test's info line):
    * 100% at ratio 1.2, 94% at 2, 56% at 3, 24% at 5, blind past the
    * stratum horizon — the analytic 1−(1−j²)⁸ within binomial wobble.
    */
  private val PinnedCurve: Map[Double, Int] =
    Map(1.2 -> 50, 2.0 -> 47, 3.0 -> 28, 5.0 -> 12,
      10.0 -> 0, 20.0 -> 0, 50.0 -> 0)

  /** The symmetric-only gate's measured curve — the r15 baseline the
    * asymmetric tier is graded against: 92% at 1.2, 24% at 2, 2% at 3.
    */
  private val PinnedSymCurve: Map[Double, Int] =
    Map(1.2 -> 46, 2.0 -> 12, 3.0 -> 1, 5.0 -> 0,
      10.0 -> 0, 20.0 -> 0, 50.0 -> 0)
  private val PinTolerance = 8
}
