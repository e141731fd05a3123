package graft

import org.scalatest.funsuite.AnyFunSuite

/** PINS the budgeted bench's isolated-child selection rules — pure
  * functions extracted from the orchestrator so the scheduling fixes
  * live in a spec, not only in a dry-run's artifact:
  *
  *  - the ANCHOR phase (round 15): a fixed 20% sub-budget always runs
  *    the slowest affordable queries as fresh-JVM children first, so
  *    the driver artifact carries drift-comparable isolated numbers
  *    (r14's run admitted zero — the full-coverage gate was strictest
  *    at the slowest-first queue's head);
  *  - SCAN-DOWN (the r14 advisory): an unaffordable head must not
  *    abandon affordable singles further down the queue — the most
  *    expensive query that still fits runs instead.
  *
  * The quiet-box validation of the live protocol (anchors 0.98–1.14×
  * of committed BENCH_DETAIL, warm_srcs.single = 5 at the 1200 s
  * budget) is in BENCH_DRIFT.md "Round-15"; this spec keeps the
  * decision logic from rotting underneath it.
  */
class BenchPlannerSpec extends AnyFunSuite {

  // slowest-first queue with per-query isolated-child estimates, the
  // shape orchestrateBody builds (overhead folded into est here); worst
  // is the child's kill bound — the orchestrator passes its timeout
  // (max(120, 4×est)), modeled here as a plain multiple so the tests
  // stay arithmetic-readable
  private val queue = Seq("slow", "mid", "cheap")
  private val est = Map("slow" -> 100.0, "mid" -> 40.0, "cheap" -> 10.0)
  private val worst: String => Double = n => 1.2 * est(n)

  test("anchor phase picks the slowest query that fits the sub-budget") {
    assert(Bench.pickAnchor(queue, est, worst, anchorSpent = 0.0,
      anchorBudget = 240.0, remaining = 1200.0, estDrain = 400.0)
      .contains("slow"))
  }

  test("anchor scan-down: a head past the sub-budget yields the next affordable query, not phase exit") {
    // head alone exceeds the sub-budget — r14's failure shape; the fix
    // runs 'mid' instead of admitting zero anchors
    assert(Bench.pickAnchor(queue, est, worst, anchorSpent = 0.0,
      anchorBudget = 60.0, remaining = 1200.0, estDrain = 400.0)
      .contains("mid"))
    // spent budget narrows the fit the same way
    assert(Bench.pickAnchor(queue, est, worst, anchorSpent = 220.0,
      anchorBudget = 240.0, remaining = 1200.0, estDrain = 400.0)
      .contains("cheap"))
  }

  test("anchors never eat the drain child's room") {
    // every query fits the sub-budget, but only 'cheap' leaves the
    // always-run drain child affordable EVEN AT ITS KILL BOUND (the
    // drain guard charges worst, not est — r15 advisory)
    assert(Bench.pickAnchor(queue, est, worst, anchorSpent = 0.0,
      anchorBudget = 240.0, remaining = 415.0, estDrain = 400.0)
      .contains("cheap"))
    // nothing fits → the phase ends (None), it never overdraws
    assert(Bench.pickAnchor(queue, est, worst, anchorSpent = 235.0,
      anchorBudget = 240.0, remaining = 405.0, estDrain = 400.0).isEmpty)
  }

  test("overshoot bound: a pick whose KILL BOUND would blow 2x the sub-budget is skipped (r15 advisory)") {
    // anchorSpent accumulates ACTUAL durations, so the only hard cap on
    // a single pick's real cost is its child timeout; the planner must
    // charge that worst case against 2x the sub-budget. Here 'slow'
    // fits on estimate (100 <= 240) but its timeout-modeled worst case
    // (5x est = 500) exceeds 2x240 = 480 → 'mid' (worst 200) runs.
    val timeoutish: String => Double = n => 5.0 * est(n)
    assert(Bench.pickAnchor(queue, est, timeoutish, anchorSpent = 0.0,
      anchorBudget = 240.0, remaining = 1200.0, estDrain = 400.0)
      .contains("mid"))
    // spent budget tightens the worst-case cap the same way: at
    // spent=300, 'mid' (300+200 > 480) is out, 'cheap' (300+50) fits —
    // but the estimate gate must ALSO hold (300+10 > 240 fails): the
    // two guards compose to None, never an overdraw
    assert(Bench.pickAnchor(queue, est, timeoutish, anchorSpent = 300.0,
      anchorBudget = 240.0, remaining = 1200.0, estDrain = 400.0).isEmpty)
    // the drain reserve is also charged at the kill bound: 'slow' fits
    // both budget gates at worst=1.2x but remaining only covers drain +
    // its worst case for 'cheap'
    assert(Bench.pickAnchor(queue, est, worst, anchorSpent = 0.0,
      anchorBudget = 240.0, remaining = 413.0, estDrain = 400.0)
      .contains("cheap"))
  }

  test("phase-W selection reserves full grouped coverage for the rest of the queue") {
    // grouped estimate charges 2x est for whatever remains un-isolated
    def grouped(rest: Seq[String]): Double = 2.0 * rest.map(est).sum
    // isolating 'slow' (100) leaves grouped(mid, cheap) = 100 + drain 400
    // → needs > 600; at 700 remaining it fits
    assert(Bench.pickSingle(queue, est, grouped,
      remaining = 700.0, estDrain = 400.0).contains("slow"))
    // at 550 remaining 'slow' would break coverage (600) but 'mid' fits
    // (40 + grouped(slow, cheap) = 220 + 400 = 660 > 550? no —
    // grouped(slow, cheap) = 2*(110) = 220; 40+220+400 = 660 > 550, so
    // 'mid' does NOT fit either; 'cheap' needs 10 + 2*140 + 400 = 690).
    // Nothing fits: the phase hands the queue to grouped scheduling.
    assert(Bench.pickSingle(queue, est, grouped,
      remaining = 550.0, estDrain = 400.0).isEmpty)
    // the advisory's exact shape: the head alone is unaffordable but a
    // cheaper single still fits full coverage → it runs
    def flatGrouped(rest: Seq[String]): Double = rest.size.toDouble
    assert(Bench.pickSingle(queue, est, flatGrouped,
      remaining = 450.0, estDrain = 400.0).contains("mid"))
  }
}
