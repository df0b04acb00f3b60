package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench's baseline parsing: the comparison source for round-over-round
  * regression verdicts, so a silent mis-parse corrupts the verdict. */
class BenchSpec extends AnyFunSuite {

  test("parseBaseline reads only the queries_min map, not sibling q-keyed maps") {
    // the shape of bench/last_run.json: medians first, then mins, then a
    // delta map re-using the SAME query names with garbage-as-times
    val txt =
      """{"sf":"x","passes":3,
        |"queries_median":{"q01_gold":0.51,"q02_dept":0.62},
        |"queries_min":{"q01_gold":0.249,"q02_dept":0.31},
        |"delta_min_pct_vs_baseline":{"q01_gold":6.18,"q02_dept":-44.0}}""".stripMargin
    assert(Bench.parseBaseline(txt) ==
      Map("q01_gold" -> 0.249, "q02_dept" -> 0.31))
  }

  test("parseBaseline on the committed baseline format") {
    val txt =
      """{"source":"...","measured":"2026-08-12","total_median":44.9,
        |"queries_min":{"q01_gold":0.2788,"q77_quantile":0.4565}}""".stripMargin
    assert(Bench.parseBaseline(txt) ==
      Map("q01_gold" -> 0.2788, "q77_quantile" -> 0.4565))
  }

  test("parseBaseline without a queries_min section falls back to flat pairs") {
    assert(Bench.parseBaseline("""{"q03_x":1.5}""") == Map("q03_x" -> 1.5))
  }

  test("sub-millisecond times survive the emit→parse round trip") {
    // Double.toString(1e-4) is "1.0E-4"; the old emitter + number regex
    // silently read that back as 1.0 — a 10000x phantom regression
    assert(Bench.fmt4(0.0001) == "0.0001")
    assert(Bench.fmt6(0.0000015) == "0.000002")
    assert(Bench.fmt4(-1.0) == "-1.0000")
    val txt = s"""{"queries_min":{"q50_x":${Bench.fmt6(0.0001)},"q51_y":1.25}}"""
    assert(Bench.parseBaseline(txt) == Map("q50_x" -> 0.0001, "q51_y" -> 1.25))
    // and a LEGACY baseline that already carries scientific notation
    // parses to the true value rather than the mantissa
    assert(Bench.parseBaseline("""{"queries_min":{"q52_z":1.0E-4}}""") ==
      Map("q52_z" -> 0.0001))
  }

  // ---- the round-16 budget-guarded pass scheduler ----
  // A fake clock advances 1 "second" per run() call, so budgets are
  // countable in units of executed samples.
  private def fakeRun(log: scala.collection.mutable.Buffer[String],
      clock: Array[Double], cost: String => Double = _ => 1.0)
      : String => Double = { n =>
    log += n; clock(0) += 1.0; cost(n)
  }

  test("sweep under a generous budget runs passes+extra in full, interleaved") {
    val log = scala.collection.mutable.Buffer[String]()
    val clock = Array(0.0)
    // q_a is cheap (<1s) → gets the extra sweep; q_b is not
    val cost = Map("q_a" -> 0.5, "q_b" -> 2.0)
    val (samples, hit) = Bench.sweep(Seq("q_a", "q_b"), passes = 2, extra = 1,
      budgetSec = 1e9, () => clock(0), fakeRun(log, clock, cost))
    assert(!hit)
    // pass 1 in name order, pass 2 slowest-first, extra on cheap only
    assert(log == Seq("q_a", "q_b", "q_b", "q_a", "q_a"))
    assert(samples("q_a") == Vector(0.5, 0.5, 0.5))
    assert(samples("q_b") == Vector(2.0, 2.0))
  }

  test("sweep: guarded passes run slowest-first, so a budget cut strands " +
      "only the sub-second cohort at thin sample counts") {
    // the round-18 failure shape: a budget-hit sweep left multi-second
    // queries (q280/q281) with ONE sample and an unadjudicatable rel
    // tail; with slowest-first re-ranking the cut tail is always the
    // cheap cohort, whose minima stabilize in 1–2 samples anyway
    val log = scala.collection.mutable.Buffer[String]()
    val clock = Array(0.0)
    val cost = Map("q_fast" -> 0.1, "q_mid" -> 2.0, "q_slow" -> 5.0)
    // fake clock: 1 "second" per run; budget 4 → pass 1 (clock=3), then
    // pass 2 fits exactly two more samples — they must be the slow ones
    val (samples, hit) = Bench.sweep(Seq("q_fast", "q_mid", "q_slow"),
      passes = 2, extra = 0, budgetSec = 4.0, () => clock(0),
      fakeRun(log, clock, cost))
    assert(hit)
    assert(log == Seq("q_fast", "q_mid", "q_slow", "q_slow", "q_mid"))
    assert(samples("q_slow").size == 2 && samples("q_mid").size == 2,
      s"multi-second queries must get their second sample first: $samples")
    assert(samples("q_fast").size == 1)
  }

  test("sweep: pass 1 is never cut — a zero budget still samples every query once") {
    val log = scala.collection.mutable.Buffer[String]()
    val clock = Array(0.0)
    val (samples, hit) = Bench.sweep(Seq("q_a", "q_b", "q_c"), passes = 3, extra = 2,
      budgetSec = 0.0, () => clock(0), fakeRun(log, clock))
    assert(hit)
    assert(log == Seq("q_a", "q_b", "q_c")) // exactly one full pass
    assert(samples.values.forall(_.size == 1)) // no query missing, no -1 sentinel
  }

  test("sweep: budget cuts mid-pass at query granularity, not pass granularity") {
    val log = scala.collection.mutable.Buffer[String]()
    val clock = Array(0.0)
    // budget 4: pass 1 (3 samples, clock=3), pass 2 runs q_a (clock=4),
    // then the pre-query check sees 4 > 4 is false (not strictly
    // greater) → q_b runs (clock=5), then 5 > 4 stops the sweep
    val (samples, hit) = Bench.sweep(Seq("q_a", "q_b", "q_c"), passes = 2, extra = 0,
      budgetSec = 4.0, () => clock(0), fakeRun(log, clock))
    assert(hit)
    assert(log == Seq("q_a", "q_b", "q_c", "q_a", "q_b"))
    assert(samples("q_a").size == 2 && samples("q_b").size == 2 && samples("q_c").size == 1)
  }

  test("sweep: a failed (-1) pass-1 sample excludes the query from extra sweeps") {
    val log = scala.collection.mutable.Buffer[String]()
    val clock = Array(0.0)
    val cost = Map("q_ok" -> 0.2, "q_bad" -> -1.0)
    val (samples, hit) = Bench.sweep(Seq("q_bad", "q_ok"), passes = 1, extra = 2,
      budgetSec = 1e9, () => clock(0), fakeRun(log, clock, cost))
    assert(!hit)
    assert(samples("q_bad") == Vector(-1.0)) // never retried in extra sweeps
    assert(samples("q_ok") == Vector(0.2, 0.2, 0.2))
  }

  // ---- the round-17 budget-aware fill passes ----

  test("sweep: fill spends leftover budget on more passes without setting budgetHit") {
    val log = scala.collection.mutable.Buffer[String]()
    val clock = Array(0.0)
    // 2 requested passes over 2 queries = 4 "seconds"; budget 7 leaves
    // room for one more full fill pass (clock 4→6), then the pre-query
    // check at 6 lets q_a run (clock=7), 7 > 7 is false → q_b runs
    // (clock=8), then 8 > 7 stops the fill. budgetHit stays false:
    // fill exhausting the budget is the plan, not a truncation.
    val cost = Map("q_a" -> 2.0, "q_b" -> 3.0) // no sub-second → no extra sweeps
    val (samples, hit) = Bench.sweep(Seq("q_a", "q_b"), passes = 2, extra = 1,
      budgetSec = 7.0, () => clock(0), fakeRun(log, clock, cost), fill = true)
    assert(!hit, "fill stopping at the budget must not read as a truncation")
    assert(samples("q_a").size == 4 && samples("q_b").size == 4,
      s"fill passes must keep interleaving full passes: $samples")
  }

  test("sweep: fill=false keeps the round-16 semantics exactly") {
    val log = scala.collection.mutable.Buffer[String]()
    val clock = Array(0.0)
    val cost = Map("q_a" -> 2.0, "q_b" -> 3.0)
    val (samples, hit) = Bench.sweep(Seq("q_a", "q_b"), passes = 2, extra = 1,
      budgetSec = 1e9, () => clock(0), fakeRun(log, clock, cost))
    assert(!hit)
    assert(samples.values.forall(_.size == 2)) // exactly the requested passes
  }

  test("sweep: a budget already hit in the requested passes skips fill entirely") {
    val log = scala.collection.mutable.Buffer[String]()
    val clock = Array(0.0)
    val (samples, hit) = Bench.sweep(Seq("q_a", "q_b", "q_c"), passes = 3, extra = 0,
      budgetSec = 0.0, () => clock(0), fakeRun(log, clock), fill = true)
    assert(hit)
    assert(log == Seq("q_a", "q_b", "q_c")) // pass 1 only, no fill after a cut
  }

  test("sweep: fill is capped so a tiny sweep under a huge budget cannot spin") {
    val log = scala.collection.mutable.Buffer[String]()
    val clock = Array(0.0)
    val (samples, hit) = Bench.sweep(Seq("q_a"), passes = 1, extra = 0,
      budgetSec = 1e9, () => clock(0), fakeRun(log, clock, _ => 2.0),
      fill = true, maxFillPasses = 3)
    assert(!hit)
    assert(samples("q_a").size == 4) // 1 requested + 3 capped fill passes
  }
}
