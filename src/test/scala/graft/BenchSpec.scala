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
}
