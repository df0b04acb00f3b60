package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Edge semantics of the q238–q240 kernels — the cases corpus data
  * never exercises, so the DuckDB oracle alone cannot pin them. */
class StatsSpec extends SparkSuite {
  import spark.implicits._

  // ---------------- waterFill ----------------

  test("waterFill: allocations are always feasible (alloc ≤ cap·avail) " +
      "and the bottleneck flag marks exactly the pinning sources") {
    val src = Seq(
      ("a", 4L, 1000L), ("b", 2L, 10L), ("c", 1L, 5000L), ("d", 3L, 77L))
      .toDF("source", "w", "avail")
    val out = Stats.waterFill(src, "source", "w", "avail", epochCap = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(5)))
    // feasibility: every floor share fits in epochCap·avail
    out.foreach { case (s, _, avail, alloc, _) =>
      assert(alloc <= 2 * avail, s"source $s over-allocated: $alloc > ${2 * avail}")
    }
    // the bottleneck is the min of (2·avail·W)/w — here source b
    assert(out.filter(_._5).map(_._1).toSeq == Seq("b"))
    // maximality at the bottleneck: b's share uses its full cap's floor
    val ww = 4L + 2L + 1L + 3L
    val tt = out.map { case (_, w, avail, _, _) => 2L * avail * ww / w }.min
    out.foreach { case (s, w, _, alloc, _) =>
      assert(alloc == tt * w / ww, s"source $s share is not the floor share")
    }
  }

  test("waterFill: a zero-weight source imposes no cap and receives " +
      "no allocation; a zero-avail weighted source pins T at 0") {
    // without the zero-weight guard, source a (5 tokens, weight 0)
    // would divide by zero; with it, b gets its full 2-epoch budget
    val byName = Stats.waterFill(
      Seq(("a", 0L, 5L), ("b", 1L, 100L)).toDF("source", "w", "avail"),
      "source", "w", "avail", epochCap = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getBoolean(5)))).toMap
    assert(byName("a") == ((0L, false)), "zero-weight source must sit out")
    assert(byName("b") == ((200L, true)), "lone weighted source takes 2·avail")
    // zero-avail weighted source: nothing can be drawn from it, so the
    // whole mixture's T collapses to 0 (cap below ANY floor share)
    val za = Stats.waterFill(
      Seq(("a", 1L, 0L), ("b", 1L, 100L)).toDF("source", "w", "avail"),
      "source", "w", "avail", epochCap = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(za("a") == ((0L, 0.0, true)), "empty mandatory source must pin T=0")
    assert(za("b")._1 == 0L, "T=0 means nobody draws")
  }

  // ---------------- cohensKappa ----------------

  test("cohensKappa: degenerate single-class gates define κ = 1; " +
      "perfect disagreement gives κ < 0; independence gives κ = 0") {
    // both gates pass everything: n² == pe, defined as perfect agreement
    val degen = Stats.cohensKappa(
      Seq((1L, 1L), (1L, 1L), (1L, 1L)).toDF("ga", "gb"), "ga", "gb")
      .collect()(0)
    assert(degen.getDouble(5) == 1.0, "single-class gates must give κ=1")
    assert(degen.getDouble(4) == 1.0)
    // one gate constant, the other not: pe = n·(a+c) with b=d=0 …
    val oneConst = Stats.cohensKappa(
      Seq((1L, 1L), (1L, 0L)).toDF("ga", "gb"), "ga", "gb")
      .collect()(0)
    assert(oneConst.getDouble(5) == 0.0,
      "a constant gate carries no signal: κ must be 0")
    // perfect disagreement: κ strictly negative (here −1 on a balanced 2×2)
    val dis = Stats.cohensKappa(
      Seq((1L, 0L), (0L, 1L), (1L, 0L), (0L, 1L)).toDF("ga", "gb"),
      "ga", "gb").collect()(0)
    assert(dis.getDouble(5) == -1.0, s"expected κ=-1, got ${dis.getDouble(5)}")
    // independence: agreement exactly at chance level → κ = 0
    val ind = Stats.cohensKappa(
      Seq((1L, 1L), (1L, 0L), (0L, 1L), (0L, 0L)).toDF("ga", "gb"),
      "ga", "gb").collect()(0)
    assert(ind.getDouble(5) == 0.0, s"expected κ=0, got ${ind.getDouble(5)}")
  }

  // ---------------- ksExact ----------------

  test("ksExact: a tie exactly AT the rejection boundary is NOT drift " +
      "(strict >), one integer past it is") {
    // a = {0,1}, b = {0,2}: n1=n2=2, Dnum = max|f1·n2 − f2·n1| = 2
    // boundary: Dnum²·10⁶ = 4·10⁶ == c6·(n1+n2)·n1·n2 = 16·c6 at c6=250000
    val a = Seq(0L, 1L).toDF("v")
    val b = Seq(0L, 2L).toDF("v")
    val atBoundary = Stats.ksExact(a, b, "v", c6 = 250000L).collect()(0)
    assert(atBoundary.getDouble(2) == 0.5, "D should be 2/(2·2) = 0.5")
    assert(!atBoundary.getBoolean(3),
      "equality at the boundary must NOT reject (strict >)")
    val justInside = Stats.ksExact(a, b, "v", c6 = 249999L).collect()(0)
    assert(justInside.getBoolean(3),
      "one integer inside the boundary must reject")
  }

  test("ksExact: identical samples give D = 0 and no drift; a disjoint " +
      "support gives D = 1") {
    val a = (1L to 10L).toDF("v")
    val same = Stats.ksExact(a, a, "v").collect()(0)
    assert(same.getDouble(2) == 0.0 && !same.getBoolean(3))
    val b = (101L to 110L).toDF("v")
    val disjoint = Stats.ksExact(a, b, "v").collect()(0)
    assert(disjoint.getDouble(2) == 1.0,
      "disjoint supports must reach the full D = 1 supremum")
    // at n=10 per side D=1 clears the α=5% critical value (a 3-row
    // disjoint pair would NOT — the test statistic needs n)
    assert(disjoint.getBoolean(3))
  }

  // ---------------- mannWhitney ----------------

  test("mannWhitney: ties get half credit (hand-computed U), identical " +
      "samples sit at AUC ½ with no drift, full separation rejects") {
    // A = {1,2,2}, B = {2,3}: U = [2>2]·½·2 = 1.0; AUC = 1/6
    val tied = Stats.mannWhitney(
      Seq(1L, 2L, 2L).toDF("v"), Seq(2L, 3L).toDF("v"), "v").collect()(0)
    assert(tied.getLong(0) == 3 && tied.getLong(1) == 2)
    assert(tied.getDouble(2) == 1.0, s"tie half-credit: U=${tied.getDouble(2)}")
    assert(tied.getDouble(3) == 0.166667)
    // identical samples: dev = 0, G > 0 — AUC exactly ½, never drift
    val a = (1L to 10L).toDF("v")
    val same = Stats.mannWhitney(a, a, "v").collect()(0)
    assert(same.getDouble(3) == 0.5 && !same.getBoolean(4))
    // complete separation at n=10+10 (A strictly above B): U = n₁n₂,
    // AUC = 1, drift
    val sep = Stats.mannWhitney((101L to 110L).toDF("v"), a, "v").collect()(0)
    assert(sep.getDouble(2) == 100.0 && sep.getDouble(3) == 1.0)
    assert(sep.getBoolean(4), "complete separation at n=20 must reject")
  }

  test("mannWhitney: a fully-tied pair has G = 0 and dev = 0 — defined " +
      "as no drift, no division hazard; one-sided groups are dropped") {
    val allTied = Stats.mannWhitney(
      Seq(7L, 7L).toDF("v"), Seq(7L, 7L, 7L).toDF("v"), "v").collect()(0)
    assert(allTied.getDouble(3) == 0.5 && !allTied.getBoolean(4))
    // grouped: rep 0 two-sided, rep 1 has only side 0 → only rep 0 out
    val g = Seq((0L, 0, 1L), (0L, 1, 2L), (1L, 0, 3L))
      .toDF("rep", "side", "v")
    val out = Stats.mannWhitneyBy(g, "rep", "side", "v").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L),
      "a one-sample group has no two-sample verdict")
  }

  // ---------------- isotonicFit ----------------

  test("isotonicFit: an already-monotone curve comes back unchanged; " +
      "a violator pools with WEIGHTED interval averages") {
    val mono = Seq((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 9L))
      .toDF("bin", "n", "pos")
    Stats.isotonicFit(mono, "bin", "n", "pos").collect()
      .sortBy(_.getLong(0)).foreach { r =>
        assert(r.getDouble(4) == r.getDouble(3),
          s"monotone input must be a fixed point (bin ${r.getLong(0)})")
      }
    // rates (.2, .8, .4) with weights (10, 10, 30): PAVA pools bins
    // 1..2 to (8+12)/(10+30) = 0.5 — the WEIGHTED mean, not (.8+.4)/2
    val viol = Seq((0L, 10L, 2L), (1L, 10L, 8L), (2L, 30L, 12L))
      .toDF("bin", "n", "pos")
    val fit = Stats.isotonicFit(viol, "bin", "n", "pos").collect()
      .sortBy(_.getLong(0)).map(_.getDouble(4))
    assert(fit.toSeq == Seq(0.2, 0.5, 0.5), s"got ${fit.toSeq}")
    // monotone non-decreasing always holds
    assert(fit.sliding(2).forall(p => p(0) <= p(1)))
  }

  // ---------------- medianCI ----------------

  test("medianCI: n=100 uniform ranks hit the textbook interval " +
      "[v(40), v(61)] via the exact-isqrt perfect-square path") {
    // 38416·100 = 1960² exactly — the float-sqrt seed must not round off
    val r = Stats.medianCI((1L to 100L).toDF("v"), "v").collect()(0)
    assert(r.getLong(0) == 100 && r.getDouble(1) == 50.5)
    assert((r.getLong(2), r.getLong(3)) == ((40L, 61L)),
      s"expected ranks 40/61, got ${(r.getLong(2), r.getLong(3))}")
    assert((r.getLong(4), r.getLong(5)) == ((40L, 61L)))
  }

  test("medianCI: tiny n clamps the lower rank to 1 (CI = full range); " +
      "odd n returns the middle value exactly") {
    val tiny = Stats.medianCI(Seq(3L, 9L).toDF("v"), "v").collect()(0)
    assert(tiny.getDouble(1) == 6.0)
    assert((tiny.getLong(2), tiny.getLong(3)) == ((3L, 9L)),
      "n=2 must clamp to [min, max]")
    val odd = Stats.medianCI(Seq(1L, 5L, 200L).toDF("v"), "v").collect()(0)
    assert(odd.getDouble(1) == 5.0, "odd n: the middle order statistic")
  }

  // ---------------- poissonBootstrapMean ----------------

  test("poissonBootstrapMean: deterministic across runs, exact point " +
      "mean, and the B=4 rank rule takes the extreme replicas") {
    val df = (1L to 200L).map(i => (i, i % 13)).toDF("id", "x")
    val r1 = Stats.poissonBootstrapMean(df, "id", "x", b = 8, seed = 5L)
      .collect()(0)
    val r2 = Stats.poissonBootstrapMean(df, "id", "x", b = 8, seed = 5L)
      .collect()(0)
    assert(r1 == r2, "same seed must reproduce the identical interval")
    assert(r1.getLong(0) == 200 && r1.getLong(1) == 8)
    // point mean is the exact half-up 6-dp divide, not a replica stat
    val exact = BigDecimal((1L to 200L).map(_ % 13).sum) / 200
    assert(math.abs(r1.getDouble(2) - exact.toDouble) < 5e-7)
    assert(r1.getDouble(3) <= r1.getDouble(4), "lo ≤ hi")
    // B=4: lo rank (4·25) div 1000 + 1 = 1, hi rank 4 — min and max
    val b4 = Stats.poissonBootstrapMean(df, "id", "x", b = 4, seed = 5L)
      .collect()(0)
    assert(b4.getLong(1) == 4)
    assert(b4.getDouble(3) <= r1.getDouble(2) + 2.0 &&
      b4.getDouble(4) >= r1.getDouble(2) - 2.0,
      "4-replica extremes should bracket the point-mean region")
  }

  // ---------------- bhDrift ----------------

  test("bhDrift: the step-up closure rejects every rank up to the " +
      "largest crossing rank — even ranks that missed their own bar") {
    // three groups with distinct z²: a = strong separation, b = mild,
    // c = fully tied (z² = 0)
    val rows =
      (1L to 20L).map(v => ("a", 0, v + 100L)) ++
        (1L to 20L).map(v => ("a", 1, v)) ++
        Seq(("b", 0, 1L), ("b", 0, 3L), ("b", 1, 2L), ("b", 1, 4L)) ++
        Seq(("c", 0, 5L), ("c", 1, 5L))
    val df = rows.toDF("rep", "side", "v")
    // thresholds: ranks 1 and 2 unreachable, rank 3 always crosses
    // (z² ≥ 0) → the closure must reject ALL three groups
    val closure = Stats.bhDrift(df, "rep", "side", "v",
      thresholds = Seq(Long.MaxValue, Long.MaxValue, 0L))
      .collect().map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(closure.values.forall(identity),
      s"step-up closure must reject all when the last rank crosses: $closure")
    // unreachable ladder → nothing rejected, and the tied group's z² = 0
    val none = Stats.bhDrift(df, "rep", "side", "v",
      thresholds = Seq.fill(3)(Long.MaxValue))
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getBoolean(5)))
    assert(none.forall(!_._3), "unreachable thresholds reject nothing")
    assert(none.find(_._1 == "c").get._2 == 0.0,
      "a fully-tied group carries zero evidence")
    // ranks are 1-based by z² desc: the separated group is rank 1
    val ranks = Stats.bhDrift(df, "rep", "side", "v")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(ranks("a") == 1L && ranks("c") == 3L)
  }

  // ---------------- jackknifeRatio ----------------

  test("jackknifeRatio: the two-group hand case gives SE = 0.3 and " +
      "mirrored pseudo-values; equal groups give SE = 0") {
    // groups (10, 2) and (10, 8): θ̂ = .5, LOO = {.8, .2} → SE = .3,
    // pseudo-values 2·.5 − 1·LOO = {.2, .8}
    val out = Stats.jackknifeRatio(
      Seq(("a", 10L, 2L), ("b", 10L, 8L)).toDF("g", "n", "pos"),
      "g", "n", "pos")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out("a") == ((0.8, 0.2, 0.3)), s"got ${out("a")}")
    assert(out("b") == ((0.2, 0.8, 0.3)), s"got ${out("b")}")
    // identical groups: zero spread, pseudo-values equal the ratio
    val flat = Stats.jackknifeRatio(
      Seq(("a", 10L, 5L), ("b", 10L, 5L), ("c", 10L, 5L))
        .toDF("g", "n", "pos"), "g", "n", "pos")
      .collect()
    assert(flat.forall(_.getDouble(5) == 0.0), "equal groups → SE 0")
    assert(flat.forall(_.getDouble(4) == 0.5))
  }

  // ---------------- ebShrinkRates ----------------

  test("ebShrinkRates: shrinkage contracts toward the family mean, " +
      "small groups move further at the same raw rate") {
    val g = Seq(("s10", 10L, 2L), ("b10", 10L, 8L),
      ("s1k", 1000L, 200L), ("b1k", 1000L, 800L))
      .toDF("g", "n", "pos")
    val out = Stats.ebShrinkRates(g, "g", "n", "pos")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val m = 0.5 // family mean of rates {.2, .8, .2, .8}
    out.foreach { case (k, (raw, shrunk, prior)) =>
      assert(prior > 0, s"healthy dispersion must fit a prior ($k)")
      assert(shrunk >= math.min(raw, m) - 1e-6 &&
        shrunk <= math.max(raw, m) + 1e-6,
        s"$k: shrunk $shrunk outside [raw $raw, mean $m]")
    }
    assert(math.abs(out("s10")._2 - 0.2) > math.abs(out("s1k")._2 - 0.2),
      "the 10-doc group must shrink further than the 1000-doc group")
  }

  // ---------------- kendallTau ----------------

  test("kendallTau: identity ranking gives τ = 1, reversal τ = −1, and " +
      "a tie exactly AT the z² boundary is NOT dependence") {
    def ranks(r2: Seq[Long]) = Stats.kendallTau(
      r2.zipWithIndex.map { case (r, i) => (s"g$i", (i + 1).toLong, r) }
        .toDF("g", "r1", "r2"), "g", "r1", "r2").collect()(0)
    val same = ranks(Seq(1L, 2L, 3L, 4L, 5L))
    assert(same.getDouble(3) == 1.0 && same.getLong(2) == 0)
    // n=5 perfect agreement: 18·100·10⁴ = 1.8e7 vs 38416·5·4·15 =
    // 1.15e7 → dependent even at n=5
    assert(same.getBoolean(4))
    val rev = ranks(Seq(5L, 4L, 3L, 2L, 1L))
    assert(rev.getDouble(3) == -1.0 && rev.getBoolean(4))
    // near-independence: a small |C−D| at n=5 stays under the bar
    val mixed = ranks(Seq(2L, 1L, 4L, 3L, 5L))
    assert(!mixed.getBoolean(4),
      s"weak agreement must not flag: ${mixed.getDouble(3)}")
  }

  // ---------------- wilsonIntervals ----------------

  test("wilsonIntervals: the textbook n=100,k=50 interval, and k=0 " +
      "stays inside [0,1] where Wald collapses") {
    val out = Stats.wilsonIntervals(
      Seq(("mid", 100L, 50L), ("zero", 10L, 0L), ("full", 10L, 10L))
        .toDF("g", "n", "pos"), "g", "n", "pos")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val (_, lo, hi) = out("mid")
    assert(math.abs(lo - 0.403830) < 1e-5 && math.abs(hi - 0.596170) < 1e-5,
      s"textbook Wilson(100, 50) mismatch: ($lo, $hi)")
    val (_, lo0, hi0) = out("zero")
    assert(lo0 >= -1e-9 && lo0 <= 1e-9,
      s"k=0 lower bound must sit at 0, got $lo0")
    assert(math.abs(hi0 - 0.277540) < 1e-4, s"k=0,n=10 upper: $hi0")
    val (_, lo1, hi1) = out("full")
    assert(hi1 <= 1.0 + 1e-9 && hi1 >= 1.0 - 1e-9 && lo1 > 0.6,
      s"k=n bounds must hug 1: ($lo1, $hi1)")
    // containment: every rate inside its own interval
    out.values.foreach { case (p, l, h) =>
      assert(l <= p + 1e-9 && p <= h + 1e-9) }
  }

  // ---------------- mcnemarShift ----------------

  test("mcnemarShift: a tie exactly AT the χ² boundary is NOT a shift " +
      "(strict >); concordant-only pairs are defined as no shift") {
    // b = 4, c = 0: (b−c)²·10⁴ = 160000 vs 38416·4 = 153664 → shift;
    // b = 13, c = 4: dev² = 81, 81·10⁴ = 810000 vs 38416·17 = 653072 →
    // shift; b = 12, c = 5: dev² = 49 → 490000 < 653072 → no shift
    def pairs(b: Int, c: Int) = {
      val rows = Seq.fill(b)((1L, 0L)) ++ Seq.fill(c)((0L, 1L)) ++
        Seq.fill(3)((1L, 1L))
      Stats.mcnemarShift(rows.toDF("ga", "gb"), "ga", "gb").collect()(0)
    }
    assert(pairs(4, 0).getBoolean(6), "b=4,c=0 crosses 1.96²")
    assert(pairs(13, 4).getBoolean(6))
    assert(!pairs(12, 5).getBoolean(6), "dev²·10⁴ below the bar")
    val conc = pairs(0, 0)
    assert(!conc.getBoolean(6) && conc.getDouble(5) == 0.0 &&
      conc.getString(7) == "balanced",
      "fully concordant gates: χ²=0, no shift, balanced")
    assert(pairs(4, 0).getString(7) == "tightened")
    assert(pairs(0, 4).getString(7) == "loosened")
  }

  // ---------------- disparateImpact ----------------

  test("disparateImpact: a group exactly AT the 4/5ths boundary is NOT " +
      "adverse (strict <); the best group's own ratio is 1") {
    val out = Stats.disparateImpact(
      Seq(("best", 10L, 10L), ("at08", 10L, 8L), ("under", 10L, 7L))
        .toDF("g", "n", "pos"), "g", "n", "pos")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(4), r.getBoolean(5), r.getString(6)))).toMap
    assert(out("best") == ((1.0, false, "best")))
    assert(out("at08") == ((0.8, false, "best")),
      "ratio exactly 0.8 must not flag (5·k·nb == 4·kb·n, strict <)")
    assert(out("under") == ((0.7, true, "best")),
      "ratio 0.7 must flag adverse impact")
  }

  test("disparateImpact: an all-zero-keep family defines ratio 1 and " +
      "flags nothing (no division hazard)") {
    val out = Stats.disparateImpact(
      Seq(("a", 10L, 0L), ("b", 5L, 0L)).toDF("g", "n", "pos"),
      "g", "n", "pos").collect()
    assert(out.forall(r => r.getDouble(4) == 1.0 && !r.getBoolean(5)))
  }

  test("ebShrinkRates: zero-variance and over-binomial-variance " +
      "families take the no-shrinkage path") {
    val flat = Stats.ebShrinkRates(
      Seq(("a", 10L, 5L), ("b", 20L, 10L)).toDF("g", "n", "pos"),
      "g", "n", "pos").collect()
    assert(flat.forall(r => r.getDouble(5) == 0.0 &&
      r.getDouble(4) == r.getDouble(3)),
      "zero rate variance → prior 0, shrunk = raw")
    // rates {0, 1}: observed variance exceeds the binomial-free bound
    // m(1−m) → the MoM numerator goes non-positive → no shrinkage
    val over = Stats.ebShrinkRates(
      Seq(("a", 10L, 0L), ("b", 10L, 10L)).toDF("g", "n", "pos"),
      "g", "n", "pos").collect()
    assert(over.forall(r => r.getDouble(5) == 0.0 &&
      r.getDouble(4) == r.getDouble(3)),
      "over-dispersed family must not invent a prior")
  }

  test("cohensKappaMulti: hand-checked 3-class table, perfect agreement " +
      "and the n = 0 degenerate both present 1.0") {
    import graft.ops.Stats
    // a = (x,x,y,y,z,x), b = (x,y,y,z,z,x): n = 6, diagonal po = 4
    // margins a: x=3 y=2 z=1; b: x=2 y=2 z=2 -> pe = 3*2 + 2*2 + 1*2 = 12
    // kappa = (6*4 - 12) / (36 - 12) = 12/24 = 0.5
    val df = Seq(("x", "x"), ("x", "y"), ("y", "y"), ("y", "z"),
      ("z", "z"), ("x", "x")).toDF("a", "b")
    val r = Stats.cohensKappaMulti(df, "a", "b").collect().head
    assert(r.getLong(0) == 6)
    assert(r.getDouble(1) == 0.666667) // 4/6 half-up at 6 dp
    assert(r.getDouble(2) == 0.5)
    val perfect = Seq(("x", "x"), ("y", "y")).toDF("a", "b")
    val p = Stats.cohensKappaMulti(perfect, "a", "b").collect().head
    assert(p.getDouble(1) == 1.0 && p.getDouble(2) == 1.0)
    val empty = Seq.empty[(String, String)].toDF("a", "b")
    val e = Stats.cohensKappaMulti(empty, "a", "b").collect().head
    assert(e.getLong(0) == 0 && e.getDouble(1) == 1.0 && e.getDouble(2) == 1.0,
      "an empty population must present agreement = kappa = 1.0, not /0")
  }

  test("cohensKappa: an empty population presents agreement = kappa = 1.0 " +
      "(the q309 degenerate-fixture guard)") {
    import graft.ops.Stats
    val empty = Seq.empty[(Long, Long)].toDF("ga", "gb")
    val r = Stats.cohensKappa(empty, "ga", "gb").collect().head
    assert((0 to 3).forall(r.getLong(_) == 0L), "all four cells are 0")
    assert(r.getDouble(r.fieldIndex("observed_agreement")) == 1.0)
    assert(r.getDouble(r.fieldIndex("kappa")) == 1.0)
  }
}
