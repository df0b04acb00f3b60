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
}
