package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Skyline algebra beyond what the q214/q222 oracles pin: brute-force
  * equivalence on random data, partition-invariance of the two-phase
  * prune, and the fold identity that makes the frontier incrementally
  * maintainable. */
class ParetoSpec extends SparkSuite {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    rows.filter { case (_, x, y) =>
      !rows.exists { case (_, bx, by) =>
        bx <= x && by >= y && (bx < x || by > y) }
    }.toSet

  private val rnd = new scala.util.Random(4242L)
  private val data = (1L to 400L).map(i =>
    (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))

  test("skyline2d == the brute-force NOT-EXISTS definition; exact " +
      "duplicates both survive") {
    val df = data.toDF("id", "x", "y")
    val got = Pareto.skyline2d(df, "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute(data), "skyline diverged from the definition")
    // planted exact duplicate on the frontier: both rows must survive
    val fx = brute(data).minBy(_._2)
    val dup = data :+ ((9999L, fx._2, fx._3))
    val got2 = Pareto.skyline2d(dup.toDF("id", "x", "y"), "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    assert(got2.contains((9999L, fx._2, fx._3)) && got2.contains(fx),
      "mutually undominated duplicates must BOTH survive")
  }

  test("two-phase prune is grouping-invariant: any pruneBy column " +
      "yields the global frontier") {
    val df = data.toDF("id", "x", "y")
    val expected = brute(data)
    for (mod <- Seq(2L, 3L, 7L)) {
      val grouped = df.withColumn("g", col("id") % mod)
      val got = Pareto.skyline(grouped, "x", "y", Seq("g"))
        .select("id", "x", "y").as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"prune by id%$mod changed the frontier")
    }
  }

  test("fractional x takes the type-safe path: points with x' in " +
      "(x-1, x) still dominate (the range-frame unit-offset trap)") {
    // x is DOUBLE: (x=1.5, y=10) dominates (x=1.6, y=5) even though
    // 1.5 > 1.6 - 1 — a unit-offset range frame would miss it
    val rows = Seq((1L, 1.5, 10L), (2L, 1.6, 5L), (3L, 0.5, 3L),
      (4L, 2.5, 10L), (5L, 2.5, 10L), (6L, 0.4, 10L))
    val got = Pareto.skyline2d(rows.toDF("id", "x", "y"), "x", "y")
      .as[(Long, Double, Long)].collect().toSet
    val expected = rows.filter { case (_, x, y) =>
      !rows.exists { case (_, bx, by) =>
        bx <= x && by >= y && (bx < x || by > y) } }.toSet
    assert(!expected.exists(_._1 == 2L), "sanity: row 2 is dominated")
    assert(got == expected, "double-x skyline diverged from definition")
    // randomized double-x corpus vs brute force
    val rd = data.map { case (i, x, y) => (i, x / 8.0, y) }
    val got2 = Pareto.skyline2d(rd.toDF("id", "x", "y"), "x", "y")
      .as[(Long, Double, Long)].collect().toSet
    val exp2 = rd.filter { case (_, x, y) =>
      !rd.exists { case (_, bx, by) =>
        bx <= x && by >= y && (bx < x || by > y) } }.toSet
    assert(got2 == exp2, "random double-x skyline diverged")
  }

  test("NULL x is dropped up front in BOTH dispatch paths (an unranked " +
      "point must not poison the frontier); NULL partition keys are a " +
      "kept group in both") {
    // same logical data, x typed Long (integral path) vs Double
    // (fractional path); three NULL-x rows that must not affect the
    // frontier of the non-null rows
    val base = Seq(
      (1L, Some(3L), 10L), (2L, Some(5L), 8L), (3L, None, 20L),
      (4L, None, 7L), (5L, None, 20L), (6L, Some(1L), 2L))
    val longDf = base.toDF("id", "x", "y")
    val dblDf = longDf.withColumn("x", col("x").cast("double"))
    val gotL = Pareto.skyline2d(longDf, "x", "y")
      .select("id").as[Long].collect().toSet
    val gotD = Pareto.skyline2d(dblDf, "x", "y")
      .select("id").as[Long].collect().toSet
    // frontier of the non-null rows alone: (1,2) at x=3/5 beaten by
    // nothing smaller; id 6 (x=1, y=2) is the low-x anchor
    val expected = Set(1L, 6L)
    assert(gotL == expected,
      s"NULL x poisoned the integral frontier: $gotL")
    assert(gotD == gotL,
      s"paths disagree on NULL x: integral=$gotL fractional=$gotD")
    // a NULL PARTITION key is its own legitimate group in both paths
    val gp = longDf.filter(col("x").isNotNull).withColumn("g",
      when(col("id") === 1L, lit(7L)))
    val gotGL = Pareto.skyline2d(gp, "x", "y", Seq("g"))
      .select("id").as[Long].collect().toSet
    val gotGD = Pareto.skyline2d(
      gp.withColumn("x", col("x").cast("double")), "x", "y", Seq("g"))
      .select("id").as[Long].collect().toSet
    assert(gotGL == Set(1L, 2L, 6L),
      s"NULL-group rows must keep their own frontier: $gotGL")
    assert(gotGD == gotGL,
      s"paths disagree on NULL group key: $gotGL vs $gotGD")
  }

  test("fold(skyline(hist), batch) == skyline(hist ∪ batch) on " +
      "randomized splits") {
    val df = data.toDF("id", "x", "y")
    val expected = brute(data)
    for (mod <- Seq(2L, 3L, 5L)) {
      val hist = df.filter(col("id") % mod =!= 0)
      val batch = df.filter(col("id") % mod === 0)
      val standing = Pareto.skyline2d(hist, "x", "y")
      val got = Pareto.fold(standing, batch, "x", "y")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"fold at split id%$mod lost the identity")
    }
  }
}
