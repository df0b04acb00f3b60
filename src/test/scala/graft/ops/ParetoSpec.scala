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
