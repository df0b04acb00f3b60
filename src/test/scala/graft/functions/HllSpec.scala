package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the HLL sketch aggregate: error bound vs exact NDV, merge
  * determinism under repartitioning (register max is commutative), and
  * duplicate insensitivity. */
class HllSpec extends SparkSuite {
  import spark.implicits._

  private def estimate(n: Int, partitions: Int): Long =
    (1L to n.toLong).toDF("v").repartition(partitions)
      .agg(call_function("graft_hll_distinct", col("v")))
      .head().getLong(0)

  test("estimate within error bound across scales (p=12 → ~1.6% stddev)") {
    // 4% bound, not the asymptotic 1.6%: n=5000 sits in the linear-counting
    // → HLL crossover (n ≈ m=4096) where plain HLL has a known bias bump
    // (the zone HLL++'s bias-correction tables exist for), and n=100 pays
    // a few absolute counts of register-collision variance. The fixed hash
    // makes every estimate deterministic, so this cannot flake.
    for (n <- Seq(100, 5000, 100000)) {
      val est = estimate(n, 4)
      val errOk = math.abs(est - n) <= math.max(0.04 * n, 5.0)
      assert(errOk, s"n=$n est=$est")
    }
  }

  test("partitioning cannot change the estimate (merge is register max)") {
    val one = estimate(20000, 1)
    assert(estimate(20000, 7) == one)
    assert(estimate(20000, 32) == one)
  }

  test("duplicates do not move the estimate") {
    val base = (1L to 1000L).toDF("v")
    val dup = base.union(base).union(base)
    val a = base.agg(call_function("graft_hll_distinct", col("v"))).head().getLong(0)
    val b = dup.agg(call_function("graft_hll_distinct", col("v"))).head().getLong(0)
    assert(a == b)
  }

  test("sketch -> merge -> estimate rollup == direct estimate, any grouping") {
    // the materialized-cube identity: per-day sketches rolled up must
    // give EXACTLY the direct whole-table estimate (register max is
    // commutative/idempotent and the hash is fixed)
    val df = (1L to 50000L).map(v => (v % 37, v)).toDF("day", "v")
    val direct = df.agg(call_function("graft_hll_distinct", col("v")))
      .head().getLong(0)
    val rolled = df
      .groupBy("day").agg(call_function("graft_hll_sketch", col("v")).as("sk"))
      .agg(call_function("graft_hll_estimate",
        call_function("graft_hll_merge", col("sk"))))
      .head().getLong(0)
    assert(rolled == direct)
    // two-level rollup tree (day -> week -> total) gives the same answer
    val twoLevel = df
      .groupBy("day").agg(call_function("graft_hll_sketch", col("v")).as("sk"))
      .groupBy(col("day") % 7).agg(call_function("graft_hll_merge", col("sk")).as("sk"))
      .agg(call_function("graft_hll_estimate",
        call_function("graft_hll_merge", col("sk"))))
      .head().getLong(0)
    assert(twoLevel == direct)
  }

  test("merging sketches of different precision fails loudly") {
    val df = (1L to 100L).toDF("v")
    val sk8 = df.agg(call_function("graft_hll_sketch", col("v"), lit(8)).as("sk"))
    val sk12 = df.agg(call_function("graft_hll_sketch", col("v"), lit(12)).as("sk"))
    val mixed = sk8.unionByName(sk12)
      .agg(call_function("graft_hll_merge", col("sk")))
    val e = intercept[Exception] { mixed.collect() }
    // the INTENDED failure, not any crash: the mergeInto precision guard
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("different precision")), messages(e).mkString(" | "))
  }

  test("nulls are ignored; explicit precision argument respected") {
    val df = Seq[Option[Long]](Some(1L), None, Some(2L), Some(2L)).toDF("v")
    val est = df.agg(call_function("graft_hll_distinct", col("v"))).head().getLong(0)
    assert(est == 2L)
    val p8 = df.agg(call_function("graft_hll_distinct", col("v"), lit(8))).head().getLong(0)
    assert(p8 == 2L)
  }
}
