package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the KMV bottom-k sketch family: NDV error bound, exactness
  * under k, partitioning/rollup invariance, and set-overlap (Jaccard /
  * intersection) estimation between materialized sketches. */
class KmvSpec extends SparkSuite {
  import spark.implicits._

  private def sketchOf(df: org.apache.spark.sql.DataFrame, k: Int = 1024) =
    df.agg(call_function("graft_kmv_sketch", col("v"), lit(k)).as("sk"))

  test("NDV estimate: exact under k, within ~3x stderr above k") {
    // under k distinct values the sketch IS the distinct set
    val small = (1L to 500L).toDF("v")
    assert(sketchOf(small).select(
      call_function("graft_kmv_estimate", col("sk"))).head().getLong(0) == 500L)
    // above k: (k-1)/theta, error ~ 1/sqrt(k-2) ~ 3.1% at k=1024
    val big = (1L to 100000L).toDF("v")
    val est = sketchOf(big).select(
      call_function("graft_kmv_estimate", col("sk"))).head().getLong(0)
    assert(math.abs(est - 100000L) < 10000, s"est=$est")
  }

  test("estimate is partitioning- and rollup-invariant (bottom-k union)") {
    val df = (1L to 50000L).map(v => (v % 23, v)).toDF("day", "v")
    def direct(parts: Int) = df.repartition(parts)
      .agg(call_function("graft_kmv_sketch", col("v")).as("sk"))
      .select(call_function("graft_kmv_estimate", col("sk"))).head().getLong(0)
    val one = direct(1)
    assert(direct(7) == one && direct(32) == one)
    val rolled = df.groupBy("day")
      .agg(call_function("graft_kmv_sketch", col("v")).as("sk"))
      .agg(call_function("graft_kmv_estimate",
        call_function("graft_kmv_merge", col("sk"))))
      .head().getLong(0)
    assert(rolled == one)
  }

  test("merge is IDEMPOTENT: re-merging the same sketch is absorbed — " +
      "the at-least-once streaming-fold guarantee (q115)") {
    val df = (1L to 30000L).map(v => v % 9000).toDF("v")
    val sk = df.agg(call_function("graft_kmv_sketch", col("v")).as("sk"))
    // once vs the same sketch three times: bit-identical union
    val once = sk.select(col("sk"))
    val thrice = once.unionAll(once).unionAll(once)
    def est(frame: org.apache.spark.sql.DataFrame) = frame
      .agg(call_function("graft_kmv_merge", col("sk")).as("m"))
      .select(call_function("graft_kmv_estimate", col("m"))).head().getLong(0)
    assert(est(thrice) == est(once))
    val bytesOnce = once
      .agg(call_function("graft_kmv_merge", col("sk"))).head().getAs[Array[Byte]](0)
    val bytesThrice = thrice
      .agg(call_function("graft_kmv_merge", col("sk"))).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(bytesOnce, bytesThrice))
  }

  test("Jaccard between sketches tracks true overlap") {
    // A = [1, 60k], B = [40k+1, 100k] → |∩|=20k, |∪|=100k, J=0.2
    val a = (1L to 60000L).toDF("v")
    val b = (40001L to 100000L).toDF("v")
    val j = sketchOf(a).crossJoin(sketchOf(b).withColumnRenamed("sk", "skb"))
      .select(call_function("graft_kmv_jaccard", col("sk"), col("skb")))
      .head().getDouble(0)
    assert(math.abs(j - 0.2) < 0.05, s"jaccard=$j")
    // disjoint sets → 0
    val d = (200000L to 210000L).toDF("v")
    val j0 = sketchOf(a).crossJoin(sketchOf(d).withColumnRenamed("sk", "skb"))
      .select(call_function("graft_kmv_jaccard", col("sk"), col("skb")))
      .head().getDouble(0)
    assert(j0 == 0.0)
    // identical sets → 1
    val j1 = sketchOf(a).crossJoin(sketchOf(a).withColumnRenamed("sk", "skb"))
      .select(call_function("graft_kmv_jaccard", col("sk"), col("skb")))
      .head().getDouble(0)
    assert(j1 == 1.0)
  }

  test("intersection cardinality = jaccard * union estimate, near truth") {
    val a = (1L to 60000L).toDF("v")
    val b = (40001L to 100000L).toDF("v")
    // union estimate: aggregate the two sketches as rows of one merge
    val u = sketchOf(a).unionByName(sketchOf(b))
      .agg(call_function("graft_kmv_estimate",
        call_function("graft_kmv_merge", col("sk")))).head().getLong(0)
    val j = sketchOf(a).crossJoin(sketchOf(b).withColumnRenamed("sk", "skb"))
      .select(call_function("graft_kmv_jaccard", col("sk"), col("skb")))
      .head().getDouble(0)
    val inter = j * u
    assert(math.abs(inter - 20000.0) < 4000, s"intersection=$inter (union=$u j=$j)")
  }

  test("merging mixed-k sketches contracts to the smaller k, both orders") {
    val a = (1L to 30000L).toDF("v")
    for (ks <- Seq(Seq(256, 1024), Seq(1024, 256))) {
      val sks = sketchOf(a, ks.head).unionByName(sketchOf(a, ks(1)))
      val est = sks.agg(call_function("graft_kmv_estimate",
        call_function("graft_kmv_merge", col("sk")))).head().getLong(0)
      // same value set, so estimate equals the small-k sketch's estimate
      val small = sketchOf(a, 256).select(
        call_function("graft_kmv_estimate", col("sk"))).head().getLong(0)
      assert(est == small, s"ks=$ks est=$est small=$small")
    }
  }

  test("set algebra (q285 estimators): exact below k, within the union-" +
      "relative band above it, and edge identities hold") {
    def setops(a: Seq[Long], b: Seq[Long], k: Int) = {
      val df = (a.map(v => (0L, v)) ++ b.map(v => (1L, v))).toDF("side", "v")
      val sks = df.groupBy("side")
        .agg(call_function("graft_kmv_sketch", col("v"), lit(k)).as("sk"))
      val ska = sks.filter(col("side") === 0).select(col("sk").as("ska"))
      val skb = sks.filter(col("side") === 1).select(col("sk").as("skb"))
      val sku = sks.agg(call_function("graft_kmv_merge", col("sk")).as("sku"))
      val r = ska.crossJoin(skb).crossJoin(sku).select(
        call_function("graft_kmv_estimate", col("sku")).as("eu"),
        call_function("graft_kmv_jaccard", col("ska"), col("skb")).as("j"),
        call_function("graft_kmv_estimate", col("skb")).as("eb")).head()
      val (eu, j, eb) = (r.getLong(0).toDouble, r.getDouble(1),
        r.getLong(2).toDouble)
      (eu, j * eu, eu - eb) // union, intersection, A-minus-B estimates
    }
    // below k the sketches ARE the distinct sets: every estimate exact
    val (eu1, ei1, ed1) = setops(1L to 300L, 200L to 500L, k = 1024)
    assert(eu1 == 500.0 && ei1 == 101.0 && ed1 == 199.0)
    // identical sides: J = 1, difference estimate exactly 0
    val (eu2, ei2, ed2) = setops(1L to 2000L, 1L to 2000L, k = 64)
    assert(ei2 == eu2 && ed2 == 0.0)
    // disjoint sides above k: intersection within the union-relative band
    val (eu3, ei3, _) = setops(1L to 30000L, 30001L to 60000L, k = 1024)
    assert(math.abs(eu3 - 60000.0) < 6000.0)
    assert(ei3 <= 0.10 * eu3, s"disjoint intersection est $ei3 vs union $eu3")
    // heavy overlap above k: all three inside 10% of the exact union
    val (eu4, ei4, ed4) = setops(1L to 40000L, 10001L to 50000L, k = 1024)
    assert(math.abs(eu4 - 50000.0) < 5000.0)
    assert(math.abs(ei4 - 30000.0) < 5000.0, s"ei=$ei4")
    assert(math.abs(ed4 - 10000.0) < 5000.0, s"ed=$ed4")
  }
}
