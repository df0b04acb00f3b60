package graft.functions

import graft.SparkSuite

/** KLL quantile sketch: exactness below capacity, rank-error bound under
  * compaction (direct and merged builds), serialization, and the SQL
  * surface incl. the rollup path and the empty sentinel. */
class KllSpec extends SparkSuite {
  import spark.implicits._

  test("small input: sketch is exact while never compacted") {
    val buf = new Kll.Buffer(256)
    (1 to 100).reverse.foreach(i => buf.update(i.toDouble))
    val bytes = Kll.toBytes(buf)
    assert(Kll.quantile(bytes, 0.5).contains(50.0))
    assert(Kll.quantile(bytes, 0.0).contains(1.0))
    assert(Kll.quantile(bytes, 1.0).contains(100.0))
    assert(Kll.quantile(Array.emptyByteArray, 0.5).isEmpty)
  }

  test("rank error within 2% over 200k values — direct build and 64-way merge") {
    val n = 200000
    // deterministic LCG stream — reproducible without java.util.Random
    var x = 12345L
    val vals = Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 11).toDouble / (1L << 53).toDouble
    }
    val direct = new Kll.Buffer(256)
    vals.foreach(direct.update)
    val merged = vals.grouped(n / 64 + 1).map { chunk =>
      val b = new Kll.Buffer(256); chunk.foreach(b.update); b
    }.reduce((a, b) => a.mergeFrom(b))
    val sorted = vals.sorted
    for (buf <- Seq(direct, merged); q <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
      val est = Kll.quantile(Kll.toBytes(buf), q).get
      val rank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(rank - q) <= 0.02, s"q=$q estimated at rank $rank")
    }
  }

  test("mixed-k merge: either order stays within the SMALLER k's rank " +
      "bound and the orders agree within it (KllMergeAgg keeps the smaller k)") {
    val n = 200000
    var x = 98765L
    val vals = Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 11).toDouble / (1L << 53).toDouble
    }
    val (va, vb) = vals.splitAt(n / 2)
    def sk(k: Int, vs: Array[Double]) = {
      val b = new Kll.Buffer(k); vs.foreach(b.update); b
    }
    // the aggregate's merge policy: fold the larger-k sketch INTO the
    // smaller-k one, so the result's accuracy contract is the smaller k's
    val order1 = sk(64, va).mergeFrom(sk(256, vb)) // A's half holds k=64
    val order2 = sk(64, vb).mergeFrom(sk(256, va)) // B's half holds k=64
    assert(order1.k == 64 && order2.k == 64)
    assert(order1.n == n && order2.n == n)
    val sorted = vals.sorted
    val bound = 0.04 // k=64 ⇒ ~3% observed rank error; 2% was the k=256 pin
    for (q <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
      val r1 = sorted.count(_ <= Kll.quantile(Kll.toBytes(order1), q).get).toDouble / n
      val r2 = sorted.count(_ <= Kll.quantile(Kll.toBytes(order2), q).get).toDouble / n
      assert(math.abs(r1 - q) <= bound, s"order1 q=$q at rank $r1")
      assert(math.abs(r2 - q) <= bound, s"order2 q=$q at rank $r2")
      assert(math.abs(r1 - r2) <= bound, s"orders disagree at q=$q: $r1 vs $r2")
    }
  }

  test("serialization round-trips the full structure") {
    val buf = new Kll.Buffer(64)
    (1 to 5000).foreach(i => buf.update((i % 97).toDouble))
    val back = Kll.fromBytes(Kll.toBytes(buf))
    assert(back.k == buf.k && back.n == buf.n && back.compactions == buf.compactions)
    assert(back.levels.map(_.toSeq) == buf.levels.map(_.toSeq))
  }

  test("SQL surface: per-group sketch, rollup merge, empty merge is NULL") {
    (1 to 10000).map(i => (i % 2, i.toDouble)).toDF("g", "v")
      .createOrReplaceTempView("kll_in")
    val perGroup = spark.sql(
      """SELECT g, graft_kll_quantile(graft_kll_sketch(v), 0.5d) AS p50
        |FROM kll_in GROUP BY g""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(perGroup(0) - 5000.0) <= 250.0)
    assert(math.abs(perGroup(1) - 5000.0) <= 250.0)
    val rolled = spark.sql(
      """SELECT graft_kll_quantile(graft_kll_merge(sk), 0.5d) AS p50
        |FROM (SELECT g, graft_kll_sketch(v) AS sk FROM kll_in GROUP BY g)""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(rolled - 5000.0) <= 250.0)
    val empty = spark.sql(
      """SELECT graft_kll_quantile(graft_kll_merge(sk), 0.5d) AS p50
        |FROM (SELECT g, graft_kll_sketch(v) AS sk FROM kll_in WHERE v < 0 GROUP BY g)""".stripMargin)
      .head()
    assert(empty.isNullAt(0))
  }
}
