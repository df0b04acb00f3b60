package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the Count–Min frequency sketch: one-sided error, the ε·N
  * bound, bit-identical merge invariance (the property Misra–Gries
  * cannot give), shape-mismatch rejection, and the empty sentinel. */
class CmSpec extends SparkSuite {
  import spark.implicits._

  // zipf-ish corpus: term t_i appears ~N/i times — heavy head, long tail
  private lazy val terms = (1 to 200).flatMap(i =>
    Seq.fill(2000 / i)(s"t_$i")).toDF("term")

  test("estimates are one-sided (never undercount) and inside the eN bound") {
    val exact = terms.groupBy("term").count().as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val sk = terms.agg(call_function("graft_cm_sketch", col("term")).as("sk"))
    val est = sk.select(explode(typedLit(exact.keys.toSeq)).as("term"), col("sk"))
      .select(col("term"),
        call_function("graft_cm_estimate", col("sk"), col("term")).as("est"))
      .as[(String, Long)].collect().toMap
    val bound = math.ceil(math.E / 2048 * n).toLong
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t undercounted: ${est(t)} < $c")
      assert(est(t) <= c + bound, s"$t overcounted past eN: ${est(t)} vs $c + $bound")
    }
  }

  test("merged sketch is BIT-IDENTICAL for any partitioning and rollup shape") {
    def bytesOf(df: org.apache.spark.sql.DataFrame): Seq[Byte] =
      df.head().getAs[Array[Byte]](0).toSeq
    val one = bytesOf(terms.repartition(1)
      .agg(call_function("graft_cm_sketch", col("term"))))
    assert(bytesOf(terms.repartition(32)
      .agg(call_function("graft_cm_sketch", col("term")))) == one)
    // rollup: per-group sketches merged == direct, exactly
    val rolled = bytesOf(terms
      .withColumn("g", length(col("term")) % 5)
      .groupBy("g").agg(call_function("graft_cm_sketch", col("term")).as("sk"))
      .agg(call_function("graft_cm_merge", col("sk"))))
    assert(rolled == one)
    // the total-row count survives the rollup
    val nRolled = terms
      .withColumn("g", length(col("term")) % 5)
      .groupBy("g").agg(call_function("graft_cm_sketch", col("term")).as("sk"))
      .agg(call_function("graft_cm_total",
        call_function("graft_cm_merge", col("sk")))).head().getLong(0)
    assert(nRolled == terms.count())
  }

  test("serialization round-trips; unseen item estimates small; empty sentinel is 0") {
    val buf = new Cm.Buffer(4, 2048)
    Seq("a", "b", "a").foreach(s => buf.add(s.getBytes("UTF-8")))
    val back = Cm.fromBytes(Cm.toBytes(buf))
    assert(back.estimate("a".getBytes("UTF-8")) == 2L)
    assert(back.estimate("b".getBytes("UTF-8")) == 1L)
    assert(back.n == 3L)
    // unseen: can only collide upward, and with 3 rows in 4x2048 cells
    // the deterministic hash keeps these empty
    assert(back.estimate("zzz".getBytes("UTF-8")) <= 3L)
    // merge-of-nothing sentinel estimates 0 and totals 0
    val row = terms.limit(0)
      .agg(call_function("graft_cm_sketch", col("term")).as("one"))
      .select(
        call_function("graft_cm_estimate", col("one"), lit("a")).as("e"),
        call_function("graft_cm_total", col("one")).as("t"))
      .head()
    assert(row.getLong(0) == 0L && row.getLong(1) == 0L)
  }

  test("join-size inner product: >= true size, near-exact when sparse, " +
      "shape-checked") {
    // A: t_i × i for i in 1..20; B: t_i × (21-i) → true Σ fa·fb known
    val a = (1 to 20).flatMap(i => Seq.fill(i)(s"t_$i")).toDF("term")
    val b = (1 to 20).flatMap(i => Seq.fill(21 - i)(s"t_$i")).toDF("term")
    val trueSize = (1 to 20).map(i => i.toLong * (21 - i)).sum
    val row = a.agg(call_function("graft_cm_sketch", col("term")).as("ska"))
      .crossJoin(b.agg(call_function("graft_cm_sketch", col("term")).as("skb")))
      .select(call_function("graft_cm_join_size", col("ska"), col("skb")))
      .head()
    val est = row.getLong(0)
    // one-sided, and with 20 terms in 4x2048 cells effectively exact
    assert(est >= trueSize && est <= trueSize + 10, s"est=$est true=$trueSize")
    val mism = a.agg(
        call_function("graft_cm_sketch", col("term"), lit(1024), lit(4)).as("ska"))
      .crossJoin(b.agg(call_function("graft_cm_sketch", col("term")).as("skb")))
      .select(call_function("graft_cm_join_size", col("ska"), col("skb")))
    intercept[Exception] { mism.collect() }
  }

  test("corrupt headers die in fromBytes with a real message, not later") {
    // d=w=65536 overflows d*w to 0 in Int — the length check must be
    // done in Long and reject this BEFORE allocating anything
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putInt(65536); bb.putInt(65536); bb.putLong(0L)
    val ex = intercept[IllegalArgumentException] { Cm.fromBytes(bb.array()) }
    assert(ex.getMessage.contains("malformed CM sketch"))
    intercept[IllegalArgumentException] {
      val neg = java.nio.ByteBuffer.allocate(16)
      neg.putInt(-4); neg.putInt(2048); neg.putLong(0L)
      Cm.fromBytes(neg.array())
    }
  }

  test("differently-shaped sketches refuse to merge") {
    val a = new Cm.Buffer(4, 2048)
    val b = new Cm.Buffer(4, 1024)
    intercept[IllegalArgumentException] { a.mergeFrom(b) }
    val skA = terms.agg(
      call_function("graft_cm_sketch", col("term"), lit(2048), lit(4)).as("sk"))
    val skB = terms.agg(
      call_function("graft_cm_sketch", col("term"), lit(1024), lit(4)).as("sk"))
    val ex = intercept[Exception] {
      skA.union(skB).agg(call_function("graft_cm_merge", col("sk"))).collect()
    }
    assert(ex.getMessage != null)
  }
}
