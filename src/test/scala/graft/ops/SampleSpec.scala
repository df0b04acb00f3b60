package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Deterministic sampling operators. The hash-gate family is pinned at
  * plan level in PlansSpec (scan-level filter, no shuffle) and by oracle
  * in q20/q51; here the budget-prefix operator's exactness and
  * partition-independence. */
class SampleSpec extends SparkSuite {
  import spark.implicits._

  private def fixture = (1 to 200).map { i =>
    // scores with heavy ties, unique ids, varied weights
    (i.toLong, (i % 13).toDouble, (i % 7) + 1L)
  }.toDF("id", "score", "w")

  private def run(partitions: Int, budget: Long): Set[Long] =
    Sample.takeByBudget(fixture, "score", "id", "w", budget, partitions)
      .select("id").as[Long].collect().toSet

  test("takeByBudget: exact prefix of the global (score desc, id) order") {
    val rows = fixture.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy { case (id, s, _) => (-s, id) }
    var acc = 0L
    val expected = rows.takeWhile { case (_, _, w) => { acc += w; acc <= 150 } }
      .map(_._1).toSet
    assert(run(4, 150L) == expected)
  }

  test("takeByBudget: result is independent of the partition count") {
    val base = run(1, 300L)
    assert(base.nonEmpty)
    Seq(3, 7, 32).foreach(p => assert(run(p, 300L) == base, s"partitions=$p"))
  }

  test("takeByBudget: zero budget selects nothing, ample budget everything") {
    assert(run(4, 0L).isEmpty)
    assert(run(4, 10000L).size == 200)
  }

  test("epochShuffle: a true permutation, shard-major order == global " +
      "h-order, epochs decorrelate, partition-count-invariant") {
    val df = (0L until 1000L).toDF("doc_id")
    val out = Sample.epochShuffle(df, "doc_id", epoch = 2, shards = 8)
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect()
    // permutation: every row present once, (shard, pos) unique, pos dense
    assert(out.length == 1000)
    assert(out.map(r => (r._2, r._3)).distinct.length == 1000)
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(0L until rows.length))
    }
    // shard-major concatenation replays the global hash order
    val concat = out.sortBy(r => (r._2, r._3)).map(_._1).toSeq
    def h(k: Long, e: Long) =
      ((k * Text.Mult % Text.P) + e) * Text.Mult % Text.P
    assert(concat == (0L until 1000L).sortBy(k => (h(k, 2), k)))
    // a different epoch is a different permutation of the same rows
    val e3 = Sample.epochShuffle(df, "doc_id", epoch = 3, shards = 8)
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect()
      .sortBy(r => (r._2, r._3)).map(_._1).toSeq
    assert(e3.toSet == concat.toSet && e3 != concat)
    // determinism across physical partitionings
    val repart = Sample.epochShuffle(df.repartition(13), "doc_id", 2, 8)
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect().toSet
    assert(repart == out.toSet)
    // output-name collisions are refused
    intercept[IllegalArgumentException] {
      Sample.epochShuffle(df.withColumn("pos", lit(1)), "doc_id", 0, 4)
    }
  }

  test("systematicPps: sum of picks == n exactly, heavy rows carry " +
      "multiplicity, zero weights never picked, partition-invariant") {
    val df = (1L to 300L).map { i =>
      // one dominant row (w=5000 > W/n), a zero-weight row, varied rest
      val w = if (i == 7L) 5000L else if (i == 8L) 0L else (i % 17) + 1L
      (i, w)
    }.toDF("id", "w")
    val out = Sample.systematicPps(df, "id", "w", n = 50L)
      .select("id", "n_picks").as[(Long, Long)].collect().toMap
    assert(out.values.sum == 50L, s"picks must total n: $out")
    val totalW = 5000L + (1L to 300L).filter(i => i != 7 && i != 8)
      .map(i => (i % 17) + 1L).sum
    // the dominant row's multiplicity ~ n*w/W, never less than floor-1
    assert(out(7L) >= 50L * 5000L / totalW - 1, s"heavy row underpicked: ${out.get(7L)}")
    assert(!out.contains(8L), "zero-weight row must never be picked")
    // identical draw at any physical partitioning / partitions arg
    val re = Sample.systematicPps(df.repartition(13), "id", "w", 50L, partitions = 5)
      .select("id", "n_picks").as[(Long, Long)].collect().toMap
    assert(re == out)
    // negative weights fail the job rather than mis-sample
    intercept[Exception] {
      Sample.systematicPps(Seq((1L, -2L)).toDF("id", "w"), "id", "w", 10L).collect()
    }
    // empty input: empty result, schema intact
    val empty = Sample.systematicPps(df.limit(0), "id", "w", 10L)
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("id", "w", "n_picks"))
  }

  test("prioritySample: exact replay of the priority draw, estimator " +
      "weights max(w, tau), partition-invariant, small inputs exhaustive") {
    val df = (1L to 300L).map(i => (i, (i % 23) + 1L)).toDF("id", "w")
    val out = Sample.prioritySample(df, "id", "w", n = 40)
      .select(col("id"), col("priority"), col("est_weight"))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    // scala replay of the exact same arithmetic
    def pri(id: Long, w: Long): Double =
      w.toDouble / (((id * Text.Mult % Text.P) + 1).toDouble / Text.P)
    val all = (1L to 300L).map(i => (i, (i % 23) + 1L))
      .map { case (id, w) => (id, w, pri(id, w)) }
      .sortBy { case (id, _, p) => (-p, id) }
    val tau = all(40)._3
    val expected = all.take(40)
      .map { case (id, w, p) => (id, p, math.max(w.toDouble, tau)) }
      .sortBy(_._1)
    assert(out.toSeq == expected)
    // partition invariance
    val re = Sample.prioritySample(df.repartition(13), "id", "w", 40)
      .select(col("id"), col("priority"), col("est_weight"))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(re.toSeq == expected)
    // input smaller than n: exhaustive, tau = 0, est_weight == w exactly
    val small = Sample.prioritySample(df.limit(5), "id", "w", n = 40)
      .select(col("w").cast("double"), col("est_weight"))
      .as[(Double, Double)].collect()
    assert(small.length == 5 && small.forall { case (w, e) => w == e })
    // refusals: output-column collision, negative weight
    intercept[IllegalArgumentException] {
      Sample.prioritySample(df.withColumn("priority", lit(1)), "id", "w", 10)
    }
    intercept[Exception] {
      Sample.prioritySample(Seq((1L, -2L)).toDF("id", "w"), "id", "w", 10).collect()
    }
  }

  test("prioritySampleByGroup: group-local draw replayed exactly, " +
      "small groups exhaustive with est == w") {
    // group 'a': 100 rows (sampled), group 'b': 3 rows (exhaustive)
    val df = ((1L to 100L).map(i => (i, "a", (i % 19) + 1L)) ++
      (101L to 103L).map(i => (i, "b", 7L))).toDF("id", "g", "w")
    val out = Sample.prioritySampleByGroup(df, "id", "w", "g", n = 10)
      .select(col("id"), col("g"), col("priority"), col("est_weight"))
      .as[(Long, String, Double, Double)].collect()
    def pri(id: Long, w: Long): Double =
      w.toDouble / (((id * Text.Mult % Text.P) + 1).toDouble / Text.P)
    val a = (1L to 100L).map(i => (i, (i % 19) + 1L))
      .map { case (id, w) => (id, w, pri(id, w)) }
      .sortBy { case (id, _, p) => (-p, id) }
    val tauA = a(10)._3
    val expectA = a.take(10)
      .map { case (id, w, p) => (id, "a", p, math.max(w.toDouble, tauA)) }
    assert(out.filter(_._2 == "a").sortBy(_._1).toSeq == expectA.sortBy(_._1))
    // group b is exhaustive: all 3 rows, tau = 0, est == w exactly
    val b = out.filter(_._2 == "b")
    assert(b.length == 3 && b.forall(_._4 == 7.0))
  }

  test("takeByBudget: empty input yields an empty, correctly-schemed frame") {
    val empty = Seq.empty[(Long, Double, Long)].toDF("id", "score", "w")
    val out = Sample.takeByBudget(empty, "score", "id", "w", 100L)
    assert(out.columns.toSeq == Seq("id", "score", "w"))
    assert(out.isEmpty)
  }

  test("strideInterleave: weight-2 source takes twice the slots, " +
      "deterministic exact virtual times, bad weight rejected") {
    val df = (1L to 6L).map(i => (i, "a")) ++ (11L to 16L).map(i => (i, "b"))
    val sched = Sample.strideInterleave(
      df.toDF("id", "src"), "id", "src", Seq("a" -> 2), defaultWeight = 1)
    val S = Sample.InterleaveStride
    // a's virtual times: k·S/2; b's: k·S — a fires twice per b slot
    val got = sched.orderBy(col("vt"), col("src"), col("id"))
      .as[(Long, String, Long)].collect().toSeq
    val expected = Seq(
      (1L, "a", S / 2), (2L, "a", S), (11L, "b", S),
      (3L, "a", 3 * S / 2), (4L, "a", 2 * S), (12L, "b", 2 * S),
      (5L, "a", 5 * S / 2), (6L, "a", 3 * S), (13L, "b", 3 * S),
      (14L, "b", 4 * S), (15L, "b", 5 * S), (16L, "b", 6 * S))
    assert(got == expected)
    // ties between sources at equal vt resolve by source name (a < b)
    assert(got(1) == ((2L, "a", S)) && got(2) == ((11L, "b", S)))
    // a weight that does not divide the stride is a hard error
    intercept[IllegalArgumentException] {
      Sample.strideInterleave(df.toDF("id", "src"), "id", "src", Seq("a" -> 11))
    }
  }

  test("neymanSample: budget follows N·σ (zero-variance and singleton " +
      "strata get none), proportional fallback when all σ = 0, " +
      "deterministic hash-rank draw") {
    // A varies (σ > 0, 12 rows), B is constant (σ = 0), C is a singleton
    val rows = (1L to 12L).map(i => (i, "A", if (i % 2 == 0) 100L else 0L)) ++
      (21L to 28L).map(i => (i, "B", 5L)) ++ Seq((31L, "C", 9L))
    val df = rows.toDF("id", "src", "v")
    val got = Sample.neymanSample(df, "id", "src", "v", budget = 10)
      .orderBy("src", "strat_rank")
      .as[(Long, String, Long, Long)].collect().toSeq
    // every sampled row is from A, alloc 10, ranks 1..10
    assert(got.map(_._2).distinct == Seq("A"))
    assert(got.map(_._4).distinct == Seq(10L))
    assert(got.map(_._3) == (1L to 10L))
    // the draw is the hash-rank order, a pure function of the ids
    val expectedOrder = (1L to 12L)
      .sortBy(i => (i * Text.Mult % Text.P, i)).take(10)
    assert(got.map(_._1) == expectedOrder)
    // all-constant strata: proportional fallback with exact-integer total
    val flat = ((1L to 6L).map(i => (i, "A", 7L)) ++
      (11L to 13L).map(i => (i, "B", 7L))).toDF("id", "src", "v")
    val fb = Sample.neymanSample(flat, "id", "src", "v", budget = 10)
      .groupBy("src").agg(max("alloc").as("alloc"), count(lit(1)).as("n"))
      .orderBy("src")
      .as[(String, Long, Long)].collect().toSeq
    // targets 20/3 and 10/3 -> bases 6 and 3, the one extra goes to the
    // larger remainder (A at .667)
    assert(fb == Seq(("A", 7L, 6L), ("B", 3L, 3L)),
      s"proportional fallback drifted: $fb")
    // values where a LongType Σx² silently wraps (x = 4e9 → x² ≈
    // 1.6e19 > Long.MaxValue): the decimal moments must keep the
    // high-variance stratum's allocation, not corrupt it to garbage
    val big = Seq((1L, "A", 4000000000L), (2L, "A", 0L),
      (3L, "B", 5L), (4L, "B", 5L)).toDF("id", "src", "v")
    val bigAlloc = Sample.neymanSample(big, "id", "src", "v", budget = 2)
      .groupBy("src").agg(max("alloc").as("alloc")).orderBy("src")
      .as[(String, Long)].collect().toSeq
    // σ(B) = 0, so ALL budget must land on A (zero-alloc strata emit
    // no rows, like the first subtest's B) — a wrapped Σx² flips A's
    // variance negative/garbage and loses this
    assert(bigAlloc == Seq(("A", 2L)),
      s"large-value stratum lost its allocation (Σx² wrap?): $bigAlloc")
  }

  test("neymanSample: a 38-digit variance-numerator overflow FAILS the " +
      "job loudly instead of silently emitting an empty sample") {
    // two rows near Long.MaxValue: the exact Σx² ≈ (9.2e18)² ≈ 8.5e37
    // and the N·(N·Σx² − (Σx)²) numerator passes 38 digits. Under ANSI
    // (this engine's default) the Decimal(38,0) aggregate itself
    // throws NUMERIC_VALUE_OUT_OF_RANGE; with ANSI off the overflow
    // degrades to NULL and the raise_error guard fires, naming the
    // stratum. Either way the job must FAIL — never silently return an
    // empty sample.
    val big = Seq((1L, "HOT", Long.MaxValue - 1), (2L, "HOT", 1L),
      (3L, "B", 5L), (4L, "B", 6L)).toDF("id", "src", "v")
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val e = intercept[Exception] {
      Sample.neymanSample(big, "id", "src", "v", budget = 2).collect()
    }
    assert(messages(e).exists(m =>
        (m.contains("neymanSample") && m.contains("HOT")) ||
          m.contains("NUMERIC_VALUE_OUT_OF_RANGE")),
      s"expected a loud overflow failure, got: $e")
    // the ANSI-off silent-null path: the guard must fire with the
    // stratum name instead of emptying the sample
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val e2 = intercept[Exception] {
        Sample.neymanSample(big, "id", "src", "v", budget = 2).collect()
      }
      assert(messages(e2).exists(m =>
          m.contains("neymanSample") && m.contains("HOT")),
        s"expected the guard to name stratum HOT, got: $e2")
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("priorityTopK is a mergeable sketch: top-(n+1) of unioned " +
      "partial states resolves to the one-shot sample exactly") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, (i * 7) % 97 + 1)).toDF("id", "w")
    val n = 20
    val oneShot = Sample.prioritySample(df, "id", "w", n)
      .orderBy("id").collect().toSeq
    // split into three disjoint parts, fold their top-(n+1) states
    val parts = Seq(
      df.filter(col("id") % 3 === 0), df.filter(col("id") % 3 === 1),
      df.filter(col("id") % 3 === 2))
    val folded = parts.map(Sample.priorityTopK(_, "id", "w", n))
      .reduce(_ unionByName _)
      .orderBy(col("priority").desc, col("id")).limit(n + 1)
    val resolved = Sample.priorityFinish(folded, "id", "w", n)
      .orderBy("id").collect().toSeq
    assert(resolved == oneShot,
      "fold of partial top-(n+1) states must equal the one-shot draw " +
        "(τ and estimator weights included)")
  }
}
