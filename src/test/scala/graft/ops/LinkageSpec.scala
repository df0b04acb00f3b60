package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Record linkage, PageRank and corpus-drift invariants beyond what the
  * DuckDB oracles pin (q125–q127): linkage ground-truth recall, rank
  * conservation/determinism, and drift-share accounting.
  */
class LinkageSpec extends SparkSuite {
  import spark.implicits._

  test("blockAndScore: blocking recall 1.0 against ground truth; " +
      "candidates stay linear (no cross join)") {
    val q = graft.SparkEntry.queries("q125_record_linkage")
    val out = q(spark, sfDir()).cache()
    val n = graft.Tables.customer(spark, sfDir()).count()
    // every dirty twin must link back to its clean original...
    val truePairs = out.filter(col("b_key") === col("a_key") + 9000000L).count()
    assert(truePairs == n, s"linkage missed ${n - truePairs} true pairs")
    // ...and every reported match must score as a full agreement or a
    // name+balance coincidence — never a name-only block neighbor
    assert(out.filter(col("score") < 5).isEmpty)
    out.unpersist()
  }

  test("blockAndScore: threshold excludes partial agreements") {
    val left = Seq((1L, "alice", "A", 10.0), (2L, "bob", "B", 20.0))
      .toDF("a_key", "a_name", "blk", "a_bal")
    val right = Seq((11L, "alice", "A", 10.0), (12L, "bobby", "B", 99.0))
      .toDF("b_key", "b_name", "blk", "b_bal")
    val m = Linkage.blockAndScore(left, right, Seq("blk"), Seq(
      (levenshtein(col("a_name"), col("b_name")) <= 1, 3),
      (col("a_bal") === col("b_bal"), 2)), threshold = 5)
    // (1,11): lev 0 + bal equal = 5 → match; (2,12): lev 2, bal differ → 0
    assert(m.select("a_key", "b_key").as[(Long, Long)].collect().toSet ==
      Set((1L, 11L)))
  }

  test("pageRank: node set stable, floor(rank) ≥ base, total mass " +
      "conserved up to floor loss, and bit-deterministic across runs") {
    // two triangles bridged by one edge + an isolated symmetric pair
    val half = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (4L, 6L), (10L, 11L))
    val e = (half ++ half.map(_.swap)).toDF("src", "dst")
    val r1 = Components.pageRank(e, "src", "dst", iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 10L, 11L))
    assert(r1.values.forall(_ >= 150000000L), "rank below damping base")
    val total = r1.values.sum
    val ideal = r1.size * 1000000000L
    assert(total <= ideal && total > ideal - r1.size * 200L,
      s"mass not conserved: $total vs $ideal")
    // the isolated 2-cycle fixpoints at exactly 1.0 (scaled):
    // 0.15 + 0.85 * 1.0 = 1.0, integer-exact at every iteration
    assert(r1(10L) == 1000000000L && r1(11L) == 1000000000L)
    // bridge vertices (3,4) outrank their triangle peers
    assert(r1(3L) > r1(2L) && r1(4L) > r1(5L))
    val r2 = Components.pageRank(e, "src", "dst", iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == r2, "integer PageRank must be bit-deterministic")
  }

  test("containment: exact inclusion and non-inclusion on known domains") {
    val a = Seq(1L, 2L, 2L, 3L).toDF("k")
    val b = Seq(1L, 2L, 3L, 4L).toDF("j")
    val in = Linkage.containment(a, "k", b, "j").head()
    assert((in.getLong(0), in.getLong(1)) == ((3L, 0L)), "full inclusion")
    val out = Linkage.containment(b, "j", a, "k").head()
    assert((out.getLong(0), out.getLong(1)) == ((4L, 1L)), "4 missing 1")
  }

  test("containment: native-type string keys compare correctly, mixed " +
      "int widths widen, and incompatible key types fail loudly") {
    // round-9 advice: the old cast-to-long nulled string keys on both
    // sides and reported containment over a single NULL key
    val sa = Seq("x", "y", "y").toDF("k")
    val sb = Seq("x", "z").toDF("j")
    val r = Linkage.containment(sa, "k", sb, "j").head()
    assert((r.getLong(0), r.getLong(1)) == ((2L, 1L)), "y not contained")
    val ia = Seq(1, 2).toDF("k")          // int32
    val lb = Seq(1L, 2L, 3L).toDF("j")    // int64
    val w = Linkage.containment(ia, "k", lb, "j").head()
    assert((w.getLong(0), w.getLong(1)) == ((2L, 0L)), "widened inclusion")
    intercept[IllegalArgumentException] {
      Linkage.containment(sa, "k", lb, "j")
    }
  }

  test("pageRank: iters=20 (checkpoint-cadence path) stays integer-exact " +
      "and deterministic") {
    val half = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (4L, 6L), (10L, 11L))
    val e = (half ++ half.map(_.swap)).toDF("src", "dst")
    val r1 = Components.pageRank(e, "src", "dst", iters = 20).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the isolated 2-cycle fixpoints at exactly 1.0 at EVERY iteration —
    // any lineage/replay corruption across the cadence boundary would
    // break this exact invariant
    assert(r1(10L) == 1000000000L && r1(11L) == 1000000000L)
    assert(r1.keySet.size == 8 && r1.values.forall(_ >= 150000000L))
    val r2 = Components.pageRank(e, "src", "dst", iters = 20).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == r2, "deep run must stay bit-deterministic")
  }

  test("quantileNormalize: matches a single-window row_number and is " +
      "independent of the partition count") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 500).map(i => ((i * 7919) % 101, i.toLong))
      .toDF("score", "id")
    def ranks(parts: Int): Map[Long, (Long, java.math.BigDecimal)] =
      Sample.quantileNormalize(df, Seq(col("score"), col("id")), parts)
        .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getDecimal(3))).toMap
    val expect = df.withColumn("rnk",
        row_number().over(Window.orderBy(col("score"), col("id"))).cast("long"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val got = ranks(32)
    assert(got.view.mapValues(_._1).toMap == expect,
      "distributed rank must equal the single-window row_number")
    // partition boundaries shift which partition holds a row, never its
    // global prefix sum — 1, 7 and 32 partitions must agree bit for bit
    assert(ranks(1) == got && ranks(7) == got)
    // percentile of the max row is exactly 1
    val maxId = expect.maxBy(_._2)._1
    assert(got(maxId)._2 == new java.math.BigDecimal("1.000000"))
  }

  test("collocations: HOF pair expansion equals the per-doc self-join, " +
      "and lift is symmetric in its marginals") {
    val docs = graft.Tables.documents(spark, sfDir())
    val lst = slice(array_sort(array_distinct(
      filter(graft.ops.Text.tokens(col("text")), t => length(t) >= 4))), 1, 15)
    val toks = docs.select(col("doc_id"), lst.as("lst"))
    val viaHof = toks.select(explode(expr(
      "flatten(transform(lst, (x, i) -> " +
        "transform(slice(lst, i + 2, size(lst)), y -> struct(x AS a, y AS b))))"
      )).as("p"))
      .select(col("p.a"), col("p.b")).as[(String, String)].collect().sorted
    val tok = toks.select(col("doc_id"), explode(col("lst")).as("t"))
    val viaJoin = tok.as("x").join(tok.as("y"), "doc_id")
      .filter(col("x.t") < col("y.t"))
      .select(col("x.t"), col("y.t")).as[(String, String)].collect().sorted
    assert(viaHof.toSeq == viaJoin.toSeq,
      "scan-level pair expansion must equal the self-join pair set")
    // every emitted pair respects the sorted-list invariant a < b
    assert(viaHof.forall { case (a, b) => a < b })
  }

  test("quantile calibration: monotone in rank, endpoints map to " +
      "endpoints, every target rank is a valid A order statistic") {
    val out = graft.SparkEntry.queries("q132_quantile_calibration")(spark, sfDir())
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out.nonEmpty)
    val docs = graft.Tables.documents(spark, sfDir())
    val nA = docs.filter(col("lang") === "en").count()
    val nB = docs.filter(col("lang") === "de").count()
    assert(out.length == nB, "every B doc must calibrate")
    // target rank is monotone in source rank and hits both endpoints
    assert(out.zip(out.tail).forall { case ((_, t1, c1), (_, t2, c2)) =>
      t1 <= t2 && c1 <= c2 }, "calibration must be monotone")
    assert(out.last._2 == nA, "max of B must map to max of A")
    assert(out.head._2 == (nA + nB - 1) / nB, "min of B maps to ceil(nA/nB)")
    assert(out.forall { case (_, t, _) => t >= 1 && t <= nA })
  }

  test("negative sampling: no self-pairs, exactly 3 distinct-rank " +
      "partners per doc, bit-deterministic across runs") {
    val q = graft.SparkEntry.queries("q134_negative_sampling")
    val out = q(spark, sfDir()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = graft.Tables.documents(spark, sfDir()).count()
    assert(out.length == n * 3, "every doc gets exactly k=3 partners")
    assert(out.forall { case (d, _, p) => d != p }, "self-pair leaked")
    assert(out.groupBy(_._1).forall(_._2.map(_._2).toSet == Set(1L, 2L, 3L)))
    val again = q(spark, sfDir()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sorted.toSeq == again.sorted.toSeq, "sampling must be deterministic")
  }

  test("winsorized stats: bounds are genuine group order statistics and " +
      "clipping moves the mean toward the interior") {
    val out = graft.SparkEntry.queries("q135_winsorized_stats")(spark, sfDir())
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (raw, w) = (BigDecimal(r.getDouble(4)), BigDecimal(r.getDouble(5)))
      assert(lo <= hi && n > 0)
      // the winsorized mean must sit inside the clip bounds
      assert(w >= BigDecimal(lo) && w <= BigDecimal(hi),
        s"lang ${r.getString(0)}: winsorized mean $w outside [$lo, $hi]")
      // and cannot drift arbitrarily far from the raw mean
      assert((w - raw).abs <= raw, s"implausible winsorization shift")
    }
  }

  test("event funnel: stage timestamps strictly increase and `reached` " +
      "counts the non-null prefix") {
    val out = graft.SparkEntry.queries("q136_event_funnel")(spark, sfDir())
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // timestamps surface as java.time values under the Java-8 time API
      val ts = (1 to 4).map(i =>
        Option(r.get(i)).map(_.asInstanceOf[Comparable[Any]]))
      // prefix property: a stage is reached only if every earlier one is
      assert(ts.zip(ts.tail).forall { case (a, b) => !(a.isEmpty && b.nonEmpty) })
      val present = ts.flatten
      assert(present.zip(present.tail).forall { case (a, b) => a.compareTo(b) < 0 },
        s"stage timestamps must strictly increase: $present")
      assert(r.getInt(5) == present.size)
    }
  }

  test("cohort retention: week 0 is exactly 1.0 and every rate is a " +
      "valid fraction of the cohort") {
    val out = graft.SparkEntry.queries("q137_cohort_retention")(spark, sfDir())
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (k, act, coh) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(k >= 0 && act >= 1 && act <= coh)
      if (k == 0)
        assert(r.getDouble(4) == 1.0,
          "every cohort member is active in their own first week")
    }
  }

  test("time-to-convert: deciles are nondecreasing, positive, and the " +
      "ninth sits at the exact ceil(9n/10) order statistic") {
    val out = graft.SparkEntry.queries("q138_time_to_convert")(spark, sfDir())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == (1L to 9L))
    assert(out.forall(_._2 > 0), "funnel deltas must be positive")
    assert(out.map(_._2).zip(out.map(_._2).tail).forall { case (a, b) => a <= b },
      "deciles must be nondecreasing")
    assert(out.map(_._3).distinct.size == 1)
  }

  test("rolling active users: every day's WAU is >= that day's DAU and " +
      "<= the all-time distinct user count") {
    val out = graft.SparkEntry.queries("q139_rolling_active_users")(spark, sfDir())
      .collect().map(r => r.get(0).asInstanceOf[Comparable[Any]] -> r.getLong(1)).toMap
    val ev = graft.Tables.events(spark, sfDir())
    val users = ev.select("user_id").distinct().count()
    val dau = ev.select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .distinct().groupBy("d").agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0).asInstanceOf[Comparable[Any]] -> r.getLong(1)).toMap
    assert(out.nonEmpty && out.values.forall(w => w >= 1 && w <= users))
    dau.foreach { case (d, n) =>
      out.get(d).foreach(w => assert(w >= n, s"day $d: WAU $w < DAU $n"))
    }
  }

  test("corpus drift: shares sum to 1 within the rounding budget and " +
      "versions reconcile with direct counts") {
    val out = graft.SparkEntry.queries("q127_corpus_drift")(spark, sfDir())
      .cache()
    val docs = graft.Tables.documents(spark, sfDir())
    val t1 = docs.filter(col("doc_id") % 10 =!= 0).count()
    val t2 = docs.filter(col("doc_id") % 7 =!= 0).count()
    val agg = out.agg(
      sum("n_v1"), sum("n_v2"), sum("share_v1"), sum("share_v2"),
      sum("share_drift"), count(lit(1))).head()
    assert(agg.getLong(0) == t1 && agg.getLong(1) == t2,
      "per-cell counts must partition each version exactly")
    val cells = agg.getLong(5)
    // each share is half-up-rounded at 1e-6 → per-cell error ≤ 5e-7
    // (plus a vanishing double-sum term — boundary is DOUBLE since r9)
    val tol = BigDecimal(cells) * BigDecimal("0.0000005")
    assert((BigDecimal(agg.getDouble(2)) - 1).abs <= tol, "share_v1 sum")
    assert((BigDecimal(agg.getDouble(3)) - 1).abs <= tol, "share_v2 sum")
    assert(BigDecimal(agg.getDouble(4)).abs <= tol * 2, "drift must net ~0")
    out.unpersist()
  }

  test("robust outliers: median and MAD are genuine group order " +
      "statistics and the outlier count replays row by row") {
    val rows = graft.SparkEntry.queries("q162_robust_outliers")(spark, sfDir())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val data = graft.Tables.events(spark, sfDir())
      .select("event_type", "value")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { case (et, n, med, mad, nOut) =>
      val vs = data(et)
      assert(n == vs.length, s"$et count")
      val sorted = vs.sorted
      assert(med == sorted((vs.length + 1) / 2 - 1), s"$et median is not " +
        "the lower-median order statistic")
      val devs = vs.map(v => math.abs(v - med)).sorted
      assert(mad == devs((vs.length + 1) / 2 - 1), s"$et MAD order statistic")
      assert(nOut == vs.count(v => math.abs(v - med) > 3 * mad),
        s"$et outlier count replay")
      assert(nOut < n, s"$et cannot flag everything")
    }
  }

  test("labelSessions + path trigrams: paths never cross a session " +
      "boundary; boundary at gap strictly greater than the threshold") {
    import java.sql.Timestamp
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // one user: a,b,c then a 61-min gap, then d,e,f; a second 60-min gap
    // is NOT a boundary (strictly-greater contract)
    val ev = Seq(
      (1L, 1L, "a", ts(0)), (1L, 2L, "b", ts(1)), (1L, 3L, "c", ts(2)),
      (1L, 4L, "d", Timestamp.valueOf("2024-01-01 11:03:00")),
      (1L, 5L, "e", Timestamp.valueOf("2024-01-01 12:03:00")),
      (1L, 6L, "f", Timestamp.valueOf("2024-01-01 12:04:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
    val labeled = Sessionize.labelSessions(ev, "ts", "user_id", "event_id",
      gapSeconds = 3600)
    val sessions = labeled.select("event_type", "session_id")
      .as[(String, Long)].collect().toMap
    assert(sessions == Map("a" -> 1L, "b" -> 1L, "c" -> 1L,
      "d" -> 2L, "e" -> 2L, "f" -> 2L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "session_id").orderBy(col("ts"), col("event_id"))
    val tris = labeled
      .withColumn("s2", lead(col("event_type"), 1).over(w))
      .withColumn("s3", lead(col("event_type"), 2).over(w))
      .filter(col("s3").isNotNull)
      .select(col("event_type"), col("s2"), col("s3"))
      .as[(String, String, String)].collect().toSet
    // only the within-session trigrams — (b,c,d) and (c,d,e) must not exist
    assert(tris == Set(("a", "b", "c"), ("d", "e", "f")))
  }

  test("burstiness: brute-force per-user replay on the fixture; index " +
      "bounded in (-1, 1); periodic actor pins B = -1") {
    val out = graft.SparkEntry.queries("q176_burstiness")(spark, sfDir())
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out.nonEmpty)
    // replay: exact integer gap seconds per user, moments from BigInt
    val ev = graft.Tables.events(spark, sfDir())
      .select("user_id", "ts", "event_id")
      .collect().map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1), r.getLong(2)))
    def us(t: java.time.LocalDateTime) =
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
    val byUser = ev.groupBy(_._1).view.mapValues(_.sortBy(e => (us(e._2), e._3)))
    byUser.toSeq.foreach { case (uid, rows) =>
      val times = rows.map(r => us(r._2)).toSeq
      val gaps: Seq[Long] = times.zip(times.drop(1)).map { case (a, b) =>
        (b - a) / 1000000L
      }
      if (gaps.length >= 2) {
        val n = gaps.length
        val s1 = gaps.map(BigInt(_)).sum
        val s2 = gaps.map(g => BigInt(g) * BigInt(g)).sum
        val mu = s1.toDouble / n
        val sig = math.sqrt(math.max(
          (s2.toDouble - s1.toDouble * s1.toDouble / n) / (n - 1), 0.0))
        val (gn, gmu, gsig, gb) = out(uid)
        assert(gn == n, s"user $uid gap count")
        assert(math.abs(gmu - mu) < 1e-4, s"user $uid mean")
        assert(math.abs(gsig - sig) < 1e-4, s"user $uid stddev")
        gb.foreach(b => assert(b > -1.0 - 1e-9 && b < 1.0,
          s"user $uid burstiness out of range: $b"))
      } else assert(!out.contains(uid), s"user $uid below 2 gaps must drop")
    }
    // synthetic periodic actor: equal gaps -> sigma 0 -> B exactly -1
    import spark.implicits._
    import java.sql.Timestamp
    val periodic = (0 to 5).map(i =>
      (99L, Timestamp.valueOf(f"2024-01-01 10:${i * 7}%02d:00"), i.toLong))
      .toDF("user_id", "ts", "event_id")
    val b = {
      // replicate the query body directly on the synthetic frame
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val gaps = periodic.withColumn("prev", lag(col("ts"), 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("gap_s",
          expr("(unix_micros(CAST(ts AS TIMESTAMP)) - unix_micros(CAST(prev AS TIMESTAMP))) DIV 1000000"))
      val d = col("gap_s").cast(DecimalType(20, 0))
      gaps.groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum(d).cast("double").as("s1"),
          sum(d * d).cast("double").as("s2"))
        .withColumn("mu", col("s1") / col("n"))
        .withColumn("sigma", sqrt(greatest(
          (col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1), lit(0.0))))
        .select(((col("sigma") - col("mu")) / (col("sigma") + col("mu"))))
        .as[Double].head()
    }
    assert(b == -1.0, s"periodic actor must read B = -1 exactly, got $b")
  }

  test("mutualInformation: bijective columns read MI = H (nmi 1), " +
      "independent columns read MI = 0 exactly") {
    val ln2 = 0.693147181 // round(ln 2, 9) — the recipe's 9-dp lattice
    def row(df: org.apache.spark.sql.DataFrame) =
      Linkage.mutualInformation(df, "x", "y")
        .select("n", "h_x", "h_y", "h_xy", "mi_nats", "nmi")
        .as[(Long, Double, Double, Double, Double, Double)].head()
    // X determines Y and vice versa: H(X)=H(Y)=MI=ln2, joint ln2
    val bij = Seq(("a", 1), ("a", 1), ("b", 2), ("b", 2)).toDF("x", "y")
    val (n1, hx1, hy1, hxy1, mi1, nmi1) = row(bij)
    assert(n1 == 4L)
    Seq(hx1, hy1, hxy1, mi1).foreach(v =>
      assert(math.abs(v - ln2) < 1e-12, s"expected ln2, got $v"))
    assert(nmi1 == 1.0, s"bijection must read nmi exactly 1, got $nmi1")
    // uniform independent: every cell has nxy·N == nx·ny -> ln(1) = 0,
    // so MI is EXACTLY zero (no float residue), joint entropy ln4
    val ind = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)).toDF("x", "y")
    val (_, hx2, _, hxy2, mi2, nmi2) = row(ind)
    assert(mi2 == 0.0 && nmi2 == 0.0, s"independence must read 0, got $mi2")
    assert(math.abs(hx2 - ln2) < 1e-12)
    // ln9(1/4) = -1.386294361 while 2·ln9(1/2) = -1.386294362: the two
    // 9-dp roundings differ by one lattice step — compare at 1e-8
    assert(math.abs(hxy2 - 2 * ln2) < 1e-8, s"joint must read ~ln4: $hxy2")
  }
}
