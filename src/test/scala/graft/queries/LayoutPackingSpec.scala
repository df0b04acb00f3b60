package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Invariants for the round-18 layout/curation wave (L278–L282) beyond
  * what the DuckDB oracles pin: the winnowing fingerprint guarantee on
  * a constructed shared run, CCNet bucket monotonicity and tercile
  * bounds, a from-scratch sequence-packing fold, Morton-code
  * bijectivity plus the pruning claim that motivates z-ordering, and
  * the DSIR maintenance == rebuild identity inside one engine. */
class LayoutPackingSpec extends SparkSuite {
  import spark.implicits._

  test("winnowing guarantee: docs sharing a run of >= w+k-1 tokens " +
      "share fingerprints; disjoint docs never match") {
    // a 20-token shared run (>> w+k-1 = 6) embedded in distinct noise,
    // plus a third doc with no shared content at all
    val run = (1 to 20).map(i => s"shared$i")
    val docA = ((1 to 10).map(i => s"noisea$i") ++ run).mkString(" ")
    val docB = (run ++ (1 to 10).map(i => s"noiseb$i")).mkString(" ")
    val docC = (1 to 30).map(i => s"lonely$i").mkString(" ")
    val docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val out = graft.ops.Dedup
      .winnowingPairs(docs, "doc_id", "text", k = 3, w = 4, dfCap = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 2),
      s"the shared run must surface shared fingerprints, got ${out.toSeq}")
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L),
      "a content-disjoint doc can never share a fingerprint")
  }

  test("ccnet buckets: every doc assigned, tercile lower bounds hold, " +
      "and bucket score ranges are monotone per language") {
    val rows = graft.SparkEntry.queries("q298_ccnet_buckets")(spark, sfDir())
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("head", "middle", "tail")(r._4)))
    rows.groupBy(_._2).foreach { case (lang, ls) =>
      val n = ls.length
      val tail = ls.filter(_._4 == "tail")
      val mid = ls.filter(_._4 == "middle")
      val head = ls.filter(_._4 == "head")
      // value thresholds: F(t1) >= ceil(n/3), F(t2) >= ceil(2n/3)
      assert(tail.length >= (n + 2) / 3, s"$lang tail too small")
      assert(tail.length + mid.length >= (2 * n + 2) / 3,
        s"$lang tail+middle too small")
      // bucket ranges are monotone on the 3-dp cut grid; the emitted
      // 6-dp means can straddle a boundary by < one 3-dp step only
      if (tail.nonEmpty && mid.nonEmpty)
        assert(tail.map(_._3).max <= mid.map(_._3).min + 1e-3)
      if (mid.nonEmpty && head.nonEmpty)
        assert(mid.map(_._3).max <= head.map(_._3).min + 1e-3)
    }
  }

  test("sequence packing: a from-scratch per-source next-fit fold " +
      "reproduces the operator; bin count is the capacity lower bound " +
      "or more") {
    val out = graft.SparkEntry.queries("q299_sequence_packing")(
      spark, sfDir()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    val L = 512L
    val docs = graft.Tables.documents(spark, sfDir())
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1),
        graft.functions.TextKernels.tokenize(r.getString(2)).length.toLong))
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      var nb, rem, pk, tr = 0L
      ds.sortBy(_._2).foreach { case (_, _, ntok) =>
        val fit = math.min(ntok, L)
        tr += math.max(ntok - L, 0L)
        if (fit <= rem) { rem -= fit; pk += fit }
        else { nb += 1L; rem = L - fit; pk += fit }
      }
      def r6(x: Long, t: Long) =
        (if (t == 0) 0L else (2 * x * 1000000L + t) / (2 * t)).toDouble / 1e6
      src -> ((ds.length.toLong, ds.map(_._3).sum, nb,
        r6(pk, nb * L), r6(tr, ds.map(_._3).sum)))
    }
    assert(out == expect, "operator must equal the from-scratch fold")
    out.foreach { case (src, (_, ntok, nb, fill, _)) =>
      assert(fill <= 1.0 + 1e-9, s"$src fill > 1")
      assert(nb >= (math.min(ntok, Long.MaxValue) + L - 1) / L - docs.length,
        s"$src bins below any plausible bound") // sanity only
    }
  }

  test("morton interleave: bijective on the 8-bit x 8-bit grid, and " +
      "z-order layout prunes strictly better than date-sort for " +
      "customer point queries") {
    def spread(v: Long): Long = {
      val a = (v | (v << 4)) & 3855L
      val b = (a | (a << 2)) & 13107L
      (b | (b << 1)) & 21845L
    }
    val zs = for (x <- 0L until 256L; y <- 0L until 256L)
      yield (spread(x) << 1) | spread(y)
    assert(zs.distinct.size == 65536 && zs.max < 65536L && zs.min == 0L,
      "Part1By1 interleave must biject [0,256)^2 onto [0,65536)")
    val rows = graft.SparkEntry.queries("q300_zorder_layout")(spark, sfDir())
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rows("zorder") < rows("datesort"),
      s"z-order must prune better: $rows")
  }

  test("dsir maintenance == rebuild: the incremental fold's selection " +
      "equals the one-shot q296 selection row for row") {
    def rowsOf(q: String) = graft.SparkEntry.queries(q)(spark, sfDir())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1).toSeq
    assert(rowsOf("q301_dsir_incremental") == rowsOf("q296_dsir_selection"))
  }

  test("unimax: allocations sum to the budget exactly, never exceed the " +
      "epoch cap, and uncapped languages share the water level") {
    val rows = graft.SparkEntry.queries("q302_unimax_mixture")(spark, sfDir())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val b = 3 * rows.map(_._2).sum / 2
    assert(rows.map(_._4).sum == b, "water-filling must spend B exactly")
    rows.foreach { r =>
      assert(r._4 <= r._3, s"${r._1} allocated past its epoch cap")
      assert(r._5 <= 2.0 + 1e-9, s"${r._1} epochs past E")
    }
    // uncapped languages all sit at the level (within the +1 remainder)
    val uncapped = rows.filter(r => r._4 < r._3).map(_._4)
    if (uncapped.nonEmpty)
      assert(uncapped.max - uncapped.min <= 1,
        "uncapped languages must share the water level")
  }

  test("winnowing ingest == one-shot: the batch-vs-corpus match equals " +
      "the full-corpus q297 pairs restricted to cross pairs") {
    val docs = graft.Tables.documents(spark, sfDir())
    val oneShot = graft.ops.Dedup
      .winnowingPairs(docs, "doc_id", "text", k = 3, w = 4, dfCap = 64)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .filter(p => (p._1 % 4 == 0) != (p._2 % 4 == 0))
      .map(p => if (p._1 % 4 != 0) p else (p._2, p._1, p._3, p._4))
      .toSet
    val fold = graft.SparkEntry.queries("q303_winnowing_ingest")(
      spark, sfDir()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(fold == oneShot, "ingest fold must equal the one-shot cross set")
  }

  test("stream packing == one-shot; the remainder carries across " +
      "batches and replays fold to a no-op") {
    def rowsOf(q: String) = graft.SparkEntry.queries(q)(spark, sfDir())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).sortBy(_._1).toSeq
    assert(rowsOf("q307_stream_packing") == rowsOf("q299_sequence_packing"))
    // remainder carry: 4×100-token docs split mid-window must still
    // pack into ONE 512-token window across the batch boundary
    val t = Seq(("s", 1L, 100L), ("s", 2L, 100L), ("s", 3L, 100L),
      ("s", 4L, 100L)).toDF("source", "doc_id", "ntok")
    val P = graft.ops.Packing
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("source").collect().map(_.toSeq).toSeq
    val st1 = P.packFold(P.emptyState(spark), t.filter(col("doc_id") <= 2), 512L)
    val st2 = P.packFold(st1, t.filter(col("doc_id") > 2), 512L)
    val one = P.packFold(P.emptyState(spark), t, 512L)
    assert(rows(st2) == rows(one), "two-batch fold must equal one-shot")
    assert(one.select("n_bins").head.getLong(0) == 1L,
      "400 tokens across the batch boundary must share one open window")
    // at-least-once replay: the max_id guard folds it to a no-op
    val st3 = P.packFold(st2, t.filter(col("doc_id") > 2), 512L)
    assert(rows(st3) == rows(st2), "replay must be an algebraic no-op")
  }

  test("bloom skipping: exact is the lower bound, bloom never reads " +
      "fewer files than exact and never more than minmax, exact has " +
      "zero excess") {
    val rows = graft.SparkEntry.queries("q306_bloom_skipping")(spark, sfDir())
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(rows.keySet == Set("minmax", "bloom", "exact"))
    assert(rows("exact")._2 == 0.0, "exact containment has no excess")
    assert(rows("bloom")._1 >= rows("exact")._1 - 1e-9,
      "no skipper reads fewer files than true containment")
    assert(rows("bloom")._1 <= rows("minmax")._1 + 1e-9,
      "the bloom index must not be worse than min/max on this layout")
    assert(rows("bloom")._2 >= -1e-9, "excess is nonnegative")
  }

  test("temperature mixture: allocations spend the budget exactly, " +
      "flatten the raw shares, and preserve the size ordering") {
    val rows = graft.SparkEntry.queries("q305_temperature_mixture")(
      spark, sfDir()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._2)
    assert(rows.map(_._3).sum == rows.map(_._2).sum,
      "largest-remainder apportionment must spend B exactly")
    // τ < 1 flattens: the smallest language's share rises, the largest
    // language's share falls, and ordering by size is preserved
    assert(rows.head._5 > rows.head._4, "smallest lang must be boosted")
    assert(rows.last._5 < rows.last._4, "largest lang must be damped")
    val temps = rows.map(_._5).toSeq
    assert(temps.zip(temps.tail).forall { case (a, b) => a <= b },
      "temperature shares must stay monotone in corpus size")
  }

  test("s-curve planner: recall and sub-threshold leak both rise as " +
      "bands widen; a from-scratch recompute matches one config") {
    val rows = graft.SparkEntry.queries("q304_lsh_s_curve")(spark, sfDir())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 6L, 12L))
    val recalls = rows.map(_._6).toSeq
    val leaks = rows.map(_._4).toSeq
    assert(recalls.zip(recalls.tail).forall { case (a, c) => a <= c },
      "recall must be nondecreasing in b")
    assert(leaks.zip(leaks.tail).forall { case (a, c) => a <= c },
      "sub-threshold leak must be nondecreasing in b")
    // from-scratch recompute for (b=4, r=3) on the raw capped jaccards
    val ss = graft.ops.Dedup.nearDupPairsCapped(
      graft.Tables.documents(spark, sfDir()), "doc_id", "text",
      shingleN = 3, k = 12, bands = 4, threshold = 0.5, cap = 16)
      .collect().map(_.getDouble(2))
    import java.math.{BigDecimal => JBD, RoundingMode}
    val sp = ss.map { s =>
      val sr = s * s * s
      val omb = (1.0 - sr) * (1.0 - sr) * (1.0 - sr) * (1.0 - sr)
      new JBD(1.0 - omb).setScale(9, RoundingMode.HALF_UP)
    }.foldLeft(JBD.ZERO)(_.add(_))
    val n = ss.length
    // same half-away divide as roundRatioSigned (sp >= 0 here)
    val num = sp.movePointRight(6).multiply(new JBD(2)).add(new JBD(n))
    val mean = num.divideToIntegralValue(new JBD(2L * n)).movePointLeft(6)
    val got = rows.find(_._1 == 4L).get._6
    assert(math.abs(mean.doubleValue - got) < 1e-12,
      s"(4,3) recall recompute: $mean vs $got")
  }
}
