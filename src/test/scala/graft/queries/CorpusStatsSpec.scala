package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Invariants for the round-9 corpus-profile operators (L121–L124)
  * beyond what the DuckDB oracles pin: curve monotonicity, graph-theory
  * identities cross-checked against brute force, and drift
  * self-consistency.
  */
class CorpusStatsSpec extends SparkSuite {

  test("vocab coverage: monotone in vocab size, coverage+oov ≈ 1, " +
      "and the counts reconcile with a direct token count") {
    val out = graft.SparkEntry.queries("q140_vocab_coverage")(spark, sfDir())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(100L, 1000L, 5000L, 20000L))
    // coverage is a nondecreasing curve; covered tokens never exceed total
    assert(out.zip(out.tail).forall { case (a, b) =>
      a._2 <= b._2 && a._5 <= b._5 })
    assert(out.forall(r => r._2 <= r._3 && r._5 >= 0 && r._5 <= 1))
    // each row rounds coverage and oov independently — they meet at 1
    // within one rounding step
    assert(out.forall(r => math.abs(r._5 + r._6 - 1.0) <= 2e-6))
    // a vocab size >= the whole vocabulary covers everything
    out.filter(r => r._1 >= r._4).foreach(r => assert(r._2 == r._3))
    val total = graft.Tables.documents(spark, sfDir())
      .select(explode(graft.ops.Text.tokens(col("text"))).as("t"))
      .count()
    assert(out.head._3 == total, "total_tokens must equal the corpus count")
  }

  test("cluster cohesion: density in (0,1], mean hamming within the " +
      "pair threshold, edges within the clique bound") {
    val out = graft.SparkEntry.queries("q141_cluster_cohesion")(spark, sfDir())
      .collect()
    assert(out.nonEmpty, "fixture corpus has near-dup clusters of size >= 3")
    out.foreach { r =>
      val (n, e) = (r.getLong(1), r.getLong(2))
      val (ham, dens) = (r.getDouble(3), r.getDouble(4))
      assert(n >= 3 && e >= n - 1, "component must be connected")
      assert(e <= n * (n - 1) / 2, "edges cannot exceed the clique bound")
      assert(ham >= 0 && ham <= 3.0, "pairs were filtered at hamming <= 3")
      assert(dens > 0 && dens <= 1.000001)
    }
    // ordered by size desc
    val sizes = out.map(_.getLong(1)).toSeq
    assert(sizes == sizes.sortBy(-_))
  }

  test("triangle stats: degree-ordered count equals brute force over " +
      "the collected pair set, wedge identity holds") {
    val r = graft.SparkEntry.queries("q142_triangle_stats")(spark, sfDir())
      .head()
    val (nodes, edges, tri, wedges) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val pairs = graft.ops.Dedup
      .simhashPairs(graft.Tables.documents(spark, sfDir()), "doc_id", "text",
        bands = 4, maxHamming = 3)
      .select("id_a", "id_b").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val adj = pairs.flatMap(p => Seq(p, p.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(nodes == adj.size && edges == pairs.length)
    val bruteTri = pairs.iterator.map { case (a, b) =>
      (adj(a) & adj(b)).size }.sum / 3L  // each triangle seen via 3 edges
    assert(tri == bruteTri, s"triangle count $tri != brute force $bruteTri")
    val bruteWedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    assert(wedges == bruteWedges)
    if (wedges > 0) {
      val gcc = r.getDouble(4)
      assert(gcc >= 0 && gcc <= 1.000001 &&
        math.abs(gcc - 3.0 * tri / wedges) < 1e-5)
    }
  }

  test("centroid drift: cosine is a valid similarity, version counts " +
      "reconcile, and identical versions read as undrifted") {
    val out = graft.SparkEntry.queries("q143_centroid_drift")(spark, sfDir())
      .collect()
    val e = graft.Tables.embeddings(spark, sfDir())
    val labels = e.select("label").distinct().count()
    assert(out.length == labels, "every label must be profiled")
    out.foreach { r =>
      val cos = r.getDouble(3)
      assert(cos >= -1.000001 && cos <= 1.000001)
      assert(r.getBoolean(4) == (cos < 1.0), "drifted derives from cos")
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    }
    val n1 = e.filter(col("vec_id") % 10 =!= 0).groupBy("label").count()
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    out.foreach(r => assert(r.getLong(1) == n1(r.getInt(0)),
      "n_v1 must match the direct per-label count"))
  }

  test("degree profile: buckets are powers of two bracketing their max, " +
      "doc counts cover every pair endpoint") {
    val out = graft.SparkEntry
      .queries("q156_neardup_degree_profile")(spark, sfDir())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (bucket, nDocs, maxDeg) =>
      assert(java.lang.Long.bitCount(bucket) == 1, s"bucket $bucket not a power of 2")
      assert(nDocs > 0)
      assert(maxDeg >= bucket && (bucket == (1L << 30) || maxDeg < bucket * 2),
        s"max degree $maxDeg outside [$bucket, ${bucket * 2})")
    }
    val docs = graft.Tables.documents(spark, sfDir())
    val pairs = graft.ops.Dedup
      .simhashPairsCapped(docs, "doc_id", "text", bands = 4, maxHamming = 3,
        cap = graft.ops.Dedup.DefaultDegreeCap)
    val endpoints = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id"))).distinct().count()
    assert(out.map(_._2).sum == endpoints,
      "bucket doc counts must cover every pair endpoint exactly once")
  }

  test("first-occurrence novelty: the earliest doc is fully novel, " +
      "novel counts reconcile with the distinct shingle universe") {
    val out = graft.SparkEntry
      .queries("q157_first_occurrence_novelty")(spark, sfDir())
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.foreach { case (id, nSh, nNov, novelty) =>
      assert(nSh > 0 && nNov >= 0 && nNov <= nSh, s"doc $id counts")
      assert(novelty >= 0.0 && novelty <= 1.0, s"doc $id novelty")
    }
    val first = out.minBy(_._1)
    assert(first._2 == first._3 && first._4 == 1.0,
      "the lowest-id doc owns all of its shingles")
    // Σ n_novel = |distinct shingle hashes|: every shingle has exactly
    // one first owner
    val docs = graft.Tables.documents(spark, sfDir())
    val universe = graft.ops.Dedup
      .withShingleHashes(docs.select(col("doc_id"), col("text")), "text", 3)
      .select(explode(col("hv")).as("h")).distinct().count()
    assert(out.map(_._3).sum == universe,
      "novel counts must partition the shingle universe")
  }

  test("incremental novelty: the fold against the standing ownership " +
      "equals the full recompute restricted to the batch, bit for bit") {
    val inc = graft.SparkEntry
      .queries("q158_incremental_novelty")(spark, sfDir())
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted
    val full = graft.SparkEntry
      .queries("q157_first_occurrence_novelty")(spark, sfDir())
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .filter(_._1 % 3 == 0).sorted
    assert(inc.nonEmpty, "the batch must contain docs with shingles")
    assert(inc.toSeq == full.toSeq,
      "fold(standing, batch) must equal CC of the union — the q119 contract")
  }

  test("streamed novelty: micro-batched ascending-id ingest with a " +
      "replayed final batch equals the batch fold bit for bit") {
    val streamed = graft.SparkEntry
      .queries("q165_stream_novelty")(spark, sfDir())
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted
    val batch = graft.SparkEntry
      .queries("q158_incremental_novelty")(spark, sfDir())
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq,
      "streamed fold diverged from the one-shot incremental fold")
  }

  test("minhash calibration: estimates are k-quantized fractions in " +
      "[0,1], exact J valid, and every q23 near-dup pair is measured") {
    val rows = graft.SparkEntry
      .queries("q159_minhash_calibration")(spark, sfDir())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    def quantized(v: Double, k: Int): Boolean =
      (0 to k).exists(m => math.abs(v - (math.round(m.toDouble / k * 1e6) / 1e6)) < 1e-9)
    rows.foreach { case (a, b, j, e4, e8, e12) =>
      assert(a < b)
      assert(j >= 0.0 && j <= 1.0, s"($a,$b) exact J out of range")
      assert(quantized(e4, 4) && quantized(e8, 8) && quantized(e12, 12),
        s"($a,$b) estimate not a k-quantized fraction")
    }
    val measured = rows.map(r => (r._1, r._2)).toSet
    val dups = graft.SparkEntry.queries("q23_minhash_near_dup")(spark, sfDir())
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    dups.foreach(p => assert(measured(p), s"near-dup pair $p not measured"))
  }

  test("cross-source dup matrix: upper-triangular keys, pair counts " +
      "partition the pair stream, within flag derives from the key") {
    val rows = graft.SparkEntry
      .queries("q160_cross_source_dup_matrix")(spark, sfDir())
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, n, within) =>
      assert(a <= b, "matrix must be upper-triangular")
      assert(n > 0)
      assert(within == (a == b))
    }
    assert(rows.map(k => (k._1, k._2)).distinct.length == rows.length)
    val totalPairs = graft.ops.Dedup.simhashPairsCapped(
      graft.Tables.documents(spark, sfDir()), "doc_id", "text",
      bands = 4, maxHamming = 3,
      cap = graft.ops.Dedup.DefaultDegreeCap).count()
    assert(rows.map(_._3).sum == totalPairs,
      "matrix cells must partition the (capped) pair stream exactly")
  }

  test("dedup survival: counts reconcile with the corpus and with q49's " +
      "verdicts, ratios are valid fractions") {
    val rows = graft.SparkEntry
      .queries("q168_dedup_survival_by_source")(spark, sfDir())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    val docs = graft.Tables.documents(spark, sfDir())
    assert(rows.map(_._2).sum == docs.count(), "per-source docs cover corpus")
    rows.foreach { case (src, n, kept, tok, tokKept, ds, ts) =>
      assert(kept >= 1 && kept <= n, s"$src kept range")
      assert(tokKept >= 0 && tokKept <= tok, s"$src token range")
      assert(ds > 0.0 && ds <= 1.0 && ts >= 0.0 && ts <= 1.0, s"$src ratios")
    }
    // total kept must equal the number of cluster survivors (one per
    // component plus singletons) from the resolution itself, over the
    // same capped candidate graph the query consumes
    val pairs = graft.ops.Dedup.simhashPairsCapped(docs, "doc_id", "text",
      bands = 4, maxHamming = 3, cap = graft.ops.Dedup.DefaultDegreeCap)
    val keepTotal = graft.ops.Components
      .resolveClusters(docs, "doc_id", pairs, "id_a", "id_b")
      .filter(col("keep")).count()
    assert(rows.map(_._3).sum == keepTotal, "survivor totals reconcile")
  }

  test("exact-dup provenance: clusters partition the corpus, the first " +
      "carrier is the cluster minimum and wears its own source") {
    val rows = graft.SparkEntry
      .queries("q166_exact_dup_provenance")(spark, sfDir())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    val docs = graft.Tables.documents(spark, sfDir())
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.map(_._2).sum == docs.size,
      "cluster sizes must partition the corpus")
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.foreach { case (hash, n, nSrc, first, firstSrc) =>
      assert(n >= 1 && nSrc >= 1 && nSrc <= n, s"$hash counts")
      assert(docs(first) == firstSrc, s"$hash first carrier source")
    }
  }

  test("token gini: valid range, counts reconcile, and a brute-force " +
      "per-source replay matches") {
    val rows = graft.SparkEntry.queries("q164_token_gini")(spark, sfDir())
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val data = graft.Tables.documents(spark, sfDir())
      .select(col("source"), col("doc_id"),
        size(graft.ops.Text.tokens(col("text"))).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { case (src, n, total, gini) =>
      val docs = data(src)
      assert(n == docs.length && total == docs.map(_._3).sum, s"$src counts")
      assert(gini >= 0.0 && gini < 1.0, s"$src gini out of range")
      val xs = docs.map(_._3).sorted
      val s = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val num = BigInt(2) * s - BigInt(n + 1) * total
      val den = BigInt(n) * total
      val expect = (BigDecimal(num) / BigDecimal(den))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(gini == expect, s"$src gini replay: got $gini want $expect")
    }
  }

  test("skip-gram PMI: returned rows recompute from a brute-force window " +
      "count; pairs canonical (w <= c), above min-count, rank-ordered") {
    def tok(text: String): Array[String] =
      text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val toks = graft.Tables.documents(spark, sfDir())
      .select("text").collect().map(r => tok(r.getString(0)))
    val fwd = toks.flatMap { t =>
      t.indices.flatMap(i => (i + 1) to math.min(i + 5, t.length - 1) map
        (j => (t(i), t(j))))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val dir = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    fwd.foreach { case ((a, b), n) =>
      dir((a, b)) += n; dir((b, a)) += n }
    val mar = dir.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = dir.values.sum
    val rows = graft.SparkEntry.queries("q289_skipgram_pmi")(spark, sfDir())
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { case (w, c, n, pmi) =>
      assert(w <= c && n >= 20)
      assert(n == dir((w, c)), s"pair count for ($w,$c)")
      val expect = BigDecimal(math.log(
        (n * ct).toDouble / (mar(w) * mar(c)).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(expect - pmi) < 1e-9, s"pmi for ($w,$c)")
    }
    // rank order: pmi non-increasing with (w, c) tiebreaks
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a._4 > b._4 || (a._4 == b._4 &&
        (a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)))) }
  }

  test("hyperball: exact N(r) equals a BFS brute force, N(1) identity " +
      "holds, closure saturates at r=3, sketch sums inside the band") {
    val rows = graft.SparkEntry.queries("q290_hyperball")(spark, sfDir())
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2, 3))
    val docs = graft.Tables.documents(spark, sfDir())
    val prs = graft.ops.Dedup.simhashPairsCapped(docs, "doc_id", "text",
      bands = 4, maxHamming = 3, cap = graft.ops.Dedup.DefaultDegreeCap)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val adj = (prs ++ prs.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap.withDefaultValue(Set.empty)
    val seeds = ids.filter(_ % 17 == 0).sorted.take(100)
    var balls: Map[Long, Set[Long]] = seeds.map(v => v -> Set(v)).toMap
    (0 to 3).foreach { r =>
      assert(balls.values.map(_.size.toLong).sum == rows(r)._2,
        s"exact seeded N($r) vs BFS brute force")
      balls = balls.map { case (v, b) => v -> (b ++ b.flatMap(adj)) }
    }
    assert(rows(0)._2 == seeds.length.toLong, "N(0) = |seeds|")
    assert(rows(1)._2 == seeds.length.toLong +
      seeds.map(v => adj(v).size.toLong).sum,
      "N(1) = |seeds| + seed out-degrees")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3, "N and closure are monotone") }
    assert(rows(3)._3 == 1.0, "closure_frac(3) = 1")
    assert(rows.forall(_._4), "every HLL ball-sum inside the 10% band")
  }
}
