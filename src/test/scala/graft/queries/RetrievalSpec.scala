package graft.queries

import graft.SparkSuite

/** Invariants for the round-17 sparse-retrieval operators (L262/L265)
  * beyond what the DuckDB oracles pin: the anchor-join phrase matcher is
  * cross-checked against a brute-force sliding-window scan, and the BM25
  * ranked list against a from-scratch Scala recompute of the score.
  */
class RetrievalSpec extends SparkSuite {

  private def tok(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  private lazy val docToks: Map[Long, Array[String]] =
    graft.Tables.documents(spark, sfDir()).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> tok(r.getString(1))).toMap

  test("phrase search: every reported hit count equals a brute-force " +
      "sliding-window scan; ranks are contiguous and hit-ordered") {
    val rows = graft.SparkEntry.queries("q281_phrase_search")(spark, sfDir())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty, "the fixture's top trigrams must match somewhere")
    def bruteHits(ph: Array[String], t: Array[String]): Int =
      if (t.length < ph.length) 0
      else (0 to t.length - ph.length).count(i =>
        ph.indices.forall(j => t(i + j) == ph(j)))
    rows.foreach { case (phrase, docId, _, nHits, nDocs) =>
      val ph = phrase.split(" ")
      assert(ph.length == 3, "workload phrases are trigrams")
      assert(bruteHits(ph, docToks(docId)).toLong == nHits,
        s"anchor-join hits for '$phrase' in doc $docId")
      // n_docs is the phrase's TOTAL matched-doc count, brute-forced
      val expectDocs = docToks.count { case (_, t) => bruteHits(ph, t) > 0 }
      assert(expectDocs.toLong == nDocs, s"matched-doc count for '$phrase'")
    }
    rows.groupBy(_._1).foreach { case (phrase, rs) =>
      val byRank = rs.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1 to rs.length),
        s"ranks contiguous for '$phrase'")
      assert(byRank.length == math.min(3, byRank.head._5),
        s"top-3 capped by n_docs for '$phrase'")
      // hit-count non-increasing with rank; ties broken by doc_id asc
      byRank.zip(byRank.tail).foreach { case (a, b) =>
        assert(a._4 > b._4 || (a._4 == b._4 && a._2 < b._2)) }
    }
  }

  test("bm25 retrieval: top-ranked scores recompute from scratch; " +
      "ranked lists are score-ordered and every doc matches a term") {
    val rows = graft.SparkEntry.queries("q284_bm25_retrieval")(spark, sfDir())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    // from-scratch corpus stats in plain Scala
    val tf = docToks.view.mapValues(_.groupBy(identity)
      .view.mapValues(_.length.toLong).toMap).toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val nDocs = docToks.size.toLong
    val avgDl = docToks.values.map(_.length.toLong).sum.toDouble / nDocs
    def bm25(term: String, doc: Long): Double = {
      val t = tf(doc).getOrElse(term, 0L)
      if (t == 0L) 0.0
      else math.log((nDocs - df(term) + 0.5) / (df(term) + 0.5) + 1.0) *
        (t * 2.2) /
        (t + 1.2 * (0.25 + 0.75 * (docToks(doc).length / avgDl)))
    }
    rows.foreach { case (query, docId, _, score) =>
      val expect = query.split(" ").map(bm25(_, docId)).sum
      assert(math.abs(expect - score) < 1e-6,
        s"score recompute for '$query' doc $docId: $expect vs $score")
      assert(score > 0, "disjunctive BM25 over smoothed idf is positive")
      assert(query.split(" ").exists(t => tf(docId).contains(t)),
        "every returned doc contains at least one query term")
    }
    rows.groupBy(_._1).foreach { case (query, rs) =>
      val byRank = rs.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1 to rs.length),
        s"ranks contiguous for '$query'")
      byRank.zip(byRank.tail).foreach { case (a, b) =>
        assert(a._4 > b._4 || (a._4 == b._4 && a._2 < b._2),
          s"rank order for '$query'") }
    }
  }

  test("streaming phrase-index fold equals the one-shot batch answer " +
      "row-for-row (incl. the deliberate final-batch replay no-op)") {
    val oneShot = graft.SparkEntry.queries("q281_phrase_search")(
      spark, sfDir()).collect().map(_.toString).sorted.toSeq
    val folded = graft.SparkEntry.queries("q286_stream_phrase_index")(
      spark, sfDir()).collect().map(_.toString).sorted.toSeq
    assert(folded == oneShot)
  }

  test("proximity search: pair counts and min gaps equal a brute-force " +
      "window scan; ranks contiguous and pair-ordered") {
    val rows = graft.SparkEntry.queries("q287_proximity_search")(
      spark, sfDir()).collect().map(r => (r.getString(0), r.getLong(1),
        r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    def brute(t1: String, t2: String, t: Array[String]): (Long, Long) = {
      val hits = for {
        i <- t.indices; j <- (i + 1) to math.min(i + 5, t.length - 1)
        if (t(i) == t1 && t(j) == t2) || (t(i) == t2 && t(j) == t1)
      } yield (j - i).toLong
      (hits.length.toLong, if (hits.isEmpty) 0L else hits.min)
    }
    rows.foreach { case (query, docId, _, nPairs, minGap) =>
      val Array(t1, t2) = query.split(" ")
      val (bn, bg) = brute(t1, t2, docToks(docId))
      assert(bn == nPairs && bg == minGap,
        s"'$query' doc $docId: brute ($bn,$bg) vs ($nPairs,$minGap)")
    }
    rows.groupBy(_._1).foreach { case (query, rs) =>
      val byRank = rs.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1 to rs.length))
      byRank.zip(byRank.tail).foreach { case (a, b) =>
        assert(a._4 > b._4 || (a._4 == b._4 && a._2 < b._2),
          s"rank order for '$query'") }
    }
  }

  test("incremental bm25: maintained index equals a from-scratch rebuild " +
      "of corpus v2, row-for-row") {
    val maintained = graft.SparkEntry.queries("q294_incremental_bm25")(
      spark, sfDir()).collect().map(_.toString).sorted.toSeq
    // direct rebuild: q54's own pipeline on a v2-filtered fixture
    val v2dir = graft.Tmp.dir("graft-q294-spec")
    graft.Tables.documents(spark, sfDir())
      .filter("doc_id % 11 <> 0")
      .write.mode("overwrite").parquet(s"$v2dir/documents.parquet")
    val direct = graft.SparkEntry.queries("q54_bm25_terms")(
      spark, v2dir.toString).collect().map(_.toString).sorted.toSeq
    assert(maintained == direct, "maintenance == rebuild")
  }
}
