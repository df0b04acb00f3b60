package graft.queries

import graft.SparkSuite

/** Weighted-Jaccard rescoring (L274) invariants beyond the oracle:
  * brute-force frequency-vector recompute, range, and the exact-copy /
  * amplified-copy anchors that motivate the operator.
  */
class WeightedJaccardSpec extends SparkSuite {

  private def tok(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  test("every candidate pair's weighted jaccard recomputes from raw " +
      "frequency vectors; values in (0, 1]") {
    val docToks = graft.Tables.documents(spark, sfDir())
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tok(r.getString(1))).toMap
    def tf(id: Long) = docToks(id).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val rows = graft.SparkEntry.queries("q293_weighted_jaccard")(
      spark, sfDir()).collect()
    assert(rows.nonEmpty, "the fixture has near-dup candidates")
    rows.foreach { r =>
      val (a, b, wj) = (r.getLong(0), r.getLong(1), r.getDouble(3))
      val (ta, tb) = (tf(a), tf(b))
      val terms = ta.keySet ++ tb.keySet
      val smin = terms.toSeq
        .map(t => math.min(ta.getOrElse(t, 0L), tb.getOrElse(t, 0L))).sum
      val smax = terms.toSeq
        .map(t => math.max(ta.getOrElse(t, 0L), tb.getOrElse(t, 0L))).sum
      val expect = BigDecimal(2 * smin * 1000000L + smax) /
        BigDecimal(2 * smax)
      assert(math.abs(expect.setScale(0, BigDecimal.RoundingMode.FLOOR)
        .toDouble / 1e6 - wj) < 1e-9, s"J_w recompute for ($a,$b)")
      assert(wj > 0.0 && wj <= 1.0)
      assert(r.getDouble(2) >= 0.5, "candidates pass the set-J threshold")
    }
  }

  test("anchors: identical docs score J_w = 1, an n-times-amplified copy " +
      "scores ~1/n while its set jaccard is 1") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    val df = Seq(
      (1L, base, "en", "s", 1L), (2L, base, "en", "s", 1L),
      (3L, (base + " ") * 3, "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = graft.Tmp.dir("graft-wj-spec")
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("q293_weighted_jaccard")(
      spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(out((1L, 2L)) == ((1.0, 1.0)), "verbatim copy: both scores 1")
    val (setJ, wJ) = out((1L, 3L))
    assert(setJ == 1.0, "amplified copy: identical shingle SET")
    assert(math.abs(wJ - 1.0 / 3.0) < 1e-5,
      s"amplified copy: J_w ~ 1/3, got $wJ")
  }
}
