package graft.queries

import graft.SparkSuite

/** Kneser–Ney bigram scoring (L263) invariants beyond the oracle: the
  * scoring formula is a PROPER conditional distribution (sums to one
  * over the vocabulary for every history), and the fixture scores
  * recompute from scratch.
  */
class LmSpec extends SparkSuite {

  private def tok(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  /** The q282 formula as plain math over exact counts. */
  private def knModel(docs: Seq[Array[String]]) = {
    val pairs = docs.flatMap(t => t.zip(t.drop(1)))
    val c2 = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1p = c2.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1m = c2.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tt = c2.size.toLong
    (c2, c1, n1p, n1m, tt)
  }

  test("KN bigram probabilities sum to 1 over the vocabulary for every " +
      "history (unseen continuations carry the discounted mass)") {
    val docs = Seq("the cat sat on the mat", "the dog sat on the log",
      "a cat and a dog and a rat").map(tok)
    val (c2, c1, n1p, n1m, tt) = knModel(docs)
    val vocab = docs.flatten.distinct
    c1.keys.foreach { w1 =>
      val total = vocab.map { w2 =>
        val disc = math.max(c2.getOrElse((w1, w2), 0L) - 0.75, 0.0) / c1(w1)
        val backoff = 0.75 * n1p(w1) / c1(w1) *
          n1m.getOrElse(w2, 0L).toDouble / tt
        disc + backoff
      }.sum
      assert(math.abs(total - 1.0) < 1e-12, s"sum over vocab for '$w1'")
    }
  }

  test("fixture per-doc means recompute from scratch; every mean is " +
      "strictly negative (observed P < 1 under discounting)") {
    val docToks = graft.Tables.documents(spark, sfDir())
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tok(r.getString(1))).toMap
    val (c2, c1, n1p, n1m, tt) = knModel(docToks.values.toSeq)
    val rows = graft.SparkEntry.queries("q282_kn_bigram_lm")(spark, sfDir())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (docId, nBigrams, mean) =>
      val bgs = docToks(docId).zip(docToks(docId).drop(1))
      assert(bgs.length.toLong == nBigrams)
      // the exact-integer ratio the query mints, on the same 9-dp grid
      val expect = bgs.map { bg =>
        val num = tt * (4 * c2(bg) - 3) + 3 * n1p(bg._1) * n1m(bg._2)
        val den = 4 * c1(bg._1) * tt
        BigDecimal(math.log(num.toDouble / den.toDouble))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble / bgs.length
      assert(math.abs(expect - mean) < 1e-6,
        s"doc $docId mean recompute: $expect vs $mean")
      assert(mean < 0.0)
    }
  }

  test("stupid backoff: held-out scores recompute from scratch; class " +
      "counts partition the bigrams; every score is <= 0") {
    val docToks = graft.Tables.documents(spark, sfDir())
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tok(r.getString(1))).toMap
    val train = docToks.filter(_._1 % 7 != 0).values.toSeq
    val pairs = train.flatMap(t => t.zip(t.drop(1)))
    val c2 = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val u = train.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = train.flatten.size.toLong
    def lp9(num: Long, den: Long): BigDecimal =
      BigDecimal(math.log(num.toDouble / den.toDouble))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val rows = graft.SparkEntry.queries("q288_stupid_backoff")(spark, sfDir())
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (docId, nBg, nBo, nOov) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(docId % 7 == 0, "only held-out docs are scored")
      val bgs = docToks(docId).zip(docToks(docId).drop(1))
      assert(bgs.length.toLong == nBg)
      val cls = bgs.map { bg =>
        if (c2.contains(bg)) 0 else if (u.contains(bg._2)) 1 else 2 }
      assert(cls.count(_ == 1).toLong == nBo && cls.count(_ == 2).toLong == nOov)
      val scored = bgs.zip(cls).collect {
        case (bg, 0) => lp9(c2(bg), c1(bg._1))
        case (bg, 1) => lp9(2L * u(bg._2), 5L * n)
      }
      if (scored.nonEmpty) {
        val mean = r.getDouble(4)
        assert(math.abs(scored.sum.toDouble / scored.length - mean) < 1e-6,
          s"doc $docId mean recompute")
        assert(mean <= 0.0, "stupid-backoff scores are probabilities-like <= 1")
      }
    }
  }
}
