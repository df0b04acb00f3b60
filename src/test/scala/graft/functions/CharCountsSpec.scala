package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The graft_char_counts kernel (q283's one-pass histogram) and the
  * entropy gate built on it: histogram bit-identity against a plain
  * Scala recompute (including astral code points, where the kernel's
  * unit — code points, surrogate pairs once — must match DuckDB's
  * unicode(substr(…))), and the closed-form entropy anchors.
  */
class CharCountsSpec extends SparkSuite {
  import spark.implicits._

  private val texts = Seq(
    "a", "aa", "abab", "The cat! The cat?", "tab\tand\nnewline",
    "Ünïcode émojis 😀😀🎉", "𝕬stral 𝕬gain", "0" * 1000,
    (0 until 256).map(_.toChar).mkString)

  test("histogram equals a plain Scala code-point recompute, sorted by cp") {
    val got = texts.toDF("text")
      .select(call_function("graft_char_counts", col("text")).as("h"))
      .as[Seq[(Int, Long)]].collect()
    texts.zip(got).foreach { case (s, hist) =>
      val expect = s.codePoints().toArray.toSeq
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      assert(hist == expect, s"histogram for '$s'")
    }
  }

  test("entropy anchors: single-repeated-char docs score 0 and are " +
      "dropped; a 256-symbol uniform doc scores ln(256) and is kept") {
    val df = Seq(
      (1L, "z" * 500, "en", "s", 500L),
      (2L, scala.util.Random.shuffle(
        (0 until 256).flatMap(i => Seq.fill(4)((i + 32).toChar))).mkString,
        "en", "s", 1024L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = graft.Tmp.dir("graft-centropy-spec")
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("q283_char_entropy")(spark, dir.toString)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(1L) == ((500L, 1L, 0.0, false)),
      "constant doc: zero entropy, gated out")
    val (ncp, alpha, ent, keep) = out(2L)
    assert(ncp == 1024L && alpha == 256L && keep)
    assert(math.abs(ent - math.log(256.0)) < 2e-6,
      s"uniform-256 entropy $ent vs ${math.log(256.0)}")
  }

  test("fixture: entropy positive, bounded by ln(alphabet), and the gate " +
      "is exactly entropy > 1.5 at the 6-dp grid") {
    val rows = graft.SparkEntry.queries("q283_char_entropy")(spark, sfDir())
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (alpha, ent, keep) = (r.getLong(2), r.getDouble(3), r.getBoolean(4))
      assert(ent >= 0.0 && ent <= math.log(alpha.toDouble) + 1e-6)
      assert(keep == (ent > 1.5))
    }
  }
}
