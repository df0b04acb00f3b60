package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties for the compiled CDC boundary kernel: on random
  * strings (including supplementary-plane codepoints), the O(len)
  * rolling recurrence must equal the DEFINING per-window fold computed
  * independently here, boundaries stay in range and strictly before the
  * end, and prepending a prefix shifts every surviving boundary by
  * exactly the prefix's codepoint length (the content-defined
  * robustness law). */
object CdcProps extends Properties("cdcBoundaries") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30).withWorkers(1)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val (w, d) = (16, 8)
  private val P = 1000000007L

  private val genText: Gen[String] = for {
    n <- Gen.choose(0, 400)
    // mostly ASCII with occasional high-BMP and supplementary codepoints
    cps <- Gen.listOfN(n, Gen.frequency(
      (20, Gen.choose(32, 126)),
      (2, Gen.choose(0xC0, 0x2FF)),
      (1, Gen.oneOf(0x4E2D, 0x1F600, 0x10400))))
  } yield cps.map(Character.toChars(_).mkString).mkString

  /** The defining per-window fold over CODEPOINTS: 1-based end
    * positions in [w, len-1] whose w-codepoint window hash divides d. */
  private def refBounds(s: String): Seq[Int] = {
    val cps = s.codePoints().toArray
    val n = cps.length
    (w to n - 1).filter { end1 =>
      var h = 0L
      var j = end1 - w
      while (j < end1) { h = (h * 31 + cps(j)) % P; j += 1 }
      h % d == 0
    }
  }

  private def kernelBounds(s: String): Seq[Int] =
    Seq(s).toDF("t")
      .select(call_function("graft_cdc_boundaries", col("t"), lit(w), lit(d)))
      .head().getSeq[Int](0).toSeq

  property("rolling recurrence == defining per-window fold") =
    Prop.forAll(genText) { s => kernelBounds(s) == refBounds(s) }

  property("boundaries strictly inside (w <= b < len), ascending") =
    Prop.forAll(genText) { s =>
      val n = s.codePoints().toArray.length
      val bs = kernelBounds(s)
      bs.forall(b => b >= w && b < n) && bs == bs.sorted && bs.distinct == bs
    }

  property("prefix insertion shifts surviving boundaries by its length") =
    Prop.forAll(genText, Gen.choose(1, 5)) { (s, k) =>
      val prefix = "Z" * k
      val base = kernelBounds(s).toSet
      val shifted = kernelBounds(prefix + s).map(_ - k).toSet
      // every old boundary whose window lies fully in the old content
      // must survive, shifted; new boundaries may appear only where a
      // window overlaps the prefix (positions < w after the shift)
      base.subsetOf(shifted) &&
        (shifted -- base).forall(_ < w)
    }
}
