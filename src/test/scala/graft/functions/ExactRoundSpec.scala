package graft.functions

import java.math.{BigDecimal => JBD, MathContext, RoundingMode}

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalacheck.Gen

/** ExactRound is the rounding discipline for oracle-compared decimals
  * (the q109 fix): its result must equal BigDecimal HALF_UP division
  * exactly — that is the contract that makes the DuckDB HUGEINT `//`
  * mirror bit-identical. */
class ExactRoundSpec extends SparkSuite {

  private def viaSpark(nums: Seq[(BigInt, BigInt)], scale: Int): Seq[JBD] = {
    // strings, not java BigDecimal: createDataFrame infers the latter as
    // DECIMAL(38,18), which overflows q109-sized numerators at ingest
    val df = spark.createDataFrame(
      nums.map { case (n, d) => (n.toString, d.toString) })
      .toDF("n", "d")
      .select(ExactRound.roundRatio(
        col("n").cast(DecimalType(38, 0)),
        col("d").cast(DecimalType(38, 0)), scale).as("r"))
    df.collect().map(_.getDecimal(0)).toSeq
  }

  private def oracle(n: BigInt, d: BigInt, scale: Int): JBD =
    new JBD(n.bigInteger)
      .divide(new JBD(d.bigInteger), scale, RoundingMode.HALF_UP)
      .setScale(scale)

  test("roundRatio == BigDecimal HALF_UP on exact .5 ties") {
    // n/d landing exactly on a half-quantum is the case the round-7
    // q109 hash mismatch came from; pin half-up on constructed ties
    val ties = Seq(
      (BigInt(1), BigInt(2), 0),            // 0.5 -> 1
      (BigInt(15), BigInt(10), 0),          // 1.5 -> 2
      (BigInt(25), BigInt(10), 0),          // 2.5 -> 3 (half-UP, not even)
      (BigInt(125), BigInt(100), 1),        // 1.25 -> 1.3
      (BigInt(1000005), BigInt(2000000), 6) // 0.5000025 -> 0.500003 (tie at 6+1)
    )
    ties.groupBy(_._3).foreach { case (s, cases) =>
      val got = viaSpark(cases.map(c => (c._1, c._2)), s)
      cases.zip(got).foreach { case ((n, d, _), g) =>
        assert(g.compareTo(oracle(n, d, s)) == 0 && g.scale == s,
          s"$n/$d at scale $s: got $g, want ${oracle(n, d, s)}")
      }
    }
  }

  test("roundRatio == BigDecimal HALF_UP at q109 magnitudes (property)") {
    // numerators up to the q109 variance numerator (~1e25), denominators
    // up to cnt²·1e4 — the real operating range, including den > num
    val gen = for {
      n <- Gen.chooseNum(0L, Long.MaxValue)
      scaleUp <- Gen.oneOf(BigInt(1), BigInt(1000), BigInt(10).pow(7))
      d <- Gen.chooseNum(1L, 20000000L)
      s <- Gen.oneOf(0, 2, 6)
    } yield (BigInt(n) * scaleUp, BigInt(d), s)
    val cases = Gen.listOfN(60, gen).sample.get
    cases.groupBy(_._3).foreach { case (s, cs) =>
      val got = viaSpark(cs.map(c => (c._1, c._2)), s)
      cs.zip(got).foreach { case ((n, d, _), g) =>
        assert(g.compareTo(oracle(n, d, s)) == 0,
          s"$n/$d at scale $s: got $g, want ${oracle(n, d, s)}")
      }
    }
  }

  test("roundRatioSigned == BigDecimal HALF_UP on signed means incl. ties") {
    // the q143 shape: num is a signed DECIMAL(·,10) sum, den a count;
    // HALF_UP (= half-away-from-zero) must hold on BOTH signs, and the
    // constructed ties must not depend on double rounding
    val numScale = 10
    val cases = Seq(
      ("0.0000005000", 1L, 6),   // +tie      -> 0.000001
      ("-0.0000005000", 1L, 6),  // -tie      -> -0.000001
      ("1.0000015000", 1L, 6),   // +tie at 6 -> 1.000002
      ("-1.0000015000", 1L, 6),  // -tie      -> -1.000002
      ("2.5000000000", 2L, 6),   // 1.25 exact
      ("-7.7777777777", 3L, 6),  // repeating, negative
      ("123.4567891234", 7L, 6), // arbitrary
      ("0.0000000000", 5L, 6)    // zero
    )
    val df = spark.createDataFrame(cases.map { case (n, d, _) => (n, d) })
      .toDF("n", "d")
      .select(ExactRound.roundRatioSigned(
        col("n").cast(DecimalType(27, numScale)), numScale,
        col("d"), 6).as("r"))
    df.collect().map(_.getDecimal(0)).zip(cases).foreach {
      case (got, (n, d, s)) =>
        val want = new JBD(n).divide(
          new JBD(d), s, RoundingMode.HALF_UP).setScale(s)
        assert(got.compareTo(want) == 0,
          s"$n/$d at scale $s: got $got, want $want")
    }
  }

  test("floorDiv is exact floor for non-negative operands") {
    val cases = Seq((BigInt(7), BigInt(2)), (BigInt(0), BigInt(5)),
      (BigInt(10).pow(24) + 1, BigInt(3)), (BigInt(999999), BigInt(1000000)))
    val df = spark.createDataFrame(
      cases.map { case (n, d) => (n.toString, d.toString) })
      .toDF("n", "d")
      .select(ExactRound.floorDiv(
        col("n").cast(DecimalType(38, 0)), col("d").cast(DecimalType(38, 0))).as("q"))
    df.collect().map(r => BigInt(r.getDecimal(0).toBigInteger))
      .zip(cases).foreach { case (got, (n, d)) =>
        assert(got == n / d, s"floorDiv($n,$d): got $got")
      }
  }
}
