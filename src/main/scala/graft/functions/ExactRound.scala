package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Tie-safe presentation rounding for oracle-compared results.
  *
  * The rounding discipline (round-8, after the q109 hash mismatch):
  *
  * `round(double, s)` is NOT portable across engines. Spark rounds the
  * exact decimal expansion of the double (BigDecimal HALF_UP); DuckDB
  * scales the binary double by 10^s and nearbyints it. When the scaled
  * value lands within the FP multiply's error (~|x·10^s|·2^-53) of a
  * .5 boundary the two paths disagree — a per-row probability that is
  * negligible for a handful of small-magnitude values (q74: 12 values
  * near 1e2) but material once thousands of large-magnitude values are
  * emitted (q109: ~3 000 values near 1e11 → window ~2e-5 each).
  *
  * Rules for any value that crosses the oracle comparison boundary:
  *
  *  1. If the quantity derives from exact DECIMAL sums, never leave
  *     decimal space: round with [[roundRatio]] — pure integer
  *     arithmetic, bit-identical on any engine (DuckDB side uses
  *     HUGEINT `//`, see the q109 oracle).
  *  2. Choose the presentation scale s so that |value|·10^s < 2^53.
  *     The driver's comparison converts decimals to float64; below
  *     2^53 that conversion is uniquely (correctly) rounded on both
  *     engines, above it the engines' int→double paths may differ in
  *     the last ulp.
  *  3. Transcendental-derived doubles (ln, cosine) cannot be made
  *     exact; keep magnitudes small, round at a scale whose window
  *     (|x·10^s|·2^-53 per value · rows) is quantifiably negligible,
  *     and absorb per-element flips in a DECIMAL sum before the final
  *     presentation round (the q65/q78 logprob recipe: a scale-9
  *     per-token flip moves the per-doc mean by ~1e-11).
  *  4. Pure integer derivations (ntile, counts, `//`) need none of
  *     this — they are exact by construction (q107).
  *  5. NEVER emit DECIMAL — or a mismatched temporal type — at the
  *     oracle comparison boundary (round-9, after the 10 round-8 hash
  *     failures): the driver's hasher does not normalize DECIMAL
  *     across engines (Spark presents DECIMAL(38,s), DuckDB infers
  *     DECIMAL(26..38,s) — bit-identical values, mismatched hash).
  *     Boundary columns must be BIGINT / DOUBLE / VARCHAR / BOOLEAN /
  *     matched DATE: cast [[roundRatio]] results to DOUBLE on BOTH
  *     engines (exact by rule 2 while |v|·10^s < 2^53) or emit the
  *     scaled integer as BIGINT; cast Spark `date_trunc` (timestamp)
  *     to DATE where the oracle emits DATE. `scripts/check.py`
  *     enforces this at the arrow-type level.
  */
object ExactRound {

  private val I = DecimalType(38, 0)

  /** Exact floor(num/den) for non-negative integer-valued DECIMAL(38,0)
    * columns. Spark's decimal `/` rounds HALF_UP at the result scale,
    * so `floor(num/den)` alone can flip when the true quotient sits
    * within the rounding error of an integer; subtracting the remainder
    * first makes the division exact at any scale. */
  def floorDiv(num: Column, den: Column): Column =
    ((num - num % den) / den).cast(I)

  /** round-half-up(num/den) at `scale`, computed wholly in integer
    * space: floor((2·num·10^scale + den) / (2·den)), presented as
    * DECIMAL(38, scale). Requires num ≥ 0, den > 0 (all uses are
    * counts and power sums). The DuckDB mirror is
    * `((2*num*POW + den) // (2*den)) * CAST(10^-scale AS DECIMAL)`
    * over HUGEINT. */
  def roundRatio(num: Column, den: Column, scale: Int): Column = {
    val pow = lit(java.math.BigDecimal.TEN.pow(scale)).cast(I)
    val n = num.cast(I)
    val d = den.cast(I)
    val q = floorDiv(n * lit(2) * pow + d, d * lit(2))
    (q.cast(DecimalType(38, scale)) / pow).cast(DecimalType(38, scale))
  }

  /** round-half-away-from-zero(num/den) at `scale` for a SIGNED decimal
    * `num` of scale `numScale` and a positive integer `den` — the signed
    * sibling of [[roundRatio]] for means of signed DECIMAL sums (e.g.
    * embedding centroids). Integer-space exact: num is scaled to the
    * integer num·10^numScale (a (36−numScale,numScale)×10^numScale
    * product, exact while |num| < 10^(36−2·numScale)), the half-up
    * quotient is taken on |·| and the sign reapplied — half-away ties
    * match Spark decimal HALF_UP and DuckDB decimal rounding on both
    * signs. DuckDB mirror (HUGEINT s10 = num·10^numScale, d =
    * den·10^(numScale−scale)):
    * `CASE WHEN s10 < 0 THEN -((2*(-s10) + d) // (2*d))
    *       ELSE (2*s10 + d) // (2*d) END * CAST(10^-scale AS DECIMAL)`.
    * Requires scale ≤ numScale ≤ 14 (precision budget of the
    * integer-scaling product). */
  def roundRatioSigned(num: Column, numScale: Int, den: Column,
      scale: Int): Column = {
    require(scale <= numScale && numScale <= 14,
      s"need scale <= numScale <= 14, got scale=$scale numScale=$numScale")
    val toInt = lit(java.math.BigDecimal.TEN.pow(numScale))
      .cast(DecimalType(numScale + 1, 0))
    val nInt = (num.cast(DecimalType(36 - numScale, numScale)) * toInt).cast(I)
    val dInt = den.cast(I) *
      lit(java.math.BigDecimal.TEN.pow(numScale - scale)).cast(I)
    val q = floorDiv(abs(nInt) * lit(2) + dInt, dInt * lit(2))
    val signed = when(nInt < 0, -q).otherwise(q)
    (signed.cast(DecimalType(38, scale)) /
      lit(java.math.BigDecimal.TEN.pow(scale)).cast(I))
      .cast(DecimalType(38, scale))
  }
}
