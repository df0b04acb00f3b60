package graft.ops

import graft.functions.ExactRound
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The q238–q240 and q258–q262 decision kernels as first-class
  * operators: mixture water-filling feasibility, Cohen's κ gate
  * agreement, the exact two-sample Kolmogorov–Smirnov drift test, the
  * exact Mann–Whitney rank-sum drift test (single-pair and grouped),
  * isotonic (PAVA) gate calibration, the distribution-free
  * order-statistic median CI, and the deterministic Poisson-multiplier
  * bootstrap CI. Extracted from the query bodies so their edge
  * semantics (zero-weight sources, degenerate single-class gates, a
  * tie exactly at a rejection boundary, an already-monotone
  * calibration curve, a two-row CI) are pinned by specs, not only by
  * the oracle's equality on corpus data. All are exact-integer
  * kernels: DECIMAL(38,0) sums, verdicts decided by integer
  * cross-multiplication against minted constants, and the half-away
  * integer divide (`ExactRound.roundRatio`) at the presentation
  * boundary — a boundary case cannot flip cross-engine. Where a kernel
  * must emit a raw DOUBLE (the isotonic rate, a bootstrap replica
  * mean) it is an integer÷integer IEEE division of exact sums — the
  * same bits on any engine (ExactRound rule 2).
  */
object Stats {
  private val I = DecimalType(38, 0)

  /** Mixture water-filling under availability (q238): the bottleneck-
    * rule budget T = min_s ⌊epochCap·avail_s·W∕w_s⌋, evaluated entirely
    * in integer floor arithmetic. T is feasible by construction (every
    * source's floor share ⌊T·w∕W⌋ fits inside `epochCap · avail`
    * tokens) but not necessarily the MAXIMUM feasible T — integer
    * floors can leave headroom the closed-form rule does not claw back
    * (cap·avail=5, w=3, W=10 gives T=16 while T=19 still fits). Input: one row per source with a
    * weight column and an available-token column. Zero-weight sources
    * impose NO cap and receive NO allocation (they are out of the
    * mixture); `avail` must be ≥ 0, and `epochs` is reported as 0 for
    * an empty source. One |sources|-row aggregate + broadcast grid
    * math — never a corpus shuffle.
    */
  def waterFill(src: DataFrame, srcCol: String, wCol: String,
      availCol: String, epochCap: Int): DataFrame = {
    require(epochCap >= 1, s"epochCap must be positive, got $epochCap")
    val base = src.select(col(srcCol), col(wCol).cast(I).as("w"),
      col(availCol).cast(I).as("avail"))
    val tw = base.agg(sum("w").as("ww"))
    val withT = base.crossJoin(broadcast(tw))
      .withColumn("cap_t", when(col("w") > 0,
        expr(s"($epochCap * avail * ww) div w").cast(I)))
    val t = withT.agg(min("cap_t").as("tt"))
    withT.crossJoin(broadcast(t))
      .withColumn("alloc", when(col("w") > 0,
        expr("(tt * w) div ww").cast(I)).otherwise(lit(0).cast(I)))
      .select(col(srcCol), col("w").cast("long").as("weight"),
        col("avail").cast("long").as("avail_tokens"),
        col("alloc").cast("long").as("alloc_tokens"),
        when(col("avail") > 0,
          ExactRound.roundRatio(col("alloc"), col("avail"), 6)
            .cast("double")).otherwise(lit(0.0)).as("epochs"),
        coalesce(col("cap_t") === col("tt"), lit(false)).as("bottleneck"))
  }

  /** Cohen's κ between two 0/1 gate columns (q239): agreement beyond
    * chance, κ = (n·(a+d) − pe)∕(n² − pe) with pe the chance cross
    * product — pure integers into one signed half-away divide. A
    * degenerate pair of single-class gates (n² == pe, e.g. both gates
    * pass everything) is defined as κ = 1: gates that cannot disagree
    * agree perfectly — and an EMPTY population (n = 0, e.g. every doc
    * upstream-filtered) likewise presents agreement = κ = 1.0 rather
    * than dividing by zero (the q302/q304 degenerate-fixture guard
    * class). Returns one row: the 2×2 contingency counts, observed
    * agreement, κ. */
  def cohensKappa(g: DataFrame, gaCol: String, gbCol: String): DataFrame = {
    val ga = col(gaCol)
    val gb = col(gbCol)
    val c = g.agg(
      coalesce(sum(ga * gb), lit(0L)).cast(I).as("a"),
      coalesce(sum(ga * (lit(1L) - gb)), lit(0L)).cast(I).as("b"),
      coalesce(sum((lit(1L) - ga) * gb), lit(0L)).cast(I).as("c"),
      coalesce(sum((lit(1L) - ga) * (lit(1L) - gb)), lit(0L)).cast(I).as("d"),
      count(lit(1)).cast(I).as("n"))
    val k = c
      .withColumn("pe", (col("a") + col("b")) * (col("a") + col("c")) +
        (col("c") + col("d")) * (col("b") + col("d")))
      .withColumn("po", col("n") * (col("a") + col("d")))
      .withColumn("den", col("n") * col("n") - col("pe"))
    k.select(
      col("a").cast("long").as("n_both"),
      col("b").cast("long").as("n_a_only"),
      col("c").cast("long").as("n_b_only"),
      col("d").cast("long").as("n_neither"),
      when(col("n") === 0, lit(1.0)).otherwise(
        ExactRound.roundRatio(col("a") + col("d"), col("n"), 6)
          .cast("double")).as("observed_agreement"),
      when(col("den") === 0, lit(1.0)).otherwise(
        when(col("po") - col("pe") >= 0,
          ExactRound.roundRatio(col("po") - col("pe"), col("den"), 6))
          .otherwise(-ExactRound.roundRatio(col("pe") - col("po"),
            col("den"), 6))
          .cast("double")).as("kappa"))
  }

  /** Multi-class Cohen's κ between two categorical label columns
    * (q315 — the k-class generalization of [[cohensKappa]], the
    * agreement measure published LID comparisons report): po =
    * Σ_k n_kk (diagonal mass), pe = Σ_k rowtot_k·coltot_k (chance
    * cross product), κ = (n·po − pe)∕(n² − pe) — pure DECIMAL(38,0)
    * integers into the signed half-away divide. Degenerate cases are
    * κ = 1 exactly as in the binary kernel: n² == pe (both labelings
    * constant — they cannot disagree) and n == 0 (nothing to
    * disagree on). The contingency table is |classes|² rows — grid
    * math, one corpus aggregate. One row: n, observed agreement, κ. */
  def cohensKappaMulti(g: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val c = g.groupBy(col(aCol).as("ka"), col(bCol).as("kb"))
      .agg(count(lit(1)).cast(I).as("m"))
      .localCheckpoint() // |classes|² grid; margins + diagonal read it
    val diag = c.agg(
      coalesce(sum(when(col("ka") === col("kb"), col("m"))
        .otherwise(lit(0).cast(I))), lit(0).cast(I)).as("po"),
      coalesce(sum(col("m")), lit(0).cast(I)).as("n"))
    val ra = c.groupBy("ka").agg(sum("m").as("ra"))
    val cb = c.groupBy("kb").agg(sum("m").as("cb"))
    val pe = ra.join(cb, col("ka") === col("kb"))
      .agg(coalesce(sum(col("ra") * col("cb")), lit(0).cast(I)).as("pe"))
    diag.crossJoin(pe)
      .withColumn("den", col("n") * col("n") - col("pe"))
      .withColumn("num", col("n") * col("po") - col("pe"))
      .select(
        col("n").cast("long").as("n"),
        when(col("n") === 0, lit(1.0)).otherwise(
          ExactRound.roundRatio(col("po"), col("n"), 6)
            .cast("double")).as("observed_agreement"),
        when(col("den") === 0, lit(1.0)).otherwise(
          when(col("num") >= 0,
            ExactRound.roundRatio(col("num"), col("den"), 6))
            .otherwise(-ExactRound.roundRatio(-col("num"), col("den"), 6))
            .cast("double")).as("kappa"))
  }

  /** Kendall's τ between two DISTINCT integer rankings of the same
    * groups (q276): the rank-correlation that answers "do these two
    * orderings agree?" pair by pair — C concordant and D discordant
    * pairs over the n(n−1)∕2 group pairs, τ = (C−D)∕(n(n−1)∕2) minted
    * signed half-up at 6 dp, and the α = 5% independence verdict
    * decided strictly in integer space: 18·(C−D)²·10⁴ >
    * 38416·n(n−1)(2n+5) (the normal approximation's z² cleared of its
    * square root; a tie exactly AT the boundary is NOT dependence —
    * strict >, pinned in spec). Ranks must be distinct integers (the
    * callers mint them with a deterministic tiebreak, so no zero sign
    * products exist). |groups|²-pair grid math — callers rank
    * AGGREGATES, never corpus rows. */
  def kendallTau(df: DataFrame, grpCol: String, r1Col: String,
      r2Col: String): DataFrame = {
    val base = df.select(col(grpCol).as("grp"),
      col(r1Col).cast(I).as("r1"), col(r2Col).cast(I).as("r2"))
    val a = base.select(col("grp").as("ga"), col("r1").as("a1"),
      col("r2").as("a2"))
    val b = base.select(col("grp").as("gb"), col("r1").as("b1"),
      col("r2").as("b2"))
    val pairs = a.join(broadcast(b), col("ga") < col("gb"))
      .withColumn("sgn", (col("a1") - col("b1")) * (col("a2") - col("b2")))
    val agg = pairs.agg(
      sum(when(col("sgn") > 0, 1L).otherwise(0L)).cast(I).as("c"),
      sum(when(col("sgn") < 0, 1L).otherwise(0L)).cast(I).as("d"))
    val n = base.agg(count(lit(1)).cast(I).as("n"))
    agg.crossJoin(broadcast(n))
      .withColumn("cd", col("c") - col("d"))
      .select(
        col("n").cast("long").as("n_groups"),
        col("c").cast("long").as("n_concordant"),
        col("d").cast("long").as("n_discordant"),
        when(col("cd") >= 0, ExactRound.roundRatio(
          lit(2).cast(I) * col("cd"), col("n") * (col("n") - 1), 6))
          .otherwise(-ExactRound.roundRatio(
            lit(2).cast(I) * -col("cd"), col("n") * (col("n") - 1), 6))
          .cast("double").as("tau"),
        (lit(18).cast(I) * col("cd") * col("cd") * lit(10000L).cast(I) >
          lit(38416L).cast(I) * col("n") * (col("n") - 1) *
            (lit(2).cast(I) * col("n") + 5)).as("dependent"))
  }

  /** Wilson score intervals for per-group binary rates (q274): the
    * interval that behaves at the boundaries where the Wald interval
    * collapses (k = 0 or k = n give degenerate Wald CIs — exactly the
    * small-source rows a curation report cares about). Computed in
    * doubles from the exact (k, n) integers with ONE fixed operand
    * tree — `p = k∕n`, `center = p + z²∕(2n)`, `rad = z·√(p(1−p)∕n +
    * z²∕(4n²))`, `(center ± rad)∕(1 + z²∕n)` — written identically in
    * both engines (z = 1.96, z² = 3.8416 minted as shared literals), so
    * every IEEE step is bit-identical and the raw-double bounds cross
    * the oracle boundary safely. Requires n > 0 per group. */
  def wilsonIntervals(grouped: DataFrame, grpCol: String, nCol: String,
      posCol: String): DataFrame = {
    val nn = col("n").cast("double")
    val kk = col("pos").cast("double")
    val p = kk / nn
    val z = lit(1.96)
    val z2 = lit(3.8416)
    val den = lit(1.0) + z2 / nn
    val center = p + z2 / (lit(2.0) * nn)
    val rad = z * sqrt(p * (lit(1.0) - p) / nn +
      z2 / (lit(4.0) * (nn * nn)))
    grouped.select(col(grpCol).as("grp"),
      col(nCol).cast(I).as("n"), col(posCol).cast(I).as("pos"))
      .select(col("grp"),
        col("n").cast("long").as("n_docs"),
        col("pos").cast("long").as("n_keep"),
        ExactRound.roundRatio(col("pos"), col("n"), 6)
          .cast("double").as("keep_rate"),
        ((center - rad) / den).as("wilson_lo"),
        ((center + rad) / den).as("wilson_hi"))
  }

  /** McNemar's test for a PAIRED gate migration (q271): κ (cohensKappa)
    * measures agreement; this tests whether the DISAGREEMENT between
    * gate v1 and gate v2 on the same rows is asymmetric — the question
    * a gate-version rollout actually asks ("does v2 decide differently,
    * and in which direction?"). Only the discordant cells matter:
    * b = v1-only keeps, c = v2-only keeps; χ² = (b−c)²∕(b+c) presented
    * half-up at 6 dp and the α = 5% verdict decided strictly in integer
    * space — shift iff (b−c)²·10⁴ > 38416·(b+c), a tie exactly AT the
    * boundary is NOT a shift (strict >, pinned in spec). A fully
    * concordant pair (b = c = 0) is defined as no shift, χ² = 0.
    * `direction` reports which version is net stricter ('tightened' =
    * v1 kept more, 'loosened' = v2 keeps more, 'balanced'). One
    * aggregate over the paired gate columns. */
  def mcnemarShift(g: DataFrame, gaCol: String, gbCol: String): DataFrame = {
    val ga = col(gaCol)
    val gb = col(gbCol)
    val c = g.agg(
      sum(ga * gb).cast(I).as("a"),
      sum(ga * (lit(1L) - gb)).cast(I).as("b"),
      sum((lit(1L) - ga) * gb).cast(I).as("c"),
      sum((lit(1L) - ga) * (lit(1L) - gb)).cast(I).as("d"),
      count(lit(1)).cast(I).as("n"))
    c.withColumn("dd", col("b") - col("c"))
      .select(
        col("n").cast("long").as("n"),
        col("a").cast("long").as("n_both"),
        col("b").cast("long").as("n_v1_only"),
        col("c").cast("long").as("n_v2_only"),
        col("d").cast("long").as("n_neither"),
        when(col("b") + col("c") === 0, lit(0.0)).otherwise(
          ExactRound.roundRatio(col("dd") * col("dd"),
            col("b") + col("c"), 6).cast("double")).as("chi2"),
        (col("dd") * col("dd") * lit(10000L).cast(I) >
          lit(38416L).cast(I) * (col("b") + col("c"))).as("shift_detected"),
        when(col("dd") > 0, lit("tightened"))
          .when(col("dd") < 0, lit("loosened"))
          .otherwise(lit("balanced")).as("direction"))
  }

  /** Exact two-sample KS drift test (q240) between `a`'s and `b`'s
    * `vCol` distributions: D = max|F₁−F₂| as the rational
    * Dnum∕(n₁·n₂) over the merged support, and the α-level verdict
    * decided STRICTLY in integer space — drift iff
    * Dnum²·10⁶ > c6·(n₁+n₂)·n₁·n₂. The default c6 = 1358² = 1844164
    * is the squared 3-dp table value c(α=0.05) = 1.358 (times 10⁶);
    * a tie exactly AT the boundary is NOT drift (strict `>`, pinned
    * by spec). Both inputs must be non-empty. One sort-free pass:
    * per-distinct-value cumulative-count windows on each side. */
  def ksExact(a: DataFrame, b: DataFrame, vCol: String,
      c6: Long = 1844164L): DataFrame = {
    val ag = a.groupBy(col(vCol).as("v")).agg(count(lit(1)).as("c1"))
    val bg = b.groupBy(col(vCol).as("v")).agg(count(lit(1)).as("c2"))
    val merged = ag.join(bg, Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))
    // unpartitioned window over the DISTINCT-value support only (grid-
    // bounded: 6-dp scores / categorical values — never raw-row-sized)
    val w = Window.orderBy(col("v")).rowsBetween(
      Window.unboundedPreceding, Window.currentRow)
    val n1 = ag.agg(sum("c1").cast(I).as("n1"))
    val n2 = bg.agg(sum("c2").cast(I).as("n2"))
    val s = merged
      .withColumn("f1", sum("c1").over(w).cast(I))
      .withColumn("f2", sum("c2").over(w).cast(I))
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
    s.agg(max(abs(col("f1") * col("n2") - col("f2") * col("n1")))
        .as("dnum"),
        first(col("n1")).as("n1"), first(col("n2")).as("n2"))
      .select(col("n1").cast("long").as("n1"),
        col("n2").cast("long").as("n2"),
        ExactRound.roundRatio(col("dnum"), col("n1") * col("n2"), 6)
          .cast("double").as("d_stat"),
        (col("dnum") * col("dnum") * lit(1000000L).cast(I) >
          lit(c6).cast(I) * (col("n1") + col("n2")) *
            col("n1") * col("n2")).as("drift_detected"))
  }

  /** Exact two-sample Mann–Whitney rank-sum drift test, grouped: one
    * verdict per `repCol` group over rows (rep, side, v) with side 0 =
    * sample A, side 1 = sample B. The U statistic is kept as the
    * integer 2U = Σ_v c₁(v)·(2·F₂(v) − c₂(v)) over the merged distinct
    * support (ties contribute the standard half-credit — the c₂∕2 term
    * is what the −c₂ inside the doubled sum encodes), and the
    * two-sided α = 5% normal-approximation verdict is decided ENTIRELY
    * in integer space on the bhDrift e5 effect-size ladder (round 17 —
    * the round-16 reduction's verdict product 38416·n₁n₂·G crossed 38
    * digits at ~sf130, measured by StatsScaleProbe at factor 3000):
    * e5 = ⌊dev·10⁵∕(n₁n₂)⌋ ≤ 10⁵ with dev = |2U − n₁n₂|, then
    * z6 = ⌊e5²·3n(n−1)·n₁n₂ ∕ (G·10⁴)⌋ compared strictly against
    * 3841600 = 1.96²·10⁶, with G = n(n−1)(n+1) − Σ(t³−t) the
    * tie-corrected variance numerator. Every left-to-right intermediate
    * stays inside DECIMAL(38,0) to ~sf300 (the bhDrift headroom — the
    * ladder peak e5²·3n(n−1)·n₁n₂ reads ~7·10³⁷ at factor 3000 on the
    * probe fixture), and the floor-divide recipe is minted VERBATIM in
    * the oracle SQL, so the ≤10⁻⁴-relative coarsening the e5 grid adds
    * cannot flip a verdict cross-engine.
    * A degenerate group (all values tied) has G = 0 and dev = 0 —
    * no drift, no division hazard; a group missing either side is
    * dropped (a one-sample group has no two-sample verdict). A tie
    * exactly AT the boundary is NOT drift (strict `>`). Returns per
    * rep: n1, n2, u (A's U as DOUBLE — exact, 2U < 2⁵³), auc =
    * U∕(n₁n₂) at 6 dp (the probability-of-superiority effect size),
    * drift_detected. One sort-free pass: per-(rep, distinct value)
    * counts + a rep-partitioned cumulative window. */
  private def mwCore(df: DataFrame, repCol: String, sideCol: String,
      vCol: String): DataFrame = {
    val m = df
      .groupBy(col(repCol).as("rep"), col(vCol).as("v"))
      .agg(
        sum(when(col(sideCol) === 0, 1L).otherwise(0L)).as("c1"),
        sum(when(col(sideCol) === 0, 0L).otherwise(1L)).as("c2"))
    val w = Window.partitionBy("rep").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val s = m
      .withColumn("f2", sum("c2").over(w).cast(I))
      .withColumn("t", (col("c1") + col("c2")).cast(I))
    val agg = s.groupBy("rep").agg(
      sum(col("c1").cast(I) * (lit(2).cast(I) * col("f2") - col("c2").cast(I)))
        .as("u2"),
      sum(col("c1")).cast(I).as("n1"),
      sum(col("c2")).cast(I).as("n2"),
      sum(col("t") * col("t") * col("t") - col("t")).as("ties"))
    agg.filter(col("n1") > 0 && col("n2") > 0)
      .withColumn("n", col("n1") + col("n2"))
      .withColumn("dev", abs(col("u2") - col("n1") * col("n2")))
      .withColumn("g",
        col("n") * (col("n") - 1) * (col("n") + 1) - col("ties"))
  }

  /** The shared e5→z6 integer ladder over [[mwCore]] output (minted for
    * bhDrift in round 16, extended to the single-test verdict in round
    * 17): the 5-dp effect size e5 = ⌊dev·10⁵∕(n₁n₂)⌋ ≤ 10⁵ (dev ≤ n₁n₂
    * by construction), then the 10⁻⁶-grid z² as
    * z6 = ⌊e5²·3n(n−1)·n₁n₂ ∕ (G·10⁴)⌋ — every left-to-right
    * intermediate ≤ ~9·10³⁵ at sf100-scale counts, headroom to ~sf300
    * (StatsScaleProbe). A fully-tied group has dev = 0 → e5 = 0 → z6 =
    * 0, and the G = 0 guard keeps the division defined. */
  private def withZ6(v: DataFrame): DataFrame = v
    .withColumn("e5", ExactRound.floorDiv(
      col("dev") * lit(100000L).cast(I), col("n1") * col("n2")))
    .withColumn("z6", when(col("g") > 0,
      ExactRound.floorDiv(
        col("e5") * col("e5") * lit(3).cast(I) * col("n") *
          (col("n") - 1) * col("n1") * col("n2"),
        col("g") * lit(10000L).cast(I))).otherwise(lit(0).cast(I)))

  def mannWhitneyBy(df: DataFrame, repCol: String, sideCol: String,
      vCol: String): DataFrame = {
    val v = withZ6(mwCore(df, repCol, sideCol, vCol))
    v.select(
      col("rep"),
      col("n1").cast("long").as("n1"),
      col("n2").cast("long").as("n2"),
      (col("u2").cast("double") / lit(2.0)).as("u"),
      ExactRound.roundRatio(col("u2"), lit(2).cast(I) * col("n1") * col("n2"), 6)
        .cast("double").as("auc"),
      // strict >: a z² tie exactly AT the 1.96² boundary is NOT drift
      (col("z6") > lit(3841600L).cast(I)).as("drift_detected"))
  }

  /** Single-pair Mann–Whitney: `a` is sample A (side 0), `b` sample B.
    * Both must be non-empty. See [[mannWhitneyBy]] for the exact
    * semantics. */
  def mannWhitney(a: DataFrame, b: DataFrame, vCol: String): DataFrame =
    mannWhitneyBy(
      a.select(lit(0L).as("rep"), lit(0).as("side"), col(vCol).as("v"))
        .unionAll(b.select(lit(0L).as("rep"), lit(1).as("side"),
          col(vCol).as("v"))),
      "rep", "side", "v").drop("rep")

  /** Isotonic (PAVA) calibration of a binary rate against an ordered
    * bin: for per-bin rows (bin, n > 0, pos) the least-squares monotone
    * non-decreasing fit ŷ_bin, via the closed max-min form ŷ_i =
    * max_{j≤i} min_{l≥i} (Σ_{j..l} pos ∕ Σ_{j..l} n) — the interval
    * averages a pool-adjacent-violators sweep converges to, O(k³) grid
    * math over the k OBSERVED bins (empty bins never enter the fit; an
    * already-monotone curve comes back unchanged — each i attains its
    * own singleton interval). Interval rates are integer÷integer IEEE
    * double divisions of exact prefix sums (< 2⁵³) — min/max over them
    * is bit-deterministic on any engine — and `raw_rate` rounds via
    * the integer half-up divide. The grid never touches the corpus:
    * callers aggregate to bins first, so the fit costs one broadcast
    * self-join on a k-row table at any corpus size. */
  def isotonicFit(binned: DataFrame, binCol: String, nCol: String,
      posCol: String): DataFrame = {
    val sess = binned.sparkSession
    import sess.implicits._
    // the bin aggregate is parameter-sized by construction (callers
    // bound k; q259 caps at 16) — collect it and run the O(k³) grid on
    // the driver, the kmeansLloyd small-aggregate precedent. The first
    // cut kept the grid distributed (self-joins on the k-row table)
    // and paid ~3 s of re-planning/scheduling PER CALL at any SF for
    // 16 rows of math; the collect form is ~0.3 s, corpus pays only
    // the upstream aggregate either way.
    val rows = binned
      .select(col(binCol).cast("long"), col(nCol).cast("long"),
        col(posCol).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    if (rows.isEmpty) {
      Seq.empty[(Long, Long, Long, Double, Double)]
        .toDF("bin", "n_docs", "n_keep", "raw_rate", "iso_rate")
    } else {
      val k = rows.length
      // prefix sums in BigInt — the DECIMAL(38,0) oracle's arithmetic
      val cn = rows.scanLeft(BigInt(0))(_ + _._2).tail
      val cp = rows.scanLeft(BigInt(0))(_ + _._3).tail
      // interval rate as the SAME integer÷integer IEEE double division
      // the oracle runs (exact operands < 2⁵³ → identical bits)
      def rate(j: Int, l: Int): Double = {
        val p = cp(l) - (if (j == 0) BigInt(0) else cp(j - 1))
        val nn = cn(l) - (if (j == 0) BigInt(0) else cn(j - 1))
        p.toDouble / nn.toDouble
      }
      val iso = (0 until k).map { i =>
        (0 to i).map(j => (i until k).map(l => rate(j, l)).min).max
      }
      rows.toSeq.zipWithIndex.map { case ((b, n, p), i) =>
        val raw6 = (BigInt(2) * p * 1000000 + n) / (BigInt(2) * n)
        (b, n, p, raw6.toDouble / 1e6, iso(i))
      }.toDF("bin", "n_docs", "n_keep", "raw_rate", "iso_rate")
    }
  }

  /** Distribution-free median CI from order statistics: the point
    * median (mean of the two central order statistics for even n,
    * exact — integer values make the ∕2 a representable double) and
    * the ~95% CI [v₍l₎, v₍n+1−l₎] with l = max(1, (n − m) div 2) where
    * m is the SMALLEST integer with m²·10⁴ ≥ 38416·n (the integer
    * ceiling of 1.96·√n — minted via an exact integer sqrt: the
    * float-sqrt seed is corrected by ±1 in integer space, so a perfect
    * square cannot round off cross-engine). Conservative inward by
    * construction (normal approximation to Binomial(n, ½) ranks, the
    * textbook nonparametric interval). One support-sized pass:
    * distinct-value counts + a cumulative window; rank selection is
    * `min v with F(v) ≥ r` — never a global row sort. Requires a
    * non-empty input with an integer-valued `vCol`. */
  def medianCI(df: DataFrame, vCol: String): DataFrame = {
    val sup = df.groupBy(col(vCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = sup.withColumn("f",
      // unpartitioned window over the integer-value SUPPORT only
      // (distinct values, grid-bounded — never raw-row-sized)
      sum("c").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast(I))
    val n = col("n")
    val x = lit(38416L).cast(I) * n
    val s0 = floor(sqrt(x.cast("double"))).cast(I)
    val s1 = when(s0 * s0 > x, s0 - 1).otherwise(s0)
    val s2 = when((s1 + 1) * (s1 + 1) <= x, s1 + 1).otherwise(s1)
    val m1 = ExactRound.floorDiv(s2, lit(100).cast(I))
    val m = when(m1 * m1 * lit(10000).cast(I) >= x, m1).otherwise(m1 + 1)
    val ranks = sup.agg(sum("c").cast(I).as("n"))
      .select(n,
        greatest(ExactRound.floorDiv(n - m, lit(2).cast(I)), lit(1).cast(I))
          .as("lo_r"))
      .select(n, col("lo_r"), (n + 1 - col("lo_r")).as("hi_r"),
        ExactRound.floorDiv(n + 1, lit(2).cast(I)).as("m1_r"),
        (ExactRound.floorDiv(n, lit(2).cast(I)) + 1).as("m2_r"))
    cum.crossJoin(broadcast(ranks))
      .agg(
        first(col("n")).cast("long").as("nn"),
        min(when(col("f") >= col("m1_r"), col("v"))).as("mv1"),
        min(when(col("f") >= col("m2_r"), col("v"))).as("mv2"),
        min(when(col("f") >= col("lo_r"), col("v"))).as("lo_v"),
        min(when(col("f") >= col("hi_r"), col("v"))).as("hi_v"),
        first(col("lo_r")).cast("long").as("rank_lo"),
        first(col("hi_r")).cast("long").as("rank_hi"))
      .select(col("nn").as("n"),
        ((col("mv1") + col("mv2")).cast("double") / lit(2.0)).as("median"),
        col("lo_v").cast("long").as("ci_lo"),
        col("hi_v").cast("long").as("ci_hi"),
        col("rank_lo"), col("rank_hi"))
  }

  /** Poisson(1) multiplier-bootstrap thresholds on the 0..2³¹−2 hash
    * scale: t_k = ⌊CDF_Poisson(1)(k)·(2³¹−1)⌋ for k = 0..7, minted once
    * and shared verbatim with the oracle (truncating the weight at 8
    * drops ~1.0e-5 of the mass — documented). */
  val PoissonT: Seq[Long] = Seq(790015083L, 1580030167L, 1975037709L,
    2106706890L, 2139624185L, 2146207644L, 2147304887L, 2147461637L)

  /** Deterministic Poisson-multiplier bootstrap CI for mean(vCol):
    * replica b reweights every row by w ~ Poisson(1) drawn via
    * inverse-CDF on the Knuth multiplicative hash u = ((id·B + b) mod
    * P)·2654435761 + seed mod P (P = 2³¹−1 — the q20 seeded-sample
    * recipe, so both engines draw the SAME weights), replica means are
    * exact integer half-up divides at 6 dp, and the CI is the
    * percentile-bootstrap pair of order statistics at ranks
    * (R·25) div 1000 + 1 and R − (R·25) div 1000 of the R kept
    * replicas ordered by (mean, b) — every choice an integer rule, so
    * the interval is bit-identical cross-engine. A replica whose
    * weights all drew 0 is dropped (probability e^{−n·B-ish} — never
    * observed; ranks are defined over kept replicas so the rule stays
    * total). One corpus scan exploded ×B with per-replica map-side
    * partial aggregation — B·|corpus| work, B-row shuffle. */
  def poissonBootstrapMean(df: DataFrame, idCol: String, vCol: String,
      b: Int = 50, seed: Long = 77L): DataFrame = {
    require(b >= 4, s"need at least 4 replicas, got $b")
    val P = 2147483647L
    val mult = 2654435761L
    val u = (((col(idCol).cast("long") * b + col("rep")) % P) * mult +
      seed) % P
    val wExpr = PoissonT.zipWithIndex.foldRight(lit(8L): Column) {
      case ((t, k), e) => when(col("u") < t, k.toLong).otherwise(e)
    }
    val reps = df
      .select(col(idCol), col(vCol).cast("long").as("x"),
        explode(sequence(lit(0L), lit(b - 1L))).as("rep"))
      .withColumn("u", u)
      .withColumn("w", wExpr)
    val means = reps.groupBy("rep")
      .agg(sum(col("w") * col("x")).cast(I).as("num"),
        sum("w").cast(I).as("den"))
      .filter(col("den") > 0)
      .select(col("rep"),
        ExactRound.roundRatio(col("num"), col("den"), 6)
          .cast("double").as("mean_b"))
    val ranked = means
      // unpartitioned window over the b-row replicate table only
      // (b is the fixed bootstrap replica count, corpus-independent)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("mean_b"), col("rep"))))
      .withColumn("rr", count(lit(1)).over(
        Window.partitionBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    val ci = ranked
      .withColumn("lo_r", expr("(rr * 25) div 1000 + 1"))
      .withColumn("hi_r", expr("rr - (rr * 25) div 1000"))
      .agg(
        first(col("rr")).cast("long").as("b_replicas"),
        min(when(col("rn") === col("lo_r"), col("mean_b"))).as("ci_lo"),
        min(when(col("rn") === col("hi_r"), col("mean_b"))).as("ci_hi"))
    val point = df.agg(count(lit(1)).cast(I).as("n"),
      sum(col(vCol).cast("long")).cast(I).as("sx"))
      .select(col("n").cast("long").as("n"),
        ExactRound.roundRatio(col("sx"), col("n"), 6)
          .cast("double").as("point_mean"))
    point.crossJoin(broadcast(ci))
      .select(col("n"), col("b_replicas"), col("point_mean"),
        col("ci_lo"), col("ci_hi"))
  }

  /** Benjamini–Hochberg z² thresholds for m = 20 two-sided tests at
    * FDR q = 0.05: t_i = Φ⁻¹(1 − 0.025·i∕20)²·10⁶ for rank i = 1..20,
    * minted once and shared verbatim with the oracle (t_20 = 3841459 ≈
    * the single-test 1.96² value — the step-up ladder relaxes toward
    * it). */
  val BhT20: Seq[Long] = Seq(9140593L, 7879439L, 7149139L, 6634897L,
    6238533L, 5916468L, 5645523L, 5411894L, 5206700L, 5023886L,
    4859143L, 4709292L, 4571926L, 4445175L, 4327558L, 4217885L,
    4115180L, 4018640L, 3927589L, 3841459L)

  /** FDR-controlled multiple drift testing: one Mann–Whitney per
    * `repCol` group (side 0 vs side 1, as [[mannWhitneyBy]]) with the
    * Benjamini–Hochberg step-up applied across groups. Per group the
    * tie-corrected z² = dev²·3·n(n−1)∕(n₁n₂·G) lands on the 10⁻⁶ grid
    * via the half-up integer divide (a fully-tied group gets z² = 0 —
    * no evidence, no division hazard), groups rank by (z² desc, rep),
    * rank i compares against thresholds(i−1), and the step-up closure
    * rejects EVERY rank ≤ the largest crossing rank — a group below
    * its own threshold is still rejected when a weaker-ranked group
    * crosses (the defining BH property, pinned in spec). Ranks beyond
    * the threshold ladder are never crossing ranks but remain
    * rejectable by closure. The whole controller is grid math on
    * |groups| rows. */
  def bhDrift(df: DataFrame, repCol: String, sideCol: String,
      vCol: String, thresholds: Seq[Long] = BhT20): DataFrame = {
    // sf100-safe magnitude ladder (round 16; found by StatsScaleProbe):
    // the one-shot z6 numerator dev²·3n(n−1)·10⁶ reaches 41 digits at
    // sf100 (probe measured 6.3e40) — over DECIMAL(38,0) AND the
    // oracle's HUGEINT alike. The [[withZ6]] e5 ladder (shared with
    // the mannWhitneyBy single-test verdict since round 17) keeps
    // every intermediate ≤ ~9·10³⁵ at sf100 with headroom to ~sf300,
    // and its floor-divide recipe is minted verbatim in the oracle,
    // so the ≤ 10⁻⁴-relative coarsening cannot flip a verdict
    // cross-engine; a fully-tied group still reads exactly 0.
    val z = withZ6(mwCore(df, repCol, sideCol, vCol))
    // unpartitioned window over the per-TEST verdict table only (one
    // row per replicate/test group — experiment-grid bounded)
    val ranked = z.withColumn("rank",
      row_number().over(Window.orderBy(col("z6").desc, col("rep"))))
    val sess = df.sparkSession
    import sess.implicits._
    val tDf = thresholds.zipWithIndex
      .map { case (t, i) => ((i + 1).toLong, t) }
      .toDF("rank_i", "ti")
    val withT = ranked.join(broadcast(tDf),
      col("rank") === col("rank_i"), "left")
    val imax = withT.agg(coalesce(max(when(col("z6") >= col("ti"),
      col("rank"))), lit(0L)).as("im"))
    withT.crossJoin(broadcast(imax))
      .select(
        col("rep"),
        col("n1").cast("long").as("n1"),
        col("n2").cast("long").as("n2"),
        (col("z6").cast("double") / lit(1000000.0)).as("z2"),
        col("rank").cast("long").as("rank"),
        (col("rank") <= col("im")).as("rejected"))
  }

  /** Delete-a-group jackknife for the ratio θ = Σpos∕Σn over per-group
    * partials (grp, n > 0, pos): per group the leave-one-out ratio
    * θ₋ₛ = (K−kₛ)∕(N−nₛ), the pseudo-value G·θ̂ − (G−1)·θ₋ₛ, and the
    * jackknife SE √((G−1)∕G · Σ(θ₋ₛ−θ̄)²) — the standard production
    * recipe for the SE of a NONLINEAR (ratio) corpus metric, priced as
    * one |groups|-row aggregate + grid math (the corpus never replays;
    * callers aggregate partials first). Everything lives on the 10⁻⁶
    * integer grid: LOO ratios are half-up divides, deviations are
    * G·a_s − Σa integers, and se² is a single half-up divide at scale
    * 12 whose unscaled value stays < 2⁵³ (the decimal→double boundary)
    * before the one terminal sqrt — bit-identical cross-engine.
    * Requires ≥ 2 groups, each with n > 0. */
  def jackknifeRatio(grouped: DataFrame, grpCol: String, nCol: String,
      posCol: String): DataFrame = {
    val base = grouped.select(col(grpCol).as("grp"),
      col(nCol).cast(I).as("n"), col(posCol).cast(I).as("pos"))
    val tot = base.agg(sum("n").as("nn"), sum("pos").as("kk"),
      count(lit(1)).cast(I).as("gg"))
    val loo = base.crossJoin(broadcast(tot))
      .withColumn("loo6", ExactRound.floorDiv(
        lit(2).cast(I) * (col("kk") - col("pos")) * lit(1000000L).cast(I) +
          (col("nn") - col("n")),
        lit(2).cast(I) * (col("nn") - col("n"))))
      .withColumn("a6", ExactRound.floorDiv(
        lit(2).cast(I) * col("kk") * lit(1000000L).cast(I) + col("nn"),
        lit(2).cast(I) * col("nn")))
    val sums = loo.agg(sum("loo6").as("ss"),
      first(col("gg")).as("g2"), count(lit(1)).cast(I).as("gcnt"))
    val dev = loo.crossJoin(broadcast(sums))
      .withColumn("dev", col("gg") * col("loo6") - col("ss"))
    val se = dev.agg(
      sum(col("dev") * col("dev")).as("sd2"),
      first(col("gg")).as("g3"))
      .select(sqrt(ExactRound.roundRatio(
        (col("g3") - 1) * col("sd2"),
        col("g3") * col("g3") * col("g3") * lit(1000000000000L).cast(I), 12)
        .cast("double")).as("jk_se"))
    dev.crossJoin(broadcast(se))
      .select(col("grp"),
        col("n").cast("long").as("n_docs"),
        col("pos").cast("long").as("n_keep"),
        (col("loo6").cast("double") / lit(1000000.0)).as("loo_rate"),
        ((col("gg") * col("a6") - (col("gg") - 1) * col("loo6"))
          .cast("double") / lit(1000000.0)).as("pseudo_value"),
        col("jk_se"))
  }

  /** Empirical-Bayes beta-binomial shrinkage of per-group rates
    * (Robbins/Morris via method-of-moments): from per-group partials
    * (grp, n > 0, pos) fit the beta prior on the 10⁻⁶ grid — with
    * S = Σraw₆, D = G·10⁶, Sd2 = Σ(G·raw₆−S)², the prior strength
    * M = m(1−m)∕v − 1 reduces to the single rational
    * (S(D−S)(G−1) − Sd2)∕Sd2, minted half-up at 6 dp and CAPPED at
    * 10¹⁵ on the grid (v → 0 sends M → ∞; the cap keeps every
    * downstream product and double conversion inside 2⁵³ and reads
    * "prior stronger than any finite group — full pooling"); then
    * α₆ = half-up(S·M₆∕D), β₆ = M₆ − α₆ (so α+β = M exactly on the
    * grid), and shrunk = (pos·10⁶ + α₆)∕(n·10⁶ + M₆) per group. An
    * UNDER-dispersed family (observed variance ≥ the binomial-free
    * bound, numerator ≤ 0) or a zero-variance family takes the
    * documented no-shrinkage path: shrunk = raw, prior_strength = 0.
    * One |groups|-row aggregate + grid math — the corpus pays only the
    * partial-building aggregate upstream. */
  /** Disparate-impact audit of a binary gate across groups (the
    * EEOC/Uniform-Guidelines 4/5ths rule, the standard first screen for
    * a selection procedure): per group the keep rate, the impact ratio
    * vs the BEST group (exact rational k_g·n_b∕(k_b·n_g), half-up at
    * 6 dp), and the adverse flag decided by integer cross-multiplication
    * 5·k_g·n_b < 4·k_b·n_g — a group exactly AT 0.8 is NOT adverse
    * (strict <, pinned in spec). "Best" = the group of highest 6-dp
    * rate, ties to the lexically first group — the grid rounding makes
    * the reference-group choice engine-portable. Input: per-group
    * partials (grp, n > 0, pos); the audit is |groups|-row grid math.
    * The best group's own ratio is exactly 1. */
  def disparateImpact(grouped: DataFrame, grpCol: String, nCol: String,
      posCol: String): DataFrame = {
    val base = grouped.select(col(grpCol).as("grp"),
      col(nCol).cast(I).as("n"), col(posCol).cast(I).as("pos"))
      .withColumn("raw6", ExactRound.floorDiv(
        lit(2).cast(I) * col("pos") * lit(1000000L).cast(I) + col("n"),
        lit(2).cast(I) * col("n")))
    val best = base
      // unpartitioned window over the per-GROUP aggregate only
      // (|groups|-bounded — never raw-row-sized)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("raw6").desc, col("grp"))))
      .filter(col("rk") === 1)
      .select(col("grp").as("best_grp"), col("n").as("bn"),
        col("pos").as("bk"))
    base.crossJoin(broadcast(best))
      .select(col("grp"),
        col("n").cast("long").as("n_docs"),
        col("pos").cast("long").as("n_keep"),
        (col("raw6").cast("double") / lit(1000000.0)).as("keep_rate"),
        // a best group with zero keeps means EVERY group has zero keeps
        // (rates all 0): define ratio 1, nothing adverse — no division
        when(col("bk") === 0, lit(1.0)).otherwise(
          ExactRound.roundRatio(col("pos") * col("bn"),
            col("bk") * col("n"), 6).cast("double")).as("impact_ratio"),
        (lit(5).cast(I) * col("pos") * col("bn") <
          lit(4).cast(I) * col("bk") * col("n")).as("adverse"),
        col("best_grp"))
  }

  def ebShrinkRates(grouped: DataFrame, grpCol: String, nCol: String,
      posCol: String): DataFrame = {
    val two = lit(2).cast(I)
    val mil = lit(1000000L).cast(I)
    val base = grouped.select(col(grpCol).as("grp"),
      col(nCol).cast(I).as("n"), col(posCol).cast(I).as("pos"))
      .withColumn("raw6", ExactRound.floorDiv(
        two * col("pos") * mil + col("n"), two * col("n")))
    val sums = base.agg(sum("raw6").as("ss"),
      count(lit(1)).cast(I).as("gg"))
    val withDev = base.crossJoin(broadcast(sums))
      .withColumn("dev", col("gg") * col("raw6") - col("ss"))
    val prior = withDev.agg(
      sum(col("dev") * col("dev")).as("sd2"),
      first(col("ss")).as("s2"), first(col("gg")).as("g2"))
      .withColumn("d", col("g2") * mil)
      .withColumn("mnum",
        col("s2") * (col("d") - col("s2")) * (col("g2") - 1) - col("sd2"))
      .withColumn("m6",
        when(col("sd2") > 0 && col("mnum") > 0,
          least(
            (ExactRound.roundRatio(col("mnum"), col("sd2"), 6) * mil).cast(I),
            lit(1000000000000000L).cast(I)))
          .otherwise(lit(0).cast(I)))
      .withColumn("alpha6", when(col("m6") > 0, ExactRound.floorDiv(
        two * col("s2") * col("m6") + col("d"),
        two * col("d"))).otherwise(lit(0).cast(I)))
      .select(col("m6"), col("alpha6"))
    base.crossJoin(broadcast(prior))
      .select(col("grp"),
        col("n").cast("long").as("n_docs"),
        col("pos").cast("long").as("n_keep"),
        (col("raw6").cast("double") / lit(1000000.0)).as("raw_rate"),
        when(col("m6") > 0,
          ExactRound.roundRatio(col("pos") * mil + col("alpha6"),
            col("n") * mil + col("m6"), 6).cast("double"))
          .otherwise(col("raw6").cast("double") / lit(1000000.0))
          .as("shrunk_rate"),
        (col("m6").cast("double") / lit(1000000.0)).as("prior_strength"))
  }
}
