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

  /** Mixture water-filling under availability (q238): the largest
    * total budget T such that every source's floor share ⌊T·w∕W⌋ fits
    * inside `epochCap · avail` tokens (the bottleneck rule
    * T = min_s ⌊epochCap·avail_s·W∕w_s⌋), evaluated entirely in
    * integer floor arithmetic. Input: one row per source with a
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
    * agree perfectly. Returns one row: the 2×2 contingency counts,
    * observed agreement, κ. */
  def cohensKappa(g: DataFrame, gaCol: String, gbCol: String): DataFrame = {
    val ga = col(gaCol)
    val gb = col(gbCol)
    val c = g.agg(
      sum(ga * gb).cast(I).as("a"),
      sum(ga * (lit(1L) - gb)).cast(I).as("b"),
      sum((lit(1L) - ga) * gb).cast(I).as("c"),
      sum((lit(1L) - ga) * (lit(1L) - gb)).cast(I).as("d"),
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
      ExactRound.roundRatio(col("a") + col("d"), col("n"), 6)
        .cast("double").as("observed_agreement"),
      when(col("den") === 0, lit(1.0)).otherwise(
        when(col("po") - col("pe") >= 0,
          ExactRound.roundRatio(col("po") - col("pe"), col("den"), 6))
          .otherwise(-ExactRound.roundRatio(col("pe") - col("po"),
            col("den"), 6))
          .cast("double")).as("kappa"))
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
    * in integer space: |2U − n₁n₂|²·30000 > (38416·n₁n₂·G) div
    * (n(n−1)) with G = n(n−1)(n+1) − Σ(t³−t) the tie-corrected
    * variance numerator and 38416 = 1.96²·10⁴ the squared 3-dp table
    * value minted once (the `L·C > A·B ⇔ L > A·B div C` reduction for
    * integer L keeps every product inside DECIMAL(38,0) to sf100 —
    * the naive cross-multiplication overflows 38 digits at sf10).
    * A degenerate group (all values tied) has G = 0 and dev = 0 —
    * no drift, no division hazard; a group missing either side is
    * dropped (a one-sample group has no two-sample verdict). A tie
    * exactly AT the boundary is NOT drift (strict `>`). Returns per
    * rep: n1, n2, u (A's U as DOUBLE — exact, 2U < 2⁵³), auc =
    * U∕(n₁n₂) at 6 dp (the probability-of-superiority effect size),
    * drift_detected. One sort-free pass: per-(rep, distinct value)
    * counts + a rep-partitioned cumulative window. */
  def mannWhitneyBy(df: DataFrame, repCol: String, sideCol: String,
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
    val v = agg.filter(col("n1") > 0 && col("n2") > 0)
      .withColumn("n", col("n1") + col("n2"))
      .withColumn("dev", abs(col("u2") - col("n1") * col("n2")))
      .withColumn("g",
        col("n") * (col("n") - 1) * (col("n") + 1) - col("ties"))
      .withColumn("r", ExactRound.floorDiv(
        lit(38416L).cast(I) * col("n1") * col("n2") * col("g"),
        col("n") * (col("n") - 1)))
    v.select(
      col("rep"),
      col("n1").cast("long").as("n1"),
      col("n2").cast("long").as("n2"),
      (col("u2").cast("double") / lit(2.0)).as("u"),
      ExactRound.roundRatio(col("u2"), lit(2).cast(I) * col("n1") * col("n2"), 6)
        .cast("double").as("auc"),
      (col("dev") * col("dev") * lit(30000L).cast(I) > col("r"))
        .as("drift_detected"))
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
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = binned
      .select(col(binCol).cast("long").as("bin"), col(nCol).cast(I).as("n"),
        col(posCol).cast(I).as("pos"))
      .withColumn("cn", sum("n").over(w))
      .withColumn("cp", sum("pos").over(w))
      .localCheckpoint() // k rows; three self-joins below read it
    val j = pre.select(col("bin").as("jb"), col("n").as("jn"),
      col("pos").as("jp"), col("cn").as("jcn"), col("cp").as("jcp"))
    val l = pre.select(col("bin").as("lb"), col("cn").as("lcn"),
      col("cp").as("lcp"))
    val iv = j.join(l, col("jb") <= col("lb"))
      .select(col("jb"), col("lb"),
        (col("lcp") - col("jcp") + col("jp")).as("p"),
        (col("lcn") - col("jcn") + col("jn")).as("nn"))
    val mi = pre.select(col("bin"))
      .join(iv, col("jb") <= col("bin") && col("lb") >= col("bin"))
      .groupBy("bin", "jb")
      .agg(min(col("p").cast("double") / col("nn").cast("double")).as("m"))
    val iso = mi.groupBy("bin").agg(max("m").as("iso_rate"))
    pre.join(iso, Seq("bin"))
      .select(col("bin"),
        col("n").cast("long").as("n_docs"),
        col("pos").cast("long").as("n_keep"),
        ExactRound.roundRatio(col("pos"), col("n"), 6)
          .cast("double").as("raw_rate"),
        col("iso_rate"))
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
}
