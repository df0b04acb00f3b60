package graft.ops

import graft.functions.ExactRound
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The q238–q240 decision kernels as first-class operators: mixture
  * water-filling feasibility, Cohen's κ gate agreement, and the exact
  * two-sample Kolmogorov–Smirnov drift test. Extracted from the query
  * bodies so their edge semantics (zero-weight sources, degenerate
  * single-class gates, a tie exactly at the KS rejection boundary) are
  * pinned by specs, not only by the oracle's equality on corpus data.
  * All three are exact-integer kernels: DECIMAL(38,0) sums and the
  * half-away integer divide (`ExactRound.roundRatio`) at the
  * presentation boundary — a boundary case cannot flip cross-engine.
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
}
