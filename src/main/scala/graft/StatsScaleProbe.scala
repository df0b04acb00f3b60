package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale overflow probe for the stats arm's DECIMAL(38,0) claims
  * (`runMain graft.StatsScaleProbe [factor]`, default 1000 = sf0.1 →
  * sf100): `ops/Stats.mannWhitney` and `bhDrift` claim their e5
  * effect-size ladder keeps every verdict intermediate inside
  * DECIMAL(38,0) to ~sf300 (the round-16 div-reduction crossed 38
  * digits at ~sf130 — measured by this probe, fixed in rounds 16/17),
  * and q258/q260/q262/q263 (the Mann–Whitney / median-CI / A-A / BH-FDR
  * rows over `documents`) inherit that claim. This main tests it.
  *
  * The fixture is SUPPORT-BOUNDED: the sf0.1 `documents` rows
  * replicated `factor`× via an exploded literal sequence — counts (the
  * overflow driver: every 38-digit-risk product is a polynomial in n,
  * n₁, n₂, G) reach genuine sf100 magnitude while the value support
  * (523 distinct n_chars at sf0.1) stays fixed, exactly the shape a
  * real 100 TB corpus has (support grows far slower than rows) and the
  * only shape that fits one box. No text/embedding columns are
  * minted — these three kernels read (source, lang, n_chars) only.
  *
  * Overflow detection is not left to luck: the probe flips
  * `spark.sql.ansi.enabled=true`, under which a Decimal overflow THROWS
  * instead of silently returning NULL — a pass here means no
  * intermediate left 38 digits anywhere in the three kernels.
  *
  * The probe also checks exact REPLICATION INVARIANTS, so it verifies
  * values, not just absence-of-crash: uniform k× replication multiplies
  * every per-value count by k, hence for Mann–Whitney n₁,n₂ scale by k
  * and 2U by exactly k² (U = Σc₁·(2F₂−c₂) is bilinear in the counts),
  * so `auc` = U∕(n₁n₂) — an integer half-up divide at 6 dp on both
  * engines — must be BIT-IDENTICAL to the sf0.1 run; the median (an
  * order statistic at a quantile fixed under replication) must also be
  * identical, while its CI tightens (rank window √k narrower — checked
  * for containment); BH-FDR per-source n₁,n₂ scale by k and the
  * rejection set is expected to grow with power (warned if an sf0.1
  * rejection disappears — integer floors can re-order near-tied z6
  * neighbours, so that one is not an exact law).
  */
object StatsScaleProbe {
  private def replicate(docs: DataFrame, factor: Int): DataFrame =
    docs.select(col("source"), col("lang"), col("n_chars"))
      .withColumn("_r", explode(sequence(lit(0), lit(factor - 1))))
      .drop("_r")

  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 1000
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.ansi.enabled", "true")

    val base = Tables.documents(spark, src)
    val big = replicate(base, factor)
    println(s"[probe] rows: base=${base.count()}, replicated=${big.count()} (${factor}x)")

    // Each kernel carries a CLAIMED factor range (the scaladoc's sfN
    // over this fixture's ~50k-rows-per-sf shape). Inside the range an
    // ANSI overflow FAILS the probe; beyond it, an overflow is reported
    // as the kernel's measured boundary (factor 3000 measured the MW
    // verdict product 38416·n₁n₂·G at 7.1e39 — past its sf100 claim,
    // exactly where the closed-form bound says it crosses, k ≈ 1300).
    var failed = false
    // ANSI-mode decimal failures surface under several error classes
    // (NUMERIC_VALUE_OUT_OF_RANGE from Decimal arithmetic, CAST_OVERFLOW
    // / NUMERIC_OUT_OF_SUPPORTED_RANGE from casts, ARITHMETIC_OVERFLOW,
    // DECIMAL_PRECISION_EXCEEDS_MAX_PRECISION from type negotiation) or
    // as a bare ArithmeticException from Decimal ops — match the error
    // CLASS, not one message substring, so an overflow can never escape
    // `ranged` unclassified (round-17 advice).
    def overflowClass(ec: String): Boolean = ec != null && (
      ec.startsWith("NUMERIC_VALUE_OUT_OF_RANGE") ||
        ec.startsWith("NUMERIC_OUT_OF_SUPPORTED_RANGE") ||
        ec.startsWith("CAST_OVERFLOW") ||
        ec.startsWith("ARITHMETIC_OVERFLOW") ||
        ec.startsWith("DECIMAL_PRECISION_EXCEEDS_MAX_PRECISION"))
    def isDecimalOverflow(e: Throwable): Boolean = e != null && (
      (e match {
        case st: org.apache.spark.SparkThrowable => overflowClass(st.getCondition)
        case _: ArithmeticException => true
        case _ => false
      }) || isDecimalOverflow(e.getCause))
    def ranged(label: String, claimedFactor: Int)(body: => Unit): Unit =
      try body catch {
        case e: Throwable if isDecimalOverflow(e) && factor > claimedFactor =>
          println(s"[probe] $label: measured 38-digit boundary BEYOND its " +
            s"claimed factor $claimedFactor (probe factor $factor): " +
            e.getMessage.linesIterator.next())
        case e: Throwable if isDecimalOverflow(e) =>
          failed = true
          println(s"[probe] FAIL $label: overflow INSIDE claimed factor " +
            s"$claimedFactor: ${e.getMessage.linesIterator.next()}")
      }

    // ---- q258 shape: two-sample Mann–Whitney, en vs rest ----
    // claimed to ~sf300 (factor 3000) since round 17: the verdict runs
    // on the bhDrift e5 ladder (the round-16 reduction's product
    // 38416·n₁n₂·G ≈ 38416·0.24·n⁵ crossed 10³⁸ at n ≈ 6.4e6 rows,
    // k ≈ 1300 here — measured by this probe at factor 3000, which is
    // what motivated the extension). The en-vs-rest split's n₁n₂ can
    // reach n²∕4 (vs the per-source arm's ~n²∕20), so the worst-case
    // ladder peak sits ~5× higher than bhDrift's — the claimed factor
    // is the same 3000 because the ACTUAL e5 on this fixture is far
    // below its 10⁵ ceiling; a probe run at the boundary reports the
    // measured crossing rather than failing (see `ranged`).
    def mw(df: DataFrame) = ops.Stats.mannWhitney(
      df.filter(col("lang") === "en"), df.filter(col("lang") =!= "en"),
      "n_chars").head()
    ranged("mannWhitney", 3000) {
      val mwS = mw(base.select(col("source"), col("lang"), col("n_chars")))
      val mwB = time(s"mannWhitney x$factor")(mw(big))
      println(s"[probe] mw base=$mwS")
      println(s"[probe] mw big =$mwB")
      require(mwB.getLong(0) == mwS.getLong(0) * factor &&
        mwB.getLong(1) == mwS.getLong(1) * factor,
        s"n1/n2 did not scale ${factor}x")
      // u is emitted as an exact double (2U < 2^53 is part of the claim)
      require(mwB.getDouble(2) == mwS.getDouble(2) * factor.toDouble * factor,
        s"U did not scale ${factor}^2x: ${mwS.getDouble(2)} -> ${mwB.getDouble(2)}")
      require(mwB.getDouble(3) == mwS.getDouble(3),
        s"auc not replication-invariant: ${mwS.getDouble(3)} -> ${mwB.getDouble(3)}")
    }

    // ---- q260 shape: order-statistic median CI ----
    // claimed to sf100; its largest product 38416·n crosses 10³⁸ only
    // near n ≈ 2.6e33 — effectively unbounded
    ranged("medianCI", 1000) {
      val ciS = ops.Stats.medianCI(base, "n_chars").head()
      val ciB = time(s"medianCI x$factor")(ops.Stats.medianCI(big, "n_chars").head())
      println(s"[probe] ci base=$ciS")
      println(s"[probe] ci big =$ciB")
      require(ciB.getLong(0) == ciS.getLong(0) * factor, "n did not scale")
      require(ciB.getDouble(1) == ciS.getDouble(1),
        s"median moved under replication: ${ciS.getDouble(1)} -> ${ciB.getDouble(1)}")
      require(ciB.getLong(2) >= ciS.getLong(2) && ciB.getLong(3) <= ciS.getLong(3),
        s"replicated CI [${ciB.getLong(2)}, ${ciB.getLong(3)}] not inside " +
          s"base CI [${ciS.getLong(2)}, ${ciS.getLong(3)}]")
    }

    // ---- q263 shape: per-source BH-FDR drift battery ----
    def bh(df: DataFrame): Map[String, (Long, Long, Boolean)] = {
      val srcs = df.select(col("source").as("rep")).distinct()
      val d = df.crossJoin(broadcast(srcs))
        .select(col("rep"),
          when(col("source") === col("rep"), 0).otherwise(1).as("side"),
          col("n_chars").as("v"))
      ops.Stats.bhDrift(d, "rep", "side", "v").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(5))))
        .toMap
    }
    // claimed to ~sf300 (factor 3000): the e5-ladder peak
    // e5²·3n(n−1)·n₁n₂ reads 7.2·10³⁷ at k = 3000 on this fixture
    ranged("bhDrift", 3000) {
      val bhS = bh(base.select(col("source"), col("lang"), col("n_chars")))
      val bhB = time(s"bhDrift x$factor")(bh(big))
      require(bhS.keySet == bhB.keySet, "source sets differ")
      bhS.foreach { case (s, (n1, n2, rej)) =>
        val (bn1, bn2, brej) = bhB(s)
        require(bn1 == n1 * factor && bn2 == n2 * factor, s"$s: n did not scale")
        // power-monotonicity is expected but not exact law (integer
        // floors can re-order near-tied z6 neighbours) — warn, don't fail
        if (rej && !brej)
          println(s"[probe] WARN $s: rejected at base but not replicated")
      }
      println(s"[probe] bh rejections: base=${bhS.count(_._2._3)}/${bhS.size}, " +
        s"x$factor=${bhB.count(_._2._3)}/${bhB.size}")
    }
    require(!failed, "a kernel overflowed INSIDE its claimed range")
    println(s"[probe] PASS at factor $factor: no overflow inside any claimed " +
      s"range; replication invariants hold where kernels ran")
    spark.stop()
  }
}
