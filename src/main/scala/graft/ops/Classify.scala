package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Model-based quality selection: a linear text classifier over hashed
  * bag-of-token features, trained in CLOSED FORM from class counts
  * (multinomial Naive Bayes with Laplace smoothing) — the
  * quality-classifier stage of the CCNet/FineWeb recipe (Wenzek et al.
  * 2020 §3.3 train a fastText-style linear model on a curated target
  * vs the raw crawl; the FineWeb/DCLM pipelines keep the same shape:
  * score every doc against a curated positive class, keep above a
  * threshold). No MLlib dependency: multinomial NB's MLE is literally
  * two count aggregates, so "training" is one corpus pass and the
  * model is a `buckets`-row weight table.
  *
  * Determinism/exactness: token→bucket hashing rides the compiled
  * graft_token_hashes kernel (md5-derived — engine-replayable); the
  * per-bucket log-odds are minted ONCE on the 9-dp DECIMAL grid
  * (round(ln(·), 9) — the q296/q305 precedent for engine-shared
  * transcendentals: both engines evaluate the identical double
  * expression, then snap to the grid); per-doc scores are exact
  * DECIMAL sums of count × weight products, so partial-aggregation
  * order can never move a document across the keep threshold.
  *
  * Scale shape: training = one explode + two map-combined aggregates
  * onto a `buckets`-row grid (broadcast at ANY corpus size); scoring =
  * one explode + a broadcast join + one per-doc hash aggregate —
  * linear, no corpus-axis joins, and the model never exceeds
  * `buckets` rows.
  */
object Classify {

  /** Hashed bag-of-tokens features: one row per (doc, bucket) with the
    * token-occurrence count — the standing feature table of the
    * incremental-DSIR discipline (append-only; a doc's features never
    * change, so re-scoring under refreshed weights re-reads features,
    * never text). `carry` columns ride along (e.g. the label source). */
  def hashedTokenFeatures(df: DataFrame, idCol: String, textCol: String,
      buckets: Int, carry: Seq[String] = Nil): DataFrame = {
    require(buckets >= 2, s"degenerate bucket count: $buckets")
    df.withColumn("_th", call_function("graft_token_hashes", col(textCol)))
      .filter(size(col("_th")) > 0)
      .select((col(idCol) +: carry.map(col)) :+ explode(col("_th")).as("_h"): _*)
      .select((col(idCol) +: carry.map(col)) :+
        (col("_h") % buckets).as("b"): _*)
      .groupBy(col(idCol) +: carry.map(col) :+ col("b"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Per-bucket class token counts (b, cpos, cneg) — the ABELIAN
    * sufficient statistics of the NB model: counts from independent
    * corpus parts fold by plain addition, which is exactly what makes
    * the classifier maintainable under continuous ingest (L293): an
    * arriving batch contributes its own counts, the standing counts
    * never recompute. */
  def classCounts(feats: DataFrame, isPos: Column): DataFrame =
    feats.groupBy("b").agg(
      sum(when(isPos, col("n")).otherwise(0L)).as("cpos"),
      sum(when(isPos, 0L).otherwise(col("n"))).as("cneg"))

  /** The `buckets`-row weight table from (possibly folded) class
    * counts: w9(b) = round(ln(((cpos+1)·(Nneg+V)) ∕ ((cneg+1)·
    * (Npos+V))), 9) on the DECIMAL grid — Laplace-smoothed multinomial
    * NB. ONE formula implementation serves both the one-shot
    * ([[nbWeights]]) and incremental (fold [[classCounts]], then this)
    * paths, so the training closed form cannot drift between them.
    * Buckets no token ever hashes to are absent from the table — they
    * are also absent from every document, so they can never contribute
    * to a score. */
  def nbWeightsFromCounts(counts: DataFrame, buckets: Int): DataFrame = {
    val tot = counts.agg(sum("cpos").as("npos"), sum("cneg").as("nneg"))
    counts.crossJoin(broadcast(tot))
      .withColumn("w9", round(log(
        ((col("cpos") + lit(1.0d)) * (col("nneg") + lit(buckets.toLong))) /
        ((col("cneg") + lit(1.0d)) * (col("npos") + lit(buckets.toLong)))), 9)
        .cast(DecimalType(13, 9)))
      .select("b", "w9")
  }

  /** One-shot training: [[classCounts]] + [[nbWeightsFromCounts]]. */
  def nbWeights(feats: DataFrame, isPos: Column, buckets: Int): DataFrame =
    nbWeightsFromCounts(classCounts(feats, isPos), buckets)

  /** Per-doc NB verdict: score = Σ_b n·w9 (exact DECIMAL — the count
    * lane mirrors the oracle's DECIMAL(10,0) cast), keep_cls = score
    * > 0, the likelihood-ratio-1 threshold (class-prior calibration is
    * a deployment knob, deliberately not part of the closed form —
    * published quality classifiers tune the operating point against a
    * downstream eval, not the training prior). */
  def nbScore(feats: DataFrame, weights: DataFrame, idCol: String,
      carry: Seq[String] = Nil): DataFrame =
    feats.join(broadcast(weights), "b")
      .groupBy(col(idCol) +: carry.map(col): _*)
      .agg(sum("n").as("n_tokens"),
        sum(col("n").cast(DecimalType(10, 0)) * col("w9")).as("score"))
      .withColumn("keep_cls", col("score") > 0)
}
