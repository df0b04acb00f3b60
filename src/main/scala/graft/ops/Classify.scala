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
    * The table is DENSE — exactly `buckets` rows: counts are
    * left-joined onto the full 0..buckets−1 grid before the formula,
    * so a bucket no TRAINING token ever hashed to still carries its
    * Laplace-smoothed default weight ln((Nneg+V)∕(Npos+V)) (cpos =
    * cneg = 0). That makes [[nbScore]]'s feature→weight join complete
    * for ANY scored document, including out-of-training docs whose
    * buckets never occurred in the training corpus. */
  def nbWeightsFromCounts(counts: DataFrame, buckets: Int): DataFrame = {
    val tot = counts.agg(sum("cpos").as("npos"), sum("cneg").as("nneg"))
    val grid = counts.sparkSession.range(buckets.toLong)
      .select(col("id").as("b"))
    grid.join(counts, Seq("b"), "left")
      .na.fill(0L, Seq("cpos", "cneg"))
      .crossJoin(broadcast(tot))
      .withColumn("w9", round(log(
        ((col("cpos") + lit(1.0d)) * (col("nneg") + lit(buckets.toLong))) /
        ((col("cneg") + lit(1.0d)) * (col("npos") + lit(buckets.toLong)))), 9)
        .cast(DecimalType(13, 9)))
      // an EMPTY training corpus has null totals → null weights on every
      // grid row; drop them so an untrained model is an empty table that
      // scores nothing (EmptyInputSpec), not a table of nulls that
      // scores everything to null. With ≥ 1 training row every grid
      // weight is non-null, so this filter never fires on a real model.
      .filter(col("w9").isNotNull)
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
    * downstream eval, not the training prior). The join is an inner
    * equi-join but LOSES nothing: [[nbWeightsFromCounts]] weight
    * tables are dense over the full bucket grid, so every feature row
    * of every document — in or out of the training corpus — finds its
    * weight (unseen-in-training buckets contribute the smoothed
    * default, and n_tokens counts every token). */
  def nbScore(feats: DataFrame, weights: DataFrame, idCol: String,
      carry: Seq[String] = Nil): DataFrame =
    feats.join(broadcast(weights), "b")
      .groupBy(col(idCol) +: carry.map(col): _*)
      .agg(sum("n").as("n_tokens"),
        sum(col("n").cast(DecimalType(10, 0)) * col("w9")).as("score"))
      .withColumn("keep_cls", col("score") > 0)

  /** K-class sufficient statistics: per-(bucket, class) token counts
    * from labeled features — the multi-class twin of [[classCounts]],
    * same abelian property (counts from independent corpus parts or
    * arriving batches fold by plain addition). `labelCol` rides on the
    * feature frame (a `carry` of [[hashedTokenFeatures]]). */
  def classCountsK(feats: DataFrame, labelCol: String): DataFrame =
    feats.groupBy(col("b"), col(labelCol).as("cls"))
      .agg(sum("n").as("c"))

  /** Dense per-class weight table from k-class counts: for EVERY
    * (bucket, class) cell of the |classes|×`buckets` grid, w9 =
    * round(ln((c + 1) ∕ (N_cls + V)), 9) — Laplace-smoothed
    * multinomial NB log-likelihood on the shared 9-dp DECIMAL grid
    * (uniform class prior: the prior is a deployment knob exactly as
    * in [[nbScore]]'s threshold, and published LID models are priced
    * on likelihood argmax). Dense for the same reason as
    * [[nbWeightsFromCounts]]: an out-of-training doc's buckets must
    * still contribute each class's smoothed floor, or short docs lose
    * their verdicts. The table is |classes|·`buckets` rows — broadcast
    * at any corpus size. */
  def nbWeightsK(counts: DataFrame, buckets: Int): DataFrame = {
    val classes = counts.select("cls").distinct()
    val grid = counts.sparkSession.range(buckets.toLong)
      .select(col("id").as("b")).crossJoin(classes)
    val tot = counts.groupBy("cls").agg(sum("c").as("nl"))
    grid.join(counts, Seq("b", "cls"), "left")
      .na.fill(0L, Seq("c"))
      .join(broadcast(tot), "cls")
      .withColumn("w9", round(log(
        (col("c") + lit(1.0d)) / (col("nl") + lit(buckets.toLong))), 9)
        .cast(DecimalType(13, 9)))
      .select("b", "cls", "w9")
  }

  /** Per-doc argmax-class verdict: score_cls = Σ_b n·w9 (exact DECIMAL
    * sums — partial-agg order can never move a doc across a class
    * boundary), pred = the class with the highest score, ties broken
    * to the lexicographically LARGER class label (the struct-max
    * order — deterministic, engine-replayable, no engine argmax
    * policy). Scoring = one broadcast join + two hash aggregates keyed
    * on (doc, class) then (doc) — linear, the k-class twin of
    * [[nbScore]]. */
  def nbClassify(feats: DataFrame, weights: DataFrame, idCol: String)
      : DataFrame =
    feats.join(broadcast(weights), "b")
      .groupBy(col(idCol), col("cls"))
      .agg(sum(col("n").cast(DecimalType(10, 0)) * col("w9")).as("score"))
      .groupBy(idCol)
      .agg(max(struct(col("score"), col("cls"))).as("_m"))
      .select(col(idCol), col("_m.cls").as("pred"))
}
