package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked record linkage (entity resolution): find rows in two tables
  * that describe the same real-world entity despite field corruption —
  * the classic Fellegi–Sunter shape of blocking + per-field agreement
  * weights + a match threshold. The reference pipeline's DQ layer only
  * checks single-table rules; this extends the engine to the cross-table
  * identity resolution a 100 TB ingest needs (merging feeds that share
  * entities but not keys).
  *
  * Scale design: candidates come from an EQUI-JOIN on blocking keys —
  * never a cross join — so candidate count is Σ_b |A_b|·|B_b| over
  * blocks, linear when blocks are bounded. Expensive per-pair scoring
  * (edit distance) runs only on blocked candidates. The blocking key
  * must be chosen robust to the expected corruption model (here: a
  * key prefix that the corruption cannot touch); recall lost to
  * blocking is the standard precision/cost trade and is measured by
  * the spec against ground truth.
  */
object Linkage {

  /** Per-field agreement term: `weight` if `agree`, else 0. */
  private def term(agree: Column, weight: Int): Column =
    when(agree, lit(weight)).otherwise(lit(0))

  /** Score candidate pairs of `left` ⋈ `right` blocked on `blockCols`
    * (equi-join). `fields` gives (agreement predicate over the joined
    * frame, weight); a pair matches when the weighted agreement sum
    * reaches `threshold`. Returns the joined frame with an integer
    * `score` column, filtered to matches. */
  def blockAndScore(left: DataFrame, right: DataFrame,
      blockCols: Seq[String], fields: Seq[(Column, Int)],
      threshold: Int): DataFrame = {
    require(fields.nonEmpty, "at least one scored field required")
    val cand = left.join(right, blockCols)
    val score = fields.map { case (p, w) => term(p, w) }.reduce(_ + _)
    cand.withColumn("score", score.cast("int"))
      .filter(col("score") >= threshold)
  }

  /** Exact inclusion-dependency check (FK discovery): one row —
    * (n_distinct, n_missing) — for how much of `a`'s `aCol` domain is
    * contained in `b`'s `bCol`. Distinct-then-anti-join, one shuffle per
    * side on the key; at 100 TB run the KMV containment ESTIMATE first
    * (q110's machinery — one scan, mergeable state, all columns at once)
    * and exact-confirm only the plausible inclusions, the same
    * estimate-then-confirm shape as Bloom decontamination (q101). */
  /** Mutual information between two categorical columns — the SOFT
    * column-dependency profile completing q201's functional-dependency
    * discovery (an FD is the MI = H(Y) limit; a near-FD that q201 can
    * only count violations for gets a graded score here). MI drives
    * feature selection, join-order statistics (correlated columns break
    * the independence assumption cost models lean on), and redundancy
    * detection before training-data featurization.
    *
    * Estimator: the plug-in MI = Σ_xy (n_xy∕N)·ln(n_xy·N∕(n_x·n_y)) in
    * nats, with H(X), H(Y) and the normalized MI∕min(H) alongside.
    *
    * Exactness (the q65/q145 logprob recipe): every ln rounds at scale
    * 9 into DECIMAL(13,9) — both engines' libm agree through 9 dp on
    * identical double operands (each operand here is one IEEE divide
    * of exact sub-2^53 integer products) — then every Σ term is
    * count·ln9, an EXACT decimal sum; only the final ∕N presentations
    * run in double on identical operands. Scale shape: ONE corpus
    * aggregate to the |X|·|Y| cell table; marginals, entropies and the
    * MI fold all live on that bounded frame (broadcast joins). Returns
    * one row: (n, h_x, h_y, h_xy, mi_nats, nmi). */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(13, 9)
    def ln9(c: Column): Column = round(log(c), 9).cast(dec)
    val cells = df.groupBy(col(xCol).as("_x"), col(yCol).as("_y"))
      .agg(count(lit(1)).as("nxy"))
      .localCheckpoint() // |X|·|Y| rows; feeds marginals + the fold
    val nx = cells.groupBy("_x").agg(sum("nxy").as("nx"))
    val ny = cells.groupBy("_y").agg(sum("nxy").as("ny"))
    val tot = cells.agg(sum("nxy").as("n"))
    def entropy(cnt: String): Column =
      -sum(col(cnt) * ln9(col(cnt).cast("double") / col("n")))
    val hx = nx.crossJoin(broadcast(tot)).agg(entropy("nx").as("hx_s"))
    val hy = ny.crossJoin(broadcast(tot)).agg(entropy("ny").as("hy_s"))
    val joint = cells.join(broadcast(nx), "_x").join(broadcast(ny), "_y")
      .crossJoin(broadcast(tot))
    val mi = joint.agg(
      (-sum(col("nxy") * ln9(col("nxy").cast("double") / col("n"))))
        .as("hxy_s"),
      sum(col("nxy") * ln9((col("nxy") * col("n")).cast("double")
        / (col("nx") * col("ny")).cast("double"))).as("mi_s"),
      first(col("n")).as("n"))
    mi.crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
      .select(
        col("n").cast("long").as("n"),
        (col("hx_s").cast("double") / col("n")).as("h_x"),
        (col("hy_s").cast("double") / col("n")).as("h_y"),
        (col("hxy_s").cast("double") / col("n")).as("h_xy"),
        (col("mi_s").cast("double") / col("n")).as("mi_nats"),
        when(least(col("hx_s"), col("hy_s")) > 0,
          col("mi_s").cast("double")
            / least(col("hx_s"), col("hy_s")).cast("double"))
          .otherwise(lit(0.0)).as("nmi"))
  }

  def containment(a: DataFrame, aCol: String, b: DataFrame,
      bCol: String): DataFrame = {
    // Compare in the columns' NATIVE types (round-9 advice): the old
    // unconditional cast-to-long silently nulled string keys on both
    // sides and reported a bogus containment over a single NULL key.
    // Integral pairs widen to long (lossless); any other type pair must
    // match exactly or we fail loudly instead of comparing across an
    // implicit cast. NULL keys are excluded, matching SQL DISTINCT/IN
    // semantics.
    import org.apache.spark.sql.types._
    val ta = a.schema(aCol).dataType
    val tb = b.schema(bCol).dataType
    def integral(t: DataType) = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    def key(c: Column) =
      (if (integral(ta)) c.cast("long") else c).as("_k")
    require(ta == tb || (integral(ta) && integral(tb)),
      s"containment: key types must match, got $aCol: $ta vs $bCol: $tb")
    val da = a.select(key(col(aCol))).filter(col("_k").isNotNull).distinct()
    val db = b.select(key(col(bCol))).filter(col("_k").isNotNull).distinct()
    val missing = da.join(db, Seq("_k"), "left_anti")
    da.agg(count(lit(1)).as("n_distinct"))
      .crossJoin(missing.agg(count(lit(1)).as("n_missing")))
  }
}
