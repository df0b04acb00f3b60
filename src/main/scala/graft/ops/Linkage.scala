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
