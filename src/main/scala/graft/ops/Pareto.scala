package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto-frontier) operators — Börzsönyi 2001. The
  * multi-criteria selection primitive scalarized rankers cannot
  * express: a weighted score commits to one trade-off, the skyline
  * returns every undominated one.
  *
  * Dominance here is the 2-D minimize-x / maximize-y frame: `a`
  * dominates `b` iff xₐ ≤ x_b ∧ yₐ ≥ y_b with at least one strict.
  * Exact duplicates are mutually undominated and BOTH survive —
  * matching the declarative NOT-EXISTS definition the oracles run.
  *
  * Scale design: dominance is transitive, so
  * `skyline(S) = skyline(∪ᵢ skyline(Sᵢ))` for any partitioning of S —
  * the algebraic property that makes the operator both
  * distribution-friendly (per-group prune, then a global pass over
  * the bounded survivor union; the corpus is never globally sorted)
  * and INCREMENTALLY maintainable (fold a new batch into a standing
  * frontier without re-reading history; [[fold]]).
  */
object Pareto {

  /** One skyline pass: per `part` group (whole frame when empty), keep
    * rows no other row in the group dominates.
    *
    * Integral x rides two windows on the group key: the running max of
    * y over strictly-smaller x via `rangeBetween(unboundedPreceding,
    * -1)` (the unit offset equals "strictly smaller" exactly because x
    * is integral), and the max y among equal x. Fractional x
    * (Double/Float/Decimal) cannot use a unit-offset range frame — x'
    * in (x-1, x) would escape it and dominated points would survive —
    * so it takes the type-safe path: max(y) per DISTINCT x, the lag of
    * the running max over x order gives the best y among strictly
    * smaller x, joined back on the group+x key (co-partitioned with
    * the aggregate's own shuffle). Same frontier, either path.
    *
    * NULL handling: a row with NULL x is not rankable and is DROPPED
    * up front in both paths (without the explicit filter the integral
    * path would silently poison the whole frontier: NULLs sort first,
    * so the null group leaks into every non-null row's
    * strictly-smaller range frame as a spurious dominator). A NULL
    * PARTITION key is a legitimate group and is kept: the integral
    * windows group NULLs together, and the fractional path's
    * join-back is null-safe (`<=>`) to match. */
  def skyline2d(input: DataFrame, xCol: String, yCol: String,
      part: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.types._
    val df = input.filter(col(xCol).isNotNull)
    val integralX = df.schema(xCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    // Unpartitioned-window contract: the windows below run single-
    // partition ONLY when `part` is empty — at corpus scale callers
    // pass partition keys (the skyline is then per-group); the
    // part-empty consumers (q222's incremental state) feed ≤grid-sized
    // frontier tables, never the raw corpus.
    if (integralX) {
      val lt = (if (part.isEmpty) Window.orderBy(col(xCol))
        else Window.partitionBy(part.map(col): _*).orderBy(col(xCol)))
        .rangeBetween(Window.unboundedPreceding, -1)
      val eq = Window.partitionBy((part :+ xCol).map(col): _*)
      df.withColumn("_best_smaller", max(yCol).over(lt))
        .withColumn("_best_equal", max(yCol).over(eq))
        .filter((col("_best_smaller").isNull ||
            col("_best_smaller") < col(yCol)) &&
          col("_best_equal") === col(yCol))
        .drop("_best_smaller", "_best_equal")
    } else {
      val grp = part :+ xCol
      val ord = (if (part.isEmpty) Window.orderBy(col(xCol))
        else Window.partitionBy(part.map(col): _*).orderBy(col(xCol)))
        .rowsBetween(Window.unboundedPreceding, -1)
      val best = grp.foldLeft(
        df.groupBy(grp.map(col): _*)
          .agg(max(yCol).as("_best_equal"))
          .withColumn("_best_smaller", max(col("_best_equal")).over(ord)))(
        (d, c) => d.withColumnRenamed(c, "_grp_" + c))
      // null-safe equi-join: a NULL x (or NULL partition key) matches
      // its own aggregate group instead of being dropped, keeping the
      // two dispatch paths' NULL handling identical
      df.join(best, grp.map(c => col(c) <=> col("_grp_" + c))
          .reduce(_ && _))
        .filter((col("_best_smaller").isNull ||
            col("_best_smaller") < col(yCol)) &&
          col("_best_equal") === col(yCol))
        .select(df.columns.map(col): _*)
    }
  }

  /** Distributed skyline: per-group prune (any grouping works —
    * correctness does not depend on it, only the prune ratio does),
    * then the global pass over the bounded survivor union. */
  def skyline(df: DataFrame, xCol: String, yCol: String,
      pruneBy: Seq[String]): DataFrame =
    skyline2d(skyline2d(df, xCol, yCol, pruneBy).drop(pruneBy: _*),
      xCol, yCol)

  /** Incremental maintenance: fold a new batch into a standing
    * frontier. By transitivity `skyline(standing ∪ batch)` equals the
    * skyline of the full history — per-fold cost is |frontier| +
    * |batch|, never the corpus (the q119/q158 incremental-fold shape,
    * applied to a VIEW rather than a labeling). Columns of `standing`
    * and `batch` must agree on (xCol, yCol) plus any carried id. */
  def fold(standing: DataFrame, batch: DataFrame, xCol: String,
      yCol: String): DataFrame =
    skyline2d(standing.unionByName(batch), xCol, yCol)
}
