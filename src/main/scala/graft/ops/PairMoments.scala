package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The covariance arm's shared first pass (q243 / q248 / q273): per
  * upper-triangle pair position of a d=64 embedding, the row count and
  * the exact DECIMAL(38,0) sum of the scale-10¹⁰ integer products the
  * compiled `graft_pair_products` kernel emits — ONE compiled pass per
  * row, partially aggregated map-side into the fixed 2,016-key grid
  * (never a self-join, never a corpus shuffle on the pair key).
  *
  * Extracted so the kernel's presence is pinned ONCE in PlansSpec: the
  * interpreted fallback this kernel replaced (nested transform lambdas
  * building 2,016 structs per row) made the q243 query END-TO-END 3.4×
  * slower at sf1 (24.0 → 6.99 s, bench/README.md round 14) — the
  * expression-level gap alone is ~8× (the figure in the PairProducts
  * scaladoc, functions/expressions.scala; end-to-end dilutes it with
  * scan + partial-aggregate cost the kernel swap doesn't touch) — and
  * before this extraction nothing stopped a refactor of any one call
  * site from silently reverting to it.
  */
object PairMoments {
  private val I = DecimalType(38, 0)

  /** (pos INT, n LONG, s DECIMAL(38,0)) — pos is the row-major
    * upper-triangle pair index of the fixed d=64 grid; callers join a
    * broadcast pos→(i,j) map or cast pos as their state key demands. */
  def pass(df: DataFrame, embCol: String): DataFrame =
    df.select(posexplode(call_function("graft_pair_products", col(embCol))))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"), sum(col("col").cast(I)).as("s"))
}
