package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY.md §2.5 W1/W2). */
object Windows {

  /** Latest row per key (reference: tests/delta_reader_spark.py:58-66 —
    * `row_number() over (partition by key order by ord desc)` then rn=1).
    * `tieBreak` keeps the result deterministic when `ord` has duplicates.
    *
    * Scale: one shuffle on `key`; at 100 TB prefer this over
    * `groupBy(key).agg(max_by(...))` only when the full row is needed —
    * both are a single exchange, row_number avoids a second join back.
    */
  def latestPerKey(df: DataFrame, key: String, ord: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ord).desc, col(tieBreak).desc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Before/after version pairing per key (reference:
    * jobs/bronze/bronze_reader.py:105-122 — pandas loop ordering each
    * changed key's versions by `updated_at` and taking first/last; here a
    * single-shuffle window + conditional aggregation).
    *
    * Returns one row per key: first/last payload columns, version count,
    * and a change classification (SINGLETON / UNCHANGED / CHANGED).
    */
  def beforeAfter(
      df: DataFrame,
      key: String,
      ord: String,
      tieBreak: String,
      payloadCols: Seq[String]): DataFrame = {
    val wAsc = Window.partitionBy(col(key)).orderBy(col(ord).asc, col(tieBreak).asc)
    val wDesc = Window.partitionBy(col(key)).orderBy(col(ord).desc, col(tieBreak).desc)
    val firstCols = payloadCols.map(c =>
      max(when(col("rn_first") === 1, col(c))).as(s"first_$c"))
    val lastCols = payloadCols.map(c =>
      max(when(col("rn_last") === 1, col(c))).as(s"last_$c"))
    val base = df
      .withColumn("rn_first", row_number().over(wAsc))
      .withColumn("rn_last", row_number().over(wDesc))
      .groupBy(col(key))
      .agg(firstCols.head, (firstCols.tail ++ lastCols :+
        count(lit(1)).as("n_versions")): _*)
    val head = payloadCols.head
    base.withColumn(
      "change_type",
      when(col("n_versions") === 1, lit("SINGLETON"))
        .when(col(s"first_$head") === col(s"last_$head"), lit("UNCHANGED"))
        .otherwise(lit("CHANGED")))
  }
}
