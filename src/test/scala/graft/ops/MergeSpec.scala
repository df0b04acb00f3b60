package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins the MERGE semantics documented in Merge.scala — including the two
  * deliberate deviations/quirks the Scaladoc promises tests for:
  * upsertMerge's null-coalesce (vs MERGE UPDATE SET *) and scd2Merge's
  * two-phase close-out (reference: jobs/silver/silver_builder.py:103-132).
  */
class MergeSpec extends SparkSuite {
  import spark.implicits._

  test("upsertMerge: source wins on match, unmatched both sides survive") {
    val target = Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "name", "v")
    val source = Seq((2L, "B", 200), (3L, "c", 30)).toDF("id", "name", "v")
    assertSameRows(
      Merge.upsertMerge(target, source, "id"),
      Seq(Row(1L, "a", 10), Row(2L, "B", 200), Row(3L, "c", 30)))
  }

  test("upsertMerge deviation pin: NULL source column keeps target value") {
    // Delta MERGE `UPDATE SET *` would overwrite with NULL; our coalesce
    // keeps the old value. Documented deviation (Merge.scala) — pin it so
    // a future refactor can't silently change behavior.
    val target = Seq((1L, Some("old"))).toDF("id", "name")
    val source = Seq((1L, Option.empty[String])).toDF("id", "name")
    assertSameRows(
      Merge.upsertMerge(target, source, "id"),
      Seq(Row(1L, "old")))
  }

  private def scd2Target(rows: (Long, String, String)*) = {
    val df = rows.toSeq.toDF("id", "name", "eff")
      .withColumn("effective_start_date", col("eff").cast("timestamp_ntz"))
      .drop("eff")
    df.withColumn("effective_end_date",
        lit("2099-12-31 00:00:00").cast("timestamp_ntz"))
      .withColumn("is_current", lit(true))
      .select("id", "name", "effective_start_date", "effective_end_date", "is_current")
  }

  private def src(rows: (Long, String, String)*) =
    rows.toSeq.toDF("id", "name", "upd")
      .withColumn("updated_at", col("upd").cast("timestamp_ntz"))
      .drop("upd")

  private val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00:00")
  private val t1 = java.time.LocalDateTime.parse("2024-06-01T00:00:00")
  private val sentinel = java.time.LocalDateTime.parse("2099-12-31T00:00:00")

  test("scd2Merge: changed row is closed out; new key inserted as current") {
    val target = scd2Target((1L, "a", "2024-01-01 00:00:00"), (2L, "b", "2024-01-01 00:00:00"))
    val source = src((1L, "A", "2024-06-01 00:00:00"), (9L, "z", "2024-06-01 00:00:00"))
    val out = Merge.scd2Merge(target, source, "id", Seq("name"))
    assertSameRows(out, Seq(
      Row(1L, "a", t0, t1, false),      // closed out (name changed)
      Row(2L, "b", t0, sentinel, true), // untouched
      Row(9L, "z", t1, sentinel, true)  // inserted as current
    ))
  }

  test("scd2Merge two-phase quirk pin: changed row's NEW version is NOT inserted") {
    // The reference's single MERGE closes out the old version but does not
    // insert the new one (its PK matched, so the insert clause never
    // fires); the new version lands on the NEXT incremental run. Kept
    // faithfully — after one pass with a changed row, key 1 has zero
    // current versions.
    val target = scd2Target((1L, "a", "2024-01-01 00:00:00"))
    val source = src((1L, "A", "2024-06-01 00:00:00"))
    val out = Merge.scd2Merge(target, source, "id", Seq("name"))
    assert(out.filter(col("id") === 1 && col("is_current")).count() == 0)
    // ... and replaying the same source batch (phase 2) inserts it:
    val out2 = Merge.scd2Merge(out, source, "id", Seq("name"))
    assertSameRows(out2.filter(col("is_current")), Seq(Row(1L, "A", t1, sentinel, true)))
  }

  test("scd2Merge: unchanged matched row stays current and history is preserved") {
    val history = scd2Target((3L, "old", "2023-01-01 00:00:00"))
      .withColumn("effective_end_date", lit("2024-01-01 00:00:00").cast("timestamp_ntz"))
      .withColumn("is_current", lit(false))
    val target = scd2Target((1L, "a", "2024-01-01 00:00:00")).unionByName(history)
    val source = src((1L, "a", "2024-06-01 00:00:00"))
    val out = Merge.scd2Merge(target, source, "id", Seq("name"))
    assert(out.count() == 2)
    assert(out.filter(col("id") === 1 && col("is_current")).count() == 1)
    assert(out.filter(col("id") === 3 && !col("is_current")).count() == 1)
  }

  test("asScd2 wraps a snapshot in the SCD2 envelope") {
    val out = Merge.asScd2(Seq((1L, "a")).toDF("id", "name"), "2024-01-01 00:00:00")
    assertSameRows(out, Seq(Row(1L, "a", t0, sentinel, true)))
  }
}
