package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.time.LocalDateTime.parse(s.replace(' ', 'T'))

  private val left = Seq(
    (1L, "2024-01-01 09:00:00", 100L), // before any rate → unmatched
    (1L, "2024-01-01 10:00:00", 101L), // exactly at rate v1 → matches v1
    (1L, "2024-01-01 12:00:00", 102L), // between v1 and v2 → v1
    (1L, "2024-01-02 00:00:00", 103L), // after v2 → v2
    (2L, "2024-01-01 12:00:00", 200L)  // other key, no rates → unmatched
  ).toDF("k", "s", "event_id")
    .withColumn("ts", col("s").cast("timestamp_ntz")).drop("s")

  private val right = Seq(
    (1L, "2024-01-01 10:00:00", 1.5, 1L),
    (1L, "2024-01-01 18:00:00", 2.5, 2L)
  ).toDF("k", "s", "rate", "ver")
    .withColumn("ts", col("s").cast("timestamp_ntz")).drop("s")

  test("asOfJoin: latest right version at-or-before each left row, left-outer") {
    val out = Temporal.asOfJoin(left, right, "k", "ts", Seq("rate", "ver"), "ver")
      .select("event_id", "right_rate", "right_ver")
      .as[(Long, Option[Double], Option[Long])].collect()
      .map { case (k, r, v) => k -> ((r, v)) }.toMap
    assert(out(100L) == ((None, None)))
    assert(out(101L) == ((Some(1.5), Some(1L))))
    assert(out(102L) == ((Some(1.5), Some(1L))))
    assert(out(103L) == ((Some(2.5), Some(2L))))
    assert(out(200L) == ((None, None)))
  }

  test("asOfJoin: equal right timestamps — highest tie-break version wins") {
    val dupRight = right.unionByName(
      Seq((1L, "2024-01-01 10:00:00", 9.9, 3L)).toDF("k", "s", "rate", "ver")
        .withColumn("ts", col("s").cast("timestamp_ntz")).drop("s"))
    val out = Temporal.asOfJoin(left, dupRight, "k", "ts", Seq("rate", "ver"), "ver")
      .filter(col("event_id") === 101L)
      .select("right_ver").as[Long].head()
    assert(out == 3L)
  }

  test("asOfJoin: NULL right values survive the match (struct carrier)") {
    val rightWithNull = Seq((1L, "2024-01-01 10:00:00", Option.empty[Double], 1L))
      .toDF("k", "s", "rate", "ver")
      .withColumn("ts", col("s").cast("timestamp_ntz")).drop("s")
    val out = Temporal.asOfJoin(left, rightWithNull, "k", "ts", Seq("rate", "ver"), "ver")
      .filter(col("event_id") === 102L)
      .select("right_rate", "right_ver").as[(Option[Double], Option[Long])].head()
    // the version matched (ver=1) even though its rate is legitimately NULL
    assert(out == ((None, Some(1L))))
  }

  test("binnedRangeJoin equals the naive range join") {
    val points = (0 until 200).map(i =>
      (i.toLong, f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00"))
      .toDF("pid", "s").withColumn("ts", col("s").cast("timestamp_ntz")).drop("s")
    val intervals = Seq(
      (10L, "2024-01-01 03:00:00", "2024-01-01 07:30:00"),
      (20L, "2024-01-01 06:00:00", "2024-01-01 06:00:00"), // degenerate point
      (30L, "2024-01-01 20:00:00", "2024-01-01 23:59:59")
    ).toDF("iid", "ss", "es")
      .withColumn("ws", col("ss").cast("timestamp_ntz"))
      .withColumn("we", col("es").cast("timestamp_ntz")).drop("ss", "es")
    val binned = Temporal.binnedRangeJoin(points, intervals, "ts", "ws", "we", 3600)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals,
      col("ts") >= col("ws") && col("ts") <= col("we"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    assert(naive.nonEmpty)
  }
}
