package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class WindowsSpec extends SparkSuite {
  import spark.implicits._

  test("latestPerKey: top-1 per key with deterministic tie-break") {
    val df = Seq(
      (1L, "2024-01-01", 10L), (1L, "2024-02-01", 11L),
      (2L, "2024-03-01", 20L), (2L, "2024-03-01", 21L) // tie on ord → max tieBreak wins
    ).toDF("k", "d", "id")
    val out = Windows.latestPerKey(df, "k", "d", "id")
    assertSameRows(out, Seq(Row(1L, "2024-02-01", 11L), Row(2L, "2024-03-01", 21L)))
  }

  test("beforeAfter: SINGLETON / UNCHANGED / CHANGED classification") {
    val df = Seq(
      (1L, 1L, "A"),             // singleton
      (2L, 1L, "A"), (2L, 2L, "A"), // two versions, same payload
      (3L, 1L, "A"), (3L, 2L, "B")  // changed
    ).toDF("k", "v", "payload")
    val out = Windows.beforeAfter(df, "k", "v", "v", Seq("payload"))
    val cls = out.select("k", "change_type").as[(Long, String)].collect().toMap
    assert(cls == Map(1L -> "SINGLETON", 2L -> "UNCHANGED", 3L -> "CHANGED"))
    val r3 = out.filter(col("k") === 3).select("first_payload", "last_payload")
      .as[(String, String)].head()
    assert(r3 == ("A", "B"))
  }
}
