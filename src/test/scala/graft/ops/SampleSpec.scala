package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Deterministic sampling operators. The hash-gate family is pinned at
  * plan level in PlansSpec (scan-level filter, no shuffle) and by oracle
  * in q20/q51; here the budget-prefix operator's exactness and
  * partition-independence. */
class SampleSpec extends SparkSuite {
  import spark.implicits._

  private def fixture = (1 to 200).map { i =>
    // scores with heavy ties, unique ids, varied weights
    (i.toLong, (i % 13).toDouble, (i % 7) + 1L)
  }.toDF("id", "score", "w")

  private def run(partitions: Int, budget: Long): Set[Long] =
    Sample.takeByBudget(fixture, "score", "id", "w", budget, partitions)
      .select("id").as[Long].collect().toSet

  test("takeByBudget: exact prefix of the global (score desc, id) order") {
    val rows = fixture.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy { case (id, s, _) => (-s, id) }
    var acc = 0L
    val expected = rows.takeWhile { case (_, _, w) => { acc += w; acc <= 150 } }
      .map(_._1).toSet
    assert(run(4, 150L) == expected)
  }

  test("takeByBudget: result is independent of the partition count") {
    val base = run(1, 300L)
    assert(base.nonEmpty)
    Seq(3, 7, 32).foreach(p => assert(run(p, 300L) == base, s"partitions=$p"))
  }

  test("takeByBudget: zero budget selects nothing, ample budget everything") {
    assert(run(4, 0L).isEmpty)
    assert(run(4, 10000L).size == 200)
  }

  test("takeByBudget: empty input yields an empty, correctly-schemed frame") {
    val empty = Seq.empty[(Long, Double, Long)].toDF("id", "score", "w")
    val out = Sample.takeByBudget(empty, "score", "id", "w", 100L)
    assert(out.columns.toSeq == Seq("id", "score", "w"))
    assert(out.isEmpty)
  }
}
