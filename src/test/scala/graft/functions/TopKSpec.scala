package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the bounded-heap top-k aggregate: equivalence to the window
  * row_number formulation, partitioning invariance (the partial-merge
  * path), and small-group edge cases. */
class TopKSpec extends SparkSuite {
  import spark.implicits._

  private def viaHeap(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(call_function("graft_topk",
        struct(col("v"), col("id")), col("id"), lit(k)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("col").as("id"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").desc)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("g"), col("rank"), col("id"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
  }

  test("heap top-k == window row_number top-k, any partitioning") {
    val rng = new scala.util.Random(7)
    val df = (1L to 5000L).map(id => (id, (id % 13).toInt, rng.nextInt(100).toDouble))
      .toDF("id", "g", "v")
    val expected = viaWindow(df, 3)
    for (parts <- Seq(1, 4, 32))
      assert(viaHeap(df.repartition(parts), 3) == expected, s"parts=$parts")
  }

  test("k larger than the group emits the whole group, ordered") {
    val df = Seq((1L, 0, 5.0), (2L, 0, 9.0)).toDF("id", "g", "v")
    val got = df.groupBy("g")
      .agg(call_function("graft_topk",
        struct(col("v"), col("id")), col("id"), lit(10)).as("top"))
      .select(col("top")).head().getSeq[Long](0)
    assert(got == Seq(2L, 1L)) // descending by (v, id)
  }

  test("global top-k by hash == orderBy(hash).limit(k): a sort-free sampler") {
    // composition note: graft_topk over a hash sort key IS a
    // deterministic uniform sample — the map-side heaps prune to k rows
    // per partition, so no global sort ever materializes (q20's
    // TakeOrdered cousin, but usable inside any aggregation)
    val df = (1L to 20000L).toDF("id")
      .withColumn("h", xxhash64(col("id")))
    val viaSort = df.orderBy(col("h").desc, col("id")).limit(50)
      .select("id").collect().map(_.getLong(0)).toSet
    val viaTopK = df.groupBy()
      .agg(call_function("graft_topk",
        struct(col("h"), col("id")), col("id"), lit(50)).as("sample"))
      .select(explode(col("sample")))
      .collect().map(_.getLong(0)).toSet
    assert(viaTopK == viaSort)
  }

  test("struct payloads survive the serialized merge path") {
    val df = (1L to 200L).map(i => (i, (i % 3).toInt, i.toDouble)).toDF("id", "g", "v")
    val got = df.repartition(17).groupBy("g")
      .agg(call_function("graft_topk",
        struct(col("v"), col("id")),
        struct(col("id"), col("v")), lit(2)).as("top"))
      .select(col("g"), explode(col("top")).as("p"))
      .select(col("g"), col("p.id"), col("p.v"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(
      (0, 198L, 198.0), (0, 195L, 195.0),
      (1, 199L, 199.0), (1, 196L, 196.0),
      (2, 200L, 200.0), (2, 197L, 197.0)))
  }
}
