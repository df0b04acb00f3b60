package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the exact paged-bitmap distinct family: equality with
  * COUNT(DISTINCT) on page-boundary-straddling ids, rollup-tree and
  * partitioning invariance (OR is commutative/idempotent), byte-stable
  * serialization, null skip, negative-id refusal. */
class BitmapSpec extends SparkSuite {
  import spark.implicits._

  test("exact count, page boundaries included, any partitioning") {
    // ids straddle the 65536-bit page boundary and leave page gaps
    val ids = Seq(0L, 1L, 63L, 64L, 65535L, 65536L, 65537L,
      1000000L, 1000001L, 12345678L)
    val dup = (ids ++ ids ++ ids).toDF("v")
    for (parts <- Seq(1, 7, 32)) {
      val n = dup.repartition(parts)
        .agg(call_function("graft_bitmap_count",
          call_function("graft_bitmap_sketch", col("v"))))
        .head().getLong(0)
      assert(n == ids.length.toLong, s"parts=$parts got $n")
    }
  }

  test("rollup of per-group sketches == one-shot sketch, byte for byte") {
    val df = (1L to 5000L).map(i => (i % 7, i * 13 % 4096)).toDF("g", "v")
    val oneShot = df.agg(call_function("graft_bitmap_sketch", col("v")))
      .head().getAs[Array[Byte]](0)
    val rolled = df.groupBy("g")
      .agg(call_function("graft_bitmap_sketch", col("v")).as("bm"))
      .agg(call_function("graft_bitmap_merge", col("bm")))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(oneShot, rolled),
      "equal sets must serialize byte-identically through any rollup tree")
    assert(Bitmap.count(Bitmap.deserialize(rolled)) ==
      df.select("v").distinct().count())
  }

  test("nulls are skipped; negative ids refuse loudly") {
    val withNull = Seq(Some(1L), None, Some(2L)).toDF("v")
    val n = withNull.agg(call_function("graft_bitmap_count",
      call_function("graft_bitmap_sketch", col("v")))).head().getLong(0)
    assert(n == 2L)
    val err = intercept[Throwable] {
      Seq(-1L).toDF("v")
        .agg(call_function("graft_bitmap_sketch", col("v"))).collect()
    }
    val messages = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(messages.exists(_.contains("non-negative")),
      s"expected the non-negative refusal, got: $messages")
  }

  test("page-count cap refuses loudly instead of OOMing on a sparse " +
      "id space (add and merge paths)") {
    val p = Bitmap.empty
    // three scattered ids, one page each; cap of 2 trips on the third
    Bitmap.add(p, 0L, maxPages = 2)
    Bitmap.add(p, 1L << 20, maxPages = 2)
    val e = intercept[IllegalArgumentException] {
      Bitmap.add(p, 1L << 30, maxPages = 2)
    }
    assert(e.getMessage.contains("dictionary-encode"))
    val other = Bitmap.empty
    Bitmap.add(other, 1L << 40)
    val m = intercept[IllegalArgumentException] {
      Bitmap.mergeInto(p, other, maxPages = 2)
    }
    assert(m.getMessage.contains("sparse"))
    // re-adding to an EXISTING page at the cap is fine (no new page)
    Bitmap.add(p, 1L, maxPages = 2)
    assert(Bitmap.count(p) == 3L)
  }
}
