package graft.ops

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSuite {

  test("saltedEquiJoin: identical result to the plain join") {
    val li = Tables.lineitem(spark, sfDir()).withColumnRenamed("l_orderkey", "o_orderkey")
    val o = Tables.orders(spark, sfDir())
    val plain = li.join(o, "o_orderkey")
    val salted = Scale.saltedEquiJoin(li, o, "o_orderkey", salts = 4)
    assert(salted.count() == plain.count())
    assert(salted.columns.sorted.toSeq == plain.columns.sorted.toSeq)
    val pc = plain.groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sc = salted.groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pc == sc)
  }

  test("bucketed co-located join: no shuffle exchange in the plan") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      // disable broadcast so the join must rely on the bucket layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Scale.writeBucketed(Tables.orders(spark, sfDir()), "t_b_orders", "o_orderkey", 4)
      Scale.writeBucketed(
        Tables.lineitem(spark, sfDir()).withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_b_lineitem", "o_orderkey", 4)
      val j = spark.table("t_b_lineitem").join(spark.table("t_b_orders"), "o_orderkey")
      j.collect()
      val p = j.queryExecution.executedPlan.toString()
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$p")
      // and the same join on unbucketed scans DOES shuffle
      val plain = Tables.lineitem(spark, sfDir())
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(Tables.orders(spark, sfDir()), "o_orderkey")
      plain.collect()
      assert(plain.queryExecution.executedPlan.toString().contains("Exchange hashpartitioning"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compact: merges a many-file layout, preserves every row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    (1L to 5000L).toDF("id").repartition(40).write.parquet(dir)
    val before = spark.read.parquet(dir).as[Long].collect().sorted.toSeq
    val (nBefore, nAfter) = Scale.compact(spark, dir, targetRowsPerFile = 2500L)
    assert(nBefore == 40 && nAfter == 2, s"got $nBefore -> $nAfter")
    val after = spark.read.parquet(dir).as[Long].collect().sorted.toSeq
    assert(after == before)
  }
}
