package graft.sql

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class GoldModelsSpec extends SparkSuite {

  test("materialize: CTAS write + read-back equals the model output (M5)") {
    Tables.orders(spark, sfDir()).createOrReplaceTempView("orders")
    val path = java.nio.file.Files.createTempDirectory("gold").toString + "/t"
    val out = GoldModels.materialize(spark, GoldModels.attritionMonthly, path)
    val direct = GoldModels.run(spark, GoldModels.attritionMonthly)
    assert(out.collect().toSeq.sortBy(_.toString) ==
      direct.collect().toSeq.sortBy(_.toString))
    assert(graft.Meta.tableExists(spark, path))
  }

  test("rows -> DataFrame lift with explicit schema (S6, dq_checks.py:122)") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("reason", StringType, nullable = true)))
    val rows = java.util.Arrays.asList(Row(1L, "bad"), Row(2L, null))
    val df = spark.createDataFrame(rows, schema)
    assert(df.count() == 2)
    assert(df.schema == schema)
    assert(df.filter(df("reason").isNull).count() == 1)
  }
}
