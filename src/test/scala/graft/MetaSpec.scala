package graft

import java.nio.file.Files

class MetaSpec extends SparkSuite {
  import spark.implicits._

  test("tableExists: false for missing/empty dir, true after a write (M1)") {
    val dir = Files.createTempDirectory("meta").toString
    assert(!Meta.tableExists(spark, s"$dir/nope"))
    Files.createDirectory(java.nio.file.Paths.get(s"$dir/empty"))
    assert(!Meta.tableExists(spark, s"$dir/empty"))
    Seq(1, 2).toDF("x").write.parquet(s"$dir/t")
    assert(Meta.tableExists(spark, s"$dir/t"))
  }

  test("describeSchema: name/type/nullability (M2)") {
    val df = Seq((1L, Some("a"))).toDF("id", "name")
    assert(Meta.describeSchema(df) ==
      Seq(("id", "bigint", false), ("name", "string", true)))
  }

  test("snapshotVersion advances across rewrites (M3)") {
    val dir = Files.createTempDirectory("meta").toString + "/t"
    assert(Meta.snapshotVersion(spark, dir).isEmpty)
    Seq(1).toDF("x").write.parquet(dir)
    val v1 = Meta.snapshotVersion(spark, dir).get
    Thread.sleep(1100) // fs mtime granularity
    Seq(2).toDF("x").write.mode("overwrite").parquet(dir)
    assert(Meta.snapshotVersion(spark, dir).get >= v1)
  }

  test("preview: count + first rows (M4)") {
    val (n, rows) = Meta.preview((1 to 10).toDF("x"), 3)
    assert(n == 10 && rows.size == 3)
    val (n2, rows2) = Meta.preview((1 to 2).toDF("x"), 3)
    assert(n2 == 2 && rows2.size == 2)
  }
}
