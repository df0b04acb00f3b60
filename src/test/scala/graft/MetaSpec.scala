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

  test("Versioned: publish, time travel, latest, vacuum (M3 time travel)") {
    val dir = Files.createTempDirectory("meta-ver").toString + "/t"
    assert(Meta.Versioned.latestVersion(spark, dir).isEmpty)
    assert(Meta.Versioned.write(Seq(1, 2).toDF("x"), dir) == 1L)
    assert(Meta.Versioned.write(Seq(3).toDF("x"), dir) == 2L)
    assert(Meta.Versioned.write(Seq(4, 5, 6).toDF("x"), dir) == 3L)
    assert(Meta.Versioned.latestVersion(spark, dir).contains(3L))
    assert(Meta.Versioned.read(spark, dir).count() == 3)                  // latest
    assert(Meta.Versioned.read(spark, dir, Some(1L)).count() == 2)        // time travel
    assert(Meta.Versioned.vacuum(spark, dir, keep = 2) == Seq(1L))
    assert(Meta.Versioned.latestVersion(spark, dir).contains(3L))
    intercept[Exception] { Meta.Versioned.read(spark, dir, Some(1L)).count() }
  }

  test("Versioned.publishAll: readers never observe a torn multi-table publish") {
    val root = Files.createTempDirectory("meta-multi").toString
    val c1 = Meta.Versioned.publishAll(root, Seq(
      "dim" -> Seq((1L, "a")).toDF("id", "name"),
      "fact" -> Seq((1L, 10.0)).toDF("id", "v")))
    assert(c1 == 1L)
    assert(Meta.Versioned.committedVersions(spark, root)
      .contains(Map("dim" -> 1L, "fact" -> 1L)))
    assert(Meta.Versioned.readCommitted(spark, root, "dim").count() == 1)
    // a TORN publish: a new version dir staged (crash before the manifest
    // rename) — manifest readers must keep resolving commit 1's versions
    Meta.Versioned.write(Seq((2L, "b")).toDF("id", "name"), s"$root/dim")
    assert(Meta.Versioned.committedVersions(spark, root)
      .contains(Map("dim" -> 1L, "fact" -> 1L)))
    assert(Meta.Versioned.readCommitted(spark, root, "dim").count() == 1)
    // the next publishAll lands AFTER the debris version and flips the
    // whole set atomically
    val c2 = Meta.Versioned.publishAll(root, Seq(
      "dim" -> Seq((1L, "a"), (2L, "b")).toDF("id", "name"),
      "fact" -> Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")))
    assert(c2 == 2L)
    assert(Meta.Versioned.committedVersions(spark, root)
      .contains(Map("dim" -> 3L, "fact" -> 2L)))
    assert(Meta.Versioned.readCommitted(spark, root, "dim").count() == 2)
    assert(Meta.Versioned.readCommitted(spark, root, "fact").count() == 2)
    // cross-table time travel: the full consistent set of commit 1
    assert(Meta.Versioned.readCommitted(spark, root, "fact", commit = Some(1L)).count() == 1)
    assert(Meta.Versioned.readCommitted(spark, root, "dim", commit = Some(1L)).count() == 1)
    // unknown table in a commit is an error, not an empty frame
    intercept[IllegalArgumentException] {
      Meta.Versioned.readCommitted(spark, root, "nope")
    }
  }

  test("observed: metrics collected in the same pass as the action") {
    import org.apache.spark.sql.functions._
    val (df, obs) = Meta.observed((1 to 100).toDF("x"), "m",
      "n" -> count(lit(1)), "sum_x" -> sum(col("x")))
    df.count() // one action, metrics ride along
    assert(obs.get("n") == 100L && obs.get("sum_x") == 5050L)
  }
}
