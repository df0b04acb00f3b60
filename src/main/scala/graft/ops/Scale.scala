package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale techniques as first-class operators: explicit key salting for
  * extreme join skew, and bucketed table layout for exchange-free
  * co-located joins. Both are semantics-neutral — results are identical
  * to the plain join; only the physical distribution changes — so their
  * oracles are the unsalted/unbucketed SQL.
  */
object Scale {

  /** Salted inner equi-join for skewed keys: the large side spreads each
    * key's rows across `salts` sub-partitions via a deterministic row
    * hash; the small side is replicated once per salt. A hot key's
    * shuffle partition is thereby split `salts` ways. AQE's skew-join
    * split handles moderate skew at runtime; explicit salting is the
    * deterministic fallback for extreme single-key skew (and works for
    * aggregations-after-join where AQE cannot).
    */
  /** @param saltBy deterministic expression spreading a hot key's rows
    *   across salts (e.g. a narrow-column hash). Defaults to row-position
    *   spreading, which is type-safe but nondeterministic-flagged —
    *   prefer passing a cheap hash of stable columns. ANY assignment
    *   yields the same join result; the salt only splits shuffle
    *   partitions. */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int, saltBy: Option[Column] = None): DataFrame = {
    val salt = saltBy.getOrElse(pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val saltedLarge = large.withColumn("_salt", salt.cast("int") % salts)
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Write `df` bucketed and sorted by `key` into the session catalog —
    * the co-located layout: two tables bucketed the same way join with
    * NO shuffle exchange (pinned in PlansSpec). At 100 TB this is the
    * difference between re-shuffling the fact table per join and reading
    * it pre-partitioned; bucket count is sized to executor parallelism.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    // repartition on the key with width == bucket count: Spark's bucket
    // assignment is the same murmur3 hash as HashPartitioning, so each
    // task then holds exactly one bucket and writes ONE file — without
    // this, every input partition writes a file per bucket it touches
    // (p×b small files; at 32 partitions × 8 buckets the file-commit
    // overhead dominated the write).
    df.repartition(buckets, col(key)).write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Small-file compaction (the OPTIMIZE maintenance op): rewrite a
    * parquet directory into ~`targetRowsPerFile`-row files. Streaming
    * append sinks and per-trigger commits leave thousands of tiny files;
    * at 100 TB an uncompacted table pays per-file open/footer cost on
    * every scan. Row-count-proportional repartition is the
    * deterministic-size stand-in for byte-targeted sizing; returns the
    * (filesBefore, filesAfter) pair for observability.
    *
    * All directory surgery goes through Hadoop `FileSystem` (resolved
    * from the table path, same as [[graft.Meta]]), so the operator works
    * on any Hadoop-compatible filesystem, not just `file:`. Every rename
    * result is CHECKED: a silent rename failure either corrupts the swap
    * or deletes the only live copy, so failure rolls back and throws.
    *
    * Swap-window contract: the publish is two renames (dir → dir_old,
    * then dir_compacting → dir). Each rename is atomic on HDFS/local
    * filesystems, but BETWEEN them a concurrent reader resolving the
    * path sees no directory — compaction of a live table needs either a
    * read-quiesced maintenance window or a manifest-pointer layout where
    * readers never resolve raw paths ([[graft.Meta.Versioned.publishAll]]
    * is that layout: compact a NEW version dir, then commit the manifest).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetRowsPerFile: Long): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val table = new Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: Path): Int =
      if (!fs.exists(p)) 0
      else fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    require(fs.exists(table) && fs.getFileStatus(table).isDirectory,
      s"not a table directory: $dir")
    val before = parquetFiles(table)
    val df = spark.read.parquet(dir)
    val files = math.max(1, math.ceil(df.count().toDouble / targetRowsPerFile).toInt)
    val tmp = new Path(dir + "_compacting")
    df.repartition(files).write.mode("overwrite").parquet(tmp.toString)
    val dead = new Path(dir + "_old")
    if (fs.exists(dead)) // debris from a crashed previous swap — clear it
      fs.delete(dead, true)
    if (!fs.rename(table, dead)) {
      fs.delete(tmp, true)
      throw new java.io.IOException(s"compact: cannot move $dir aside; table unchanged")
    }
    if (!fs.rename(tmp, table)) {
      // roll the original back before reporting failure
      if (!fs.rename(dead, table))
        throw new java.io.IOException(
          s"compact: swap failed AND rollback failed — original preserved at $dead")
      fs.delete(tmp, true)
      throw new java.io.IOException(s"compact: cannot publish rewrite; table unchanged")
    }
    fs.delete(dead, true)
    (before, parquetFiles(table))
  }
}
