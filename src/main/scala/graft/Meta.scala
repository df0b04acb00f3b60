package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Table-maintenance / metadata operators (SURVEY.md §2.11 M1-M4).
  *
  * The reference probes Delta tables (`DeltaTable.isDeltaTable`,
  * jobs/bronze/bronze_builder.py:112), prints schema with nullability
  * (jobs/bronze/delta_schema_inspector.py:35-37), reads the table version
  * (jobs/silver/silver_reader.py:71) and previews count + first rows
  * (jobs/silver/silver_reader.py:70-78). Parquet-path equivalents here.
  */
object Meta {

  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** M1: does a readable table exist at `path`? True iff the directory
    * exists and contains at least one parquet part file at any depth
    * (partitioned tables nest part files under key=value directories;
    * an empty dir — e.g. a failed write — is not a table). */
  def tableExists(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path)
    f.exists(p) && {
      val it = f.listFiles(p, true)
      var found = false
      while (!found && it.hasNext) {
        val n = it.next().getPath.getName
        found = n.endsWith(".parquet") || n.startsWith("part-")
      }
      found
    }
  }

  /** M2: schema inspection — (name, type, nullable) per field, the shape
    * the reference's inspector prints. */
  def describeSchema(df: DataFrame): Seq[(String, String, Boolean)] =
    df.schema.fields.toSeq.map(f => (f.name, f.dataType.simpleString, f.nullable))

  /** M3: version stand-in without a transaction log — the latest
    * modification time (epoch millis) over the table's files. Monotone
    * under append/overwrite, so usable as a snapshot marker. */
  def snapshotVersion(spark: SparkSession, path: String): Option[Long] = {
    val (f, p) = fs(spark, path)
    if (!f.exists(p)) None
    else f.listStatus(p).map(_.getModificationTime) match {
      case Array() => None
      case ts      => Some(ts.max)
    }
  }

  /** M4: row count + first-n preview in one pass over a cached scan
    * (the reference runs count() and head() as two scans). */
  def preview(df: DataFrame, n: Int = 5): (Long, Seq[Row]) = {
    val rows = df.limit(n + 1).collect().toSeq
    // avoid a full count when the caller only wants a bounded preview probe
    val total = if (rows.size <= n) rows.size.toLong else df.count()
    (total, rows.take(n))
  }

  /** M3 extended: versioned snapshot writes over plain parquet — the
    * time-travel surface the reference gets from Delta (`dt.version()`,
    * jobs/silver/silver_reader.py:71), rebuilt on directory layout:
    * every write lands in `path/v=<n+1>`, readers resolve latest or any
    * retained historical version. Writers never mutate a published
    * snapshot, so concurrent readers of version n are isolated from the
    * n+1 write — the same immutability contract a transaction log gives,
    * minus cross-table atomicity. */
  object Versioned {
    // STRICTLY v=<digits> — maintenance debris (e.g. Scale.compact's
    // sibling `v=1_compacting` / `v=1_old` work dirs) must be invisible
    // to the version surface, not a parse crash
    private val VersionDir = "^v=(\\d+)$".r

    private def versions(spark: SparkSession, path: String): Seq[Long] = {
      val (f, p) = fs(spark, path)
      if (!f.exists(p)) Seq.empty
      else f.listStatus(p).toSeq
        .map(_.getPath.getName)
        .collect { case VersionDir(n) => n.toLong }
        .sorted
    }

    /** Publish `df` as the next version; returns the new version number. */
    def write(df: DataFrame, path: String): Long = {
      val next = versions(df.sparkSession, path).lastOption.getOrElse(0L) + 1
      df.write.mode("errorifexists").parquet(s"$path/v=$next")
      next
    }

    /** Latest version number, if any snapshot exists. */
    def latestVersion(spark: SparkSession, path: String): Option[Long] =
      versions(spark, path).lastOption

    /** Read latest (version = None) or a specific retained snapshot. */
    def read(spark: SparkSession, path: String, version: Option[Long] = None): DataFrame = {
      val v = version.orElse(latestVersion(spark, path)).getOrElse(
        throw new IllegalArgumentException(s"no versions at $path"))
      spark.read.parquet(s"$path/v=$v")
    }

    /** Drop all but the newest `keep` snapshots (VACUUM). */
    def vacuum(spark: SparkSession, path: String, keep: Int): Seq[Long] = {
      val all = versions(spark, path)
      val dead = all.dropRight(keep)
      val (f, _) = fs(spark, path)
      dead.foreach(v => f.delete(new org.apache.hadoop.fs.Path(s"$path/v=$v"), true))
      dead
    }
  }

  /** Single-pass pipeline observability (`Dataset.observe`): named
    * metrics collected DURING an action over one scan — no second
    * count()/agg() pass over the input, which at 100 TB is the
    * difference between free metrics and a doubled read. */
  def observed(df: DataFrame, name: String,
      metrics: (String, org.apache.spark.sql.Column)*): (DataFrame, org.apache.spark.sql.Observation) = {
    require(metrics.nonEmpty, "observed requires at least one metric")
    val obs = org.apache.spark.sql.Observation(name)
    val exprs = metrics.map { case (alias, c) => c.as(alias) }
    (df.observe(obs, exprs.head, exprs.tail: _*), obs)
  }
}
