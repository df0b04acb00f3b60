package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IO layer over the driver-provided parquet fixtures (TESTDATA.md).
  *
  * Mirrors the reference's scan surface (SURVEY.md §2.1 S1-S6): batch
  * parquet scans standing in for Delta/JDBC. All loaders are plain
  * `spark.read.parquet` so Catalyst pushes filters/column pruning into
  * the scan — same pattern as the reference's JDBC-subquery pushdown
  * (reference: jobs/bronze/bronze_builder.py:95-104).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Generic parquet table scan (reference: jobs/silver/silver_builder.py:93). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events fixture has shipped `ts` two ways across driver rounds:
    * parquet INT64 TIMESTAMP(NANOS) — which Spark 4 refuses by default
    * (PARQUET_TYPE_ILLEGAL), so we read nanos as long and truncate to
    * microseconds — and native TIMESTAMP(MICROS), which Spark reads as
    * TIMESTAMP_NTZ directly. Detect per-directory from the file footer so
    * both load identically; either way the result is timestamp_ntz,
    * keeping wall-clock (naive) semantics matching DuckDB's
    * `CAST(ts AS TIMESTAMP)`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Session-build code (Verify/Bench/test harness) sets this conf up
    // front; this defensive set covers driver-owned sessions (e.g. the
    // smoke check) that didn't. Idempotent — the value is always "true".
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts", eventsTsNtz(eventsTsIsNanosLong(spark, dir)))
  }

  /** True when the events fixture stores ts as INT64 TIMESTAMP(NANOS)
    * (surfaced as LongType under nanosAsLong). Cached per directory —
    * streaming queries probe this on every source build.
    */
  def eventsTsIsNanosLong(spark: SparkSession, dir: String): Boolean =
    tsKindCache.computeIfAbsent(dir, { d =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      Boolean.box(spark.read.parquet(s"$d/events.parquet")
        .schema("ts").dataType == org.apache.spark.sql.types.LongType)
    })

  private val tsKindCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Normalized event-time column (wall-clock NTZ) for either encoding. */
  def eventsTsNtz(isNanosLong: Boolean): org.apache.spark.sql.Column =
    if (isNanosLong) timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
    else col("ts").cast("timestamp_ntz")

  /** Same instant as TIMESTAMP (LTZ) — watermarks require it; the session
    * runs in UTC so the wall-clock values are identical.
    */
  def eventsTsLtz(isNanosLong: Boolean): org.apache.spark.sql.Column =
    if (isNanosLong) timestamp_micros(expr("ts div 1000"))
    else col("ts").cast("timestamp")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every fixture table as a temp view — the SQL entry point
    * (reference: dbt gold models over named relations,
    * dbt/models/gold/gold_attrition_prototype.sql:13).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
