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

  /** The events fixture stores `ts` as parquet INT64 TIMESTAMP(NANOS) which
    * Spark 4 refuses by default (PARQUET_TYPE_ILLEGAL). Read nanos as long
    * and truncate to microseconds — identical to DuckDB's
    * `CAST(ts AS TIMESTAMP)` semantics, so oracle comparisons line up.
    * timestamp_ntz keeps wall-clock (naive) semantics matching DuckDB.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Session-build code (Verify/Bench/test harness) sets this conf up
    // front; this defensive set covers driver-owned sessions (e.g. the
    // smoke check) that didn't. Idempotent — the value is always "true".
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
  }

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
