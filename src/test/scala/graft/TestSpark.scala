package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run (sessions are expensive;
  * suites must not stop it). Mirrors the Verify/Bench session config.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.builder("local[4]", "4").appName("graft-tests").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Base suite: shared session + order-insensitive DataFrame comparison. */
abstract class SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** Row sets equal, ignoring row order (column order must match). */
  def assertSameRows(actual: DataFrame, expected: Seq[Row]): Unit = {
    val got = actual.collect().toSeq
    assert(
      got.map(_.toString).sorted == expected.map(_.toString).sorted,
      s"\ngot:      ${got.map(_.toString).sorted.mkString(", ")}" +
        s"\nexpected: ${expected.map(_.toString).sorted.mkString(", ")}")
  }

  def sfDir(sf: String = "0.001"): String = s"/root/testdata/sf$sf"
}
