package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rule-driven data-quality checks (reference: data-quality/dq_rules.yaml:1-37
  * interpreted by data-quality/dq_checks.py:63-98 — not_null / unique /
  * between / foreign_key, violators quarantined).
  *
  * The reference interprets YAML rules in a pandas loop on the driver; here
  * each rule compiles to a distributed predicate / anti-join so the check
  * runs inside Spark (no collect) and scales with the table.
  */
object Quality {

  sealed trait Rule {
    def table: String
    def ruleName: String
    def columnName: String
  }
  final case class NotNull(table: String, column: String) extends Rule {
    val ruleName = "not_null"; val columnName = column
  }
  /** Violation semantics match pandas `~col.between(lo, hi)`: NULL counts
    * as a violation (dq_checks.py:85). */
  final case class Between(table: String, column: String, lo: Double, hi: Double)
      extends Rule {
    val ruleName = "between"; val columnName = column
  }
  /** Violation = every row belonging to a key with multiplicity > 1
    * (pandas `duplicated(keep=False)`, dq_checks.py:77-81). */
  final case class Unique(table: String, column: String) extends Rule {
    val ruleName = "unique"; val columnName = column
  }
  /** Violation = child rows whose key is absent from the parent —
    * a left-anti join (dq_checks.py:90-96). */
  final case class ForeignKey(table: String, column: String,
      refTable: String, refColumn: String) extends Rule {
    val ruleName = "foreign_key"; val columnName = column
  }

  /** Rows of `df` violating `rule` (for quarantine; dq_checks.py:103-126). */
  def violatingRows(rule: Rule, df: DataFrame, ref: => DataFrame = null): DataFrame =
    rule match {
      case NotNull(_, c) => df.filter(col(c).isNull)
      case Between(_, c, lo, hi) =>
        df.filter(col(c).isNull || !col(c).between(lo, hi))
      case Unique(_, c) =>
        // single shuffle: window count per key, keep multiplicity > 1.
        // A window (unlike a groupBy + semi-join back) scans the input once
        // and groups NULL keys together — matching SQL GROUP BY / pandas
        // duplicated() semantics, where duplicate NULLs ARE violations.
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col(c))
        df.withColumn("_key_count", count(lit(1)).over(w))
          .filter(col("_key_count") > 1)
          .drop("_key_count")
      case ForeignKey(_, c, _, refC) =>
        df.join(ref.select(col(refC).as(c)).distinct(), Seq(c), "left_anti")
    }

  /** One row per rule: (table_name, rule, column_name, violations). */
  def violationCounts(spark: SparkSession, rules: Seq[(Rule, DataFrame, DataFrame)]): DataFrame = {
    val counted = rules.map { case (rule, df, ref) =>
      violatingRows(rule, df, ref)
        .agg(count(lit(1)).as("violations"))
        .select(
          lit(rule.table).as("table_name"),
          lit(rule.ruleName).as("rule"),
          lit(rule.columnName).as("column_name"),
          col("violations"))
    }
    counted.reduce(_ unionByName _)
  }

  /** Quarantine: rows violating any rule, tagged with the rule name,
    * deduplicated (dq_checks.py:75-98 pd.concat + drop_duplicates →
    * U1/U2 in SURVEY.md §2.7).
    *
    * Single-scan design: k rules are evaluated as k flag columns over ONE
    * pass of `df` (row-local predicates cost nothing extra; Unique adds a
    * window over its key; ForeignKey adds a left join against the parent's
    * distinct keys — typically broadcast). The tag array is then exploded,
    * keeping only violated tags. The per-rule union-of-scans alternative
    * re-reads the table k times — the r1 scale bottleneck in q08.
    */
  def quarantine(rules: Seq[Rule], df: DataFrame, keyCols: Seq[String],
      refs: Map[String, DataFrame] = Map.empty): DataFrame = {
    var cur = df
    val tags = rules.zipWithIndex.map { case (r, i) =>
      val flag = s"_violates_$i"
      r match {
        case NotNull(_, c) =>
          cur = cur.withColumn(flag, col(c).isNull)
        case Between(_, c, lo, hi) =>
          cur = cur.withColumn(flag, col(c).isNull || !col(c).between(lo, hi))
        case Unique(_, c) =>
          val w = org.apache.spark.sql.expressions.Window.partitionBy(col(c))
          cur = cur.withColumn(flag, count(lit(1)).over(w) > 1)
        case ForeignKey(_, c, refT, refC) =>
          val hit = s"_fk_hit_$i"
          val parent = refs(refT).select(col(refC).as(c)).distinct()
            .withColumn(hit, lit(true))
          cur = cur.join(parent, Seq(c), "left")
            .withColumn(flag, col(hit).isNull).drop(hit)
      }
      when(col(flag), lit(s"${r.ruleName}:${r.columnName}"))
    }
    cur
      .select(keyCols.map(col) :+
        explode(filter(array(tags: _*), t => t.isNotNull)).as("violated_rule"): _*)
      .dropDuplicates()
  }
}
