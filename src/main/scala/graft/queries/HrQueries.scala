package graft.queries

import graft.Tables
import graft.ops._
import graft.sql.GoldModels
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's own operator surface (SURVEY.md §2) re-based onto the
  * fixture star schema. Each query has a DuckDB oracle with identical
  * column aliases. Aggregates over doubles go through exact DECIMAL sums
  * (order-independent) before a final double cast, so Spark's partial-
  * aggregation merge order can never flip a bit vs the oracle.
  */
object HrQueries {

  val all: Seq[Q] = Seq(

    // ---- Gold SQL models (dbt surface: SQL text → spark.sql; SURVEY §3.3)
    Q("q01_gold_attrition_monthly", GoldModels.attritionMonthly + "\n") { (spark, dir) =>
      Tables.orders(spark, dir).createOrReplaceTempView("orders")
      GoldModels.run(spark, GoldModels.attritionMonthly)
    },

    Q("q02_gold_attrition_by_dept", GoldModels.attritionByDept + "\n") { (spark, dir) =>
      Tables.orders(spark, dir).createOrReplaceTempView("orders")
      Tables.customer(spark, dir).createOrReplaceTempView("customer")
      Tables.nation(spark, dir).createOrReplaceTempView("nation")
      GoldModels.run(spark, GoldModels.attritionByDept)
    },

    Q("q03_gold_attrition_summary", GoldModels.attritionSummary + "\n") { (spark, dir) =>
      Tables.orders(spark, dir).createOrReplaceTempView("orders")
      Tables.customer(spark, dir).createOrReplaceTempView("customer")
      Tables.nation(spark, dir).createOrReplaceTempView("nation")
      GoldModels.run(spark, GoldModels.attritionSummary)
    },

    // ---- W1 latest-per-key (reference: tests/delta_reader_spark.py:58-66)
    Q(
      "q04_latest_order_per_customer",
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, o_orderstatus
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
      Windows
        .latestPerKey(Tables.orders(spark, dir), "o_custkey", "o_orderdate", "o_orderkey")
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus")
    },

    // ---- J2 keyed upsert merge (reference: bronze_builder.py:116-123)
    Q(
      "q05_merge_upsert",
      """WITH t AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
        |s AS (SELECT * REPLACE ('U' AS o_orderstatus,
        |        o_totalprice + 100.0 AS o_totalprice)
        |      FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
        |       coalesce(s.o_custkey, t.o_custkey) AS o_custkey,
        |       coalesce(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
        |       coalesce(s.o_totalprice, t.o_totalprice) AS o_totalprice,
        |       coalesce(s.o_orderdate, t.o_orderdate) AS o_orderdate,
        |       coalesce(s.o_orderpriority, t.o_orderpriority) AS o_orderpriority
        |FROM t FULL JOIN s ON t.o_orderkey = s.o_orderkey
        |ORDER BY 1""".stripMargin) { (spark, dir) =>
      val o = Tables.orders(spark, dir)
      val target = o.filter(col("o_orderkey") % 3 =!= 0)
      val source = o
        .filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") + lit(100.0))
      Merge.upsertMerge(target, source, "o_orderkey")
    },

    // ---- J3 SCD2 close-out merge (reference: silver_builder.py:103-132)
    Q(
      "q06_scd2_merge",
      """WITH target AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |         TIMESTAMP '2024-01-01 00:00:00' AS effective_start_date,
        |         TIMESTAMP '2099-12-31 00:00:00' AS effective_end_date,
        |         true AS is_current
        |  FROM customer),
        |source AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 50.0 AS c_acctbal,
        |         c_mktsegment, TIMESTAMP '2024-06-01 00:00:00' AS updated_at
        |  FROM customer WHERE c_custkey % 5 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal,
        |         c_mktsegment, TIMESTAMP '2024-06-01 00:00:00'
        |  FROM customer WHERE c_custkey % 7 = 0)
        |SELECT t.c_custkey, t.c_name, t.c_nationkey, t.c_acctbal, t.c_mktsegment,
        |       t.effective_start_date,
        |       CASE WHEN s.c_custkey IS NOT NULL AND t.c_acctbal <> s.c_acctbal
        |            THEN s.updated_at ELSE t.effective_end_date END AS effective_end_date,
        |       CASE WHEN s.c_custkey IS NOT NULL AND t.c_acctbal <> s.c_acctbal
        |            THEN false ELSE t.is_current END AS is_current
        |FROM target t LEFT JOIN source s ON t.c_custkey = s.c_custkey
        |UNION ALL
        |SELECT s.c_custkey, s.c_name, s.c_nationkey, s.c_acctbal, s.c_mktsegment,
        |       s.updated_at, TIMESTAMP '2099-12-31 00:00:00', true
        |FROM source s
        |WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.c_custkey = s.c_custkey)
        |ORDER BY c_custkey, effective_start_date""".stripMargin) { (spark, dir) =>
      val c = Tables.customer(spark, dir)
      val target = Merge.asScd2(c, "2024-01-01 00:00:00")
      val changed = c
        .filter(col("c_custkey") % 5 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + lit(50.0))
      val fresh = c
        .filter(col("c_custkey") % 7 === 0)
        .withColumn("c_custkey", col("c_custkey") + lit(1000000L))
      val source = changed
        .unionByName(fresh)
        .withColumn("updated_at", lit("2024-06-01 00:00:00").cast("timestamp_ntz"))
      Merge
        .scd2Merge(target, source, "c_custkey", Seq("c_acctbal"))
    },

    // ---- D2 rule-driven DQ counts (reference: dq_checks.py:63-98)
    Q(
      "q07_dq_violation_counts",
      """SELECT * FROM (
        |  SELECT 'events' AS table_name, 'foreign_key' AS rule,
        |         'user_id' AS column_name,
        |         (SELECT count(*) FROM events e WHERE NOT EXISTS
        |            (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))
        |           AS violations
        |  UNION ALL
        |  SELECT 'lineitem', 'between', 'l_quantity',
        |         (SELECT count(*) FROM lineitem
        |          WHERE l_quantity IS NULL OR l_quantity NOT BETWEEN 5 AND 45)
        |  UNION ALL
        |  SELECT 'lineitem', 'foreign_key', 'l_partkey',
        |         (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |            (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        |  UNION ALL
        |  SELECT 'orders', 'not_null', 'o_orderdate',
        |         (SELECT count(*) FROM orders WHERE o_orderdate IS NULL)
        |  UNION ALL
        |  SELECT 'orders', 'unique', 'o_custkey',
        |         (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM
        |            (SELECT count(*) AS c FROM orders GROUP BY o_custkey
        |             HAVING count(*) > 1))
        |) ORDER BY table_name, rule, column_name""".stripMargin) { (spark, dir) =>
      import Quality._
      val li = Tables.lineitem(spark, dir)
      val o = Tables.orders(spark, dir)
      val ev = Tables.events(spark, dir)
      val cust = Tables.customer(spark, dir)
      val p = Tables.part(spark, dir)
      violationCounts(spark, Seq(
        (ForeignKey("events", "user_id", "customer", "c_custkey"), ev, cust),
        (Between("lineitem", "l_quantity", 5, 45), li, null),
        (ForeignKey("lineitem", "l_partkey", "part", "p_partkey"), li, p),
        (NotNull("orders", "o_orderdate"), o, null),
        (Unique("orders", "o_custkey"), o, null)))
    },

    // ---- U1/U2 quarantine of rule violators (reference: dq_checks.py:103-126)
    Q(
      "q08_dq_quarantine",
      """SELECT DISTINCT * FROM (
        |  SELECT l_orderkey, l_linenumber, 'between:l_quantity' AS violated_rule
        |  FROM lineitem WHERE l_quantity IS NULL OR l_quantity NOT BETWEEN 5 AND 45
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'between:l_discount'
        |  FROM lineitem WHERE l_discount IS NULL OR l_discount NOT BETWEEN 0.0 AND 0.08
        |) ORDER BY 1, 2, 3""".stripMargin) { (spark, dir) =>
      import Quality._
      val li = Tables.lineitem(spark, dir)
      quarantine(
        Seq(Between("lineitem", "l_quantity", 5, 45),
          Between("lineitem", "l_discount", 0.0, 0.08)),
        li, Seq("l_orderkey", "l_linenumber"))
    },

    // ---- T7/A1 watermark-incremental slice + advance (bronze_builder.py:78-128)
    Q(
      "q09_watermark_incremental",
      """SELECT count(*) AS n_rows, max(CAST(ts AS TIMESTAMP)) AS max_ts,
        |       count(DISTINCT user_id) AS n_users,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '2024-03-01 00:00:00'""".stripMargin) {
      (spark, dir) =>
        val slice = Incremental.slice(Tables.events(spark, dir), "ts", "2024-03-01 00:00:00")
        slice.agg(
          count(lit(1)).as("n_rows"),
          max(col("ts")).as("max_ts"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("value").cast(DecimalType(12, 2))).cast("double").as("total_value"))
    },

    // ---- W2 before/after version pairing (bronze_reader.py:105-122)
    Q(
      "q10_cdc_before_after",
      """SELECT user_id,
        |  max(CASE WHEN rn_first = 1 THEN event_type END) AS first_event_type,
        |  max(CASE WHEN rn_first = 1 THEN value END) AS first_value,
        |  max(CASE WHEN rn_last = 1 THEN event_type END) AS last_event_type,
        |  max(CASE WHEN rn_last = 1 THEN value END) AS last_value,
        |  count(*) AS n_versions,
        |  CASE WHEN count(*) = 1 THEN 'SINGLETON'
        |       WHEN max(CASE WHEN rn_first = 1 THEN event_type END)
        |          = max(CASE WHEN rn_last = 1 THEN event_type END) THEN 'UNCHANGED'
        |       ELSE 'CHANGED' END AS change_type
        |FROM (SELECT *,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn_first,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn_last
        |      FROM events)
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
      Windows
        .beforeAfter(Tables.events(spark, dir), "user_id", "ts", "event_id",
          Seq("event_type", "value"))
    },

    // ---- F2 Debezium envelope build + extract roundtrip (verify_spark.py:92-121)
    Q(
      "q11_debezium_roundtrip",
      """SELECT event_id, user_id, event_type, value, 'u' AS op
        |FROM events ORDER BY event_id""".stripMargin) { (spark, dir) =>
      val e = Tables.events(spark, dir)
      val env = e.select(
        Cdc.debeziumEnvelope(
          Seq(col("event_id"), col("user_id"), col("event_type"), col("value")),
          "u").as("json"))
      val after = StructType(Seq(
        StructField("event_id", LongType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType)))
      Cdc.debeziumAfter(env, "json", after)
    },

    // ---- P7/F1/F3 schema-validation DLQ split (kafka_DLQ.py:38-90)
    Q(
      "q12_dlq_split",
      """SELECT event_id,
        |  CASE WHEN ok THEN CAST(json_extract_string(p, '$.k') AS BIGINT) END AS k,
        |  CASE WHEN ok THEN 'valid' ELSE 'dlq' END AS status,
        |  CASE WHEN ok THEN NULL ELSE 'schema_parse_failed' END AS reason
        |FROM (SELECT event_id,
        |        CASE WHEN event_id % 7 = 0 THEN 'x' || props ELSE props END AS p,
        |        json_valid(CASE WHEN event_id % 7 = 0 THEN 'x' || props
        |                        ELSE props END) AS ok
        |      FROM events)
        |ORDER BY event_id""".stripMargin) { (spark, dir) =>
      val e = Tables.events(spark, dir)
      val corrupted = e.withColumn(
        "payload",
        when(col("event_id") % 7 === 0, concat(lit("x"), col("props")))
          .otherwise(col("props")))
      val schema = StructType(Seq(StructField("k", LongType)))
      Cdc
        .tagged(corrupted, "payload", schema)
        .select(col("event_id"), col("data.k").as("k"), col("status"), col("reason"))
    },

    // ---- F7/F8/F9 date math (silver_attrition_builder.py:98-123)
    Q(
      "q13_date_math_monthly",
      """SELECT date_trunc('month', o.o_orderdate) AS order_month,
        |  count(*) AS n_items,
        |  CAST(min(date_diff('day', CAST(o.o_orderdate AS DATE),
        |                     CAST(l.l_shipdate AS DATE))) AS INT) AS min_delay,
        |  CAST(max(date_diff('day', CAST(o.o_orderdate AS DATE),
        |                     CAST(l.l_shipdate AS DATE))) AS INT) AS max_delay,
        |  CAST(sum(date_diff('day', CAST(o.o_orderdate AS DATE),
        |                     CAST(l.l_shipdate AS DATE))) AS DOUBLE) / count(*)
        |    AS avg_delay
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
      val li = Tables.lineitem(spark, dir)
      val o = Tables.orders(spark, dir)
      val delay = datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        // DATE at the boundary: Spark date_trunc returns a timestamp
        // where DuckDB's returns DATE (round-9 gate hardening).
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
          .as("order_month"))
        .agg(
          count(lit(1)).as("n_items"),
          min(delay).as("min_delay"),
          max(delay).as("max_delay"),
          (sum(delay).cast("double") / count(lit(1))).as("avg_delay"))
    },

    // ---- D1 deterministic synthetic features (silver_attrition_builder.py:71-86)
    Q(
      "q14_synthetic_features",
      """SELECT c_custkey,
        |  ['Single','Married'][CAST(((c_custkey % 2147483647)*2654435761 + 1) % 2147483647 % 2 AS INT) + 1]
        |    AS marital_status,
        |  ['Remote','Office'][CAST(((c_custkey % 2147483647)*2654435761 + 2) % 2147483647 % 2 AS INT) + 1]
        |    AS persona,
        |  CAST(((c_custkey % 2147483647)*2654435761 + 3) % 2147483647 % 3 + 1 AS INT) AS travel_time_hrs,
        |  CAST(((c_custkey % 2147483647)*2654435761 + 4) % 2147483647 % 34 + 22 AS INT) AS age,
        |  ['Yes','No'][CAST(((c_custkey % 2147483647)*2654435761 + 5) % 2147483647 % 2 AS INT) + 1]
        |    AS overtime,
        |  CAST(((c_custkey % 2147483647)*2654435761 + 6) % 2147483647 % 5 + 1 AS INT) AS last_appraisal_score,
        |  CAST(((c_custkey % 2147483647)*2654435761 + 7) % 2147483647 % 21 AS INT) AS years_at_company
        |FROM customer ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      Facts
        .syntheticFeatures(Tables.customer(spark, dir).select("c_custkey"), "c_custkey")
    })
}
