package graft.queries

import graft.Tables
import graft.ops.Temporal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Temporal-join and multi-level aggregate queries: as-of join (the
  * natural SCD2 read-side query the reference materializes around),
  * point-in-interval range join via time binning, and ROLLUP subtotals.
  */
object TemporalQueries {

  val all: Seq[Q] = Seq(

    // ---- As-of join: every event attached to the latest "rate update"
    // (every 10th event) at-or-before it for the same user. One window
    // pass, one shuffle — the oracle uses DuckDB's native ASOF LEFT JOIN.
    Q(
      "q38_asof_join",
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |r AS (
        |  SELECT user_id, ts, value AS rate, event_id AS rate_event
        |  FROM e WHERE event_id % 10 = 0)
        |SELECT e.event_id, e.user_id, e.ts, e.value,
        |       r.rate AS right_rate, r.rate_event AS right_rate_event,
        |       r.ts AS right_ts
        |FROM e ASOF LEFT JOIN r
        |  ON e.user_id = r.user_id AND e.ts >= r.ts""".stripMargin) { (spark, dir) =>
      val e = Tables.events(spark, dir).select("event_id", "user_id", "ts", "value")
      val rates = e.filter(col("event_id") % 10 === 0)
        .select(col("user_id"), col("ts"),
          col("value").as("rate"), col("event_id").as("rate_event"))
      Temporal.asOfJoin(e, rates, "user_id", "ts", Seq("rate", "rate_event"), "rate_event")
    },

    // ---- Binned range join: events counted into 6-hour promo windows
    // (every 200th event opens one). The bin explode turns the range
    // predicate into an equi-join; oracle is the naive BETWEEN join.
    Q(
      "q39_range_join",
      """WITH w AS (
        |  SELECT event_id AS promo_id, CAST(ts AS TIMESTAMP) AS ws,
        |         CAST(ts AS TIMESTAMP) + INTERVAL 6 HOUR AS we
        |  FROM events WHERE event_id % 200 = 0),
        |e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
        |SELECT w.promo_id, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM e JOIN w ON e.ts BETWEEN w.ws AND w.we
        |GROUP BY 1""".stripMargin) { (spark, dir) =>
      val e = Tables.events(spark, dir).select("event_id", "ts", "value")
      val windows = e.filter(col("event_id") % 200 === 0)
        .select(col("event_id").as("promo_id"), col("ts").as("ws"),
          (col("ts") + expr("INTERVAL 6 HOURS")).as("we"))
      Temporal.binnedRangeJoin(e.drop("event_id"), windows, "ts", "ws", "we",
        binSeconds = 21600)
        .groupBy("promo_id")
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(12, 2))).cast("double").as("total_value"))
    },

    // ---- Set operations beyond the reference's UNION surface:
    // INTERSECT/EXCEPT with distinct-set semantics.
    Q(
      "q41_set_ops",
      """SELECT id FROM (
        |  SELECT c_custkey AS id FROM customer WHERE c_custkey <= 200
        |  INTERSECT
        |  SELECT user_id AS id FROM events)
        |EXCEPT
        |SELECT o_custkey AS id FROM orders
        |WHERE o_orderkey % 2 = 0 AND o_custkey <= 50""".stripMargin) { (spark, dir) =>
      val active = Tables.customer(spark, dir)
        .filter(col("c_custkey") <= 200).select(col("c_custkey").as("id"))
      val seen = Tables.events(spark, dir).select(col("user_id").as("id"))
      val excluded = Tables.orders(spark, dir)
        .filter(col("o_orderkey") % 2 === 0 && col("o_custkey") <= 50)
        .select(col("o_custkey").as("id"))
      active.intersect(seen).except(excluded)
    },

    // ---- ROLLUP subtotals (multi-level aggregate; beyond the
    // reference's flat GROUP BYs): per-month, per-year, and grand total.
    Q(
      "q40_rollup",
      """SELECT CAST(year(o_orderdate) AS INT) AS year,
        |       CAST(month(o_orderdate) AS INT) AS month,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY ROLLUP (year, month)""".stripMargin) { (spark, dir) =>
      Tables.orders(spark, dir)
        .rollup(
          year(col("o_orderdate")).cast("int").as("year"),
          month(col("o_orderdate")).cast("int").as("month"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total_price"))
    },

    // ---- NATIVE AS-OF JOIN (L178): each event joined to the user's
    // most recent prior purchase through the engine's OWN physical
    // operator — AsOfMarker → AsOfRewrite (resolution rule) →
    // AsOfJoinStrategy → AsOfJoinExec, the whole-operator extension
    // path (LogicalPlan + Rule + Strategy + SparkPlan via
    // SparkSessionExtensions). The exec co-partitions both sides on the
    // key and streams a per-partition merge holding ONE candidate right
    // row — each side shuffles in its own shape, unlike the q38
    // union+window composition. The oracle is DuckDB's NATIVE ASOF
    // LEFT JOIN: two independent as-of implementations must agree row
    // for row. (user_id, us) is deduplicated on the right first so
    // neither engine's tie policy is exercised.
    Q(
      "q197_native_asof_join",
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    event_type, value
        |  FROM events),
        |p AS (
        |  SELECT user_id, us, arg_max(value, event_id) AS pvalue
        |  FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT e.event_id, e.us, p.us AS purchase_us,
        |  p.pvalue AS purchase_value
        |FROM e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.us >= p.us""".stripMargin) {
      (spark, dir) =>
      val ev = Tables.events(spark, dir).select(col("event_id"),
        col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_type"), col("value"))
      val l = ev.select("event_id", "user_id", "us")
      // distinct right-side names keep the self-derived join unambiguous
      val r = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "us")
        .agg(max(struct(col("event_id"), col("value"))).as("_m"))
        .select(col("user_id").as("r_user"), col("us").as("r_us"),
          col("_m.event_id").as("pid"), col("_m.value").as("pvalue"))
      // the declarative marker surface the resolution rule recognizes
      l.join(r, col("user_id") === col("r_user") &&
          call_function("graft_asof", col("us"), col("r_us"), col("pid")))
        .select(col("event_id"), col("us"), col("r_us").as("purchase_us"),
          col("pvalue").as("purchase_value"))
    })
}
