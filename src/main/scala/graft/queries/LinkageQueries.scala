package graft.queries

import graft.Tables
import graft.functions.ExactRound
import graft.ops.{Components, Linkage, Sample, Similarity}
import org.apache.spark.sql.functions._

/** Identity, structure and observability layer (round 8): cross-table
  * entity resolution and FK discovery, link analysis over interaction
  * graphs, corpus drift monitoring, distribution alignment (quantile
  * normalize/calibrate), two-stage retrieval (JL projection + rerank),
  * collocation mining, deterministic negative sampling, robust
  * (winsorized) profiling, and behavioral analytics (funnel, cohort
  * retention) — the operators a continuously-rebuilt 100 TB training
  * set needs on top of curation (builder brief). Every operator is
  * oracle-checked end to end; every numeric presentation follows the
  * ExactRound integer-space discipline so results are bit-identical
  * across engines.
  */
object LinkageQueries {

  /** q127 oracle — also the oracle for q133 (the STREAMED
    * maintenance of the same drift table must land on identical
    * values; sharing the string makes that exactness literal). */
  private[queries] val driftSql: String =
    """WITH v1 AS (SELECT lang, source, n_chars FROM documents WHERE doc_id % 10 <> 0),
          |v2 AS (SELECT lang, source, n_chars FROM documents WHERE doc_id % 7 <> 0),
          |a AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_v1,
          |        CAST(sum(n_chars) AS BIGINT) AS chars_v1
          |      FROM v1 GROUP BY lang, source),
          |b AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_v2,
          |        CAST(sum(n_chars) AS BIGINT) AS chars_v2
          |      FROM v2 GROUP BY lang, source),
          |t AS (SELECT (SELECT count(*) FROM v1) AS t1, (SELECT count(*) FROM v2) AS t2),
          |j AS (SELECT coalesce(a.lang, b.lang) AS lang,
          |        coalesce(a.source, b.source) AS source,
          |        coalesce(n_v1, 0) AS n_v1, coalesce(n_v2, 0) AS n_v2,
          |        coalesce(chars_v1, 0) AS chars_v1, coalesce(chars_v2, 0) AS chars_v2
          |      FROM a FULL OUTER JOIN b ON a.lang = b.lang AND a.source = b.source)
          |SELECT lang, source, n_v1, n_v2,
          |  CAST(CASE WHEN n_v1 > 0 THEN
          |    ((2 * chars_v1 * 1000000 + n_v1) // (2 * n_v1))
          |      * CAST(0.000001 AS DECIMAL(7,6)) END AS DOUBLE) AS mean_chars_v1,
          |  CAST(CASE WHEN n_v2 > 0 THEN
          |    ((2 * chars_v2 * 1000000 + n_v2) // (2 * n_v2))
          |      * CAST(0.000001 AS DECIMAL(7,6)) END AS DOUBLE) AS mean_chars_v2,
          |  CAST(((2 * n_v1 * 1000000 + t1) // (2 * t1))
          |    * CAST(0.000001 AS DECIMAL(7,6)) AS DOUBLE) AS share_v1,
          |  CAST(((2 * n_v2 * 1000000 + t2) // (2 * t2))
          |    * CAST(0.000001 AS DECIMAL(7,6)) AS DOUBLE) AS share_v2,
          |  CAST(((2 * n_v2 * 1000000 + t2) // (2 * t2))
          |    * CAST(0.000001 AS DECIMAL(7,6))
          |  - ((2 * n_v1 * 1000000 + t1) // (2 * t1))
          |    * CAST(0.000001 AS DECIMAL(7,6)) AS DOUBLE) AS share_drift
          |FROM j CROSS JOIN t""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- Blocked RECORD LINKAGE (Fellegi–Sunter shape): resolve a
    // deterministically-corrupted twin of `customer` (keys re-minted,
    // last name char leet-mangled) back to the clean table. Blocking =
    // equi-join on (nation, name-minus-last-char) — a key the corruption
    // model cannot touch, so candidates stay linear (no cross join; the
    // spec measures blocking recall = 1 against ground truth). Scoring =
    // weighted field agreements (edit distance ≤ 1 on name, segment
    // equality, exact balance), match at score ≥ 5. Every term is
    // integer-valued — no rounding surface at the oracle boundary.
    Q(
      "q125_record_linkage",
      """WITH cl AS (
        |  SELECT c_custkey AS a_key, c_name AS a_name, c_nationkey AS nk,
        |    c_mktsegment AS a_seg, c_acctbal AS a_bal,
        |    substr(c_name, 1, length(c_name)-1) AS blk
        |  FROM customer),
        |dr AS (
        |  SELECT c_custkey + 9000000 AS b_key,
        |    substr(c_name, 1, length(c_name)-1) ||
        |      translate(substr(c_name, length(c_name), 1),
        |                '0123456789', 'OIZEASGTBP') AS b_name,
        |    c_nationkey AS nk, c_mktsegment AS b_seg, c_acctbal AS b_bal,
        |    substr(c_name, 1, length(c_name)-1) AS blk
        |  FROM customer),
        |cand AS (
        |  SELECT a_key, b_key,
        |    CAST(levenshtein(a_name, b_name) AS INT) AS lev_name,
        |    CAST(CASE WHEN a_seg = b_seg THEN 1 ELSE 0 END AS INT) AS seg_agree,
        |    CAST(CASE WHEN a_bal = b_bal THEN 1 ELSE 0 END AS INT) AS bal_agree
        |  FROM cl JOIN dr USING (blk, nk))
        |SELECT a_key, b_key, lev_name, seg_agree, bal_agree,
        |  CAST(3 * (CASE WHEN lev_name <= 1 THEN 1 ELSE 0 END)
        |    + seg_agree + 2 * bal_agree AS INT) AS score
        |FROM cand
        |WHERE 3 * (CASE WHEN lev_name <= 1 THEN 1 ELSE 0 END)
        |    + seg_agree + 2 * bal_agree >= 5""".stripMargin) { (spark, dir) =>
      val c = Tables.customer(spark, dir)
      val blk = expr("substring(c_name, 1, length(c_name)-1)")
      val clean = c.select(
        col("c_custkey").as("a_key"), col("c_name").as("a_name"),
        col("c_nationkey").as("nk"), col("c_mktsegment").as("a_seg"),
        col("c_acctbal").as("a_bal"), blk.as("blk"))
      val dirty = c.select(
        (col("c_custkey") + 9000000L).as("b_key"),
        concat(blk, translate(
          col("c_name").substr(length(col("c_name")), lit(1)),
          "0123456789", "OIZEASGTBP")).as("b_name"),
        col("c_nationkey").as("nk"), col("c_mktsegment").as("b_seg"),
        col("c_acctbal").as("b_bal"), blk.as("blk"))
      Linkage.blockAndScore(clean, dirty, Seq("blk", "nk"), Seq(
          (levenshtein(col("a_name"), col("b_name")) <= 1, 3),
          (col("a_seg") === col("b_seg"), 1),
          (col("a_bal") === col("b_bal"), 2)),
          threshold = 5)
        .select(col("a_key"), col("b_key"),
          levenshtein(col("a_name"), col("b_name")).cast("int").as("lev_name"),
          (col("a_seg") === col("b_seg")).cast("int").as("seg_agree"),
          (col("a_bal") === col("b_bal")).cast("int").as("bal_agree"),
          col("score"))
    },

    // ---- PAGERANK over the customer↔supplier interaction graph (edges
    // from orders ⋈ lineitem, symmetric), 3 iterations in scaled-integer
    // arithmetic — see Components.pageRank for why integer: a float rank
    // is merge-order-nondeterministic under partial aggregation. Each
    // iteration is the Pregel join+agg shape; the oracle unrolls the
    // identical three iterations over HUGEINT floor division.
    Q(
      "q126_pagerank",
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey AS src, l_suppkey + 10000000 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
        |        FROM e GROUP BY src),
        |r0 AS (SELECT src, CAST(1000000000 AS BIGINT) AS pr FROM deg),
        |r1 AS (SELECT e.dst AS src,
        |    CAST(150000000 + (85 * sum(r.pr // d.outdeg)) // 100 AS BIGINT) AS pr
        |  FROM e JOIN r0 r ON e.src = r.src JOIN deg d ON e.src = d.src
        |  GROUP BY e.dst),
        |r2 AS (SELECT e.dst AS src,
        |    CAST(150000000 + (85 * sum(r.pr // d.outdeg)) // 100 AS BIGINT) AS pr
        |  FROM e JOIN r1 r ON e.src = r.src JOIN deg d ON e.src = d.src
        |  GROUP BY e.dst),
        |r3 AS (SELECT e.dst AS src,
        |    CAST(150000000 + (85 * sum(r.pr // d.outdeg)) // 100 AS BIGINT) AS pr
        |  FROM e JOIN r2 r ON e.src = r.src JOIN deg d ON e.src = d.src
        |  GROUP BY e.dst)
        |SELECT src AS node_id, pr FROM r3""".stripMargin) { (spark, dir) =>
      val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
      val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      val e0 = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 10000000L).as("dst"))
        .distinct()
      // symmetric; custkey/suppkey id ranges are disjoint so no dedup needed
      val e = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      Components.pageRank(e, "src", "dst", iters = 3)
    },

    // ---- WARM-START PAGERANK MAINTENANCE: the graph twin of the
    // incremental-view folds (q100/q103) — an edge batch arrives
    // (orders with o_orderkey % 5 = 0 join the standing interaction
    // graph) and the rank vector is maintained by TWO warm iterations
    // from yesterday's fixpoint instead of a cold restart (the standing
    // vector is already near the new fixpoint everywhere the batch
    // didn't touch; warm-starting changes the iteration COUNT, not the
    // per-iteration Pregel cost — the only maintenance shape that works
    // when the graph is 100 TB). New nodes seed at the uniform 1e9.
    // Same scaled-integer recurrence as q126, so the maintained vector
    // is a pure function of (standing, edges, iters) — the oracle
    // unrolls 3 cold iterations on the standing graph then the 2 warm
    // ones on the full graph, bit-identical.
    Q(
      "q291_pagerank_warm_start",
      """WITH e0a AS (
        |  SELECT DISTINCT o_custkey AS src, l_suppkey + 10000000 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderkey % 5 <> 0),
        |ea AS (SELECT src, dst FROM e0a UNION ALL SELECT dst, src FROM e0a),
        |dega AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
        |         FROM ea GROUP BY src),
        |r0 AS (SELECT src, CAST(1000000000 AS BIGINT) AS pr FROM dega),
        |r1 AS (SELECT e.dst AS src,
        |    CAST(150000000 + (85 * sum(r.pr // d.outdeg)) // 100 AS BIGINT) AS pr
        |  FROM ea e JOIN r0 r ON e.src = r.src JOIN dega d ON e.src = d.src
        |  GROUP BY e.dst),
        |r2 AS (SELECT e.dst AS src,
        |    CAST(150000000 + (85 * sum(r.pr // d.outdeg)) // 100 AS BIGINT) AS pr
        |  FROM ea e JOIN r1 r ON e.src = r.src JOIN dega d ON e.src = d.src
        |  GROUP BY e.dst),
        |r3 AS (SELECT e.dst AS src,
        |    CAST(150000000 + (85 * sum(r.pr // d.outdeg)) // 100 AS BIGINT) AS pr
        |  FROM ea e JOIN r2 r ON e.src = r.src JOIN dega d ON e.src = d.src
        |  GROUP BY e.dst),
        |e0b AS (
        |  SELECT DISTINCT o_custkey AS src, l_suppkey + 10000000 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |eb AS (SELECT src, dst FROM e0b UNION ALL SELECT dst, src FROM e0b),
        |degb AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
        |         FROM eb GROUP BY src),
        |w0 AS (SELECT d.src, COALESCE(r3.pr, 1000000000) AS pr
        |       FROM degb d LEFT JOIN r3 ON d.src = r3.src),
        |w1 AS (SELECT e.dst AS src,
        |    CAST(150000000 + (85 * sum(r.pr // d.outdeg)) // 100 AS BIGINT) AS pr
        |  FROM eb e JOIN w0 r ON e.src = r.src JOIN degb d ON e.src = d.src
        |  GROUP BY e.dst),
        |w2 AS (SELECT e.dst AS src,
        |    CAST(150000000 + (85 * sum(r.pr // d.outdeg)) // 100 AS BIGINT) AS pr
        |  FROM eb e JOIN w1 r ON e.src = r.src JOIN degb d ON e.src = d.src
        |  GROUP BY e.dst)
        |SELECT src AS node_id, pr FROM w2""".stripMargin) { (spark, dir) =>
      val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
      val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      def edgesOf(ord: org.apache.spark.sql.DataFrame) = {
        val e0 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_suppkey") + 10000000L).as("dst"))
          .distinct()
        e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      }
      // shuffle sized to the EDGE volume, not the CPU count: at sf10 the
      // symmetric edge list is ~1e8 rows and each iteration's (dst, sum)
      // hash aggregate must fit its slice in a task — 32 fat partitions
      // exhausted unified memory (UNABLE_TO_ACQUIRE at sf10), while 256
      // un-coalesced partitions cost ~2x scheduling overhead at sf0.1.
      // Cost-based: the footer-fast orders count picks the width (the
      // same measure-then-pick move as the small-graph gate).
      val big = o.count() > 2000000L
      def run() = {
        val standing = Components.pageRankFrom(
          edgesOf(o.filter(col("o_orderkey") % 5 =!= 0)), "src", "dst",
          init = None, iters = 3, diskEdges = big)
        Components.pageRankFrom(edgesOf(o), "src", "dst",
          init = Some(standing), iters = 2, diskEdges = big)
          .localCheckpoint()
      }
      if (big) graft.Sessions.withWideAggPartitions(spark, 256)(run())
      else run()
    },

    // ---- CORPUS DRIFT MONITOR: compare two corpus versions (deterministic
    // overlapping subsets standing in for yesterday's and today's build)
    // per (lang, source) cell — document counts, corpus share, mean doc
    // length. The observability pass a recurring corpus build runs to
    // catch a source silently changing mix or length profile. One
    // aggregate per version + a broadcast scalar join for the totals
    // (never a single-partition window); shares/means presented via
    // ExactRound integer-space rounding, drift as exact decimal
    // subtraction — no float crosses the oracle boundary.
    Q(
      "q127_corpus_drift",
      driftSql) { (spark, dir) =>
      val docs = Tables.documents(spark, dir)
      val v1 = docs.filter(col("doc_id") % 10 =!= 0)
      val v2 = docs.filter(col("doc_id") % 7 =!= 0)
      def cell(v: org.apache.spark.sql.DataFrame, n: String, ch: String) =
        v.groupBy("lang", "source")
          .agg(count(lit(1)).as(n), sum("n_chars").as(ch))
      val t1 = v1.agg(count(lit(1)).as("t1"))
      val t2 = v2.agg(count(lit(1)).as("t2"))
      val j = cell(v1, "n_v1", "chars_v1")
        .join(cell(v2, "n_v2", "chars_v2"), Seq("lang", "source"), "full_outer")
        .na.fill(0L, Seq("n_v1", "n_v2", "chars_v1", "chars_v2"))
        .crossJoin(broadcast(t1)).crossJoin(broadcast(t2))
      val share1 = ExactRound.roundRatio(col("n_v1"), col("t1"), 6)
      val share2 = ExactRound.roundRatio(col("n_v2"), col("t2"), 6)
      // DOUBLE at the boundary (round-9): exact decimal→double under
      // ExactRound rule 2; the drift difference stays in decimal space
      // and only the final value is converted.
      j.select(col("lang"), col("source"), col("n_v1"), col("n_v2"),
        when(col("n_v1") > 0,
          ExactRound.roundRatio(col("chars_v1"), col("n_v1"), 6))
          .cast("double").as("mean_chars_v1"),
        when(col("n_v2") > 0,
          ExactRound.roundRatio(col("chars_v2"), col("n_v2"), 6))
          .cast("double").as("mean_chars_v2"),
        share1.cast("double").as("share_v1"),
        share2.cast("double").as("share_v2"),
        (share2 - share1).cast("double").as("share_drift"))
    },

    // ---- INCLUSION-DEPENDENCY DISCOVERY: exact containment of one
    // column's domain in another's, over a candidate catalog of key
    // pairs — the FK/schema-discovery pass a data catalog runs over
    // landed feeds (the reference trusts its warehouse DDL; a 100 TB
    // lake must discover constraints). Distinct + anti-join per pair;
    // at scale, the KMV containment estimate (q110's sketch machinery)
    // prunes the candidate pairs first and only plausible inclusions
    // get the exact confirm — the q101 estimate-then-confirm shape.
    // The catalog deliberately includes a NON-inclusion (customers
    // without orders) so the detector's negative path is oracle-checked.
    Q(
      "q128_inclusion_deps", {
        def pair(dep: String, a: String, ac: String, b: String, bc: String) =
          s"""SELECT '$dep' AS dep, n_distinct, n_missing,
             |  CAST(((2 * (n_distinct - n_missing) * 1000000 + n_distinct)
             |    // (2 * n_distinct))
             |    * CAST(0.000001 AS DECIMAL(7,6)) AS DOUBLE) AS containment,
             |  n_missing = 0 AS is_inclusion
             |FROM (SELECT
             |  (SELECT CAST(count(DISTINCT $ac) AS BIGINT) FROM $a) AS n_distinct,
             |  (SELECT CAST(count(*) AS BIGINT) FROM
             |    (SELECT DISTINCT $ac FROM $a
             |     EXCEPT SELECT DISTINCT $bc FROM $b) x) AS n_missing) s""".stripMargin
        Seq(
          pair("orders.o_custkey<customer.c_custkey",
            "orders", "o_custkey", "customer", "c_custkey"),
          pair("lineitem.l_orderkey<orders.o_orderkey",
            "lineitem", "l_orderkey", "orders", "o_orderkey"),
          pair("lineitem.l_suppkey<supplier.s_suppkey",
            "lineitem", "l_suppkey", "supplier", "s_suppkey"),
          pair("lineitem.l_partkey<part.p_partkey",
            "lineitem", "l_partkey", "part", "p_partkey"),
          pair("customer.c_nationkey<nation.n_nationkey",
            "customer", "c_nationkey", "nation", "n_nationkey"),
          pair("customer.c_custkey<orders.o_custkey",
            "customer", "c_custkey", "orders", "o_custkey"))
          .mkString("\nUNION ALL\n")
      }) { (spark, dir) =>
      val catalog: Seq[(String, org.apache.spark.sql.DataFrame, String,
          org.apache.spark.sql.DataFrame, String)] = Seq(
        ("orders.o_custkey<customer.c_custkey",
          Tables.orders(spark, dir), "o_custkey",
          Tables.customer(spark, dir), "c_custkey"),
        ("lineitem.l_orderkey<orders.o_orderkey",
          Tables.lineitem(spark, dir), "l_orderkey",
          Tables.orders(spark, dir), "o_orderkey"),
        ("lineitem.l_suppkey<supplier.s_suppkey",
          Tables.lineitem(spark, dir), "l_suppkey",
          Tables.supplier(spark, dir), "s_suppkey"),
        ("lineitem.l_partkey<part.p_partkey",
          Tables.lineitem(spark, dir), "l_partkey",
          Tables.part(spark, dir), "p_partkey"),
        ("customer.c_nationkey<nation.n_nationkey",
          Tables.customer(spark, dir), "c_nationkey",
          Tables.nation(spark, dir), "n_nationkey"),
        ("customer.c_custkey<orders.o_custkey",
          Tables.customer(spark, dir), "c_custkey",
          Tables.orders(spark, dir), "o_custkey"))
      catalog.map { case (dep, a, ac, b, bc) =>
        Linkage.containment(a, ac, b, bc)
          .select(lit(dep).as("dep"), col("n_distinct"), col("n_missing"),
            ExactRound.roundRatio(col("n_distinct") - col("n_missing"),
              col("n_distinct"), 6).cast("double").as("containment"),
            (col("n_missing") === 0L).as("is_inclusion"))
      }.reduce(_ unionByName _)
    },

    // ---- QUANTILE NORMALIZATION: exact global percentile of every
    // order's total price — the transform a per-source quality score
    // gets before cross-source thresholding ("keep the global top 10%",
    // not "top 10% of each source's own scale"). The global rank comes
    // from the two-phase prefix-sum machinery (range-partition + sort,
    // driver-prefixed per-partition counts — NO single-partition
    // window; Sample.quantileNormalize), and the percentile is rounded
    // in integer space. The oracle is DuckDB's row_number over the
    // same total order.
    Q(
      "q129_quantile_normalize",
      """WITH r AS (
        |  SELECT o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey)
        |      AS BIGINT) AS rnk,
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n
        |  FROM orders)
        |SELECT o_orderkey, rnk,
        |  CAST(((2 * rnk * 1000000 + n) // (2 * n))
        |    * CAST(0.000001 AS DECIMAL(7,6)) AS DOUBLE) AS pct
        |FROM r""".stripMargin) { (spark, dir) =>
      Sample.quantileNormalize(
          Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
          Seq(col("o_totalprice"), col("o_orderkey")))
        .select(col("o_orderkey"), col("rnk"), col("pct").cast("double").as("pct"))
    },

    // ---- JL RANDOM PROJECTION with exact RERANK (Achlioptas ±1
    // planes): shrink the 64-d embedding to 16-d with a scan-level
    // projection, SHORTLIST top-50 per query in the cheap space, then
    // exact-rerank only the shortlist in full precision — the
    // production two-stage retrieval shape (full-space work drops from
    // |corpus| to 50 per query). Planes come from the SAME det-hash
    // family as the LSH hyperplanes (disjoint ids), projection is one
    // compiled dot per output dim against a plane literal, fold order
    // is index order on both engines — so the oracle replays
    // projection, shortlist, rerank, recall AND the JL
    // distance-preservation diagnostic (Σ|cosΔ| over the shortlist,
    // per-pair rounding absorbed in a DECIMAL sum — the q65 recipe)
    // bit for bit. The fixture's embeddings are near-isotropic (every
    // margin tiny — the adversarial case for any sketch), so the
    // measured recall@5 ≈ 0.26 vs 0.01 for a random shortlist; the
    // measurement, not a pretty number, is the contract.
    Q(
      "q130_random_projection", {
        def dotSql(n: Int)(a: String, b: String) = LlmQueries.foldSumSql(
          s"list_transform(range(1, ${n + 1}), i -> $a[i]*$b[i])",
          "CAST(0 AS DOUBLE)")
        def projSql(j: Int) = LlmQueries.foldSumSql(
          s"""list_transform(range(1, 65), i -> dv[i] *
             |      (CASE WHEN ((${1000 + j}*64 + (i-1)) * ${graft.ops.Text.Mult})
             |         % ${graft.ops.Text.P} % 2 = 0
             |       THEN 1.0 ELSE -1.0 END))""".stripMargin,
          "CAST(0 AS DOUBLE)")
        s"""WITH v AS (
           |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
           |  FROM embeddings),
           |p AS (SELECT vec_id,
           |  [${(0 until 16).map(projSql).mkString(",\n   ")}] AS pv
           |  FROM v),
           |aps AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |    ${dotSql(16)("q.pv", "c.pv")}
           |      / (sqrt(${dotSql(16)("q.pv", "q.pv")})
           |         * sqrt(${dotSql(16)("c.pv", "c.pv")})) AS cos_p
           |  FROM p q, p c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
           |shortl AS (SELECT query_id, neighbor_id, cos_p FROM (
           |  SELECT query_id, neighbor_id, cos_p,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY cos_p DESC, neighbor_id) AS rn
           |  FROM aps) y WHERE rn <= 50),
           |rr AS (
           |  SELECT s.query_id, s.neighbor_id, s.cos_p,
           |    ${dotSql(64)("q.dv", "c.dv")}
           |      / (sqrt(${dotSql(64)("q.dv", "q.dv")})
           |         * sqrt(${dotSql(64)("c.dv", "c.dv")})) AS cos_f
           |  FROM shortl s JOIN v q ON q.vec_id = s.query_id
           |    JOIN v c ON c.vec_id = s.neighbor_id),
           |t5 AS (SELECT query_id, neighbor_id FROM (
           |  SELECT query_id, neighbor_id,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY cos_f DESC, neighbor_id) AS rn
           |  FROM rr) z WHERE rn <= 5),
           |es AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |    ${dotSql(64)("q.dv", "c.dv")}
           |      / (sqrt(${dotSql(64)("q.dv", "q.dv")})
           |         * sqrt(${dotSql(64)("c.dv", "c.dv")})) AS cos
           |  FROM v q, v c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
           |ek AS (SELECT query_id, neighbor_id FROM (
           |  SELECT query_id, neighbor_id,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY cos DESC, neighbor_id) AS rn
           |  FROM es) w WHERE rn <= 5),
           |err AS (SELECT query_id,
           |    sum(CAST(round(abs(cos_p - cos_f), 9) AS DECIMAL(12,9)))
           |      AS sum_abs_err
           |  FROM rr GROUP BY query_id)
           |SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_exact,
           |  CAST(count(t.neighbor_id) AS BIGINT) AS n_hit,
           |  CAST(((2 * CAST(count(t.neighbor_id) AS BIGINT) * 1000000 + count(*))
           |    // (2 * count(*)))
           |    * CAST(0.000001 AS DECIMAL(7,6)) AS DOUBLE) AS recall,
           |  CAST(round(any_value(err.sum_abs_err), 6) AS DOUBLE) AS sum_abs_err
           |FROM ek e LEFT JOIN t5 t
           |  ON t.query_id = e.query_id AND t.neighbor_id = e.neighbor_id
           |JOIN err ON err.query_id = e.query_id
           |GROUP BY e.query_id""".stripMargin
      }) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val e = Tables.embeddings(spark, dir)
      val proj = e.select(col("vec_id"),
        Similarity.randomProjection(
          Similarity.toDouble(col("embedding")), 16, 64).as("pv"))
      val short = Similarity
        .topKBruteForce(proj, proj.filter(col("vec_id") < 10), "vec_id", "pv", 50)
        .select(col("query_id"), col("neighbor_id"), col("cos").as("cos_p"))
      // rerank: full-precision cosine over the 50-pair shortlist only —
      // the shortlist is tiny (|q|·50), so both vector joins broadcast it
      val dvs = e.select(col("vec_id"),
          Similarity.toDouble(col("embedding")).as("dv"))
        .withColumn("nrm", sqrt(Similarity.dot(col("dv"), col("dv"))))
      val rr = short
        .join(dvs.select(col("vec_id").as("query_id"), col("dv").as("qv"),
          col("nrm").as("qn")), "query_id")
        .join(dvs.select(col("vec_id").as("neighbor_id"), col("dv").as("nv"),
          col("nrm").as("nn")), "neighbor_id")
        .withColumn("cos_f",
          Similarity.dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
        .select("query_id", "neighbor_id", "cos_p", "cos_f")
        .localCheckpoint() // split below into top-5 and the error sum
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos_f").desc, col("neighbor_id"))
      val t5 = rr.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("query_id", "neighbor_id").withColumn("hit", lit(1L))
      // per-pair scale-9 rounds absorbed in the DECIMAL sum, then the
      // final presentation rounds COARSER (6dp, round-9 advice): a
      // Spark/DuckDB tie flip at scale 9 moves the sum by 1e-9, which
      // the 6dp decimal-space round absorbs (both engines round
      // decimals half-away-from-zero, exactly). DOUBLE at the boundary.
      val err = rr.groupBy("query_id")
        .agg(sum(round(abs(col("cos_p") - col("cos_f")), 9)
          .cast(DecimalType(12, 9))).as("s9"))
        .select(col("query_id"),
          round(col("s9"), 6).cast("double").as("sum_abs_err"))
      val exact = Similarity
        .topKBruteForce(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id")
      exact.join(t5, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .withColumn("recall",
          ExactRound.roundRatio(col("n_hit"), col("n_exact"), 6)
            .cast("double"))
        .join(err, "query_id")
        .select("query_id", "n_exact", "n_hit", "recall", "sum_abs_err")
    },

    // ---- COLLOCATION MINING: top-30 co-occurring token pairs with
    // exact lift — the phrase/entity-structure pass that finds terms
    // systematically appearing together (boilerplate templates, multi-
    // word entities) across the corpus. Per-doc token sets are capped
    // deterministically (distinct, length ≥ 4, sorted, first 15), so
    // pair expansion is ≤ C(15,2) per doc — LINEAR in the corpus, and
    // generated by a scan-level HOF (flatten∘transform over the sorted
    // list), not a self-join: zero shuffles before the pair count.
    // Marginals join back (AQE broadcasts the small vocab side);
    // top-30 is a TakeOrdered heap with a total-order tiebreak; lift
    // = N·c_ab / (c_a·c_b) rounds in integer space.
    Q(
      "q131_collocations",
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    list_sort(list_distinct(list_filter(${LlmQueries.toksSql},
         |      t -> length(t) >= 4)))[1:15] AS lst
         |  FROM documents),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |tok AS (SELECT doc_id, unnest(lst) AS t FROM toks),
         |marg AS (SELECT t, CAST(count(*) AS BIGINT) AS n_t FROM tok GROUP BY t),
         |pairs AS (
         |  SELECT a.doc_id, a.t AS tok_a, b.t AS tok_b
         |  FROM tok a JOIN tok b USING (doc_id) WHERE a.t < b.t),
         |pc AS (SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) AS n_ab
         |       FROM pairs GROUP BY tok_a, tok_b)
         |SELECT tok_a, tok_b, n_ab, ma.n_t AS n_a, mb.n_t AS n_b,
         |  CAST(((2 * n.n_docs * n_ab * 1000000 + ma.n_t * mb.n_t)
         |    // (2 * ma.n_t * mb.n_t))
         |    * CAST(0.000001 AS DECIMAL(18,6)) AS DOUBLE) AS lift
         |FROM pc JOIN marg ma ON ma.t = tok_a JOIN marg mb ON mb.t = tok_b
         |CROSS JOIN n
         |ORDER BY n_ab DESC, tok_a, tok_b LIMIT 30""".stripMargin) {
      (spark, dir) =>
      val docs = Tables.documents(spark, dir)
      val lst = slice(array_sort(array_distinct(
        filter(graft.ops.Text.tokens(col("text")),
          t => length(t) >= 4))), 1, 15)
      val toks = docs.select(col("doc_id"), lst.as("lst"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val tok = toks.select(col("doc_id"), explode(col("lst")).as("t"))
      val marg = tok.groupBy("t").agg(count(lit(1)).as("n_t"))
      // scan-level pair expansion over the sorted capped list — the HOF
      // replaces the oracle's per-doc self-join with zero shuffles
      val pairs = toks.select(explode(expr(
        "flatten(transform(lst, (x, i) -> " +
          "transform(slice(lst, i + 2, size(lst)), " +
          "y -> struct(x AS a, y AS b))))")).as("p"))
        .select(col("p.a").as("tok_a"), col("p.b").as("tok_b"))
      val pc = pairs.groupBy("tok_a", "tok_b").agg(count(lit(1)).as("n_ab"))
      pc.join(marg.select(col("t").as("tok_a"), col("n_t").as("n_a")), "tok_a")
        .join(marg.select(col("t").as("tok_b"), col("n_t").as("n_b")), "tok_b")
        .crossJoin(broadcast(n))
        .select(col("tok_a"), col("tok_b"), col("n_ab"), col("n_a"), col("n_b"),
          ExactRound.roundRatio(col("n_docs") * col("n_ab"),
            col("n_a") * col("n_b"), 6).cast("double").as("lift"))
        .orderBy(col("n_ab").desc, col("tok_a"), col("tok_b"))
        .limit(30)
    },

    // ---- QUANTILE CALIBRATION (quantile mapping): align one source's
    // score distribution onto another's by exact rank arithmetic — the
    // cross-source normalization that makes per-source quality scores
    // comparable before a global threshold (a 'de' doc's length is
    // mapped to the 'en' length at the same percentile). Ranks on both
    // sides come from the no-single-partition prefix-sum machinery;
    // target rank = ⌈rnk_b·n_a/n_b⌉ in pure integer arithmetic; the
    // calibrated value is A's order statistic at that rank (one equi-
    // join on rank). Everything is integer-exact — no rounding surface.
    Q(
      "q132_quantile_calibration",
      """WITH a AS (
        |  SELECT doc_id, n_chars,
        |    CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rnk,
        |    (SELECT CAST(count(*) AS BIGINT) FROM documents
        |     WHERE lang = 'en') AS n
        |  FROM documents WHERE lang = 'en'),
        |b AS (
        |  SELECT doc_id, n_chars,
        |    CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rnk,
        |    (SELECT CAST(count(*) AS BIGINT) FROM documents
        |     WHERE lang = 'de') AS n
        |  FROM documents WHERE lang = 'de')
        |SELECT b.doc_id, b.n_chars, b.rnk AS rnk_b,
        |  (b.rnk * a0.n + b.n - 1) // b.n AS target_rnk,
        |  a.n_chars AS calibrated_chars
        |FROM b
        |CROSS JOIN (SELECT any_value(n) AS n FROM a) a0
        |JOIN a ON a.rnk = (b.rnk * a0.n + b.n - 1) // b.n""".stripMargin) {
      (spark, dir) =>
      val docs = Tables.documents(spark, dir)
      def ranked(lang: String) = Sample.quantileNormalize(
        docs.filter(col("lang") === lang).select("doc_id", "n_chars"),
        Seq(col("n_chars"), col("doc_id")))
      val a = ranked("en").select(col("rnk").as("rnk_a"),
        col("n_chars").as("calibrated_chars"))
      val b = ranked("de").select(col("doc_id"), col("n_chars"), col("rnk"))
      val nA = a.agg(count(lit(1)).as("n_a"))
      val nB = b.agg(count(lit(1)).as("n_b"))
      b.crossJoin(broadcast(nA)).crossJoin(broadcast(nB))
        .withColumn("target_rnk",
          expr("(rnk * n_a + n_b - 1) div n_b"))
        .join(a, col("target_rnk") === col("rnk_a"))
        .select(col("doc_id"), col("n_chars"), col("rnk").as("rnk_b"),
          col("target_rnk"), col("calibrated_chars"))
    },

    // ---- DETERMINISTIC NEGATIVE SAMPLING: k pseudo-random negative
    // partners per document for contrastive training pairs — WITHOUT a
    // cross join, an RNG, or a shuffle of the corpus against itself.
    // Each doc's partners sit at rank offsets derived from the shared
    // det-hash family (offset ∈ [1, N-1] so a partner can never be the
    // doc itself), and partners resolve through ONE equi-join on rank.
    // Ranks come from the no-single-partition prefix-sum machinery;
    // everything is integer arithmetic — reproducible across runs,
    // partitionings and engines, and re-runnable per epoch by folding
    // the epoch into the hash (the q102 epoch-shuffle recipe).
    Q(
      "q134_negative_sampling",
      s"""WITH r AS (
         |  SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) - 1 AS rnk,
         |    (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n
         |  FROM documents),
         |pairs AS (
         |  SELECT r.doc_id, j.j,
         |    (r.rnk + 1 + ((r.doc_id * 31 + j.j) * ${graft.ops.Text.Mult})
         |       % ${graft.ops.Text.P} % (r.n - 1)) % r.n AS p_rnk
         |  FROM r CROSS JOIN (SELECT unnest([1, 2, 3]) AS j) j)
         |SELECT p.doc_id, CAST(p.j AS BIGINT) AS neg_ix,
         |  r2.doc_id AS neg_doc_id
         |FROM pairs p JOIN r r2 ON r2.rnk = p.p_rnk""".stripMargin) {
      (spark, dir) =>
      val docs = Tables.documents(spark, dir).select("doc_id")
      val r = Sample.quantileNormalize(docs, Seq(col("doc_id")))
        .select(col("doc_id"), (col("rnk") - 1).as("rnk"))
      val n = docs.agg(count(lit(1)).as("n"))
      val pairs = r.crossJoin(broadcast(n))
        .select(col("doc_id"), col("rnk"), col("n"),
          explode(array(lit(1L), lit(2L), lit(3L))).as("neg_ix"))
        .withColumn("p_rnk",
          pmod(col("rnk") + 1 +
            pmod(pmod((col("doc_id") * 31 + col("neg_ix")) *
              graft.ops.Text.Mult, lit(graft.ops.Text.P)), col("n") - 1),
            col("n")))
      pairs.join(r.select(col("rnk").as("p_rnk"), col("doc_id").as("neg_doc_id")),
          "p_rnk")
        .select("doc_id", "neg_ix", "neg_doc_id")
    },

    // ---- WINSORIZED GROUP STATS: per-language mean doc length with the
    // tails clipped at the exact p5/p95 order statistics — the robust
    // profile a data card wants when a handful of giant documents
    // dominate a plain mean. Order statistics come from a PER-GROUP
    // window (partitioned by lang — shuffled on the group key, never a
    // single partition); at 100 TB group sizes outgrow a sort-within-
    // group and the KLL sketch quantiles (q77) supply approximate
    // bounds — this operator is the exact twin for when they don't.
    // Bounds join back broadcast; all presentation integer-space.
    Q(
      "q135_winsorized_stats",
      """WITH r AS (
        |  SELECT lang, n_chars,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY n_chars, doc_id) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM documents),
        |b AS (
        |  SELECT lang, any_value(n) AS n,
        |    max(CASE WHEN rnk = (5 * n + 99) // 100 THEN n_chars END) AS lo,
        |    max(CASE WHEN rnk = (95 * n + 99) // 100 THEN n_chars END) AS hi,
        |    CAST(sum(n_chars) AS BIGINT) AS s_raw
        |  FROM r GROUP BY lang),
        |c AS (
        |  SELECT d.lang, b.n, b.lo, b.hi, b.s_raw,
        |    CAST(sum(least(greatest(d.n_chars, b.lo), b.hi)) AS BIGINT) AS s_w
        |  FROM documents d JOIN b ON d.lang = b.lang
        |  GROUP BY d.lang, b.n, b.lo, b.hi, b.s_raw)
        |SELECT lang, n, lo, hi,
        |  CAST(((2 * s_raw * 1000000 + n) // (2 * n))
        |    * CAST(0.000001 AS DECIMAL(7,6)) AS DOUBLE) AS mean_raw,
        |  CAST(((2 * s_w * 1000000 + n) // (2 * n))
        |    * CAST(0.000001 AS DECIMAL(7,6)) AS DOUBLE) AS mean_winsor
        |FROM c""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(spark, dir).select("doc_id", "lang", "n_chars")
      val w = Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
      val r = docs
        .withColumn("rnk", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1))
          .over(Window.partitionBy("lang")).cast("long"))
      val b = r.groupBy("lang").agg(
        first(col("n")).as("n"),
        max(when(col("rnk") === expr("(5 * n + 99) div 100"), col("n_chars")))
          .as("lo"),
        max(when(col("rnk") === expr("(95 * n + 99) div 100"), col("n_chars")))
          .as("hi"),
        sum("n_chars").as("s_raw"))
      val c = docs.join(broadcast(b), "lang")
        .groupBy("lang", "n", "lo", "hi", "s_raw")
        .agg(sum(least(greatest(col("n_chars"), col("lo")), col("hi")))
          .as("s_w"))
      c.select(col("lang"), col("n"), col("lo"), col("hi"),
        ExactRound.roundRatio(col("s_raw"), col("n"), 6)
          .cast("double").as("mean_raw"),
        ExactRound.roundRatio(col("s_w"), col("n"), 6)
          .cast("double").as("mean_winsor"))
    },

    // ---- EVENT FUNNEL: per-user progression through the ordered stage
    // chain signup → view → click → purchase, each stage's timestamp
    // strictly after the previous stage's — the behavioral-analytics
    // query a product warehouse runs daily. Four chained min-aggregates
    // + equi-joins, all keyed on user_id (co-partitioned after the
    // first shuffle, exchange reuse does the rest); timestamps cross
    // the oracle boundary via the q32 CAST-to-micros idiom.
    Q(
      "q136_event_funnel",
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |t1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |       WHERE event_type = 'signup' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e
        |       JOIN t1 ON e.user_id = t1.user_id
        |       WHERE e.event_type = 'view' AND e.ts > t1.t1 GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e
        |       JOIN t2 ON e.user_id = t2.user_id
        |       WHERE e.event_type = 'click' AND e.ts > t2.t2 GROUP BY e.user_id),
        |t4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM e
        |       JOIN t3 ON e.user_id = t3.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > t3.t3 GROUP BY e.user_id)
        |SELECT u.user_id, t1.t1, t2.t2, t3.t3, t4.t4,
        |  CAST(CASE WHEN t4.user_id IS NOT NULL THEN 4
        |            WHEN t3.user_id IS NOT NULL THEN 3
        |            WHEN t2.user_id IS NOT NULL THEN 2
        |            WHEN t1.user_id IS NOT NULL THEN 1 ELSE 0 END AS INT)
        |    AS reached
        |FROM (SELECT DISTINCT user_id FROM e) u
        |LEFT JOIN t1 ON u.user_id = t1.user_id
        |LEFT JOIN t2 ON u.user_id = t2.user_id
        |LEFT JOIN t3 ON u.user_id = t3.user_id
        |LEFT JOIN t4 ON u.user_id = t4.user_id""".stripMargin) { (spark, dir) =>
      val e = Tables.events(spark, dir).select("user_id", "event_type", "ts")
      val t1 = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t1"))
      def stage(prev: org.apache.spark.sql.DataFrame, prevCol: String,
          typ: String, out: String) =
        e.filter(col("event_type") === typ)
          .join(prev.select("user_id", prevCol), "user_id")
          .filter(col("ts") > col(prevCol))
          .groupBy("user_id").agg(min("ts").as(out))
      val t2 = stage(t1, "t1", "view", "t2")
      val t3 = stage(t2, "t2", "click", "t3")
      val t4 = stage(t3, "t3", "purchase", "t4")
      e.select("user_id").distinct()
        .join(t1, Seq("user_id"), "left")
        .join(t2, Seq("user_id"), "left")
        .join(t3, Seq("user_id"), "left")
        .join(t4, Seq("user_id"), "left")
        .select(col("user_id"), col("t1"), col("t2"), col("t3"), col("t4"),
          when(col("t4").isNotNull, 4).when(col("t3").isNotNull, 3)
            .when(col("t2").isNotNull, 2).when(col("t1").isNotNull, 1)
            .otherwise(0).cast("int").as("reached"))
    },

    // ---- COHORT RETENTION: users grouped by first-seen week, per-week
    // activity rate relative to the cohort — the other half of the
    // behavioral pair with q136. Week truncation is Monday-start on
    // both engines; the week index k is pure integer day arithmetic;
    // rates round in integer space. One aggregate for cohorts, one
    // distinct for activity — both keyed on user_id/cohort, linear.
    Q(
      "q137_cohort_retention",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |first AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |          FROM e GROUP BY user_id),
        |act AS (SELECT DISTINCT e.user_id, f.cohort_week,
        |    date_diff('day', f.cohort_week, date_trunc('week', e.ts)) // 7 AS k
        |  FROM e JOIN first f ON e.user_id = f.user_id),
        |cs AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_cohort
        |       FROM first GROUP BY cohort_week)
        |SELECT a.cohort_week, CAST(a.k AS BIGINT) AS k,
        |  CAST(count(*) AS BIGINT) AS n_active, cs.n_cohort,
        |  CAST(((2 * count(*) * 1000000 + cs.n_cohort) // (2 * cs.n_cohort))
        |    * CAST(0.000001 AS DECIMAL(7,6)) AS DOUBLE) AS retention
        |FROM act a JOIN cs ON a.cohort_week = cs.cohort_week
        |GROUP BY a.cohort_week, a.k, cs.n_cohort""".stripMargin) {
      (spark, dir) =>
      val e = Tables.events(spark, dir).select("user_id", "ts")
      // DATE at the boundary (round-9): Spark date_trunc returns a
      // timestamp where DuckDB's returns DATE — cast so the types match.
      val first = e.groupBy("user_id")
        .agg(date_trunc("week", min("ts")).cast("date").as("cohort_week"))
      val act = e.join(first, "user_id")
        .select(col("user_id"), col("cohort_week"),
          expr("datediff(date_trunc('week', ts), cohort_week) div 7")
            .cast("long").as("k"))
        .distinct()
      val cs = first.groupBy("cohort_week").agg(count(lit(1)).as("n_cohort"))
      act.join(cs, "cohort_week")
        .groupBy("cohort_week", "k", "n_cohort")
        .agg(count(lit(1)).as("n_active"))
        .select(col("cohort_week"), col("k"), col("n_active"), col("n_cohort"),
          ExactRound.roundRatio(col("n_active"), col("n_cohort"), 6)
            .cast("double").as("retention"))
    },

    // ---- TIME-TO-CONVERT DECILES: the exact decile distribution of
    // signup→purchase latency over users completing q136's full funnel
    // chain — all interval arithmetic in integer microseconds (the
    // epoch_us idiom), deciles as EXACT order statistics via the
    // prefix-sum rank machinery (no single-partition window), selected
    // with pure integer ceil arithmetic. 9 rows out, all BIGINT.
    Q(
      "q138_time_to_convert",
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |t1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |       WHERE event_type = 'signup' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e
        |       JOIN t1 ON e.user_id = t1.user_id
        |       WHERE e.event_type = 'view' AND e.ts > t1.t1 GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e
        |       JOIN t2 ON e.user_id = t2.user_id
        |       WHERE e.event_type = 'click' AND e.ts > t2.t2 GROUP BY e.user_id),
        |t4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM e
        |       JOIN t3 ON e.user_id = t3.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > t3.t3 GROUP BY e.user_id),
        |conv AS (SELECT t1.user_id,
        |    epoch_us(t4.t4) - epoch_us(t1.t1) AS delta_us
        |  FROM t1 JOIN t4 ON t1.user_id = t4.user_id),
        |r AS (SELECT user_id, delta_us,
        |    CAST(row_number() OVER (ORDER BY delta_us, user_id) AS BIGINT) AS rnk,
        |    (SELECT CAST(count(*) AS BIGINT) FROM conv) AS n FROM conv),
        |d AS (SELECT unnest(range(1, 10)) AS decile)
        |SELECT CAST(d.decile AS BIGINT) AS decile, r.delta_us, r.n
        |FROM d JOIN r ON r.rnk = (d.decile * r.n + 9) // 10""".stripMargin) {
      (spark, dir) =>
      val e = Tables.events(spark, dir).select("user_id", "event_type", "ts")
      val t1 = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t1"))
      def stage(prev: org.apache.spark.sql.DataFrame, prevCol: String,
          typ: String, out: String) =
        e.filter(col("event_type") === typ)
          .join(prev.select("user_id", prevCol), "user_id")
          .filter(col("ts") > col(prevCol))
          .groupBy("user_id").agg(min("ts").as(out))
      val t4 = stage(stage(stage(t1, "t1", "view", "t2"),
        "t2", "click", "t3"), "t3", "purchase", "t4")
      val conv = t1.join(t4, "user_id")
        .select(col("user_id"),
          (expr("unix_micros(CAST(t4 AS TIMESTAMP))") -
            expr("unix_micros(CAST(t1 AS TIMESTAMP))")).as("delta_us"))
      val r = Sample.quantileNormalize(conv,
        Seq(col("delta_us"), col("user_id")))
      val n = conv.agg(count(lit(1)).as("n"))
      spark.range(1, 10).select(col("id").as("decile"))
        .crossJoin(broadcast(n))
        .join(r, col("rnk") === expr("(decile * n + 9) div 10"))
        .select(col("decile"), col("delta_us"), col("n"))
    },

    // ---- ROLLING ACTIVE USERS (7-day WAU per day): distinct users in
    // the trailing 7-day window of every day — computed WITHOUT a range
    // join or a window: each (user, day) activity explodes to the ≤ 7
    // window-end days it contributes to (a scan-level constant-factor
    // explode), then one distinct + one count per end day. Linear at
    // any scale; day bounds join as broadcast scalars.
    Q(
      "q139_rolling_active_users",
      """WITH e AS (SELECT DISTINCT user_id,
        |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS day FROM events),
        |b AS (SELECT date_trunc('day', min(CAST(ts AS TIMESTAMP))) AS d0,
        |             date_trunc('day', max(CAST(ts AS TIMESTAMP))) AS d1
        |      FROM events),
        |x AS (SELECT DISTINCT e.user_id,
        |    e.day + to_days(CAST(i.i AS INT)) AS end_day
        |  FROM e CROSS JOIN (SELECT unnest(range(0, 7)) AS i) i),
        |w AS (SELECT end_day, CAST(count(*) AS BIGINT) AS wau
        |      FROM x GROUP BY end_day)
        |SELECT w.end_day, w.wau FROM w, b
        |WHERE w.end_day BETWEEN b.d0 AND b.d1""".stripMargin) { (spark, dir) =>
      val ev = Tables.events(spark, dir)
      val e = ev.select(col("user_id"),
        date_trunc("day", col("ts")).as("day")).distinct()
      val b = ev.agg(date_trunc("day", min("ts")).as("d0"),
        date_trunc("day", max("ts")).as("d1"))
      val x = e.select(col("user_id"), col("day"),
          explode(sequence(lit(0), lit(6))).as("i"))
        .select(col("user_id"),
          expr("day + make_dt_interval(i, 0, 0, 0)").as("end_day"))
        .distinct()
      x.groupBy("end_day").agg(count(lit(1)).as("wau"))
        .crossJoin(broadcast(b))
        .filter(col("end_day").between(col("d0"), col("d1")))
        .select("end_day", "wau")
    },

    // ---- SESSIONIZED PATH MINING (L156): top event-type trigram paths
    // across gap-sessionized streams — the clickstream journey mining
    // that turns raw events into "what do users actually do in one
    // sitting" (paths never cross a session boundary, unlike naive
    // lead() over the whole user history). Session labels come from the
    // L12 window machinery (Sessionize.labelSessions, one user-keyed
    // shuffle); trigrams are two lead()s over the (user, session)
    // window; the path rollup is a hash aggregate and the top-20 page
    // is an orderBy+limit top-k.
    Q(
      "q175_session_paths",
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
        |    lag(CAST(ts AS TIMESTAMP)) OVER
        |      (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    sum(CASE WHEN prev IS NULL
        |             OR epoch_us(ts) - epoch_us(prev) > 3600000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM e),
        |tri AS (
        |  SELECT event_type AS step1,
        |    lead(event_type, 1) OVER w AS step2,
        |    lead(event_type, 2) OVER w AS step3
        |  FROM s
        |  WINDOW w AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)),
        |paths AS (
        |  SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n_paths
        |  FROM tri WHERE step3 IS NOT NULL GROUP BY 1, 2, 3)
        |SELECT CAST(row_number() OVER
        |    (ORDER BY n_paths DESC, step1, step2, step3) AS BIGINT) AS rank,
        |  step1, step2, step3, n_paths
        |FROM paths
        |ORDER BY n_paths DESC, step1, step2, step3 LIMIT 20""".stripMargin) {
      (spark, dir) =>
        import org.apache.spark.sql.expressions.Window
        val labeled = graft.ops.Sessionize.labelSessions(
          Tables.events(spark, dir)
            .select("user_id", "event_id", "event_type", "ts"),
          "ts", "user_id", "event_id", gapSeconds = 3600)
        val w = Window.partitionBy("user_id", "session_id")
          .orderBy(col("ts"), col("event_id"))
        val paths = labeled
          .withColumn("step2", lead(col("event_type"), 1).over(w))
          .withColumn("step3", lead(col("event_type"), 2).over(w))
          .filter(col("step3").isNotNull)
          .groupBy(col("event_type").as("step1"), col("step2"), col("step3"))
          .agg(count(lit(1)).as("n_paths"))
        paths
          .orderBy(col("n_paths").desc, col("step1"), col("step2"), col("step3"))
          .limit(20)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("n_paths").desc, col("step1"), col("step2"),
              col("step3"))).cast("long")) // ≤20-row frame
          .select("rank", "step1", "step2", "step3", "n_paths")
    },

    // ---- INTER-ARRIVAL BURSTINESS (L157): per-user mean/stddev of
    // inter-event gaps and the Goh–Barabási burstiness index
    // B = (σ−μ)/(σ+μ) — the temporal profile separating periodic
    // actors (B→−1), Poisson traffic (B≈0), and bursty humans/bots
    // (B→1); the per-entity signal behind rate-limit tuning and bot
    // triage. Gaps are exact integer seconds (floor of the microsecond
    // diff), the moment sums ride DECIMAL (q74's exactness shape), and
    // a float-cancellation guard clamps variance at 0 so equal-gap
    // users read σ = 0, never NaN.
    Q(
      "q176_burstiness",
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    lag(CAST(ts AS TIMESTAMP)) OVER
        |      (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
        |  FROM events),
        |g AS (
        |  SELECT user_id,
        |    (epoch_us(ts) - epoch_us(prev)) // 1000000 AS gap_s
        |  FROM e WHERE prev IS NOT NULL),
        |m AS (
        |  SELECT user_id,
        |    CAST(count(*) AS BIGINT) AS n_gaps,
        |    CAST(sum(CAST(gap_s AS DECIMAL(20,0))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(gap_s AS DECIMAL(20,0))
        |           * CAST(gap_s AS DECIMAL(20,0))) AS DOUBLE) AS s2
        |  FROM g GROUP BY 1),
        |x AS (
        |  SELECT user_id, n_gaps, s1 / n_gaps AS mu,
        |    sqrt(greatest((s2 - s1 * s1 / n_gaps) / (n_gaps - 1), 0)) AS sigma
        |  FROM m WHERE n_gaps >= 2)
        |SELECT user_id, n_gaps,
        |  round(mu, 6) AS mean_gap_s,
        |  round(sigma, 6) AS stddev_gap_s,
        |  CASE WHEN sigma + mu = 0 THEN NULL
        |       ELSE round((sigma - mu) / (sigma + mu), 6) END AS burstiness
        |FROM x""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val gaps = Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev", lag(col("ts"), 1).over(byUser))
        .filter(col("prev").isNotNull)
        .withColumn("gap_s",
          expr("(unix_micros(CAST(ts AS TIMESTAMP)) - unix_micros(CAST(prev AS TIMESTAMP))) DIV 1000000"))
      val d = col("gap_s").cast(DecimalType(20, 0))
      val m = gaps.groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
          sum(d).cast("double").as("s1"),
          sum(d * d).cast("double").as("s2"))
        .filter(col("n_gaps") >= 2)
        .withColumn("mu", col("s1") / col("n_gaps"))
        .withColumn("sigma",
          sqrt(greatest((col("s2") - col("s1") * col("s1") / col("n_gaps"))
            / (col("n_gaps") - 1), lit(0.0))))
      m.select(col("user_id"), col("n_gaps"),
        round(col("mu"), 6).as("mean_gap_s"),
        round(col("sigma"), 6).as("stddev_gap_s"),
        when(col("sigma") + col("mu") === 0, lit(null).cast("double"))
          .otherwise(round((col("sigma") - col("mu")) / (col("sigma") + col("mu")), 6))
          .as("burstiness"))
    },

    // ---- FIRST/LAST-TOUCH ATTRIBUTION (L164): every conversion
    // ('purchase') credits the user's FIRST non-conversion touch ever
    // and the LAST one immediately before it — the two bookend models
    // of marketing attribution, both pure window reads over the
    // per-user (ts, event_id) order (IGNORE-NULLS first/last over an
    // unbounded-preceding frame; no self-join, no per-user collect).
    // Purchases with no prior touch keep NULL — "unattributable" is an
    // answer, not a default channel. The rollup is a |types|²-bounded
    // aggregate; at corpus scale the single shuffle is the user key.
    Q(
      "q183_touch_attribution",
      """WITH o AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |      IGNORE NULLS) OVER win AS first_touch,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |      IGNORE NULLS) OVER win AS last_touch
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT first_touch, last_touch,
        |  CAST(count(*) AS BIGINT) AS n_purchases
        |FROM o WHERE event_type = 'purchase'
        |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val touch = when(col("event_type") =!= "purchase", col("event_type"))
      val win = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(spark, dir)
        .withColumn("first_touch", first(touch, ignoreNulls = true).over(win))
        .withColumn("last_touch", last(touch, ignoreNulls = true).over(win))
        .filter(col("event_type") === "purchase")
        .groupBy("first_touch", "last_touch")
        .agg(count(lit(1)).as("n_purchases"))
    },

    // ---- FUNCTIONAL-DEPENDENCY DISCOVERY (L182): does A determine B?
    // — profiled as (distinct LHS values, LHS values seeing >1 RHS,
    // worst fan-out), the schema-inference complement of L109's
    // inclusion dependencies (those find FK candidates ACROSS tables;
    // this finds key/denormalization structure WITHIN one): a clean FD
    // certifies a dimension extraction, a near-FD localizes the dirty
    // keys. One countDistinct aggregate per tested pair, |LHS|-bounded
    // frames, violation rate integer-rounded.
    Q(
      "q201_fd_discovery", {
        def fdSql(table: String, lhs: String, rhs: String) =
          s"""SELECT '$table' AS tbl, '$lhs' AS lhs, '$rhs' AS rhs,
             |  CAST(count(*) AS BIGINT) AS n_lhs,
             |  CAST(count(*) FILTER (WHERE n_rhs > 1) AS BIGINT)
             |    AS n_violating,
             |  CAST(max(n_rhs) AS BIGINT) AS max_fanout,
             |  count(*) FILTER (WHERE n_rhs > 1) = 0 AS holds
             |FROM (SELECT $lhs, CAST(count(DISTINCT $rhs) AS BIGINT) AS n_rhs
             |      FROM $table GROUP BY 1) g""".stripMargin
        Seq(
          fdSql("nation", "n_nationkey", "n_regionkey"),
          fdSql("customer", "c_nationkey", "c_mktsegment"),
          fdSql("orders", "o_custkey", "o_orderstatus"),
          fdSql("events", "user_id", "event_type"))
          .mkString("", "\nUNION ALL\n", "")
      }) { (spark, dir) =>
      def fd(df: org.apache.spark.sql.DataFrame, table: String,
          lhs: String, rhs: String) =
        df.groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("n_rhs"))
          .agg(count(lit(1)).as("n_lhs"),
            sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("n_violating"),
            max("n_rhs").as("max_fanout"))
          .select(lit(table).as("tbl"), lit(lhs).as("lhs"),
            lit(rhs).as("rhs"), col("n_lhs"), col("n_violating"),
            col("max_fanout"), (col("n_violating") === 0L).as("holds"))
      fd(Tables.load(spark, dir, "nation"), "nation",
        "n_nationkey", "n_regionkey")
        .unionByName(fd(Tables.load(spark, dir, "customer"), "customer",
          "c_nationkey", "c_mktsegment"))
        .unionByName(fd(Tables.orders(spark, dir), "orders",
          "o_custkey", "o_orderstatus"))
        .unionByName(fd(Tables.events(spark, dir), "events",
          "user_id", "event_type"))
    },

    // ---- EVENT-TIME DISORDER / WATERMARK SIZING (L183): per event,
    // its LATENESS against the running event-time high-water mark in
    // ARRIVAL order (event_id — the append-order id), rolled into a
    // power-of-two lateness histogram with cumulative coverage — the
    // measurement that SIZES a streaming watermark from data instead of
    // folklore ("2^k µs covers 99.9% of arrivals" is read straight off
    // the cumulative column). Lateness is exact integer µs from a
    // per-user ROWS window; buckets via length(bin(x)) — integer in
    // both engines; coverage rounds in integer space. The histogram is
    // ≤64 rows at any corpus scale.
    Q(
      "q202_disorder_watermark",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |l AS (
        |  SELECT greatest(0, coalesce(
        |      max(us) OVER (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - us, 0))
        |    AS late_us
        |  FROM e),
        |b AS (
        |  SELECT CASE WHEN late_us = 0 THEN 0
        |              ELSE length(bin(late_us)) END AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM l GROUP BY 1),
        |t AS (SELECT CAST(sum(n_events) AS BIGINT) AS total FROM b)
        |SELECT CAST(bucket AS BIGINT) AS bucket, n_events,
        |  CAST(sum(n_events) OVER (ORDER BY bucket) AS BIGINT) AS cum_events,
        |  CAST(((2 * sum(n_events) OVER (ORDER BY bucket) * 1000000
        |      + t.total) // (2 * t.total))
        |    * CAST(0.000001 AS DECIMAL(7,6)) AS DOUBLE) AS coverage
        |FROM b, t""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(spark, dir).select(col("user_id"),
        col("event_id"), unix_micros(col("ts").cast("timestamp")).as("us"))
      val arr = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val l = e.select(greatest(lit(0L),
        coalesce(max("us").over(arr) - col("us"), lit(0L))).as("late_us"))
      val b = l.groupBy(when(col("late_us") === 0, 0L)
          .otherwise(length(bin(col("late_us"))).cast("long")).as("bucket"))
        .agg(count(lit(1)).as("n_events"))
      val t = b.agg(sum("n_events").as("total"))
      // unpartitioned windows over the ≤64-row histogram only
      b.crossJoin(broadcast(t))
        .withColumn("cum_events",
          sum("n_events").over(Window.orderBy("bucket")))
        .select(col("bucket"), col("n_events"), col("cum_events"),
          graft.functions.ExactRound.roundRatio(col("cum_events"),
            col("total"), 6).cast("double").as("coverage"))
    },

    // ---- MUTUAL-INFORMATION COLUMN PROFILE (L193): the SOFT
    // dependency measure completing q201's functional-dependency
    // discovery — an FD is the MI = H(Y) limit, a near-FD q201 can
    // only count violations for gets a graded score here; correlated
    // columns also break the independence assumption join-size cost
    // models lean on (q106), so this is the statistic that says WHERE
    // that model lies. Two tested pairs: (l_returnflag, l_linestatus) —
    // strongly dependent (both track the return lifecycle) — and documents (lang, source). Exactness is
    // the q65/q145 logprob recipe: each ln rounds at 9 dp into
    // DECIMAL on identical one-divide double operands, every Σ term
    // is count·ln9 summed exactly in DECIMAL, only the final /N
    // presentations divide in double (see Linkage.mutualInformation).
    // One corpus aggregate per pair; everything downstream lives on
    // the |X|·|Y| cell frame.
    Q(
      "q212_mutual_information", {
        def pairSql(name: String) =
          s"""SELECT '$name' AS pair, m.n,
             |  CAST(hx.hx_s AS DOUBLE) / m.n AS h_x,
             |  CAST(hy.hy_s AS DOUBLE) / m.n AS h_y,
             |  CAST(m.hxy_s AS DOUBLE) / m.n AS h_xy,
             |  CAST(m.mi_s AS DOUBLE) / m.n AS mi_nats,
             |  CASE WHEN least(hx.hx_s, hy.hy_s) > 0
             |    THEN CAST(m.mi_s AS DOUBLE) / CAST(least(hx.hx_s, hy.hy_s) AS DOUBLE)
             |    ELSE 0.0 END AS nmi
             |FROM (
             |  SELECT
             |    -sum(nxy * CAST(round(ln(CAST(nxy AS DOUBLE) / n), 9) AS DECIMAL(13,9))) AS hxy_s,
             |    sum(nxy * CAST(round(ln(CAST(nxy * n AS DOUBLE) / CAST(nx * ny AS DOUBLE)), 9) AS DECIMAL(13,9))) AS mi_s,
             |    CAST(max(n) AS BIGINT) AS n
             |  FROM (
             |    SELECT c.nxy, mx.nx, my.ny, t.n
             |    FROM c_$name c JOIN mx_$name mx USING (x)
             |      JOIN my_$name my USING (y) CROSS JOIN t_$name t)) m
             |CROSS JOIN (
             |  SELECT -sum(nx * CAST(round(ln(CAST(nx AS DOUBLE) / n), 9) AS DECIMAL(13,9))) AS hx_s
             |  FROM mx_$name, t_$name) hx
             |CROSS JOIN (
             |  SELECT -sum(ny * CAST(round(ln(CAST(ny AS DOUBLE) / n), 9) AS DECIMAL(13,9))) AS hy_s
             |  FROM my_$name, t_$name) hy""".stripMargin
        def ctes(table: String, x: String, y: String, name: String) =
          s"""c_$name AS (
             |  SELECT $x AS x, $y AS y, CAST(count(*) AS BIGINT) AS nxy
             |  FROM $table GROUP BY 1, 2),
             |mx_$name AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM c_$name GROUP BY 1),
             |my_$name AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM c_$name GROUP BY 1),
             |t_$name AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM c_$name)""".stripMargin
        s"""WITH ${ctes("lineitem", "l_returnflag", "l_linestatus", "li")},
           |${ctes("documents", "lang", "source", "doc")}
           |${pairSql("li")}
           |UNION ALL
           |${pairSql("doc")}""".stripMargin
      }) { (spark, dir) =>
      val li = graft.ops.Linkage.mutualInformation(
          Tables.lineitem(spark, dir), "l_returnflag", "l_linestatus")
        .select(lit("li").as("pair"), col("*"))
      val doc = graft.ops.Linkage.mutualInformation(
          Tables.documents(spark, dir), "lang", "source")
        .select(lit("doc").as("pair"), col("*"))
      li.unionByName(doc)
    },

    // ---- MARKOV TRANSITION MATRIX (L197): the first-order behavioral
    // model over per-user event streams — the quantitative completion
    // of q175's top-k path mining (paths SHOW the frequent routes, the
    // transition matrix PRICES every route and feeds simulation,
    // next-event prediction, and anomaly scoring of improbable hops).
    // Consecutive-event pairs come from one lag over the per-user
    // (ts, event_id) total order — ties broken by event_id so the
    // sequence is engine-identical; transition probabilities are
    // row-normalized counts rounded in integer space. One keyed window
    // + one aggregate on the corpus; the matrix is |types|²-bounded at
    // any scale.
    Q(
      "q216_markov_transitions",
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM events),
        |tr AS (
        |  SELECT prev AS from_type, event_type AS to_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
        |ft AS (
        |  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
        |  FROM tr GROUP BY 1)
        |SELECT t.from_type, t.to_type, t.n, f.n_from,
        |  CAST(((2 * CAST(t.n AS HUGEINT) * 1000000 + f.n_from)
        |    // (2 * CAST(f.n_from AS HUGEINT)))
        |    * CAST(0.000001 AS DECIMAL(7,6)) AS DOUBLE) AS p
        |FROM tr t JOIN ft f USING (from_type)""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val seq = Tables.events(spark, dir).select(
        col("user_id"), col("event_type"),
        lag("event_type", 1).over(w).as("prev"))
      val tr = seq.filter(col("prev").isNotNull)
        .groupBy(col("prev").as("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val ft = tr.groupBy("from_type").agg(sum("n").as("n_from"))
      tr.join(broadcast(ft), "from_type")
        .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
          graft.functions.ExactRound.roundRatio(col("n"), col("n_from"), 6)
            .cast("double").as("p"))
    }
  )
}
