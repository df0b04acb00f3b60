package graft.queries

import graft.Tables
import graft.ops.{Sessionize, Similarity, Text}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Stateful-streaming and embedding-dedup queries beyond the reference's
  * stateless surface: event-time windowed aggregation over a stream,
  * gap sessionization (typed mapGroups path; mapGroupsWithState streaming
  * variant exercised in StatefulStreamsSpec), embedding-cosine near-dup.
  */
object StatefulQueries {
  import Text.{Mult, P}

  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // parquet INT64 TIMESTAMP(NANOS) as long
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val all: Seq[Q] = Seq(

    // ---- Stateful streaming aggregation: event-time daily windows over
    // the re-streamed events table, complete-mode memory sink (the
    // test-only sink; the scale path is foreachBatch/parquet per batch).
    // Stateful agg is the piece the reference never uses (its checkpoints
    // all show batchWatermarkMs=0) — added here as a first-class operator.
    Q(
      "q31_stream_windowed_agg",
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
        |  event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      // the fixture is a single parquet file; the file stream source wants
      // a directory — stage a symlink to it in a temp dir
      val streamDir = java.nio.file.Files.createTempDirectory("graft-q31-in")
      streamDir.toFile.deleteOnExit()
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val raw = spark.readStream.schema(eventsRawSchema).parquet(streamDir.toString)
      val ev = raw.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      val agg = ev
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(12, 2))).cast("double").as("total_value"))
      val name = "graft_q31_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(name).select(
        col("w.start").as("day"), col("event_type"),
        col("n_events"), col("total_value"))
    },

    // ---- Gap sessionization (1-day gap) via the typed mapGroups fold;
    // the oracle replays it with lag + running-sum window functions —
    // also exactly the shape of Sessionize.sessionizeWindows, the scale
    // variant (equality of the two is pinned in tests).
    Q(
      "q32_sessionize",
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    lag(CAST(ts AS TIMESTAMP)) OVER
        |      (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(CASE WHEN prev IS NULL
        |             OR epoch_us(ts) - epoch_us(prev) > 86400000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM e)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"))
        .as[Sessionize.Event]
      Sessionize.sessionizeTyped(ev, gapSeconds = 86400).toDF()
    },

    // ---- IVF-style ANN: 16 deterministic centroid cells, queries probe
    // their 2 nearest cells — candidates ≈ 1/8 of the corpus per query.
    Q(
      "q36_ann_ivf_topk", {
        def dotSql(a: String, b: String) =
          s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> $a[i]*$b[i])), (a, x) -> a + x)"
        def cosSql(a: String, an: String, b: String, bn: String) =
          s"${dotSql(a, b)} / ($an * $bn)"
        s"""WITH v AS (
           |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
           |  FROM embeddings),
           |n AS (SELECT vec_id, dv, sqrt(${dotSql("dv", "dv")}) AS nrm FROM v),
           |cent AS (SELECT vec_id AS cid, dv AS cv, nrm AS cn FROM n WHERE vec_id < 16),
           |asg AS (
           |  SELECT vec_id, dv, nrm, cid, crn FROM (
           |    SELECT n.vec_id, n.dv, n.nrm, cent.cid,
           |      row_number() OVER (PARTITION BY n.vec_id
           |        ORDER BY ${cosSql("n.dv", "n.nrm", "cent.cv", "cent.cn")} DESC, cent.cid) AS crn
           |    FROM n, cent)),
           |c AS (SELECT vec_id AS neighbor_id, dv AS nv, nrm AS nn, cid
           |      FROM asg WHERE crn = 1),
           |q AS (SELECT vec_id AS query_id, dv AS qv, nrm AS qn, cid
           |      FROM asg WHERE crn <= 2 AND vec_id < 5),
           |ranked AS (
           |  SELECT query_id, neighbor_id, cos,
           |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
           |  FROM (
           |    SELECT q.query_id, c.neighbor_id,
           |      ${cosSql("q.qv", "q.qn", "c.nv", "c.nn")} AS cos
           |    FROM c JOIN q USING (cid)
           |    WHERE q.query_id <> c.neighbor_id))
           |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, round(cos, 6) AS cos
           |FROM ranked WHERE rn <= 3""".stripMargin
      }) { (spark, dir) =>
      val e = Tables.embeddings(spark, dir)
      Similarity
        .topKIvf(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 3, centroids = 16, nprobe = 2)
        .withColumn("cos", round(col("cos"), 6))
    },

    // ---- Embedding-cosine near-dup pairs within hyperplane buckets
    // (dedup via similarity; threshold at the fixture's high-cosine tail).
    Q(
      "q33_embedding_near_dup", {
        def dotSql(a: String, b: String) =
          s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> $a[i]*$b[i])), (a, x) -> a + x)"
        val bucketSql = (0 until 4).map { bit =>
          val proj = s"""list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(dv, (x, i) ->
               |        x * CASE WHEN (($bit*64 + (i-1)) * $Mult) % $P % 2 = 0
               |            THEN 1.0 ELSE -1.0 END)), (a, x) -> a + x)""".stripMargin
          s"(CASE WHEN $proj > 0 THEN ${1L << bit} ELSE 0 END)"
        }.mkString(" + ")
        s"""WITH v AS (
           |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
           |  FROM embeddings),
           |b AS (SELECT vec_id, dv, $bucketSql AS bucket FROM v)
           |SELECT id_a, id_b, round(cos, 6) AS cos FROM (
           |  SELECT x.vec_id AS id_a, y.vec_id AS id_b,
           |    ${dotSql("x.dv", "y.dv")}
           |      / (sqrt(${dotSql("x.dv", "x.dv")}) * sqrt(${dotSql("y.dv", "y.dv")})) AS cos
           |  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
           |WHERE cos >= 0.4""".stripMargin
      }) { (spark, dir) =>
      Similarity
        .cosineNearDupPairs(Tables.embeddings(spark, dir), "vec_id", "embedding",
          threshold = 0.4, nbits = 4, dim = 64)
        .withColumn("cos", round(col("cos"), 6))
    })
}
