package graft.tools

import graft.{Sessions, Tables}
import graft.ops.Temporal
import org.apache.spark.sql.functions._

/** Measurement main: the native AsOfJoinExec vs the union+window
  * composition on the SAME task (each event → the user's most recent
  * prior purchase). `runMain graft.tools.ProbeAsOf <sfDir> [passes]` —
  * prints min seconds per variant (results cross-checked equal first).
  * Recorded in bench/README.md ("native as-of"). */
object ProbeAsOf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = Tables.events(spark, sfDir).select(col("event_id"),
      col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
      col("event_type"), col("value")).localCheckpoint()
    val l = ev.select("event_id", "user_id", "us")
    val r = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "us")
      .agg(max(struct(col("event_id"), col("value"))).as("_m"))
      .select(col("user_id").as("r_user"), col("us").as("r_us"),
        col("_m.event_id").as("pid"), col("_m.value").as("pvalue"))
      .localCheckpoint()

    def native() = l.join(r, col("user_id") === col("r_user") &&
        call_function("graft_asof", col("us"), col("r_us"), col("pid")))
      .select(col("event_id"), col("r_us"), col("pvalue"))

    def composed() = Temporal.asOfJoin(
      l, r.select(col("r_user").as("user_id"), col("r_us").as("us"),
        col("pid"), col("pvalue")),
      key = "user_id", tsCol = "us",
      rightCols = Seq("pvalue"), rightTieBreak = "pid")
      .select(col("event_id"), col("right_ts"), col("right_pvalue"))

    // cross-check once: identical (event_id -> (ts, value)) maps
    val a = native().collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None
        else Some((x.getLong(1), x.getDouble(2))))).toMap
    val b = composed().collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None
        else Some((x.getLong(1), x.getDouble(2))))).toMap
    require(a == b, s"variants disagree: ${a.size} vs ${b.size} keys")

    def time(f: () => org.apache.spark.sql.DataFrame): Double =
      (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min

    def withThreshold[A](v: String)(body: => A): A = {
      val key = "spark.sql.autoBroadcastJoinThreshold"
      val prev = spark.conf.get(key)
      spark.conf.set(key, v)
      try body finally spark.conf.set(key, prev)
    }

    val tb = time(native _) // default threshold → AsOfBroadcastExec
    val tm = withThreshold("-1") { time(native _) } // merge path
    val tc = time(composed _)
    println(f"""{"asof_broadcast_sec":$tb%.3f,"asof_merge_sec":$tm%.3f,""" +
      f""""asof_composed_sec":$tc%.3f,"speedup_bcast":${tc / tb}%.2f,""" +
      f""""speedup_merge":${tc / tm}%.2f,"rows":${a.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
