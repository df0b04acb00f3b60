package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver (BENCH_r{N}.json).
  *
  * A short warmup pass runs first so the earliest timed query is not
  * charged for JVM/codegen/session startup (in round 1 the first query in
  * map order absorbed ~5 s of warmup and looked 6× slower than identical
  * shapes run later). Queries are timed in sorted-name order so numbers
  * are comparable round over round.
  *
  * Each query is timed over `SPARK_GRAFT_BENCH_PASSES` (default 3) full
  * sweeps and reports its per-query MEDIAN (plus min): two consecutive
  * driver rounds measured identical code apart by up to 5.5× per query
  * under machine-load variance, so single-pass numbers were unusable for
  * regression detection. Sweeps interleave queries (pass 1 runs all
  * queries, then pass 2, …) so a transient load spike taxes different
  * queries in different passes instead of all samples of one query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt)
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries
    val names = queries.keys.toSeq.sorted
    // Warmup: scan + join + agg + window + JSON codegen paths, untimed.
    Seq("q01_gold_attrition_monthly", "q04_latest_order_per_customer",
      "q11_debezium_roundtrip").foreach { n =>
      queries.get(n).foreach(fn => try fn(spark, sfDir).count() catch { case _: Throwable => })
    }
    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      val ok = try { queries(name)(spark, sfDir).count(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
      // isolate queries: session-scoped caches (dedup signature tables
      // etc.) must not tax the storage memory of later-running queries
      spark.catalog.clearCache()
      // a failed query reports -1 so a regression can't masquerade as a speedup
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    val samples: Seq[Seq[(String, Double)]] =
      (1 to passes).map(_ => names.map(n => n -> timeOnce(n)))
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = names.map { name =>
      val ts = samples.map(_.toMap.apply(name))
      // any failed pass marks the query failed — never average over a crash
      if (ts.exists(_ < 0)) (name, -1.0, -1.0)
      else (name, medianOf(ts), ts.min)
    }
    // documented spread: per-query (max−min)/median across passes — the
    // machine-load noise floor a reader needs before calling a delta a
    // regression (r03 vs r04 swung 5× per query on identical code)
    val spreads = names.flatMap { name =>
      val ts = samples.map(_.toMap.apply(name))
      val med = medianOf(ts)
      if (ts.exists(_ < 0) || med <= 0) None else Some((ts.max - ts.min) / med)
    }
    val spreadMed = if (spreads.isEmpty) -1.0 else medianOf(spreads) * 100
    val spreadMax = if (spreads.isEmpty) -1.0 else spreads.max * 100
    def jsonMap(vals: Seq[(String, Double)]) =
      vals.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jsonMap(results.map(r => (r._1, r._2)))
    val qsMin = jsonMap(results.map(r => (r._1, r._3)))
    val total = results.map(_._2).sum
    // context submetrics (extra keys are ignorable by any JSON reader):
    // gold_sec = the three dbt-gold models — the only workload the
    // reference publishes a number for (BASELINE.md: 40.65 s) — and the
    // per-query median, since `total` scales with registered-query count
    // (75 queries here vs the reference's 3-model build)
    val gold = results.collect {
      case (n, v, _) if n.startsWith("q01") || n.startsWith("q02") || n.startsWith("q03") => v
    }.sum
    val sortedTimes = results.map(_._2).filter(_ >= 0).sorted
    val median = if (sortedTimes.isEmpty) -1.0 else sortedTimes(sortedTimes.size / 2)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""queries_min":$qsMin,"passes":$passes,""" +
      s""""spread_med_pct":$spreadMed,"spread_max_pct":$spreadMax,""" +
      s""""gold_sec":$gold,"median_sec":$median,"n_queries":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
