package graft.tools

import graft.{Sessions, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Measurement main (optimization rounds): per-JOB wall-clock breakdown
  * of one registered query under the bench consumer — where inside a
  * multi-action query the seconds actually go. A SparkListener records
  * every job's duration and submitting call site; the report groups jobs
  * by call site ordered by total seconds, so a query whose cost hides in
  * "the third localCheckpoint" or "the per-round count" names the line.
  *
  * `runMain graft.tools.ProbeJobs <query> <sfDir> [passes]` — the
  * breakdown is from the LAST pass (warm JVM, the bench's comparison
  * regime: minima); wall seconds per pass print for all passes.
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)

    final case class Rec(site: String, ms: Long)
    final case class Span(site: String, t0: Long, t1: Long)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val recs = new java.util.concurrent.ConcurrentLinkedQueue[Rec]()
    val spans = new java.util.concurrent.ConcurrentLinkedQueue[Span]()
    val stageRecs = new java.util.concurrent.ConcurrentLinkedQueue[Rec]()
    val listener = new SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        for (t0 <- si.submissionTime; t1 <- si.completionTime)
          stageRecs.add(Rec(si.name.takeWhile(_ != '\n'), t1 - t0))
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // streaming foreachBatch jobs carry no callSite property; the
        // final stage's name (the action's RDD callsite) still names
        // the line that submitted the work
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .filter(_.nonEmpty)
          .orElse(js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("?")
        starts.put(js.jobId, (site, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (site, t0) =>
          recs.add(Rec(site, je.time - t0))
          spans.add(Span(site, t0, je.time))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    for (p <- 1 to passes) {
      recs.clear()
      spans.clear()
      stageRecs.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      spark.catalog.clearCache()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[probe] pass $p: $wall%.3f s wall")
      if (p == passes) {
        // listener events are posted asynchronously; give the bus a
        // moment to drain before reading the queue (probe-only slack)
        Thread.sleep(1000)
        import scala.jdk.CollectionConverters._
        val bySite = recs.asScala.toSeq.groupBy(_.site)
          .map { case (s, rs) => (s, rs.map(_.ms).sum / 1e3, rs.size) }
          .toSeq.sortBy(-_._2)
        val totalJob = bySite.map(_._2).sum
        println(f"[probe] $name: ${bySite.map(_._3).sum} jobs, " +
          f"$totalJob%.3f s summed job time (wall $wall%.3f s; gap = " +
          "driver/planning/non-job work)")
        bySite.foreach { case (site, sec, n) =>
          println(f"[probe]   $sec%8.3f s  x$n%-4d $site")
        }
        val byStage = stageRecs.asScala.toSeq.groupBy(_.site)
          .map { case (s, rs) => (s, rs.map(_.ms).sum / 1e3, rs.size) }
          .toSeq.sortBy(-_._2)
        println(f"[probe] stages (${byStage.map(_._3).sum} total):")
        byStage.takeWhile(_._2 > 0.05).take(30).foreach { case (site, sec, n) =>
          println(f"[probe]   $sec%8.3f s  x$n%-4d $site")
        }
        // timeline gaps: driver-only intervals > 80 ms with NO job in
        // flight — the "gap" bucket named, so planning/commit-protocol
        // time is attributable to the surrounding jobs' call sites
        val sorted = spans.asScala.toSeq.sortBy(_.t0)
        var cursor = 0L
        var prevSite = "(start)"
        val gaps = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Double)]
        sorted.foreach { s =>
          if (cursor > 0 && s.t0 - cursor > 80)
            gaps += ((prevSite, s.site, (s.t0 - cursor) / 1e3))
          if (s.t1 > cursor) { cursor = s.t1; prevSite = s.site }
        }
        println(f"[probe] driver gaps > 80 ms (after -> before, sec):")
        gaps.sortBy(-_._3).take(20).foreach { case (a, b, sec) =>
          println(f"[probe]   $sec%8.3f s  after [$a] before [$b]")
        }
      }
    }
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case _: Throwable => }
    spark.stop()
  }
}
