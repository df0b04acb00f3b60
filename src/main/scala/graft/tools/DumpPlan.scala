package graft.tools

import graft.{Sessions, SparkEntry}
import org.apache.spark.sql.execution.ExplainMode

/** Dev diagnostic (optimization rounds): write one registered query's
  * `.explain("formatted")` output to a file — the before/after plan
  * evidence under plans/r20/. The query is EXECUTED first so AQE's
  * final plan (isFinalPlan=true, codegen ids, chosen join strategies)
  * is what lands in the file, not the pre-execution placeholder.
  *
  * `runMain graft.tools.DumpPlan <query> <sfDir> <outFile>`
  */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val out = args(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.toRdd.count() // run: AQE finalizes, codegen ids settle
    val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val p = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
    println(s"[dumpplan] $name -> $out (${txt.length} chars)")
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case _: Throwable => }
    spark.stop()
  }
}
