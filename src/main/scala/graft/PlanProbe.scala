package graft

/** Dev diagnostic: run one registered query against a fixture dir, print
  * wall time and executed-plan stats. `runMain graft.PlanProbe <query> [sfDir]`. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    // warmup on the smallest fixture to exclude JVM/codegen startup
    SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001").collect()
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(args(0))(spark, dir)
    df.collect()
    println(f"elapsed: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val p = df.queryExecution.executedPlan.toString
    println("plan nodes — Exchange: " + "Exchange".r.findAllIn(p).size +
      ", FileScan: " + "FileScan".r.findAllIn(p).size)
    spark.stop()
  }
}
