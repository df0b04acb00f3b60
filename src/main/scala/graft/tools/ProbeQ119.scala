package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.ops.{Components, Dedup}

/** Ad-hoc probe: quantify q119's true workload (candidate pairs, component
  * count, biggest cluster sizes) at each SF dir passed as an argument —
  * used to adjudicate the sf0.1→sf1 wall-time ratio against the growth of
  * the near-dup graph itself (the scaled fixture deliberately densifies
  * dup clusters, so edge count grows faster than row count).
  */
object ProbeQ119 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val docs = Tables.documents(spark, dir)
      val pairs = Dedup
        .simhashPairs(docs, "doc_id", "text", bands = 4, maxHamming = 3)
        .cache()
      val nPairs = pairs.count()
      val comps = Components.connectedComponents(pairs, "id_a", "id_b")
      val sizes = comps.groupBy("comp").count()
      val top = sizes.orderBy(desc("count")).limit(5)
        .collect().map(_.getLong(1)).mkString(",")
      val nComp = sizes.count()
      println(s"PROBE dir=$dir docs=${docs.count()} pairs=$nPairs " +
        s"comps=$nComp top5sizes=$top")
      pairs.unpersist()
    }
    spark.stop()
  }
}
