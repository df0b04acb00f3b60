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
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    for (dir <- args) {
      val docs = Tables.documents(spark, dir)
      val (pairs, tPairs) = t {
        val p = Dedup
          .simhashPairs(docs, "doc_id", "text", bands = 4, maxHamming = 3)
          .localCheckpoint()
        p.count(); p
      }
      val nPairs = pairs.count()
      // q119's phase split: standing labeling over 2/3 of the edges,
      // then the incremental fold of the remaining 1/3
      val old = pairs.filter((col("id_a") + col("id_b")) % 3 =!= 0)
      val batch = pairs.filter((col("id_a") + col("id_b")) % 3 === 0)
      val (standing, tCc) = t {
        val s = Components.connectedComponents(old, "id_a", "id_b")
          .localCheckpoint()
        s.count(); s
      }
      val (_, tFold) = t {
        Components.incrementalComponents(standing, batch, "id_a", "id_b")
          .count()
      }
      val comps = Components.connectedComponents(pairs, "id_a", "id_b")
      val sizes = comps.groupBy("comp").count()
      val top = sizes.orderBy(desc("count")).limit(5)
        .collect().map(_.getLong(1)).mkString(",")
      val nComp = sizes.count()
      println(f"PROBE dir=$dir docs=${docs.count()} pairs=$nPairs " +
        f"comps=$nComp top5sizes=$top " +
        f"t_pairs=$tPairs%.2f t_cc_old=$tCc%.2f t_fold=$tFold%.2f")
    }
    spark.stop()
  }
}
