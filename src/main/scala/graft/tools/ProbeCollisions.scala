package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.ops.Dedup

/** Ad-hoc probe: banded-join collision volume vs surviving near-dup
  * pairs for the SimHash LSH at each SF — adjudicates whether q119's
  * pair-generation cost is false-positive collisions (reducible by key
  * refinement) or true near-dup pairs (the workload itself). Also
  * estimates the collision volume under a second pigeonhole level
  * (complementary 24 bits split into 4×6-bit sub-bands: ≤ 3 flips
  * leave ≥ 1 sub-band intact, so recall is preserved exactly).
  */
object ProbeCollisions {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bands = 4
    val bitsPerBand = Dedup.SimHashBits / bands
    for (dir <- args) {
      val docs = Tables.documents(spark, dir)
      val hashed = docs
        .withColumn("th", call_function("graft_token_hashes", col("text")))
        .filter(size(col("th")) > 0)
        .withColumn("sim", Dedup.simhash(col("th")))
        .select(col("doc_id"), col("sim"))
        .localCheckpoint()
      val banded = hashed.select(col("doc_id"), col("sim"), posexplode(
        array((0 until bands).map(b =>
          shiftright(col("sim"), b * bitsPerBand) % (1 << bitsPerBand)): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      def collisions(df: org.apache.spark.sql.DataFrame, keys: Seq[String]) =
        df.groupBy(keys.map(col): _*).count()
          .agg(sum(expr("`count` * (`count` - 1) div 2")).as("c"),
            max("count").as("m")).head()
      val base = collisions(banded, Seq("band", "band_key"))
      // complementary 24 bits of band b, as 4 sub-bands of 6 bits
      val comp = expr(
        s"shiftright(sim, (band + 1) * $bitsPerBand) " +
          s"* shiftleft(1L, band * $bitsPerBand) " +
          s"+ pmod(sim, shiftleft(1L, band * $bitsPerBand))")
      val sub = banded.withColumn("comp", comp)
        .select(col("doc_id"), col("band"), col("band_key"), posexplode(
          array((0 until 4).map(s =>
            shiftright(col("comp"), s * 6) % 64): _*)))
        .withColumnRenamed("pos", "sub").withColumnRenamed("col", "sub_key")
      val refined = collisions(sub, Seq("band", "band_key", "sub", "sub_key"))
      val nDocs = hashed.count()
      val nSims = hashed.select("sim").distinct().count()
      // contraction potential: collisions over DISTINCT fingerprints
      val simBanded = hashed.select(col("sim")).distinct()
        .select(col("sim"), posexplode(
          array((0 until bands).map(b =>
            shiftright(col("sim"), b * bitsPerBand) % (1 << bitsPerBand)): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      val simColl = collisions(simBanded, Seq("band", "band_key"))
      println(s"PROBE dir=$dir docs=$nDocs distinct_sims=$nSims " +
        s"collisions=${base.getLong(0)} max_bucket=${base.getLong(1)} " +
        s"sub_collisions=${refined.getLong(0)} sub_max=${refined.getLong(1)} " +
        s"sim_collisions=${simColl.getLong(0)} sim_max=${simColl.getLong(1)}")
    }
    spark.stop()
  }
}
