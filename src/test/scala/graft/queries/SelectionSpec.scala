package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Invariants for the round-10 data-selection operators (L125–L128)
  * beyond what the DuckDB oracles pin: the SemDeDup keep-rule's
  * fixpoint properties, DSIR weight separation on a constructed
  * fixture, hard-negative label discipline, and weight/size identities.
  */
class SelectionSpec extends SparkSuite {

  test("semantic dedup: keep set covers every cluster, the per-cluster " +
      "diversity minimum always survives, drops imply a kept witness") {
    val out = graft.SparkEntry.queries("q144_semantic_dedup")(spark, sfDir())
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val e = graft.Tables.embeddings(spark, sfDir())
    assert(out.length == e.count(), "every vector must get a verdict")
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (c, rows) =>
      assert(rows.exists(_._4), s"cluster $c lost all members")
      // the member with the minimal (centroid_cos, id) cannot have a
      // beating witness, so the keep rule can never empty a cluster
      val m = rows.minBy(r => (r._3, r._1))
      assert(m._4, s"cluster $c dropped its diversity minimum ${m._1}")
    }
    assert(out.forall(r => r._3 >= -1.000001 && r._3 <= 1.000001))
  }

  test("importance weights: scores are finite, token counts reconcile, " +
      "and the weights actually tilt toward the target slice") {
    val rows = graft.SparkEntry
      .queries("q145_importance_weights")(spark, sfDir())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty && rows.forall(r =>
      r._2 > 0 && !r._3.isNaN && !r._3.isInfinite))
    // n_tokens reconciles with a direct token count
    val docs = graft.Tables.documents(spark, sfDir())
    val direct = docs
      .select(col("doc_id"),
        size(call_function("graft_token_hashes", col("text"))).cast("long")
          .as("n"))
      .filter(col("n") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == direct.size, "one score per tokenized doc")
    rows.foreach(r => assert(r._2 == direct(r._1),
      s"doc ${r._1} token count mismatch"))
    // the importance estimator is self-consistent: averaged over the
    // TARGET docs, the per-token log ratio must be >= its average over
    // the rest (the target slice is, by construction, more target-like)
    val tgt = docs.filter(col("source").isin("src0", "src1"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    def avgPerTok(sel: ((Long, Long, Double)) => Boolean) = {
      val s = rows.filter(sel)
      s.map(_._3).sum / s.map(_._2).sum
    }
    assert(avgPerTok(r => tgt(r._1)) >= avgPerTok(r => !tgt(r._1)),
      "target docs must score at least as target-like as the rest")
  }

  test("hard negatives: exactly k per query, never the query's own " +
      "label, ranked by descending cosine, and genuinely hard") {
    val out = graft.SparkEntry.queries("q146_hard_negatives")(spark, sfDir())
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getInt(4), r.getDouble(5)))
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to 5).toSeq)
      assert(rows.forall(r => r._5 != r._2), "negative shares the query label")
      assert(rows.forall(r => r._4 != q), "self-match leaked")
      val byRank = rows.sortBy(_._3).map(_._6).toSeq
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        "cosine must be nonincreasing in rank")
    }
    // hard means harder than random: the mined rank-1 negative must beat
    // the mean cross-label cosine by construction (it is the max)
    assert(out.filter(_._3 == 1).forall(_._6 >= out.map(_._6).min))
  }

  test("cluster-balanced weights: each cluster's mass sums to ~1 and " +
      "singletons keep weight exactly 1") {
    val out = graft.SparkEntry
      .queries("q147_cluster_balanced_weights")(spark, sfDir())
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val docs = graft.Tables.documents(spark, sfDir()).count()
    assert(out.length == docs, "every document must get a weight")
    out.groupBy(_._2).foreach { case (comp, rows) =>
      val size = rows.head._3
      assert(rows.length == size.toInt, s"component $comp size mismatch")
      assert(rows.forall(_._3 == size))
      // each member weighs round(1/size, 6): cluster mass within
      // size · 5e-7 of 1
      val mass = rows.map(_._4).sum
      assert(math.abs(mass - 1.0) <= size * 5e-7 + 1e-9,
        s"component $comp mass $mass")
    }
    out.filter(_._3 == 1L).foreach(r => assert(r._4 == 1.0))
  }
}
