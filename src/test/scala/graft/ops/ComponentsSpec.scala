package graft.ops

import graft.SparkSuite

/** Adversarial convergence pin for the distributed components fixpoint:
  * ComponentsProps covers random small graphs on both physical paths;
  * this suite forces the worst-case SHAPE — a single long path, the
  * graph whose diameter equals its size — above the union-find gate. */
class ComponentsSpec extends SparkSuite {
  import spark.implicits._

  test("long-path graph: pointer jumping converges with maxIter << diameter") {
    val n = 2048
    // path 0—1—2—…—2048: diameter n. Pure min-label propagation needs
    // ~n rounds and would blow the 25-round budget; the pointer-jumping
    // hop halves label paths every round, so ⌈log2(n)⌉ ≈ 11 rounds must
    // reach the fixpoint (non-convergence throws, it never mislabels).
    val edges = (0 until n).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")
    val comp = Components
      .connectedComponents(edges, "id_a", "id_b", maxIter = 25, smallGraphEdges = 0L)
      .collect()
    assert(comp.length == n + 1)
    assert(comp.forall(_.getLong(1) == 0L),
      "every path vertex must label to the min vertex id 0")
  }

  test("incrementalComponents PROPERTY: fold(CC(old), batch) == CC(old ∪ " +
      "batch) on randomized splits; new ids absorbed; empty batch no-op") {
    val rnd = new scala.util.Random(119L)
    def labelMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (round <- 1 to 3) {
      // random sparse graph over ~40 vertices, random 60/40 edge split —
      // the batch may bridge, extend, or introduce brand-new components
      val all = (for {
        _ <- 1 to 50
        a = rnd.nextInt(40).toLong; b = rnd.nextInt(40).toLong if a != b
      } yield (math.min(a, b), math.max(a, b))).distinct
      val (old, batch) = all.partition(_ => rnd.nextDouble() < 0.6)
      val standing = Components.connectedComponents(
        old.toDF("id_a", "id_b"), "id_a", "id_b")
      val inc = Components.incrementalComponents(
        standing, batch.toDF("id_a", "id_b"), "id_a", "id_b")
      val full = Components.connectedComponents(
        all.toDF("id_a", "id_b"), "id_a", "id_b")
      assert(labelMap(inc) == labelMap(full), s"round $round: fold != full CC")
      // empty batch: the labeling comes back unchanged
      val noop = Components.incrementalComponents(standing,
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b")
      assert(labelMap(noop) == labelMap(standing), s"round $round: no-op drifted")
    }
  }

  test("labelPropagation: barbell splits into two communities where " +
      "components would merge; isolated node keeps its label") {
    // two triangles bridged by one edge, plus isolated node 9
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L)).toDF("id_a", "id_b")
    val nodes = (Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L)).toDF("doc_id")
    val got = Components
      .labelPropagation(nodes, "doc_id", pairs, "id_a", "id_b", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-simulated synchronous LPA with (count desc, label asc) argmax
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L, 9L -> 9L))
    // min-label components would glue everything but 9 into one cluster
    val cc = Components.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(1)).distinct
    assert(cc.length == 1)
  }

  test("kCore: clique survives, pendant chain and bridge peel away; " +
      "fixpoint is round-count independent; non-convergence throws") {
    // 4-clique {1,2,3,4} + chain 4—5—6—7 + isolated 9
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 9L).toDF("doc_id")
    val got = Components
      .kCore(nodes, "doc_id", pairs, "id_a", "id_b", k = 3, maxIter = 8)
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    // 3-core = the clique, every member at within-core degree 3; the
    // chain (degree ≤ 2 throughout) and the no-edge node are out
    assert(got == Map(
      1L -> (true, 3L), 2L -> (true, 3L), 3L -> (true, 3L), 4L -> (true, 3L),
      5L -> (false, -1L), 6L -> (false, -1L), 7L -> (false, -1L),
      9L -> (false, -1L)))
    // round-count independence: a bigger maxIter changes nothing
    val again = Components
      .kCore(nodes, "doc_id", pairs, "id_a", "id_b", k = 3, maxIter = 15)
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(again == got)
    // a long chain under k=2 peels one node per end per round — 20
    // nodes cannot converge in 3 rounds, and the contract is THROW,
    // never a silently-partial core
    val chain = (0L until 20L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("id_a", "id_b")
    val chainNodes = (0L until 20L).toDF("doc_id")
    intercept[IllegalArgumentException] {
      Components.kCore(chainNodes, "doc_id", chain, "id_a", "id_b",
        k = 2, maxIter = 3).collect()
    }
  }

  test("pageRankFrom composes: warm(cold(E,3), 2) == cold(E,5) bit-for-bit " +
      "on the same graph, and absent nodes seed at the uniform 1e9") {
    import spark.implicits._
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val e = e0.unionByName(e0.select($"dst".as("src"), $"src".as("dst")))
    val cold3 = graft.ops.Components.pageRank(e, "src", "dst", iters = 3)
    val warm = graft.ops.Components
      .pageRankFrom(e, "src", "dst", Some(cold3), iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val cold5 = graft.ops.Components.pageRank(e, "src", "dst", iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(warm == cold5, "the scaled-integer recurrence composes exactly")
    // a node the standing vector has never seen starts from uniform:
    // warm-starting the EXPANDED graph from a partial init is exactly
    // one cold iteration from (init ++ uniform-for-new)
    val e2a = e.unionByName(Seq((5L, 1L), (1L, 5L)).toDF("src", "dst"))
    val seeded = graft.ops.Components
      .pageRankFrom(e2a, "src", "dst", Some(cold3), iters = 1)
    val manual = graft.ops.Components.pageRankFrom(e2a, "src", "dst",
      Some(cold3.unionByName(Seq((5L, 1000000000L)).toDF("node_id", "pr"))),
      iters = 1)
    assert(seeded.collect().map(_.toString).sorted.toSeq ==
      manual.collect().map(_.toString).sorted.toSeq)
  }
}
