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
}
