package graft.ops

import graft.TestSpark
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck property: connectedComponents on random graphs (both the
  * distributed fixpoint and the driver union-find fast path) must match
  * a plain-Scala BFS reference model — every vertex labeled with the
  * minimum id reachable from it. */
object ComponentsProps extends Properties("connectedComponents") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12).withWorkers(1)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference model: BFS from each vertex over the undirected edge set. */
  private def model(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.HashMap.empty[Long, List[Long]]
    edges.foreach { case (a, b) =>
      adj.update(a, b :: adj.getOrElse(a, Nil))
      adj.update(b, a :: adj.getOrElse(b, Nil))
    }
    val verts = adj.keySet.toSeq
    val comp = scala.collection.mutable.HashMap.empty[Long, Long]
    verts.sorted.foreach { v =>
      if (!comp.contains(v)) {
        // v is the min id of an unvisited component (sorted iteration)
        var frontier = List(v)
        while (frontier.nonEmpty) {
          val next = frontier.flatMap(u =>
            if (comp.contains(u)) Nil else { comp.update(u, v); adj(u) })
          frontier = next.filterNot(comp.contains)
        }
      }
    }
    comp.toMap
  }

  private val genEdges: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(2, 40) // vertex universe
    m <- Gen.choose(1, 60) // edge count
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong)
      b <- Gen.choose(0L, n.toLong)
    } yield (a, b))
  } yield edges.filter { case (a, b) => a != b } // no self loops

  property("matches BFS reference model on both physical paths") =
    Prop.forAll(genEdges) { edges =>
      edges.isEmpty || {
        val df = edges.toDF("id_a", "id_b")
        val expected = model(edges)
        val fast = Components.connectedComponents(df, "id_a", "id_b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val dist = Components
          .connectedComponents(df, "id_a", "id_b", smallGraphEdges = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        fast == expected && dist == expected
      }
    }

  property("gate boundary: smallGraphEdges = E picks the driver path, " +
      "E - 1 the distributed one — identical labels on the same graph") =
    Prop.forAll(genEdges) { edges =>
      edges.isEmpty || {
        val df = edges.toDF("id_a", "id_b")
        // E as the gate compares it: the symmetrized DISTINCT edge count
        val e = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
          .distinct.size.toLong
        val expected = model(edges)
        val atGate = Components
          .connectedComponents(df, "id_a", "id_b", smallGraphEdges = e)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val justOver = Components
          .connectedComponents(df, "id_a", "id_b", smallGraphEdges = e - 1)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        atGate == expected && justOver == expected && atGate == justOver
      }
    }
}
