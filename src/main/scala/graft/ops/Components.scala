package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over a pair relation — the step that turns
  * near-duplicate PAIRS (Dedup.nearDupPairs / simhashPairs /
  * Similarity.cosineNearDupPairs) into duplicate CLUSTERS, so a dedup
  * pipeline can pick one canonical survivor per cluster instead of
  * reasoning about an edge list. The reference pipeline has no graph
  * step; this extends the engine toward corpus-level curation
  * (builder brief: dedup as a first-class 100 TB operation).
  *
  * Algorithm: minimum-label propagation to fixpoint. Every vertex
  * starts labeled with itself; each round replaces a vertex's label
  * with the min over its own and its neighbors' labels; at fixpoint
  * every vertex carries the min vertex id of its component. Rounds are
  * pure DataFrame joins/aggregations (shuffle on vertex id), so each
  * round is one co-partitioned join + one hash aggregate at any scale.
  *
  * Scale notes:
  *  - Round count is the graph DIAMETER. Near-dup graphs are tiny
  *    star/clique clusters (diameter ≤ ~3), so propagation converges in
  *    a handful of rounds; for adversarial long-path graphs the
  *    large-star/small-star alternation (Kiveris et al., "Connected
  *    Components in MapReduce and Beyond") gets O(log n) rounds — the
  *    swap-in point is this same (id, comp) fixpoint loop.
  *  - `localCheckpoint` each round truncates the iterative plan lineage
  *    (uncheckpointed, Catalyst re-analyzes a plan that doubles per
  *    round and re-executes every prior round per action).
  *  - The convergence probe is `isEmpty` on the changed-label set — a
  *    driver-side boolean per round, not a data collect.
  */
object Components {

  /** (id, comp) for every vertex of the `srcCol`/`dstCol` pair relation;
    * comp = min vertex id reachable. Throws if `maxIter` rounds don't
    * reach the fixpoint (deterministic-output contract — a partial
    * propagation would silently mislabel).
    *
    * Each round is neighbor-min propagation PLUS one pointer-jumping hop
    * (comp ← comp(comp)), so label paths halve every round: convergence
    * in O(log diameter) rounds instead of O(diameter). Checkpoints are
    * lazy — the convergence probe is the action that materializes the
    * round, one job per round, and each round's plan is 3 small
    * co-partitioned joins regardless of how many rounds preceded it. */
  def connectedComponents(pairs: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25, smallGraphEdges: Long = 4000000L): DataFrame = {
    val spark = pairs.sparkSession
    // Materialize the edge list BEFORE narrowing the shuffle width:
    // `pairs` is typically a corpus-scale candidate join (SimHash bands
    // etc.) and must run at the session's tuned parallelism — only the
    // tiny label fixpoint below gets the narrow width.
    // Symmetric; distinct so parallel edges don't inflate joins.
    val half = pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val edges = half
      .unionByName(half.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    // Adaptive small-graph path (the AQE move: measure, then pick the
    // physical strategy): a near-dup edge list is usually the tiny tail
    // of a huge corpus, and a driver union-find beats a multi-round
    // distributed fixpoint by the whole per-round scheduling cost. The
    // count is a metadata-cheap scan of the materialized checkpoint;
    // same min-label output either way (pinned by CurationSpec). The
    // 4M-edge gate is ~64 MB of long pairs — well inside any driver
    // budget, and the union-find itself is ~1 s there, vs 5+ scheduled
    // rounds of 3 joins each on the distributed path (round-10 sf1
    // probe: the 2.26 M-edge near-dup graph sat just above the old 1M
    // gate and paid ~10 s of fixpoint for a 1.5 s driver fold).
    if (edges.count() <= smallGraphEdges) return driverUnionFind(edges)
    // the label/edge tables are the near-dup tail, tiny relative to the
    // corpus; a cluster run sizes this to edge volume, not corpus width
    graft.Sessions.withShufflePartitions(spark, 8) {
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("comp", col("id"))
        .localCheckpoint()
      var round = 0
      while (round < maxIter) {
        // min label over each vertex's neighborhood (incl. its own label)
        val viaNeighbors = edges
          .join(labels.select(col("id").as("dst"), col("comp")), "dst")
          .select(col("src").as("id"), col("comp"))
        val propagated = labels.unionByName(viaNeighbors)
          .groupBy("id").agg(min("comp").as("comp"))
        // pointer jump: follow the label one more hop (comp is itself a
        // vertex, so it has a label) — path-halving each round
        val next = propagated
          .join(
            propagated.select(col("id").as("comp"), col("comp").as("comp2")),
            Seq("comp"), "left")
          .select(col("id"), coalesce(col("comp2"), col("comp")).as("comp"))
          .localCheckpoint(eager = false)
        val changed = next.join(labels.withColumnRenamed("comp", "prevc"), "id")
          .filter(col("comp") < col("prevc"))
        val done = changed.isEmpty // the one action: materializes `next` too
        labels = next
        round += 1
        if (done) return labels
      }
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "component diameter exceeds the round budget; raise maxIter or " +
          "switch to large-star/small-star alternation")
    }
  }

  /** Weighted-union union-find with path compression over a collected
    * edge list, rooted at each component's MIN vertex id — identical
    * output to the distributed fixpoint. Only reachable below the
    * `smallGraphEdges` gate. */
  private def driverUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x // compress
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        // min id becomes the root — the deterministic label contract
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
    parent.keysIterator.map(id => (id, find(id))).toSeq.toDF("id", "comp")
  }

  /** Full dedup resolution over a document table: every row keyed to its
    * cluster representative, plus the keep/drop verdict. The survivor
    * decision rule is a parameter so every caller shares ONE definition:
    *   - `survivorOrder` empty (default): keep the MINIMUM id — pure
    *     column compare against the component label, no window at all;
    *   - `survivorOrder` non-empty: (column, ascending) pairs — keep the
    *     first row of the component under that ordering (id appended as
    *     the deterministic tiebreak): "keep the best copy", one
    *     rank-pruned window over the component key. Named columns (not
    *     arbitrary expressions) so the join can be pruned to exactly the
    *     referenced fields. */
  def resolveClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
      srcCol: String, dstCol: String,
      survivorOrder: Seq[(String, Boolean)] = Seq.empty): DataFrame = {
    val comp = connectedComponents(pairs, srcCol, dstCol)
      .withColumnRenamed("id", idCol)
    // prune to the id + the ordering columns BEFORE the join: the
    // document table carries full text — shuffling it through the
    // component join would dominate the whole resolution
    val needed = (idCol +: survivorOrder.map(_._1)).distinct
    val tagged = docs.select(needed.map(col): _*)
      .join(comp, Seq(idCol), "left")
      .withColumn("component", coalesce(col("comp"), col(idCol)))
    if (survivorOrder.isEmpty)
      tagged.select(col(idCol), col("component"),
        (col("component") === col(idCol)).as("keep"))
    else {
      val order = survivorOrder.map { case (c, asc) =>
        if (asc) col(c).asc else col(c).desc
      } :+ col(idCol).asc
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("component").orderBy(order: _*)
      tagged
        .withColumn("keep", row_number().over(w) === 1)
        .select(col(idCol), col("component"), col("keep"))
    }
  }

  /** INCREMENTAL connected components: fold a NEW batch of edges into an
    * existing min-label labeling without re-running the fixpoint over
    * the historical edge set — the continuous-ingest shape for dedup
    * clusters (the cluster twin of Dedup.nearDupPairsAgainst's pair
    * stream). Exactness contract (pinned in ComponentsSpec): if `labels`
    * is the min-label CC of edge set E, the result is the min-label CC
    * of E ∪ newPairs — each existing label is already the minimum id of
    * its cluster, so running CC on the LABEL graph (each new edge mapped
    * to its endpoints' current labels) and re-mapping yields the global
    * minimum exactly.
    *
    * Scale shape: two label lookups (key-keyed joins of the batch
    * against the standing labeling — in production an indexed table),
    * then the fixpoint runs on the TOUCHED-COMPONENT graph, whose size
    * is bounded by the batch, never the corpus; the final remap is one
    * broadcast-sized join against the merge table (merges ≤ new edges).
    * Returns the updated full labeling (id, comp) — rows for every
    * previously-labeled id plus any id newly seen in the batch. */
  def incrementalComponents(labels: DataFrame, newPairs: DataFrame,
      srcCol: String, dstCol: String): DataFrame = {
    require(labels.columns.toSeq == Seq("id", "comp"),
      s"expected a (id, comp) labeling, got ${labels.columns.toSeq}")
    // label-graph edges: each new edge between its endpoints' components
    val src = newPairs.select(col(srcCol).as("_a"), col(dstCol).as("_b"))
      .join(labels.withColumnRenamed("id", "_a").withColumnRenamed("comp", "_ca"),
        Seq("_a"), "left")
      .join(labels.withColumnRenamed("id", "_b").withColumnRenamed("comp", "_cb"),
        Seq("_b"), "left")
      .select(coalesce(col("_ca"), col("_a")).as("csrc"),
        coalesce(col("_cb"), col("_b")).as("cdst"))
      .filter(col("csrc") =!= col("cdst"))
    // fixpoint over the touched-component graph only
    val merged = connectedComponents(src, "csrc", "cdst")
      .withColumnRenamed("id", "_oldc").withColumnRenamed("comp", "_newc")
    // the standing labeling plus singletons for ids first seen now
    val newIds = newPairs.select(col(srcCol).as("id"))
      .unionByName(newPairs.select(col(dstCol).as("id")))
      .distinct()
      .join(labels, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("comp"))
    labels.unionByName(newIds)
      .join(broadcast(merged), col("comp") === col("_oldc"), "left")
      .select(col("id"), coalesce(col("_newc"), col("comp")).as("comp"))
  }

  /** Fixed-iteration PageRank in scaled-integer arithmetic: link analysis
    * over an edge relation (e.g. the near-dup graph, or a bipartite
    * interaction graph), used to pick authoritative canonical documents
    * or weight sources by connectivity.
    *
    * Ranks are BIGINTs scaled by 1e9 and every step is integer-exact —
    * contribution = rank `div` outdegree (floor), damping = (85·Σ) `div`
    * 100 — so the result is bit-identical across engines, partitionings
    * and merge orders (a float PageRank is not: FP addition does not
    * commute with Spark's nondeterministic partial-agg order). Each
    * iteration is one co-partitioned join (edges ⋈ ranks on src) plus
    * one hash aggregate on dst — the Pregel shape, linear per iteration
    * at any scale, no driver-side data. Callers pass a SYMMETRIC edge
    * list (or otherwise every node reachable) so the node set is stable
    * across iterations; dangling mass is dropped, matching the
    * simplified formulation (Page et al., 1999, eq. 2).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame =
    pageRankFrom(edges, srcCol, dstCol, init = None, iters)

  /** [[pageRank]] warm-started from a standing rank table (node_id, pr)
    * — the graph-MAINTENANCE entry point: after an edge batch arrives,
    * nobody restarts power iteration from uniform over 100 TB of edges;
    * the standing vector is already near the new fixpoint everywhere
    * the batch didn't touch, so a couple of warm iterations buy what a
    * cold restart needs many for (same per-iteration Pregel cost —
    * warm-starting changes the CONSTANT, not the shape). Nodes absent
    * from `init` (new arrivals) seed at the uniform 1e9. Deterministic:
    * same scaled-integer recurrence as the cold start, so the warmed
    * result is a pure function of (init, edges, iters) that the oracle
    * replays exactly. */
  def pageRankFrom(edges: DataFrame, srcCol: String, dstCol: String,
      init: Option[DataFrame], iters: Int,
      diskEdges: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters out of range: $iters")
    // `diskEdges`: the edge table is the graph-sized artifact (1e8 rows
    // at the sf10 probe) and a MEMORY-resident copy starves the unified
    // pool for the iteration aggregates themselves (storageFraction
    // protects cached blocks from eviction — measured heap OOM at
    // sf10); DISK_ONLY re-reads are sequential and cheap next to the
    // shuffle each iteration already pays, but cost ~65% at sf0.1, so
    // callers gate the level on measured volume (q291's orders count).
    // Small graphs keep the EAGER localCheckpoint (an A/B against the
    // columnar MEMORY_AND_DISK cache measured the cache 3x slower for
    // q126's graph — building the compressed columnar form costs more
    // than the whole fixpoint there).
    val eRaw = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e =
      if (diskEdges)
        eRaw.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      else eRaw.localCheckpoint()
    val degRaw = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val deg =
      if (diskEdges)
        degRaw.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      else degRaw.localCheckpoint()
    var rank = init.fold(deg.select(col("src"), lit(1000000000L).as("pr"))) {
      r0 =>
        deg.select(col("src"))
          .join(r0.select(col("node_id").as("src"), col("pr")), Seq("src"),
            "left")
          .select(col("src"), coalesce(col("pr"), lit(1000000000L)).as("pr"))
    }
    for (i <- 1 to iters) {
      rank = e.join(rank.join(deg, "src"), "src")
        .select(col("dst"), expr("pr div outdeg").as("c"))
        .groupBy("dst")
        .agg(expr("CAST(150000000 + (85 * sum(c)) div 100 AS BIGINT)").as("pr"))
        .withColumnRenamed("dst", "src")
      // Truncate the join lineage every few iterations: without this a
      // deep run (iters=20) carries a 20-join plan into the final
      // action — Catalyst re-analysis cost grows superlinearly and a
      // lost executor would recompute every prior iteration. Cadence 5
      // keeps at most a 5-deep tail at the (small) cost of
      // materializing the |nodes|-sized rank table a few times.
      if (i % 5 == 0 && i < iters) rank = rank.localCheckpoint()
    }
    val out = rank.select(col("src").as("node_id"), col("pr"))
    if (diskEdges) {
      // The DISK_ONLY edge/degree tables are graph-sized; callers like
      // q291 invoke this twice per run (standing + full graph), so
      // leaving them registered would hold 4 graph-sized persisted
      // tables in the shared session for its lifetime. Force the
      // |nodes|-sized result first, then release both inputs.
      val mat = out.localCheckpoint()
      e.unpersist()
      deg.unpersist()
      mat
    } else out
  }

  /** Deterministic synchronous label propagation (Raghavan et al. 2007
    * made reproducible): every node starts as its own community; each
    * iteration relabels a node to its neighbors' MOST FREQUENT label,
    * ties to the smallest label, isolated nodes keep their own. Unlike
    * min-label connected components, LPA splits a weakly-bridged
    * near-dup graph into densely-connected communities — the structure
    * template-dedup actually wants when one low-Hamming bridge would
    * otherwise glue two distinct template families into one component.
    *
    * Determinism: the classic algorithm breaks frequency ties randomly
    * and updates asynchronously; here updates are synchronous and the
    * argmax orders (count DESC, label ASC), so the result is a pure
    * function of the edge list that any engine replays exactly.
    *
    * Scale shape: per iteration one co-partitioned join (edges ⋈ labels
    * on dst) + one (node, label) hash aggregate + one per-node argmax
    * (a keyed window whose partitions are bounded by a node's distinct
    * neighbor-label count) — the Pregel shape, linear per iteration.
    * `pairs` should come from a bounded generator
    * ([[graft.ops.Dedup.simhashPairsCapped]]) at corpus scale. */
  def labelPropagation(nodes: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters out of range: $iters")
    val e = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint() // computed once, reused every iteration
    var labels = nodes.select(col(idCol).as("id"), col(idCol).cast("long").as("lab"))
    for (i <- 1 to iters) {
      val best = e.join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src"), col("lab"))
        .agg(count(lit(1)).as("c"))
        .withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("src").orderBy(col("c").desc, col("lab"))))
        .filter(col("_rn") === 1)
        .select(col("src").as("id"), col("lab").as("nl"))
      labels = labels.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("nl"), col("lab")).as("lab"))
      if (i % 5 == 0 && i < iters) labels = labels.localCheckpoint()
    }
    labels.select(col("id").as(idCol), col("lab").as("community"))
  }

  /** k-core decomposition (fixed k): the maximal subgraph in which every
    * node keeps degree ≥ k after everything weaker is peeled away — the
    * dense-template CORE of a near-dup graph, as opposed to its
    * periphery of one-off matches. Dedup policy reads it directly:
    * core members are template boilerplate (aggressive keep-one),
    * non-core pairs are incidental similarity (keep both, maybe
    * down-weight). Matula & Beck 1983's peeling, made synchronous.
    *
    * Algorithm: start from all endpoint nodes; each round recomputes
    * degrees within the surviving subgraph and drops nodes below k.
    * The survivor set shrinks monotonically, so the fixpoint is exact
    * and reached in at most |V| rounds — in practice a handful, since
    * near-dup graphs are cliques-plus-bridges (a clique of size > k
    * never peels; chains peel end-in). Throws if `maxIter` rounds don't
    * converge, same deterministic-output contract as
    * [[connectedComponents]] — and the fixpoint is ROUND-COUNT
    * INDEPENDENT past convergence (peeling an already-stable set is the
    * identity), so a replay that unrolls a fixed R ≥ rounds reproduces
    * it exactly.
    *
    * Scale shape: per round one co-partitioned semi-join of the edge
    * list against the survivor set (both sides keyed on node id) + one
    * degree hash-aggregate — linear in surviving edges, and the work
    * SHRINKS every round. Edges are localCheckpointed once; the
    * convergence probe is a count, not a collect. `pairs` should come
    * from a bounded generator ([[graft.ops.Dedup.simhashPairsCapped]])
    * at corpus scale.
    *
    * Returns (idCol, in_core: boolean, core_degree: long|null) for every
    * node of `nodes` — nodes outside the core (or with no edges at all)
    * read (false, null). */
  def kCore(nodes: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String, k: Int, maxIter: Int = 15): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val e = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint()
    var alive = e.select(col("src").as("id")).distinct().localCheckpoint()
    var nAlive = alive.count()
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      round += 1
      val deg = e
        .join(alive.withColumnRenamed("id", "src"), "src")
        .join(alive.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
      val next = deg.filter(col("d") >= k).select("id").localCheckpoint()
      val n = next.count()
      converged = n == nAlive
      alive = next; nAlive = n
    }
    require(converged, s"kCore(k=$k) did not converge in $maxIter rounds")
    val coreDeg = e
      .join(alive.withColumnRenamed("id", "src"), "src")
      .join(alive.withColumnRenamed("id", "dst"), "dst")
      .groupBy(col("src").as("id")).agg(count(lit(1)).as("core_degree"))
    nodes.select(col(idCol))
      .join(coreDeg.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("core_degree").isNotNull.as("in_core"),
        col("core_degree"))
  }
}
