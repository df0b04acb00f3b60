package graft.ops

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Index-maintenance algebra beyond what the q223/q226 oracles pin:
  * the encode-fold identity on randomized splits (any batching of the
  * corpus folds to the one-shot encoding, because the code is a pure
  * per-row function of (vector, codebook)), and the encoded search's
  * equivalence to the in-line-assignment search over the same
  * codebook. */
class IndexMaintenanceSpec extends SparkSuite {
  import spark.implicits._

  private lazy val e = Tables.embeddings(spark, sfDir("0.001"))
  private lazy val cents = Similarity
    .kmeansLloyd(e.filter(col("vec_id") % 3 =!= 0), "vec_id", "embedding",
      k = 4, iters = 2)._2

  test("encode-fold == one-shot-encode on randomized corpus splits") {
    val oneShot = Similarity.ivfEncode(e, "vec_id", "embedding", cents)
      .as[(Long, Long)].collect().toSet
    for (mod <- Seq(2L, 3L, 7L)) {
      val parts = (0L until mod).map(m =>
        Similarity.ivfEncode(e.filter(col("vec_id") % mod === m),
          "vec_id", "embedding", cents))
      val folded = parts.reduce(_ unionByName _)
        .as[(Long, Long)].collect().toSet
      assert(folded == oneShot, s"fold at split id%$mod lost the identity")
    }
  }

  test("topKIvfEncoded over the standing code table == topKIvfTrained's " +
      "in-line assignment (same codebook, same cells, same ranking)") {
    val qs = e.filter(col("vec_id") < 10)
    val codes = Similarity.ivfEncode(e, "vec_id", "embedding", cents)
    val enc = Similarity
      .topKIvfEncoded(e, codes, qs, "vec_id", "embedding", 5, cents, 2)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val inline = Similarity
      .topKIvfTrained(e, qs, "vec_id", "embedding", 5, cents, nprobe = 2)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(enc == inline,
      "pre-encoded search diverged from in-line assignment")
  }

  test("ivfEncode refuses an empty codebook; ties go to the lower cid") {
    intercept[IllegalArgumentException] {
      Similarity.ivfEncode(e, "vec_id", "embedding", Nil)
    }
    // duplicate centroids: every vector ties across both cells — the
    // lower cid must win everywhere (the search's ORDER BY cos DESC,
    // cid rule)
    val c0 = cents.head._2
    val dup = Seq(0 -> c0, 1 -> c0)
    val got = Similarity.ivfEncode(e, "vec_id", "embedding", dup)
      .select(countDistinct(col("cid")).as("k"), max(col("cid")).as("mx"))
      .as[(Long, Long)].collect().head
    assert(got == ((1L, 0L)), s"tie rule drifted: $got")
  }

  // ---------------- IndexLog (q241/q242 lifecycle) ----------------

  private def liveSet(log: org.apache.spark.sql.DataFrame) =
    IndexLog.resolve(log, "id").as[(Long, Long)].collect().toSet

  test("IndexLog: latest segment wins, tombstone beats upsert within " +
      "a segment, and a re-insert after a delete comes back live") {
    val codes = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "cid")
    val log0 = IndexLog.initial(codes, "id")
    // seg 1: re-encode id 1 to a new cell; delete id 2
    val log1 = log0
      .unionByName(IndexLog.upserts(Seq((1L, 11L)).toDF("id", "cid"), "id", 1L))
      .unionByName(IndexLog.tombstones(Seq(Tuple1(2L)).toDF("id"), "id", 1L))
    assert(liveSet(log1) == Set((1L, 11L), (3L, 30L)),
      "upsert must supersede seg 0; tombstone must drop id 2")
    // same-segment conflict: upsert AND tombstone for id 3 in seg 2 —
    // the tombstone wins (delete-after-upsert semantics)
    val log2 = log1
      .unionByName(IndexLog.upserts(Seq((3L, 33L)).toDF("id", "cid"), "id", 2L))
      .unionByName(IndexLog.tombstones(Seq(Tuple1(3L)).toDF("id"), "id", 2L))
    assert(liveSet(log2) == Set((1L, 11L)),
      "a same-segment tombstone must beat the upsert")
    // seg 3: id 2 re-inserted after its seg-1 delete — live again
    val log3 = log2
      .unionByName(IndexLog.upserts(Seq((2L, 22L)).toDF("id", "cid"), "id", 3L))
    assert(liveSet(log3) == Set((1L, 11L), (2L, 22L)),
      "re-insert after delete must resurrect the id")
  }

  test("IndexLog: compact squashes to exactly the live rows and " +
      "resolve(compact(log)) == resolve(log)") {
    val log = IndexLog.initial(
        Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("id", "cid"), "id")
      .unionByName(IndexLog.upserts(Seq((1L, 11L), (5L, 50L)).toDF("id", "cid"), "id", 1L))
      .unionByName(IndexLog.tombstones(Seq(Tuple1(3L), Tuple1(5L)).toDF("id"), "id", 2L))
    val compacted = IndexLog.compact(log, "id")
    assert(liveSet(compacted) == liveSet(log),
      "compaction must not change the live view")
    // the squash: one row per live id, no tombstones, no superseded rows
    val rows = compacted.collect()
    assert(rows.length == liveSet(log).size, "compact must keep live rows only")
    assert(rows.forall(!_.getBoolean(3)), "no tombstone survives compaction")
    // folds continue after compaction: a later segment still supersedes
    val after = compacted
      .unionByName(IndexLog.tombstones(Seq(Tuple1(4L)).toDF("id"), "id", 9L))
    assert(liveSet(after) == Set((1L, 11L), (2L, 20L)),
      "post-compaction folds must keep working")
  }

  test("IndexLog: empty and tombstone-only logs resolve to empty; " +
      "compact of a fully-deleted log keeps nothing") {
    val empty = IndexLog.initial(
      Seq.empty[(Long, Long)].toDF("id", "cid"), "id")
    assert(IndexLog.resolve(empty, "id").count() == 0)
    assert(IndexLog.compact(empty, "id").count() == 0)
    val allDead = IndexLog.initial(Seq((1L, 10L)).toDF("id", "cid"), "id")
      .unionByName(IndexLog.tombstones(Seq(Tuple1(1L)).toDF("id"), "id", 1L))
    assert(IndexLog.resolve(allDead, "id").count() == 0,
      "a fully-tombstoned log must resolve empty")
    assert(IndexLog.compact(allDead, "id").count() == 0,
      "compaction of a dead log must keep nothing")
  }

  test("IndexLog fold == one-shot: initial+upserts+tombstones over " +
      "real encodes equals the one-shot encode of the live corpus") {
    val hist = e.filter(col("vec_id") % 3 =!= 0)
    val adds = e.filter(col("vec_id") % 3 === 0)
    val log = IndexLog.initial(
        Similarity.ivfEncode(hist, "vec_id", "embedding", cents), "vec_id")
      .unionByName(IndexLog.upserts(
        Similarity.ivfEncode(adds, "vec_id", "embedding", cents), "vec_id", 1L))
      .unionByName(IndexLog.tombstones(
        e.filter(col("vec_id") % 5 === 0).select("vec_id"), "vec_id", 2L))
    val folded = IndexLog.resolve(log, "vec_id")
      .as[(Long, Long)].collect().toSet
    val oneShot = Similarity.ivfEncode(
        e.filter(col("vec_id") % 5 =!= 0), "vec_id", "embedding", cents)
      .as[(Long, Long)].collect().toSet
    assert(folded == oneShot, "lifecycle fold diverged from one-shot encode")
  }

  test("IndexLog: two upserts for one id in the SAME segment resolve " +
      "deterministically to the highest cid (round-15 tie-break — the " +
      "invariant no longer rests on callers feeding disjoint sets)") {
    val log = Seq(
      (1L, 3L, 0L, false), (1L, 7L, 0L, false), (1L, 5L, 0L, false),
      (2L, 9L, 1L, false), (2L, 2L, 1L, false))
      .toDF("vec_id", "cid", "seg", "deleted")
    val live = IndexLog.resolve(log, "vec_id")
      .as[(Long, Long)].collect().toMap
    assert(live == Map(1L -> 7L, 2L -> 9L),
      s"same-segment upsert tie must break to max cid, got $live")
    // and the tombstone still beats any same-segment upsert
    val withDel = log.unionByName(
      Seq((2L, Option.empty[Long], 1L, true))
        .toDF("vec_id", "cid", "seg", "deleted"))
    assert(IndexLog.resolve(withDel, "vec_id")
      .as[(Long, Long)].collect().toMap == Map(1L -> 7L))
  }
}
