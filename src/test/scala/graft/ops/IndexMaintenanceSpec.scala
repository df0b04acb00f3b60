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
}
