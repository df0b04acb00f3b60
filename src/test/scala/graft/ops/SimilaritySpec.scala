package graft.ops

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(1f, 0f, 0f, 0f)),
    (1L, Seq(0.9f, 0.1f, 0f, 0f)), // near q0
    (2L, Seq(0f, 1f, 0f, 0f)),     // orthogonal to q0
    (3L, Seq(-1f, 0f, 0f, 0f))     // opposite to q0
  ).toDF("vec_id", "embedding")

  test("cosine: exact values on unit axes") {
    val out = Similarity.topKBruteForce(vecs, vecs.filter(col("vec_id") === 0),
      "vec_id", "embedding", 3)
    val byRank = out.select("rank", "neighbor_id", "cos")
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(byRank.map(_._2).toSeq == Seq(1L, 2L, 3L))
    assert(math.abs(byRank(1)._3 - 0.0) < 1e-12) // orthogonal
    assert(math.abs(byRank(2)._3 + 1.0) < 1e-12) // opposite
  }

  test("LSH buckets: identical vectors share a bucket, opposite vectors differ") {
    val b = vecs
      .select(col("vec_id"),
        Similarity.lshBucket(Similarity.toDouble(col("embedding")), 8, 4).as("bucket"))
      .as[(Long, Long)].collect().toMap
    assert(b(0L) == b(1L), "near-identical vectors must collide")
    assert(b(0L) != b(3L), "opposite vectors must not collide")
  }

  test("multi-table bucketed ANN achieves decent recall vs brute force") {
    val e = Tables.embeddings(spark, sfDir("0.01"))
    val q = e.filter(col("vec_id") < 10)
    val exact = Similarity.topKBruteForce(e, q, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.topKBucketed(e, q, "vec_id", "embedding", 3,
      nbits = 4, dim = 64, tables = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    // 4 tables × 4 bits: P(candidate) = 1-(1-p^4)^4; the planted clusters
    // keep true neighbors at high cosine, so recall should clear 0.5
    // (single-table recall on this fixture measured 0.27)
    assert(recall >= 0.5, s"recall $recall too low")
    assert(ann.size <= exact.size)
  }

  test("IVF ANN: candidates restricted to probed cells, decent recall") {
    val e = Tables.embeddings(spark, sfDir("0.01"))
    val q = e.filter(col("vec_id") < 10)
    val exact = Similarity.topKBruteForce(e, q, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.topKIvf(e, q, "vec_id", "embedding", 3, centroids = 16, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("cosineNearDupPairs: finds planted near-identical embedding") {
    val withDup = vecs.unionByName(Seq((9L, Seq(0.99f, 0.05f, 0f, 0f))).toDF("vec_id", "embedding"))
    val pairs = Similarity.cosineNearDupPairs(withDup, "vec_id", "embedding",
      threshold = 0.99, nbits = 2, dim = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 9L)) || pairs.contains((1L, 9L)))
  }
}
