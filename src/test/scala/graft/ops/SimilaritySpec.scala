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

  test("kmeansLloyd: separates two planted blobs, deterministic across " +
      "partitionings, empty clusters carry their centroid forward") {
    // two tight blobs far apart; ids interleaved so the init (lowest two
    // ids) seeds one centroid in each blob
    val pts = (0 until 40).map { i =>
      val blob = i % 2
      val base = if (blob == 0) 10.0f else -10.0f
      (i.toLong, Seq(base + (i % 5) * 0.01f, base - (i % 3) * 0.01f, 0.0f, 1.0f))
    }.toDF("vec_id", "embedding")
    val (assigned, cents) = Similarity.kmeansLloyd(pts, "vec_id", "embedding",
      k = 2, iters = 3)
    val byCluster = assigned.select("vec_id", "cluster")
      .as[(Long, Int)].collect().groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    assert(byCluster(0) == (0 until 40 by 2).map(_.toLong).toSet)
    assert(byCluster(1) == (1 until 40 by 2).map(_.toLong).toSet)
    // centroid of blob 0 ≈ (10ish, 10ish, 0, 1)
    val c0 = cents.toMap.apply(0)
    assert(math.abs(c0(0) - 10.0) < 0.1 && math.abs(c0(3) - 1.0) < 1e-9)
    // identical training at a different physical partitioning
    val (_, cents2) = Similarity.kmeansLloyd(pts.repartition(7), "vec_id",
      "embedding", k = 2, iters = 3)
    assert(cents2 == cents)
    // duplicate init vectors: every point ties to cluster 0 (lower id
    // wins), cluster 1 starves and must carry its init centroid forward
    val twin = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.1f)))
      .toDF("vec_id", "embedding")
    val (ta, tc) = Similarity.kmeansLloyd(twin, "vec_id", "embedding", k = 2, iters = 1)
    val tm = tc.toMap
    assert(tm(1) == Seq(1.0, 0.0), "starved cluster must keep its init centroid")
    assert(math.abs(tm(0)(1) - 0.1 / 3) < 1e-6) // trained: mean of all three
    // final assignment under the trained pair splits the twin from the odd one
    val asg = ta.select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(asg == Map(0L -> 1, 1L -> 1, 2L -> 0))
    // refusals: k larger than the corpus, column collision
    intercept[IllegalArgumentException] {
      Similarity.kmeansLloyd(twin, "vec_id", "embedding", k = 9, iters = 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.kmeansLloyd(twin.withColumn("cluster", lit(1)),
        "vec_id", "embedding", k = 2, iters = 1)
    }
  }

  test("scalar quantization: codes in [0,255], reconstruction within half " +
      "a step per dimension, degenerate dimensions exact") {
    val vs = Seq(
      (0L, Seq(-1.0f, 0.25f, 7.0f, 3.0f)),
      (1L, Seq(1.0f, 0.75f, 7.0f, -3.0f)),
      (2L, Seq(0.5f, 0.5f, 7.0f, 0.0f))).toDF("vec_id", "embedding")
    val (mins, maxs) = Similarity.sqTrain(vs, "embedding")
    assert(mins == Seq(-1.0, 0.25, 7.0, -3.0) && maxs == Seq(1.0, 0.75, 7.0, 3.0))
    val out = vs.select(col("vec_id"),
        col("embedding"),
        Similarity.sqEncode(col("embedding"), mins, maxs).as("code"),
        Similarity.sqDecode(
          Similarity.sqEncode(col("embedding"), mins, maxs), mins, maxs).as("dec"))
      .as[(Long, Seq[Float], Seq[Int], Seq[Double])].collect()
    out.foreach { case (_, orig, code, dec) =>
      assert(code.forall(c => c >= 0 && c <= 255), s"code range: $code")
      orig.zip(dec).zipWithIndex.foreach { case ((x, xd), i) =>
        val halfStep = (maxs(i) - mins(i)) / 255.0 / 2.0
        assert(math.abs(x.toDouble - xd) <= halfStep + 1e-12,
          s"dim $i: $x decoded to $xd (half-step $halfStep)")
      }
    }
    // the degenerate constant dimension reconstructs exactly
    assert(out.forall(_._4(2) == 7.0))
    // out-of-bounds encode (new ingest vs an older codebook) SATURATES
    // instead of wrapping: above max → 255, below min → 0
    val oob = Seq((9L, Seq(5.0f, -1.0f, 7.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .select(Similarity.sqEncode(col("embedding"), mins, maxs).as("code"))
      .as[Seq[Int]].head()
    assert(oob(0) == 255 && oob(1) == 0)
  }

  test("cosineNearDupPairs: finds planted near-identical embedding") {
    val withDup = vecs.unionByName(Seq((9L, Seq(0.99f, 0.05f, 0f, 0f))).toDF("vec_id", "embedding"))
    val pairs = Similarity.cosineNearDupPairs(withDup, "vec_id", "embedding",
      threshold = 0.99, nbits = 2, dim = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 9L)) || pairs.contains((1L, 9L)))
  }

  test("rademacherPlanes/randomProjection: ±1 deterministic planes; the " +
      "compiled projection equals the manual left fold bit for bit") {
    val planes = Similarity.rademacherPlanes(16, 64)
    assert(planes.length == 16 &&
      planes.forall(p => p.length == 64 && p.forall(x => x == 1.0 || x == -1.0)))
    assert(planes.map(_.toSeq) == Similarity.rademacherPlanes(16, 64).map(_.toSeq),
      "planes must be deterministic")
    // roughly balanced signs (a degenerate all-ones plane would make the
    // projection a plain sum, not a JL embedding)
    planes.foreach { p =>
      val pos = p.count(_ == 1.0)
      assert(pos >= 16 && pos <= 48, s"unbalanced plane: $pos of 64 positive")
    }
    val v = (0 until 64).map(i => ((i * 31) % 11).toDouble - 5.0)
    val got = Seq(Tuple1(v)).toDF("dv")
      .select(Similarity.randomProjection(col("dv"), 16, 64).as("pv"))
      .as[Seq[Double]].head()
    // scala foldLeft matches the kernel's index-order sequential fold
    val manual = planes.map(p => p.zip(v).foldLeft(0.0) {
      case (acc, (s, x)) => acc + s * x
    })
    assert(got == manual.toSeq, "projection must equal the manual fold exactly")
  }

  test("groupDispersion: identical vectors -> 1, orthogonal -> 0, " +
      "singleton -> NULL, all via the centroid-norm identity") {
    val e1 = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val e2 = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val df = Seq(
      ("same", e1), ("same", e1), ("same", e1),
      ("orth", e1), ("orth", e2),
      ("solo", e2)).toDF("src", "embedding")
    val got = Similarity.groupDispersion(df, "src", "embedding")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got("same")._1 == 3L)
    assert(math.abs(got("same")._2.get - 1.0) < 1e-6,
      s"identical vectors must disperse to ~1, got ${got("same")._2}")
    assert(math.abs(got("orth")._2.get) < 1e-6,
      s"orthogonal vectors must disperse to ~0, got ${got("orth")._2}")
    assert(got("solo") == ((1L, None)), "below 2 vectors the mean is NULL")
  }

  test("pq: per-subspace codebooks train independently (empty cluster " +
      "keeps its centroid), codes follow the argmin, ADC ranks exactly") {
    // subspace A separates {v0,v1} from {v2,v3}; in subspace B both init
    // centroids coincide (v0 and v1 share (10,10)), so cluster 1 goes
    // EMPTY in training and must keep its init centroid
    val df = Seq(
      (0L, Seq(0f, 0f, 10f, 10f)),
      (1L, Seq(0.2f, 0f, 10f, 10f)),
      (2L, Seq(5f, 5f, 0f, 0f)),
      (3L, Seq(5.2f, 5f, 0f, 0f))).toDF("vec_id", "embedding")
    val cbs = Similarity.pqTrain(df, "vec_id", "embedding",
      dim = 4, m = 2, ksub = 2, iters = 1)
    assert(cbs.size == 2 && cbs.forall(_.size == 2))
    // subspace B: cluster 1 was empty after the tie-to-lower assignment,
    // so its centroid must still be the init (10,10)
    assert(cbs(1).toMap.apply(1) == Seq(10.0, 10.0))
    val codes = df.select(col("vec_id"),
      Similarity.pqEncode(col("embedding"), cbs, 4).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(codes(0) == Seq(0, 1) && codes(1) == Seq(0, 1))
    assert(codes(2) == Seq(1, 0) && codes(3) == Seq(1, 0))
    val top = Similarity.pqTopK(df, df.filter(col("vec_id") === 0),
      "vec_id", "embedding", cbs, dim = 4, k = 3)
      .orderBy("rank")
      .select("rank", "neighbor_id", "adc_d2")
      .as[(Int, Long, Double)].collect().toSeq
    // v1 shares v0's cells exactly -> ADC 0; v2/v3 share codes so their
    // ADC ties and the lower id must rank first
    assert(top.map(_._2) == Seq(1L, 2L, 3L))
    assert(top.head._3 == 0.0, s"same-cell ADC must be exactly 0, got $top")
    assert(top(1)._3 == top(2)._3, "equal codes must give equal ADC")
  }

  test("rrfFuse: integer contributions, full-outer union, absent side is 0") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rn")
    val vec = Seq((20L, 1), (40L, 2)).toDF("id", "rn")
    val got = Similarity.rrfFuse(lex, vec, "id", "rn")
      .orderBy(col("rrf_score").desc, col("id"))
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSeq
    def c(r: Long) = 1000000000L / (60L + r)
    // 20 is in both lists: rank 2 lexically, rank 1 in the vector list
    assert(got.head == ((20L, c(2) + c(1), Some(2L), Some(1L))))
    assert(got.map(_._1) == Seq(20L, 10L, 40L, 30L))
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(10L) == ((10L, c(1), Some(1L), None)))
    assert(byId(40L) == ((40L, c(2), None, Some(2L))))
    assert(byId(30L) == ((30L, c(3), Some(3L), None)))
  }

  test("kCenterGreedy: farthest-first coverage (not density), " +
      "duplicate vectors never win, ties break to the lower id") {
    import spark.implicits._
    // a dense clump at the origin, one point at x=10, one at x=-10:
    // k-center must take both extremes before a second clump member —
    // the anti-kmeans property
    val pts = Seq(
      1L -> Seq(0.0f, 0.0f), 2L -> Seq(0.1f, 0.0f), 3L -> Seq(0.0f, 0.1f),
      4L -> Seq(0.1f, 0.1f), 5L -> Seq(10.0f, 0.0f), 6L -> Seq(-10.0f, 0.0f),
      7L -> Seq(0.0f, 0.0f) // exact duplicate of the seed
    ).toDF("vec_id", "embedding")
    val picks = Similarity.kCenterGreedy(pts, "vec_id", "embedding", k = 4)
      .orderBy("pick_order").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(picks(0) == ((1L, 1L, 0.0)), "seed = lowest id, dist 0")
    assert(picks.slice(1, 3).map(_._2).toSet == Set(5L, 6L),
      s"both extremes must be covered before the clump: ${picks.toSeq}")
    // pick 4 returns to the clump; the exact duplicate of a chosen
    // center (id 7, dist 0) must never be selected over distinct points
    assert(!picks.map(_._2).contains(7L),
      s"a duplicate of a chosen center was picked: ${picks.toSeq}")
    // selection distances are non-increasing (farthest-first invariant)
    val ds = picks.drop(1).map(_._3)
    assert(ds.sliding(2).forall(p => p(0) >= p(1)), s"not decreasing: ${ds.toSeq}")
  }
}
