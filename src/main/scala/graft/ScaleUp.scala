package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture scale-up: `runMain graft.ScaleUp <src> <dst>
  * <factor>` replicates the driver-generated star schema `factor`× with
  * key-offset replication — the sf1 datapoint the 100 TB claims are
  * spot-checked against (bench/README.md "sf1 scale-up").
  *
  * Replication rules (replica r ∈ [0, factor), r = 0 is the verbatim
  * original, so the scaled fixture behaviorally CONTAINS the source):
  *
  *  - relational tables: every key column shifts by r·(max(key)+1 in
  *    the source), so FK joins, fan-outs, and skew replicate exactly
  *    (each replica is an isomorphic copy of the source graph; `region`
  *    and `nation` are fixed dimensions shared by all replicas).
  *  - `documents.text`: replicas get a deterministic per-(doc, r)
  *    token permutation (sort by xxhash64(token, doc_id, r)). A verbatim
  *    copy would make every doc a 10-way exact/near duplicate and blow
  *    candidate-pair counts up QUADRATICALLY in the factor — a data
  *    artifact, not a plan property. Permuted replicas keep doc length,
  *    token frequencies, and intra-replica near-dup structure (pairs
  *    scale linearly, as a real 10× corpus would) while their shingle
  *    sets decorrelate across replicas.
  *  - `embeddings.embedding`: deterministic per-(dim, r) sign flips —
  *    norms, per-dimension magnitude distributions, and intra-replica
  *    cosine structure survive; cross-replica cosines decorrelate (the
  *    expected cosine of a random-sign flip is 0), so ANN/near-dup
  *    workloads scale linearly too.
  *
  * Everything is pure column arithmetic over one scan per table (the
  * replica axis is an exploded literal sequence — no shuffle, no RNG:
  * xxhash64 keys every "random" choice, so re-running is bit-identical).
  */
object ScaleUp {

  private def withReplicas(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("_r", explode(sequence(lit(0), lit(factor - 1))))

  private def maxOf(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).head().getLong(0) + 1L

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcDir> <dstDir> <factor>")
    val (src, dst, factor) = (args(0), args(1), args(2).toInt)
    require(factor >= 1, "factor must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def load(t: String) = spark.read.parquet(s"$src/$t.parquet")
    // one plain FILE per table, exactly the driver fixture's layout —
    // the streaming queries symlink `<table>.parquet` as a single file
    // into their source dir, and a directory there is silently invisible
    // to the file-stream source (it only recurses partition dirs)
    def save(t: String)(df: DataFrame): Unit = {
      val tmp = s"$dst/_tmp_$t"
      df.coalesce(1).write.mode("errorifexists").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      require(part.length == 1, s"$t: expected one part file, got ${part.length}")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))
      java.nio.file.Files.move(part.head.toPath,
        java.nio.file.Paths.get(s"$dst/$t.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }

    // fixed dims: shared by every replica
    Seq("region", "nation").foreach(t => save(t)(load(t)))

    val (customer, supplier, part, orders, lineitem, events, docs, vecs) =
      (load("customer"), load("supplier"), load("part"), load("orders"),
        load("lineitem"), load("events"), load("documents"), load("embeddings"))
    val (cBase, sBase, pBase, oBase) =
      (maxOf(customer, "c_custkey"), maxOf(supplier, "s_suppkey"),
        maxOf(part, "p_partkey"), maxOf(orders, "o_orderkey"))
    val (eBase, uBase, dBase, vBase) =
      (maxOf(events, "event_id"), maxOf(events, "user_id"),
        maxOf(docs, "doc_id"), maxOf(vecs, "vec_id"))

    def shifted(df: DataFrame, shifts: (String, Long)*) = {
      val out = shifts.foldLeft(withReplicas(df, factor)) {
        case (acc, (c, base)) =>
          acc.withColumn(c, col(c) + col("_r") * base)
      }
      out.drop("_r")
    }

    // c_name is key-derived in the fixture (Customer#%09d) — re-mint it
    // from the shifted key, or every replica shares its original's name
    // verbatim and name-blocked joins (record linkage) go quadratic in
    // the replication factor (the q125 twin of the SimHash salt below)
    save("customer")(shifted(customer, "c_custkey" -> cBase)
      .withColumn("c_name", format_string("Customer#%09d", col("c_custkey"))))
    save("supplier")(shifted(supplier, "s_suppkey" -> sBase))
    save("part")(shifted(part, "p_partkey" -> pBase))
    save("orders")(shifted(orders, "o_orderkey" -> oBase, "o_custkey" -> cBase))
    save("lineitem")(shifted(lineitem, "l_orderkey" -> oBase,
      "l_partkey" -> pBase, "l_suppkey" -> sBase))
    save("events")(shifted(events, "event_id" -> eBase, "user_id" -> uBase))

    // documents: key shift + per-replica deterministic token permutation
    // AND a ~10% token salt (replica 0 keeps the verbatim text). The
    // permutation decorrelates ORDER-sensitive features (shingles); the
    // salt decorrelates order-INSENSITIVE ones (token-multiset simhash,
    // which is permutation-invariant — without it every replica shares
    // its original's exact fingerprint and near-dup candidate pairs grow
    // quadratically in the factor, a fixture artifact q119 surfaced).
    val toks = split(col("text"), "\\s+")
    val salted = transform(toks, t =>
      when(pmod(xxhash64(t, col("doc_id"), col("_r")), lit(10)) === 0,
        concat(t, lit("x"), col("_r"))).otherwise(t))
    val permuted = concat_ws(" ",
      transform(
        array_sort(transform(salted,
          t => struct(xxhash64(t, col("doc_id"), col("_r")).as("h"), t.as("t")))),
        s => s.getField("t")))
    save("documents")(
      withReplicas(docs, factor)
        .withColumn("text", when(col("_r") === 0, col("text")).otherwise(permuted))
        .withColumn("doc_id", col("doc_id") + col("_r") * dBase)
        .drop("_r"))

    // embeddings: key shift + per-(dim, replica) sign flips (replica 0
    // verbatim; float arithmetic: -x is exact, norms unchanged)
    save("embeddings")(
      withReplicas(vecs, factor)
        .withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            when(col("_r") === 0, x).otherwise(
              when(pmod(xxhash64(i, col("_r")), lit(2)) === 0, x).otherwise(-x))))
        .withColumn("vec_id", col("vec_id") + col("_r") * vBase)
        .drop("_r"))

    // row-count audit so a silent partial write can't masquerade as done
    val counts = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings").map { t =>
      t -> (spark.read.parquet(s"$dst/$t.parquet").count(),
        spark.read.parquet(s"$src/$t.parquet").count())
    }
    counts.foreach { case (t, (got, base)) =>
      val want = if (t == "region" || t == "nation") base else base * factor
      require(got == want, s"$t: wrote $got rows, expected $want")
      println(s"[scaleup] $t: $got rows (${factor}x $base)")
    }
    spark.stop()
  }
}
