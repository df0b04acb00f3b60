package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Boundary-preserving next-fit sequence packing (L280/L288): docs fold
  * into fixed L-token context windows per shard, docs never split
  * across windows, overlong docs truncate to L. The fold is inherently
  * ORDER-DEPENDENT (a running remainder with reset), so it runs as one
  * compiled sequential pass per contiguous shard group —
  * `repartition(shard) + sortWithinPartitions + mapPartitions` — with
  * O(1) state per stream and parallelism ACROSS shards. The state is
  * RESUMABLE: [[packFold]] continues from a standing per-shard state
  * row, which is what makes the streaming form (q307) a pure
  * continuation of the batch form (q299).
  */
object Packing {

  /** Empty standing state with [[packFold]]'s schema. */
  def emptyState(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("source", StringType),
        StructField("n_docs", LongType), StructField("n_tokens", LongType),
        StructField("n_bins", LongType), StructField("rem", LongType),
        StructField("pk", LongType), StructField("tr", LongType),
        StructField("max_id", LongType))))
  }

  /** Fold a batch of (source, doc_id, ntok) rows into the standing
    * per-source packing state (columns: source, n_docs, n_tokens,
    * n_bins, rem, pk, tr, max_id). Docs fold in ascending doc_id order
    * per source, CONTINUING from the standing remainder. Rows with
    * doc_id ≤ the source's standing max_id DROP up front, so an
    * at-least-once replay of a committed batch folds to an algebraic
    * no-op (the q280 discipline); ascending arrival is the caller's
    * contract, same as every standing-state fold in this library. */
  def packFold(state: DataFrame, batch: DataFrame, limit: Long): DataFrame = {
    val spark = state.sparkSession
    import spark.implicits._
    val st = state.select(col("source").as("_s"), col("n_docs").as("s_nd"),
      col("n_tokens").as("s_nt"), col("n_bins").as("s_nb"),
      col("rem").as("s_rem"), col("pk").as("s_pk"), col("tr").as("s_tr"),
      col("max_id").as("s_mx"))
    val joined = batch
      .join(st, batch("source") === col("_s"), "left")
      .filter(col("doc_id") > coalesce(col("s_mx"), lit(Long.MinValue)))
      .select(col("source"), col("doc_id"), col("ntok"),
        coalesce(col("s_nd"), lit(0L)).as("s_nd"),
        coalesce(col("s_nt"), lit(0L)).as("s_nt"),
        coalesce(col("s_nb"), lit(0L)).as("s_nb"),
        coalesce(col("s_rem"), lit(0L)).as("s_rem"),
        coalesce(col("s_pk"), lit(0L)).as("s_pk"),
        coalesce(col("s_tr"), lit(0L)).as("s_tr"))
    val folded = joined.repartition(col("source"))
      .sortWithinPartitions("source", "doc_id")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .mapPartitions { it =>
        // one sequential next-fit fold per contiguous shard group,
        // seeded from the standing state carried on each row
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, Long, Long, Long, Long, Long, Long, Long)]
        var cur: String = null
        var nd, nt, nb, rem, pk, tr = 0L
        var mx = Long.MinValue
        def flush(): Unit = if (cur != null)
          out += ((cur, nd, nt, nb, rem, pk, tr, mx))
        it.foreach { case (src, id, ntok, snd, snt, snb, srem, spk, str0) =>
          if (src != cur) {
            flush(); cur = src
            nd = snd; nt = snt; nb = snb; rem = srem; pk = spk; tr = str0
            mx = Long.MinValue
          }
          nd += 1L; nt += ntok; mx = math.max(mx, id)
          val fit = math.min(ntok, limit)
          tr += math.max(ntok - limit, 0L)
          if (fit <= rem) { rem -= fit; pk += fit }
          else { nb += 1L; rem = limit - fit; pk += fit }
        }
        flush()
        out.iterator
      }
      .toDF("source", "n_docs", "n_tokens", "n_bins", "rem", "pk", "tr",
        "max_id")
    state
      .join(folded.select(col("source").as("_f")),
        col("source") === col("_f"), "left_anti")
      .unionByName(folded)
  }

  /** The per-shard packing economics readout shared by q299/q307:
    * (source, n_docs, n_tokens, n_bins, fill_rate, trunc_rate). */
  def economics(state: DataFrame, limit: Long): DataFrame =
    state.select(col("source"), col("n_docs"), col("n_tokens"),
      col("n_bins"),
      when(col("n_bins") === 0, 0.0d).otherwise(
        graft.functions.ExactRound
          .roundRatio(col("pk"), col("n_bins") * limit, 6).cast("double"))
        .as("fill_rate"),
      when(col("n_tokens") === 0, 0.0d).otherwise(
        graft.functions.ExactRound
          .roundRatio(col("tr"), col("n_tokens"), 6).cast("double"))
        .as("trunc_rate"))
}
