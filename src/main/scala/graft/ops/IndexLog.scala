package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-structured lifecycle for a standing ANN code table. The
  * q226/q236 index folds only APPEND; a real standing index also
  * upserts re-embedded vectors, tombstones deleted ones, and
  * periodically compacts its segment log so reads pay one row per
  * live id again (reference behavior: the silver MERGE jobs track
  * soft deletes as data, `jobs/silver/silver_builder.py:147`
  * `tracked_cols=[..., "is_deleted"]` — the same
  * tombstone-as-a-column idea, re-expressed for the versioned code
  * table instead of a dimension).
  *
  * The log is a plain DataFrame `(id, cid, seg, deleted)`: each fold
  * appends its delta rows tagged with a monotonically increasing
  * segment number (the stream's batchId); a tombstone is a row with
  * `deleted = true`. [[resolve]] is ONE latest-per-key window (the W1
  * latest-per-key shape — rank prunes map-side via WindowGroupLimit,
  * hash-partitioned on id); within a segment a tombstone beats an
  * upsert (delete-after-upsert wins). [[compact]] squashes the log
  * back to live rows only.
  *
  * Scale: a fold COMPUTES only its delta's encode (broadcast codebook,
  * shuffle-free projection); resolve/compact cost one hash-partitioned
  * window over the log, and compaction caps the log's read
  * amplification at the chosen cadence (q210's compaction planner
  * prices that cadence). Nothing here ever touches raw vectors — the
  * log carries only (id, code) pairs.
  */
object IndexLog {

  /** Seed the log from a freshly-encoded code table (segment 0). */
  def initial(codes: DataFrame, idCol: String,
      cidCol: String = "cid"): DataFrame =
    upserts(codes, idCol, 0L, cidCol)

  /** Tag a batch's upsert codes as segment `seg`. */
  def upserts(codes: DataFrame, idCol: String, seg: Long,
      cidCol: String = "cid"): DataFrame =
    codes.select(col(idCol), col(cidCol).cast("long").as("cid"),
      lit(seg).as("seg"), lit(false).as("deleted"))

  /** Tombstone rows for deleted ids, tagged segment `seg`. */
  def tombstones(ids: DataFrame, idCol: String, seg: Long): DataFrame =
    ids.select(col(idCol), lit(null).cast("long").as("cid"),
      lit(seg).as("seg"), lit(true).as("deleted"))

  private def winner(log: DataFrame, idCol: String): DataFrame = {
    // seg DESC = latest fold wins; deleted DESC = within one segment
    // the tombstone beats the upsert (delete-after-upsert semantics);
    // cid DESC = deterministic tie-break when one segment carries two
    // upserts for the same id (highest cid wins — arbitrary but stable,
    // so the cross-engine determinism invariant survives duplicate
    // feeds instead of resting on callers supplying disjoint sets)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("seg").desc, col("deleted").desc, col("cid").desc)
    log.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && !col("deleted"))
      .drop("_rn")
  }

  /** Live view of the log: latest surviving (id, cid) per id. */
  def resolve(log: DataFrame, idCol: String): DataFrame =
    winner(log, idCol).select(col(idCol), col("cid"))

  /** Squash the log to live rows only (full schema, each winner keeps
    * its own seg so later folds keep strictly increasing segments).
    * `resolve(compact(log)) == resolve(log)` by construction. */
  def compact(log: DataFrame, idCol: String): DataFrame =
    winner(log, idCol)
}
