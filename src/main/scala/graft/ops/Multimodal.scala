package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` content plus
  * typed metadata, processed per-partition with the typed Dataset API.
  *
  * The decode step is a clearly-marked STUB (this environment ships no
  * image/audio codecs): [[decodeFeatures]] computes deterministic
  * byte-level features standing in for a real `decode → feature-extract`
  * kernel. The Spark-side plumbing is the real thing being exercised —
  * binary schema, case-class Encoders, mapPartitions batch shape (one
  * codec init per partition, not per row), and frame sampling arithmetic
  * — so swapping in a real codec changes only the function body.
  */
object Multimodal {

  /** A media row: opaque bytes + metadata (mime + declared size). */
  final case class MediaDoc(doc_id: Long, content: Array[Byte], mime: String)

  /** Extracted features; `checksum` is a stand-in for decoded content
    * statistics, `n_frames`/`n_sampled` for frame extraction. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      first_byte: Int,
      last_byte: Int,
      checksum: Long,
      n_frames: Int,
      n_sampled: Int)

  /** Lift a text table into media shape (fixture adapter: the testdata has
    * no binary column, so document text bytes play the media payload). */
  def asMedia(df: DataFrame, idCol: String, textCol: String,
      mime: String = "text/plain"): Dataset[MediaDoc] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("content"),
      lit(mime).as("mime")).as[MediaDoc]
  }

  /** STUB decode + feature extraction, one "codec" per partition.
    * Deterministic byte arithmetic so the DuckDB oracle can replay it:
    * checksum = Σ bytes mod 65536; frames of `frameSize` bytes; every
    * `sampleEvery`-th frame sampled (ceil division both times). */
  def decodeFeatures(ds: Dataset[MediaDoc], frameSize: Int = 256,
      sampleEvery: Int = 4): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { iter =>
      // real impl: initialize the codec ONCE here, per partition
      iter.map { m =>
        val bytes = m.content
        val n = bytes.length
        val checksum = bytes.foldLeft(0L)((a, b) => (a + (b & 0xff)) % 65536L)
        val nFrames = (n + frameSize - 1) / frameSize
        val nSampled = (nFrames + sampleEvery - 1) / sampleEvery
        MediaFeatures(
          m.doc_id, n,
          if (n == 0) -1 else bytes.head & 0xff,
          if (n == 0) -1 else bytes.last & 0xff,
          checksum, nFrames, nSampled)
      }
    }
  }

  /** Convenience: DataFrame in, DataFrame of features out. */
  def extract(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    decodeFeatures(asMedia(df, idCol, textCol)).toDF()

  /** One row per SAMPLED frame — the materialized shape a video
    * pipeline hands to a feature extractor (offset table + per-frame
    * payload stats). Every `sampleEvery`-th `frameSize`-byte frame,
    * 0-based frame index and byte offset, final frame may be short.
    * flatMap-per-partition is the real plumbing (codec init once per
    * partition, frames streamed — a doc's frames never buffer in one
    * row); the per-frame checksum is the deterministic decode STUB the
    * oracle replays byte for byte. */
  final case class FrameRow(doc_id: Long, frame_idx: Int, offset: Int,
      n_bytes: Int, frame_checksum: Long)

  def sampleFrames(ds: Dataset[MediaDoc], frameSize: Int = 256,
      sampleEvery: Int = 4): Dataset[FrameRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { iter =>
      // real impl: initialize the codec ONCE here, per partition
      iter.flatMap { m =>
        val bytes = m.content
        val n = bytes.length
        val nFrames = (n + frameSize - 1) / frameSize
        (0 until nFrames).iterator.filter(_ % sampleEvery == 0).map { i =>
          val off = i * frameSize
          val len = math.min(frameSize, n - off)
          var s = 0L
          var j = off
          while (j < off + len) { s = (s + (bytes(j) & 0xff)) % 65536L; j += 1 }
          FrameRow(m.doc_id, i, off, len, s)
        }
      }
    }
  }

  /** One overlapped analysis window of a PCM8-ish payload: integer
    * energy (Σ(sample−128)² over the window) — the quantity behind
    * silence trimming / voice-activity gates. */
  final case class AudioWindow(
      doc_id: Long, window_idx: Int, off: Int, n_samples: Int, energy: Long)

  /** STUB audio decode → windowed energy: the payload bytes play
    * unsigned 8-bit PCM samples (the codec stub — a real build swaps
    * ffmpeg/libsndfile into the partition init), analysis windows of
    * `win` samples hop by `hop` (overlapping when hop < win, the
    * standard STFT layout), and each window emits its exact INTEGER
    * energy Σ(b−128)². Windows are streamed per row (never buffered),
    * one decoder init per partition; RMS = sqrt(energy∕n) is left to
    * the presentation layer so the operator's output stays
    * engine-exact integers. */
  def audioEnergy(ds: Dataset[MediaDoc], win: Int = 64,
      hop: Int = 32): Dataset[AudioWindow] = {
    require(win >= 1 && hop >= 1, s"bad window spec: win=$win hop=$hop")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { iter =>
      // real impl: initialize the codec ONCE here, per partition
      iter.flatMap { m =>
        val bytes = m.content
        val n = bytes.length
        val nWin = if (n == 0) 0 else (n - 1) / hop + 1
        (0 until nWin).iterator.map { w =>
          val off = w * hop
          val len = math.min(win, n - off)
          var s = 0L
          var j = off
          while (j < off + len) {
            val c = (bytes(j) & 0xff) - 128
            s += c.toLong * c
            j += 1
          }
          AudioWindow(m.doc_id, w, off, len, s)
        }
      }
    }
  }
}
