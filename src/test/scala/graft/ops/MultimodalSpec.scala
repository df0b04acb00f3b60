package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.Row

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("decodeFeatures: byte stats, frame count, frame sampling") {
    val df = Seq((1L, "ab"), (2L, "x" * 600)).toDF("doc_id", "text")
    val out = Multimodal.extract(spark, df, "doc_id", "text")
    assert(out.columns.toSeq == Seq("doc_id", "n_bytes", "first_byte", "last_byte",
      "checksum", "n_frames", "n_sampled"))
    assertSameRows(out, Seq(
      Row(1L, 2, 97, 98, 195L, 1, 1),                    // 'a'+'b'=195, one frame
      Row(2L, 600, 120, 120, (600L * 120) % 65536, 3, 1) // ceil(600/256)=3, ceil(3/4)=1
    ))
  }

  test("asMedia: binary content with typed metadata") {
    val media = Multimodal.asMedia(Seq((1L, "abc")).toDF("doc_id", "text"), "doc_id", "text")
    val m = media.head()
    assert(m.mime == "text/plain")
    assert(new String(m.content) == "abc")
  }

  test("sampleFrames: every 4th frame, short tail, per-frame checksums, " +
      "empty payload yields no frames") {
    // 1500 bytes → ceil(1500/256) = 6 frames, sampled 0 and 4;
    // frame 4 starts at 1024 and is 256 bytes, frame 5 (unsampled) short
    val df = Seq((1L, "y" * 1500), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal
      .sampleFrames(Multimodal.asMedia(df, "doc_id", "text"))
      .collect().sortBy(f => (f.doc_id, f.frame_idx))
    assert(out.map(f => (f.doc_id, f.frame_idx)).toSeq == Seq((1L, 0), (1L, 4)))
    out.foreach { f =>
      assert(f.offset == f.frame_idx * 256)
      assert(f.n_bytes == math.min(256, 1500 - f.offset))
      assert(f.frame_checksum == (f.n_bytes.toLong * 'y') % 65536L)
    }
    // frame rows reconcile with decodeFeatures' sampled count
    val feats = Multimodal
      .decodeFeatures(Multimodal.asMedia(df, "doc_id", "text"))
      .collect().map(x => x.doc_id -> x.n_sampled).toMap
    assert(feats(1L) == 2 && feats(2L) == 0)
  }
}
