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

  test("audioEnergy: overlapped window layout, exact integer energies, " +
      "short tail, empty payload yields no windows") {
    // 100 'y' bytes (121² energy each... sample −128 = 'y'−128 = −7):
    // windows at hop 32: offs 0/32/64/96, lengths 64/64/36/4
    val df = Seq((1L, "y" * 100), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal
      .audioEnergy(Multimodal.asMedia(df, "doc_id", "text"))
      .collect().sortBy(w => (w.doc_id, w.window_idx))
    val c = ('y' - 128).toLong // -7 → 49 per sample
    assert(out.map(w => (w.doc_id, w.window_idx, w.off, w.n_samples)).toSeq ==
      Seq((1L, 0, 0, 64), (1L, 1, 32, 64), (1L, 2, 64, 36), (1L, 3, 96, 4)))
    out.foreach(w => assert(w.energy == w.n_samples * c * c))
    assert(!out.exists(_.doc_id == 2L))
    // a mixed payload: hand-computed energy on the first window
    val mix = Seq((3L, "az")).toDF("doc_id", "text")
    val e = Multimodal.audioEnergy(Multimodal.asMedia(mix, "doc_id", "text"))
      .collect().head.energy
    val (a, z) = (('a' - 128).toLong, ('z' - 128).toLong)
    assert(e == a * a + z * z)
  }
}
