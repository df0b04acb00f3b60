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
}
