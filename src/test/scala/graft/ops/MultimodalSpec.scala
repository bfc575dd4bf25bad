package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def media = Multimodal.withBinaryPayload(
    Seq((1L, "hello media world"), (2L, "tiny")).toDF("doc_id", "text"),
    "doc_id", "text")

  test("payload + typed metadata schema; metadata stays without the blob") {
    val m = media
    assert(m.schema.fieldNames.toSeq == Seq("media_id", "payload", "meta"))
    val meta = m.select("media_id", "meta.byte_len").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(meta(1L) == 17 && meta(2L) == 4)
  }

  test("feature extraction: deterministic, fixed dim, format sniffed") {
    val f = Multimodal.extractFeatures(media, 2).collect().sortBy(_.media_id)
    assert(f.map(_.media_id).toSeq == Seq(1L, 2L))
    assert(f.forall(_.feature.length == Multimodal.StubDecoder.featureDim))
    assert(f.forall(_.format == "bin"))
    val again = Multimodal.extractFeatures(media, 2).collect().sortBy(_.media_id)
    assert(f.map(_.feature.toSeq).toSeq == again.map(_.feature.toSeq).toSeq)
  }

  test("resize pass emits fixed-size thumbnails") {
    val t = Multimodal.resizePass(media, 4, 3, 2).collect()
    assert(t.length == 2 && t.forall(_.thumb.length == 12))
  }

  test("frame sampling: every stride-th pseudo-frame, memory-lean fanout") {
    val frames = Multimodal.frameSamplePass(media, frameSize = 4, stride = 2, 2)
      .where(col("media_id") === 1L).collect().sortBy(_.frame_idx)
    // 17 bytes -> 5 frames (4,4,4,4,1) -> sampled idx 0,2,4 -> 3 frames
    assert(frames.length == 3)
    assert(new String(frames.head.frame) == "hell")
  }
}
