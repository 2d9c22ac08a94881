package graft

import graft.multimodal.Media
import graft.multimodal.Media.{MediaFeatures, MediaRow}

class MediaSpec extends SparkSpec {
  import spark.implicits._

  def rows = Seq(
    MediaRow(1L, "image/fake", "payload-one".getBytes("UTF-8")),
    MediaRow(2L, "image/fake", "payload-two-longer".getBytes("UTF-8")),
    MediaRow(3L, "video/fake", Array.fill[Byte](640)(7)))

  test("extractFeatures drops payloads, keeps deterministic features") {
    val out = Media.extractFeatures(rows.toDS()).collect().sortBy(_.media_id)
    assert(out.map(_.byte_len).toSeq === Seq(11, 18, 640))
    assert(!out.head.getClass.getDeclaredFields.exists(_.getName == "blob"))
    // deterministic: same input → same fake decode
    val again = Media.extractFeatures(rows.toDS()).collect().sortBy(_.media_id)
    assert(out.toSeq === again.toSeq)
    out.foreach { f =>
      assert(f.fake_width >= 16 && f.fake_height >= 16)
      assert(f.channel_mean >= 0)
    }
  }

  test("resize bounds both dimensions while preserving ids") {
    val feats = Media.extractFeatures(rows.toDS())
    val resized = Media.resize(feats, maxDim = 32).collect()
    resized.foreach { f =>
      assert(f.fake_width <= 32 && f.fake_height <= 32)
    }
    assert(resized.map(_.media_id).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("frame sampling emits every k-th virtual frame with byte offsets") {
    val out = Media.sampleFrameOffsets(rows.filter(_.mime.startsWith("video")).toDS(), everyK = 3)
      .as[(Long, Int, Int)].collect().sortBy(_._2)
    // 640 bytes → 10 virtual frames → sampled 0,3,6,9
    assert(out.map(_._2).toSeq === Seq(0, 3, 6, 9))
    assert(out.forall(r => r._3 == r._2 * 64))
  }
}
