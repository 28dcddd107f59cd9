package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def item(id: Long, payload: String, meta: Map[String, String] = Map.empty) =
    MediaItem(id, "image/fake", payload.getBytes("UTF-8"), meta)

  test("decode is deterministic: equal bytes => equal features") {
    val ds = Seq(item(1, "pixels-a"), item(2, "pixels-a"), item(3, "pixels-b")).toDS()
    val f = decodeImages(ds).collect().map(x => x.media_id -> x).toMap
    assert(f(1).copy(media_id = 0) == f(2).copy(media_id = 0))
    assert(f(1).copy(media_id = 0) != f(3).copy(media_id = 0))
    assert(f.values.forall(x => x.width >= 64 && x.height >= 64 && x.channels == 3))
  }

  test("resize caps the longest dimension, preserving aspect") {
    val feats = Seq(ImageFeatures(1, 400, 200, 3, 0.5)).toDS()
    val r = resize(feats, maxDim = 100).head()
    assert(r.width == 100 && r.height == 50)
  }

  test("frame sampling generates every Nth frame from metadata") {
    val v = Seq(item(1, "vid", Map("fps" -> "10", "duration_ms" -> "2000"))).toDS()
    val frames = sampleFrames(v, everyNth = 5).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 5, 10, 15)) // 20 frames, every 5th
    assert(frames.map(_.offset_ms).toSeq == Seq(0L, 500L, 1000L, 1500L))
  }
}
