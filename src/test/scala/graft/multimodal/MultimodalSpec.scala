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

  /** A real solid-color PNG, crafted in memory. */
  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("imageio decoder extracts real dimensions/channels/luma from actual PNGs") {
    // a 40x20 mid-gray and a 8x8 pure white
    val gray = MediaItem(1L, "image/png", png(40, 20, 0x808080), Map.empty)
    val white = MediaItem(2L, "image/png", png(8, 8, 0xFFFFFF), Map.empty)
    val f = decodeImages(Seq(gray, white).toDS(), Decoders.imageio)
      .collect().map(x => x.media_id -> x).toMap
    assert(f(1L).width == 40 && f(1L).height == 20 && f(1L).channels == 3)
    assert(math.abs(f(1L).mean_luma - 128.0 / 255.0) < 1e-9,
      s"solid 0x808080 => luma 128/255, got ${f(1L).mean_luma}")
    assert(f(2L).width == 8 && math.abs(f(2L).mean_luma - 1.0) < 1e-9)

    // undecodable bytes surface as a task failure (route to DLQ upstream),
    // never as fabricated features
    val junk = Seq(MediaItem(3L, "image/png", Array[Byte](1, 2, 3), Map.empty)).toDS()
    intercept[org.apache.spark.SparkException] {
      decodeImages(junk, Decoders.imageio).collect()
    }
  }

  test("binaryFile ingestion: real PNG files on disk decode end-to-end") {
    def writePng(dir: String, name: String, w: Int, h: Int, rgb: Int): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), png(w, h, rgb))
    val dir = tmpDir("media-in")
    writePng(dir, "a.png", 30, 10, 0x000000)
    writePng(dir, "b.png", 12, 12, 0xFFFFFF)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "notes.txt"), "not an image")

    val items = readMedia(spark, dir, "image/png", globFilter = Some("*.png"))
    assert(items.count() == 2, "glob filter excludes the non-image file at the listing")
    val byLen = items.collect().map(m => m.meta("path").split('/').last -> m).toMap
    assert(byLen.keySet == Set("a.png", "b.png"))
    assert(byLen("a.png").meta("length").toLong > 0)

    val feats = decodeImages(items, Decoders.imageio).collect()
      .map(f => f.media_id -> f).toMap
    val aId = byLen("a.png").media_id
    val bId = byLen("b.png").media_id
    assert(feats(aId).width == 30 && feats(aId).height == 10 && feats(aId).mean_luma < 1e-9)
    assert(feats(bId).width == 12 && math.abs(feats(bId).mean_luma - 1.0) < 1e-9)
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
