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

  /** A real PCM WAV, written in memory through the JDK's own encoder so
    * the decoder is tested against genuine RIFF bytes, not hand-rolled
    * headers. Returns (bytes, the exact quantized samples written). */
  private def wav(rate: Float, bits: Int, channels: Int, signed: Boolean,
                  bigEndian: Boolean, samples: Array[Short]): (Array[Byte], Array[Short]) = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, bits, channels, signed, bigEndian)
    val frameBytes = fmt.getFrameSize
    val raw = new Array[Byte](samples.length * (bits / 8))
    var i = 0
    samples.foreach { s =>
      if (bits == 16) {
        val (b0, b1) = if (bigEndian) ((s >> 8).toByte, s.toByte) else (s.toByte, (s >> 8).toByte)
        raw(i) = b0; raw(i + 1) = b1; i += 2
      } else {
        raw(i) = (if (signed) s else s + 128).toByte; i += 1
      }
    }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(raw), fmt,
      samples.length / channels)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    assert(raw.length % frameBytes == 0)
    (out.toByteArray, samples)
  }

  test("wav decoder extracts real duration/rate/channels/rms from actual PCM WAVs") {
    // 16-bit mono sine at 8 kHz: expected RMS computed from the SAME
    // quantized samples the encoder wrote — bit-exact comparison.
    val sine = Array.tabulate[Short](8000)(n =>
      math.round(0.5 * 32767.0 * math.sin(2 * math.Pi * 440 * n / 8000.0)).toShort)
    val (sineBytes, s1) = wav(8000f, 16, 1, signed = true, bigEndian = false, sine)
    val expRms = math.sqrt(s1.map(s => (s / 32768.0) * (s / 32768.0)).sum / s1.length)
    val items = Seq(MediaItem(1L, "audio/wav", sineBytes, Map.empty)).toDS()
    val f = decodeAudio(items, Decoders.wav).head()
    assert(f.duration_ms == 1000L, s"8000 frames at 8 kHz = 1 s, got ${f.duration_ms}")
    assert(f.sample_rate == 8000 && f.channels == 1)
    assert(math.abs(f.rms - expRms) < 1e-12, s"rms ${f.rms} != $expRms")

    // stereo 16-bit: frames interleave L/R, RMS spans both channels
    val stereo = Array.tabulate[Short](2000)(n => if (n % 2 == 0) 16384 else -16384)
    val (stBytes, s2) = wav(4000f, 16, 2, signed = true, bigEndian = false, stereo)
    val expSt = math.sqrt(s2.map(s => (s / 32768.0) * (s / 32768.0)).sum / s2.length)
    val fs = decodeAudio(Seq(MediaItem(2L, "audio/wav", stBytes, Map.empty)).toDS(),
      Decoders.wav).head()
    assert(fs.channels == 2 && fs.sample_rate == 4000)
    assert(fs.duration_ms == 250L, "1000 stereo frames at 4 kHz = 250 ms")
    assert(math.abs(fs.rms - expSt) < 1e-12)

    // 8-bit unsigned PCM (the other JDK-native WAV shape)
    val eight = Array.tabulate[Short](400)(n => ((n % 256) - 128).toShort)
    val (u8Bytes, s3) = wav(8000f, 8, 1, signed = false, bigEndian = false, eight)
    val exp8 = math.sqrt(s3.map(s => (s / 128.0) * (s / 128.0)).sum / s3.length)
    val f8 = decodeAudio(Seq(MediaItem(3L, "audio/wav", u8Bytes, Map.empty)).toDS(),
      Decoders.wav).head()
    assert(math.abs(f8.rms - exp8) < 1e-12)

    // undecodable bytes fail the task (DLQ upstream), like images
    intercept[org.apache.spark.SparkException] {
      decodeAudio(Seq(MediaItem(4L, "audio/wav", Array[Byte](9, 9, 9), Map.empty)).toDS(),
        Decoders.wav).collect()
    }
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

  test("MediaFixture: generated media decode to the closed-form oracle values") {
    // The mm01 VALUES oracle hardcodes these features; this spec proves
    // the fixture generator and the real JDK decoders agree with the
    // analytic derivation on every index, independent of the driver gate.
    val dir = MediaFixture.ensure()
    (0 until MediaFixture.N).foreach { i =>
      val (w, h) = MediaFixture.imageDim(i)
      val png = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, s"img_$i.png"))
      val (dw, dh, dc, luma) = Decoders.imageio(png)
      assert((dw, dh, dc) == (w, h, 3))
      val v = MediaFixture.imageGrey(i)
      assert(math.abs(luma - v / 255.0) < 1e-9, s"i=$i luma=$luma")

      val wav = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, s"wav_$i.wav"))
      val (durMs, rate, ch, rms) = Decoders.wav(wav)
      assert((durMs, rate, ch) == (250L + 50 * i, 8000, 1))
      assert(rms == (8 + i) / 32.0, s"i=$i rms=$rms (must be exactly dyadic)")

      // Animated GIF: real multi-frame decode — every frame's dimensions
      // and palette-exact grey must match the generator's closed form.
      val gif = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, s"vid_$i.gif"))
      val frames = Decoders.gifFrames(gif)
      val (gw, gh) = MediaFixture.gifDim(i)
      assert(frames.size == MediaFixture.gifFrameCount(i), s"i=$i frames=${frames.size}")
      frames.zipWithIndex.foreach { case ((fw, fh, luma), fr) =>
        assert((fw, fh) == (gw, gh))
        val u = MediaFixture.gifGrey(i, fr)
        assert(math.abs(luma - u / 255.0) < 1e-9,
          s"i=$i frame=$fr luma=$luma expected ~${u / 255.0}")
      }
    }
  }
}
