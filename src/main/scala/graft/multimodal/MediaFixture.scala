package graft.multimodal

import java.io.{ByteArrayInputStream, File}
import java.awt.image.BufferedImage

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Deterministic on-disk media fixture for the driver-visible multimodal
  * gate entry (mm01): the driver testdata ships no media binaries, so the
  * engine generates its own — closed-form content whose decoded features
  * are analytically known, making a literal-VALUES DuckDB oracle possible:
  *
  *   - `img_<i>.png`: (16+3i) x (12+2i) truecolor PNG, every pixel the
  *     same grey value v = 10+29i. PNG is lossless, so the real imageio
  *     decode path returns exactly (w, h, 3, v-derived luma) regardless
  *     of encoder build details.
  *   - `wav_<i>.wav`: 16-bit signed little-endian mono PCM at 8000 Hz,
  *     2000+400i frames of a square wave at amplitude 1024*(8+i). The
  *     amplitude is dyadic, so the decoder's normalized RMS is EXACT
  *     ((8+i)/32) and duration is an integral 250+50i ms.
  *
  * Values chosen so every rounded feature sits far from its rounding
  * boundary (nearest distance 6.8e-6 in luma units vs ~1e-13 possible
  * accumulation noise). Generated once per working dir under fixtures/
  * (same discipline as the partsupp fixture), read back through the
  * normal `binaryFile` source so the gate exercises the real
  * listing/scan/decode plumbing.
  */
object MediaFixture {

  val N = 8

  def imageDim(i: Int): (Int, Int) = (16 + 3 * i, 12 + 2 * i)
  def imageGrey(i: Int): Int = 10 + 29 * i
  def audioAmplitude(i: Int): Short = (1024 * (8 + i)).toShort
  def audioFrames(i: Int): Int = 2000 + 400 * i

  /** Bump whenever the generated content changes (dims, grey values,
    * amplitudes, frame counts) — self-invalidates stale fixtures; the
    * mm01/mm02 VALUES oracles must change in the same commit.
    * v2: added animated-GIF `vid_<i>.gif` files for mm02. */
  private val Version = "v2"

  def gifDim(i: Int): (Int, Int) = (8 + i, 6 + i)
  def gifFrameCount(i: Int): Int = 3 + i
  /** Grey value of frame f of file i (all < 256 for i<8, f<11). */
  def gifGrey(i: Int, f: Int): Int = 20 + 13 * i + 5 * f

  /** Generate (once) and return the fixture directory. */
  def ensure(): String =
    graft.Fixtures.ensure("media", Version) { dir =>
      (0 until N).foreach { i =>
        writePng(new File(dir, s"img_$i.png"), i)
        writeWav(new File(dir, s"wav_$i.wav"), i)
        writeGif(new File(dir, s"vid_$i.gif"), i)
      }
    }

  private def writePng(f: File, i: Int): Unit = {
    val (w, h) = imageDim(i)
    val v = imageGrey(i)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (v << 16) | (v << 8) | v
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    if (!ImageIO.write(img, "png", f))
      throw new IllegalStateException("no PNG writer available in this JVM")
  }

  /** Animated GIF: the multi-frame "video" container the JDK can both
    * write and read. Constant-grey frames survive GIF's palette
    * quantization exactly (each frame's palette contains its one
    * color), so per-frame luma is closed-form like the PNGs'. */
  private def writeGif(f: File, i: Int): Unit = {
    val (w, h) = gifDim(i)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(f)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until gifFrameCount(i)).foreach { fr =>
        val v = gifGrey(i, fr)
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val rgb = (v << 16) | (v << 8) | v
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
  }

  private def writeWav(f: File, i: Int): Unit = {
    val frames = audioFrames(i)
    val amp = audioAmplitude(i)
    val raw = new Array[Byte](frames * 2)
    var k = 0
    while (k < frames) {
      val s: Short = if (k % 2 == 0) amp else (-amp).toShort
      raw(2 * k) = (s & 0xFF).toByte
      raw(2 * k + 1) = ((s >> 8) & 0xFF).toByte
      k += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt, frames.toLong)
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, f) finally ais.close()
  }
}
