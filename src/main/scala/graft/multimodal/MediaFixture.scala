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

  // ---- dHash near-dup fixture (mm03) -------------------------------
  // A SEPARATE fixture dir: mm01 globs `*.png` over the media dir, so
  // additional images there would silently change its VALUES oracle.
  //
  // Six 36x32 images built from constant-value 4x4 cells on the 9x8
  // dHash grid (cell value IS the cell average — closed-form hashes):
  //   0 left->right gradient 10+25c       -> every bit set   (-1L)
  //   1 the same gradient +20 brightness  -> same hash       (-1L)
  //      (the brightness invariance dHash exists for)
  //   2 gradient with one dipped cell (r0,c4)=80 -> exactly bit 3
  //      clears (85 < 80 fails)           -> -1L & ~(1L<<3)
  //   3 reversed gradient 210-25c         -> no bit set      (0L)
  //   4 reversed gradient +20 brightness  -> 0L
  //      (+20, not -20: cell values must stay in [0, 255] — a negative
  //      value wraps through setRGB into a bright byte and corrupts
  //      the gradient, found by this spec in v1)
  //   5 alternating 50/200 stripes        -> bits at even c  (0x55 rows)
  // Near pairs at Hamming <= 3: (0,1,0) (0,2,1) (1,2,1) (3,4,0);
  // every other pair is >= 31 bits apart.

  val DhashN = 6
  // v3: added dhv_<i>.gif frame-patterned videos for mm05.
  // v4: added vids 5 (trimmed-intro copy) and 6 (shuffled cut) for the
  //     offset-tolerant mm06 (aligned mm05 relations unchanged: neither
  //     new video reaches 2/3 aligned matches with anything).
  // Visible beyond this object: DERIVED fixtures (the mm04 persisted
  // dHash index) compose their own cache version from this one, so a
  // bump here invalidates both caches in one edit (r17 advisory — a
  // second literal over there once served a stale index against
  // freshly-hashed rows).
  private[graft] val DhashVersion = "v4"

  def dhashCell(i: Int, r: Int, c: Int): Int = i match {
    case 0 => 10 + 25 * c
    case 1 => 30 + 25 * c
    case 2 => if (r == 0 && c == 4) 80 else 10 + 25 * c
    case 3 => 210 - 25 * c
    case 4 => 230 - 25 * c
    case 5 => if (c % 2 == 0) 50 else 200
    case _ => throw new IllegalArgumentException(s"no dhash fixture $i")
  }

  /** The analytically-expected dHash of fixture image `i` (bit r*8+c
    * set iff cell (r,c) < cell (r,c+1)) — asserted against
    * [[ImageHash.dHash64]] in MultimodalSpec and the basis of the mm03
    * VALUES oracle. */
  def dhashExpected(i: Int): Long = {
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (dhashCell(i, r, c) < dhashCell(i, r, c + 1)) h |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    h
  }

  // dHash VIDEO fixtures (mm05): each dhv_<i>.gif is three 36x32
  // frames, every frame one of the dhashCell patterns above — so every
  // frame's dHash is one of the already-pinned closed forms. With
  // frame-aligned matching at Hamming <= 3 and a 2/3 match fraction:
  //   0 [grad, rev, stripes]     \
  //   1 [grad+20, rev+20, str.]   } 3/3 aligned matches pairwise
  //   2 [dipped, rev, stripes]   /
  //   3 [stripes, grad, rev]  — vid 0's SCENES reordered: 0 aligned
  //      matches (reordering is a different edit, must NOT pair)
  //   4 [stripes x3]          — exactly 1 aligned match with each of
  //      0-3 (under the 2/3 fraction, must NOT pair)
  // mm06 (offset sweep ±1, same 2/3 fraction) adds:
  //   5 [rev, stripes]        — vid 0 with its INTRO TRIMMED: 0 aligned
  //      matches (mm05 ignores it) but 2 matches at shift +1 —
  //      2·3 >= max(3,2)·2, so the offset form pairs it with 0/1/2.
  //   6 [rev, grad, stripes]  — vid 0 genuinely SHUFFLED (not a
  //      rotation): at most 1 match at ANY single shift — never pairs.
  //   ...and vid 3, the ROTATION, pairs with 0/1/2 at shift −1 under
  //   the offset sweep (a rotated 3-frame clip IS a 2-frame overlap;
  //   offset tolerance cannot and should not reject it) — the
  //   semantic line mm06's oracle pins is alignment-CONSISTENCY:
  //   rotation/trim share one alignment, a shuffle shares none.
  val DhashVidN = 7
  def dhashVidFrames(i: Int): Seq[Int] = i match {
    case 0 => Seq(0, 3, 5)
    case 1 => Seq(1, 4, 5)
    case 2 => Seq(2, 3, 5)
    case 3 => Seq(5, 0, 3)
    case 4 => Seq(5, 5, 5)
    case 5 => Seq(3, 5)
    case 6 => Seq(3, 0, 5)
    case _ => throw new IllegalArgumentException(s"no dhash video fixture $i")
  }

  private def dhashFrameImage(pattern: Int): BufferedImage = {
    val img = new BufferedImage(36, 32, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 36) {
        val v = dhashCell(pattern, y / 4, x / 4)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Generate (once) and return the dHash fixture directory. */
  def ensureDhash(): String =
    graft.Fixtures.ensure("media_dhash", DhashVersion) { dir =>
      (0 until DhashN).foreach { i =>
        if (!ImageIO.write(dhashFrameImage(i), "png", new File(dir, s"dh_$i.png")))
          throw new IllegalStateException("no PNG writer available in this JVM")
      }
      (0 until DhashVidN).foreach { i =>
        val f = new File(dir, s"dhv_$i.gif")
        val writer = ImageIO.getImageWritersByFormatName("gif").next()
        val ios = ImageIO.createImageOutputStream(f)
        try {
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          dhashVidFrames(i).foreach { p =>
            writer.writeToSequence(
              new javax.imageio.IIOImage(dhashFrameImage(p), null, null), null)
          }
          writer.endWriteSequence()
        } finally { writer.dispose(); ios.close() }
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

  private def writeWav(f: File, i: Int): Unit =
    writePcm16(f, audioFrames(i),
      k => if (k % 2 == 0) audioAmplitude(i).toInt else -audioAmplitude(i).toInt)

  /** 16-bit signed little-endian mono PCM at 8000 Hz from a
    * sample-index formula — shared by the mm01 square waves and the
    * afp fingerprint fixtures. */
  private def writePcm16(f: File, frames: Int, sample: Int => Int): Unit = {
    val raw = new Array[Byte](frames * 2)
    var k = 0
    while (k < frames) {
      val s = sample(k).toShort
      raw(2 * k) = (s & 0xFF).toByte
      raw(2 * k + 1) = ((s >> 8) & 0xFF).toByte
      k += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt, frames.toLong)
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, f) finally ais.close()
  }

  // ---- audio fingerprint near-dup fixture (au01) --------------------
  // A SEPARATE fixture dir (the mm03 discipline: mm01 globs *.wav over
  // the media dir, so extra clips there would change its oracle).
  //
  // Six 4096-frame clips of closed-form waveforms whose AudioHash
  // TIME x LAG energy grids are analytic. For an aligned 50%-duty
  // square wave of period P, the lag-k difference energy in a
  // 512-frame window is exactly 4A^2 * count(k), with
  // count(k) = k * (2*512/P - 1) for k <= P/2 — strictly rising — and
  // folding back after P/2. Per window that gives (bit w*8+(k-1) set
  // iff E(k) < E(k+1), k = 1..8):
  //   P =  8: E/4A^2 = 127,254,381,508,381,254,127,0,125
  //           -> bits k=1,2,3,8       -> window byte 0x87
  //   P = 16: E/4A^2 = 63,126,...,504,441
  //           -> bits k=1..7          -> window byte 0x7F
  // so, with all 8 windows and window boundaries aligned to P (512 is
  // a multiple of both periods):
  //   0 period-8 square, A=8192          -> 0x8787878787878787
  //   1 clip 0 + DC offset 512           -> SAME hash (differences
  //     cancel DC — the dHash brightness invariance, exact)
  //   2 clip 0 at 2x gain (A=16384)      -> SAME hash (energies all
  //     scale by 4 — sign comparisons unchanged, exact)
  //   3 period-16 square, A=8192         -> 0x7F7F7F7F7F7F7F7F
  //   4 silence                          -> 0L (no strict inequality)
  //   5 clip 0 with window 7 (frames 3584..4095, 3584 = 0 mod 16)
  //     swapped to the period-16 wave    -> 0x7F87878787878787
  // Hamming relations: (0,1)=(0,2)=(1,2)=0; (0,5)=(1,5)=(2,5)=5
  // (0x87^0x7F = 0xF8, 5 bits, one window); 3 is >= 35 from all of
  // 0/1/2/5 and 4 is >= 27 from everything (0x87 and 0x7F have 4 and
  // 7 set bits per window) — so at maxHamming=5 the pair set is
  // exactly the six listed, the au01 VALUES oracle.
  val AfpN = 6
  private[graft] val AfpVersion = "v1"
  val AfpFrames = 4096

  /** Closed-form sample formula of afp clip `i` at frame `idx` — the
    * fixture's source of truth, asserted against the real WAV
    * encode -> decode -> fingerprint path in AudioHashSpec. */
  def afpSample(i: Int, idx: Int): Int = {
    def sq(p: Int, a: Int) = if (idx % p < p / 2) a else -a
    i match {
      case 0 => sq(8, 8192)
      case 1 => sq(8, 8192) + 512
      case 2 => sq(8, 16384) // clip 0 at exactly 2x gain
      case 3 => sq(16, 8192)
      case 4 => 0
      case 5 => if (idx < 3584) sq(8, 8192) else sq(16, 8192)
      case _ => throw new IllegalArgumentException(s"no afp fixture $i")
    }
  }

  /** Generate (once) and return the afp fixture directory. */
  def ensureAfp(): String =
    graft.Fixtures.ensure("media_afp", AfpVersion) { dir =>
      (0 until AfpN).foreach { i =>
        writePcm16(new File(dir, s"afp_$i.wav"), AfpFrames, afpSample(i, _))
      }
    }

  // ---- offset-tolerant audio segment fixture (au03) ------------------
  // Multi-segment clips built from the afp waveforms above: each clip
  // concatenates [[AfpSegFrames]]-frame SEGMENTS, every segment one of
  // the afpSample patterns — so each segment's fingerprint is an
  // already-pinned closed form (the dhashVidFrames discipline for
  // audio). Segment "scenes", mutually > 3 bits apart at au03's
  // maxHamming = 3:
  //   x = pattern 0 (period-8 square)  hash 0x8787878787878787
  //   y = pattern 3 (period-16 square) hash 0x7F7F7F7F7F7F7F7F (40 from x)
  //   z = pattern 5 (window-7 swapped) hash 0x7F87878787878787 (5 from x,
  //       35 from y)
  // and pattern 2 (x at exactly 2x gain) hashes IDENTICALLY to x.
  // Clips, under the au03 sweep (maxShift ±1, Hamming ≤ 3, 2-of-3
  // longer-clip fraction):
  //   0 [x, y, z]
  //   1 [2x-gain x, y, z] — gain copy of 0: 3/3 at shift 0 (found by
  //      the ALIGNED form too)
  //   2 [y, z]            — clip 0 with its INTRO SEGMENT TRIMMED: 0
  //      aligned matches (the aligned form must MISS it) but 2 at
  //      shift +1 — 2·3 >= max(3,2)·2, so the sweep pairs it with 0/1.
  //   3 [y, x, z] + tail  — clip 0 genuinely SHUFFLED: at most 1 match
  //      at ANY single shift against each of the others — never pairs.
  //      Its 100-frame sub-segment tail is dropped by the fixed-length
  //      cut (a partial tail has no equal-length counterpart), proving
  //      the tail-drop path through the oracle.
  //   4 [DC-shifted x, y, z] — a DC copy of clip 0 (pattern 1 hashes
  //      identically to x): pairs with 0 and 1 at shift 0 (3/3) and
  //      with the trimmed clip 2 at shift −1 (2 matches, seen from the
  //      full clip's side) — the NEGATIVE-shift coverage, and the
  //      history-resident pair (0,4) the au04 incremental gate proves
  //      non-re-emitting.
  // Expected au03 pairs: (0,1,3,0) (0,2,2,+1) (0,4,3,0) (1,2,2,+1)
  // (1,4,3,0) (2,4,2,−1); the aligned segment form finds exactly
  // (0,1,3) (0,4,3) (1,4,3).
  val AfpSegN = 5
  private[graft] val AfpSegVersion = "v2" // v2: clip 4 (DC copy) for au04
  /** One segment = one afp clip length, so segment hashes ARE the afp
    * closed forms (window boundaries at multiples of 512, aligned to
    * both square-wave periods). */
  val AfpSegFrames: Int = AfpFrames

  def afpSegPatterns(i: Int): Seq[Int] = i match {
    case 0 => Seq(0, 3, 5)
    case 1 => Seq(2, 3, 5)
    case 2 => Seq(3, 5)
    case 3 => Seq(3, 0, 5)
    case 4 => Seq(1, 3, 5)
    case _ => throw new IllegalArgumentException(s"no afp segment fixture $i")
  }

  /** Generate (once) and return the afp segment fixture directory. */
  def ensureAfpSeg(): String =
    graft.Fixtures.ensure("media_afp_seg", AfpSegVersion) { dir =>
      (0 until AfpSegN).foreach { i =>
        val pats = afpSegPatterns(i)
        val tail = if (i == 3) 100 else 0 // sub-segment tail, must be dropped
        writePcm16(new File(dir, s"afps_$i.wav"),
          pats.length * AfpSegFrames + tail,
          k => afpSample(pats((k / AfpSegFrames) min (pats.length - 1)),
            k % AfpSegFrames))
      }
    }
}
