package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video travel as opaque binary
  * columns with typed metadata; decode / feature-extraction / resize /
  * frame-sampling run as partition-local batch transforms
  * (`mapPartitions`), the Scala analog of arrow-batched Pandas UDFs —
  * one decoder instantiation per partition, records processed in bounded
  * batches so decoder state amortizes and memory stays flat.
  *
  * Image decode is REAL via the JDK's own codecs
  * ([[Decoders.imageio]] — PNG/JPEG/GIF/BMP ship with every JVM, no
  * external library), and so is audio ([[Decoders.wav]] —
  * javax.sound.sampled parses WAV/AIFF/AU headers and PCM frames, also
  * JDK-native). Multi-frame VIDEO-container decode is real for the one
  * animated container the JDK ships a codec for — animated GIF
  * ([[Decoders.gifFrames]]: per-frame extraction through the GIF
  * ImageReader, oracle-gated by mm02). General av codecs (H.264/VP9/
  * AAC...) remain STUBBED — no JDK support and this container ships no
  * av libraries; [[Decoders.fake]]/[[Decoders.fakeAudio]] are the
  * deterministic stand-ins. The Spark-side contract — schema, encoders,
  * batch shape, partition-local lifecycle, partitioning strategy — is
  * identical for real and fake; swapping decoders changes one function
  * value.
  */
object Multimodal {

  /** An opaque media blob + typed metadata. */
  case class MediaItem(media_id: Long, mime: String, data: Array[Byte],
                       meta: Map[String, String])

  /** Decoded-image feature row. */
  case class ImageFeatures(media_id: Long, width: Int, height: Int,
                           channels: Int, mean_luma: Double)

  /** A sampled video frame reference (decode deferred). */
  case class FrameRef(media_id: Long, frame_idx: Int, offset_ms: Long)

  /** Decoded-audio feature row. */
  case class AudioFeatures(media_id: Long, duration_ms: Long, sample_rate: Int,
                           channels: Int, rms: Double)

  /** Decoded video-frame feature row (one per sampled frame). */
  case class FrameFeatures(media_id: Long, frame_idx: Int, width: Int,
                           height: Int, mean_luma: Double)

  /** Decoder contract: bytes → (width, height, channels, meanLuma). */
  type ImageDecoder = Array[Byte] => (Int, Int, Int, Double)

  /** Audio decoder contract: bytes → (durationMs, sampleRate, channels,
    * rms) with rms over all channels' samples normalized to [-1, 1]. */
  type AudioDecoder = Array[Byte] => (Long, Int, Int, Double)

  /** Frame decoder contract: container bytes → one (width, height,
    * meanLuma) per frame, in frame order. */
  type FrameDecoder = Array[Byte] => Seq[(Int, Int, Double)]

  object Decoders {
    /** Deterministic fake decoder: dimensions/luma derived from the
      * payload bytes. STUB for the real codec (see class doc).
      */
    val fake: ImageDecoder = bytes => {
      val h = java.util.Arrays.hashCode(bytes)
      val w = 64 + math.abs(h % 512)
      val ht = 64 + math.abs((h / 512) % 512)
      val luma = (math.abs(h.toLong) % 1000).toDouble / 1000.0
      (w, ht, 3, luma)
    }

    /** Real JDK decoder (javax.imageio — PNG/JPEG/GIF/BMP readers ship
      * with every JVM, zero added dependencies): bytes → (width, height,
      * color components, mean luma). Mean luma is Rec.601
      * (0.299 R + 0.587 G + 0.114 B) over all pixels, normalized to
      * [0, 1]. Bytes no installed reader understands throw
      * IllegalArgumentException — at pipeline level route them through
      * the failure path (DLQ, A5) rather than fabricating features.
      */
    // row-bulk sRGB fetch: one ColorModel conversion pass per row into
    // a reused buffer — per-pixel getRGB(x, y) pays bounds checks plus
    // a virtual color-conversion call w*h times (most real files
    // decode to byte-BGR or indexed rasters, not TYPE_INT_RGB), which
    // dominates decode cost on megapixel inputs. Row granularity
    // bounds the buffer at w ints regardless of image height. Shared by
    // the single-image and per-frame decoders so mm01/mm02's closed-form
    // oracle values are computed by ONE accumulation order.
    private def meanLuma(img: java.awt.image.BufferedImage): Double = {
      val w = img.getWidth
      val h = img.getHeight
      val row = new Array[Int](w)
      var sum = 0.0
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          val r = (rgb >> 16) & 0xFF
          val g = (rgb >> 8) & 0xFF
          val b = rgb & 0xFF
          sum += 0.299 * r + 0.587 * g + 0.114 * b
          x += 1
        }
        y += 1
      }
      sum / (w.toLong * h) / 255.0
    }

    val imageio: ImageDecoder = bytes => {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) throw new IllegalArgumentException(
        s"no installed image reader decodes this ${bytes.length}-byte payload")
      (img.getWidth, img.getHeight, img.getColorModel.getNumComponents, meanLuma(img))
    }

    /** Real multi-frame container decode — animated GIF through the
      * JDK's GIF ImageReader: every frame extracted and feature-mapped.
      * This is the one video-like container decodable with zero external
      * libraries; general av codecs stay behind the documented stub.
      *
      * FULL-FRAME GIFs only: a frame-optimized (delta-encoded) GIF
      * stores some frames as patches of the previous frame, and
      * reporting a patch's raw (uncomposited) luma as a frame feature
      * would be silently wrong — such payloads throw instead. Dimensions
      * alone don't detect this (ADVICE r8): delta encoders commonly ship
      * full-canvas-size frames that patch via transparent pixels +
      * disposal 'doNotDispose'. So each frame's GIF stream metadata is
      * inspected and the payload throws when any frame is offset from
      * the canvas origin or declares a transparent color. Given every
      * frame is full-canvas, origin-anchored, and fully opaque, each
      * frame overwrites the complete canvas — composited pixels equal
      * raw pixels under EVERY disposal method, so disposal needs no
      * further constraint. Undecodable bytes throw too, like
      * [[imageio]] — route both through the failure path (DLQ, A5).
      */
    val gifFrames: FrameDecoder = bytes =>
      gifFrameImages(bytes).map(img =>
        (img.getWidth, img.getHeight, meanLuma(img)))

    /** The raw per-frame decode [[gifFrames]] is built on, with the
      * same composition-safety contract — exposed within the package
      * so per-frame HASHING ([[ImageHash.hashFrames]]) shares one
      * reader and one set of checks with per-frame feature extraction.
      */
    private[multimodal] def gifFrameImages(
        bytes: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
      // The stream closes in a finally that guards EVERY exit, including
      // the no-reader throw: with ImageIO's default disk cache each
      // stream holds a temp file + fd, and the undecodable-payload path
      // is exactly the one a DLQ-heavy partition hits repeatedly.
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) throw new IllegalArgumentException(
          s"no installed reader decodes this ${bytes.length}-byte payload")
        val reader = readers.next()
        try {
          reader.setInput(in)
          val n = reader.getNumImages(true)
          val (w0, h0) = (reader.getWidth(0), reader.getHeight(0))
          (0 until n).map { i =>
            val img = reader.read(i)
            if (img.getWidth != w0 || img.getHeight != h0)
              throw new IllegalArgumentException(
                s"frame-optimized GIF: frame $i stores a ${img.getWidth}x${img.getHeight} " +
                  s"sub-image of the ${w0}x$h0 canvas; only full-frame GIFs decode " +
                  "to per-frame features")
            requireCompositionFree(reader.getImageMetadata(i), i)
            img
          }
        } finally reader.dispose()
      } finally in.close()
    }

    /** Throws unless the frame's GIF stream metadata proves raw pixels ==
      * composited pixels: zero ImageDescriptor offset and no transparent
      * color. (Tested together with the full-canvas size check above,
      * these make disposal method irrelevant — see [[gifFrames]] doc.)
      * Reads the standard `javax_imageio_gif_image_1.0` native tree the
      * JDK GIF reader always emits.
      */
    private def requireCompositionFree(
        meta: javax.imageio.metadata.IIOMetadata, frame: Int): Unit = {
      val tree = meta.getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      def attr(child: String, name: String): Option[String] = {
        val kids = tree.getElementsByTagName(child)
        if (kids.getLength == 0) None
        else Option(kids.item(0).asInstanceOf[org.w3c.dom.Element].getAttribute(name))
          .filter(_.nonEmpty)
      }
      val left = attr("ImageDescriptor", "imageLeftPosition").map(_.toInt).getOrElse(0)
      val top  = attr("ImageDescriptor", "imageTopPosition").map(_.toInt).getOrElse(0)
      if (left != 0 || top != 0)
        throw new IllegalArgumentException(
          s"frame-optimized GIF: frame $frame is offset ($left,$top) from the " +
            "canvas origin; its raw pixels patch the previous frame")
      val transparent = attr("GraphicControlExtension", "transparentColorFlag")
        .exists(_.equalsIgnoreCase("TRUE"))
      if (transparent)
        throw new IllegalArgumentException(
          s"frame-optimized GIF: frame $frame declares a transparent color; " +
            "its raw pixels composite over the previous frame, so uncomposited " +
            "features would be wrong")
    }

    /** Deterministic fake audio decoder: the video stand-in (no JDK
      * video support; container ships no av libraries). STUB — same
      * derivation style as [[fake]]. */
    val fakeAudio: AudioDecoder = bytes => {
      val h = java.util.Arrays.hashCode(bytes)
      val durationMs = 1000L + math.abs(h % 30000)
      val rate = Array(8000, 16000, 22050, 44100)(math.abs(h / 7) % 4)
      val rms = (math.abs(h.toLong / 31) % 1000).toDouble / 1000.0
      (durationMs, rate, 1 + math.abs(h / 3) % 2, rms)
    }

    /** Real JDK audio decoder (javax.sound.sampled — WAV/AIFF/AU header
      * parsing and PCM frame access ship with every JVM, zero added
      * dependencies): bytes → (duration ms, sample rate, channels, RMS
      * level). RMS is over all channels' samples normalized to [-1, 1].
      * Supports the PCM encodings the JDK reads natively (signed 16-bit
      * either endianness, signed/unsigned 8-bit); anything else —
      * compressed codecs, float WAV — throws IllegalArgumentException:
      * route through the failure path (DLQ, A5) like undecodable images.
      */
    val wav: AudioDecoder = bytes => {
      import javax.sound.sampled.{AudioFormat, AudioSystem, UnsupportedAudioFileException}
      val ais =
        try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        catch {
          case e: UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              s"no installed audio reader decodes this ${bytes.length}-byte payload", e)
        }
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val ok = (enc == AudioFormat.Encoding.PCM_SIGNED && (bits == 16 || bits == 8)) ||
          (enc == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8)
        if (!ok) throw new IllegalArgumentException(
          s"unsupported PCM shape: encoding=$enc bits=$bits")
        val channels = fmt.getChannels
        val frameBytes = fmt.getFrameSize
        val nFrames = ais.getFrameLength
        // AU headers may declare unknown data size -> NOT_SPECIFIED (-1);
        // a fabricated ~0 duration must not flow downstream as a feature
        if (nFrames < 0) throw new IllegalArgumentException(
          "audio stream declares no frame length (unknown data size header)")
        val durationMs = math.round(nFrames * 1000.0 / fmt.getFrameRate)
        // Stream frames through a bounded buffer (whole-clip buffering
        // would scale memory with clip length, not batch size).
        val buf = new Array[Byte](frameBytes * 1024)
        var sumSq = 0.0
        var n = 0L
        var read = ais.read(buf)
        while (read > 0) {
          var i = 0
          while (i + (bits / 8) <= read) {
            val sample: Double =
              if (bits == 16) {
                val (lo, hi) = if (fmt.isBigEndian) (buf(i + 1), buf(i)) else (buf(i), buf(i + 1))
                ((hi << 8) | (lo & 0xFF)).toShort / 32768.0
              } else if (enc == AudioFormat.Encoding.PCM_UNSIGNED) {
                ((buf(i) & 0xFF) - 128) / 128.0
              } else buf(i) / 128.0
            sumSq += sample * sample
            n += 1
            i += bits / 8
          }
          read = ais.read(buf)
        }
        val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
        (durationMs, math.round(fmt.getSampleRate), channels, rms)
      } finally ais.close()
    }
  }

  /** Ingest media files as [[MediaItem]]s via Spark's `binaryFile`
    * source: one row per file, content as the opaque binary column,
    * path/length/mtime as typed metadata. `media_id` is the 64-bit hash
    * of the path — deterministic across runs and engines. Scan
    * parallelism follows the normal file-split sizing
    * (`maxPartitionBytes`), so decode fan-out tracks input volume like
    * any other source; `pathGlobFilter` pushes the extension filter
    * into the listing.
    */
  def readMedia(spark: SparkSession, dir: String, mime: String,
                globFilter: Option[String] = None): Dataset[MediaItem] = {
    implicit val enc = Encoders.product[MediaItem]
    val reader = spark.read.format("binaryFile")
    globFilter.foreach(g => reader.option("pathGlobFilter", g))
    reader.load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        lit(mime).as("mime"),
        col("content").as("data"),
        map(lit("path"), col("path"),
          lit("length"), col("length").cast("string"),
          lit("mtime"), col("modificationTime").cast("string")).as("meta"))
      .as[MediaItem]
  }

  private val batchSize = 64 // records per decode batch (arrow-batch analog)

  /** Decode + feature-extract images. One decoder per partition; records
    * stream through in `batchSize` groups. Repartition upstream by expected
    * decode cost (e.g. byte size) to balance executors.
    */
  def decodeImages(items: Dataset[MediaItem],
                   decoder: ImageDecoder = Decoders.fake): Dataset[ImageFeatures] = {
    implicit val enc = Encoders.product[ImageFeatures]
    items.mapPartitions { it =>
      // per-partition decoder setup would happen here (codec contexts etc.)
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val (w, h, c, luma) = decoder(m.data)
          ImageFeatures(m.media_id, w, h, c, luma)
        }
      }
    }
  }

  /** Decode + feature-extract audio clips — same partition-local batch
    * lifecycle as [[decodeImages]]. */
  def decodeAudio(items: Dataset[MediaItem],
                  decoder: AudioDecoder = Decoders.wav): Dataset[AudioFeatures] = {
    implicit val enc = Encoders.product[AudioFeatures]
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val (durMs, rate, ch, rms) = decoder(m.data)
          AudioFeatures(m.media_id, durMs, rate, ch, rms)
        }
      }
    }
  }

  /** "Resize": recompute features at a target size — stub arithmetic,
    * real dataflow (narrow transform, stays in the same stage). */
  def resize(features: Dataset[ImageFeatures], maxDim: Int): Dataset[ImageFeatures] = {
    implicit val enc = Encoders.product[ImageFeatures]
    features.map { f =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(f.width, f.height))
      f.copy(width = math.max(1, (f.width * scale).toInt),
             height = math.max(1, (f.height * scale).toInt))
    }
  }

  /** Decode + feature-extract every `everyNth` frame of each multi-frame
    * container (animated GIF via [[Decoders.gifFrames]]) — the REAL
    * counterpart of [[sampleFrames]]' metadata-only generation: same
    * partition-local batch lifecycle as [[decodeImages]], flatMap 1→N so
    * output rows scale with sampled frames.
    */
  def decodeFrames(videos: Dataset[MediaItem], everyNth: Int = 1,
                   decoder: FrameDecoder = Decoders.gifFrames): Dataset[FrameFeatures] = {
    require(everyNth >= 1)
    implicit val enc = Encoders.product[FrameFeatures]
    videos.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { m =>
          decoder(m.data).zipWithIndex.collect {
            case ((w, h, luma), idx) if idx % everyNth == 0 =>
              FrameFeatures(m.media_id, idx, w, h, luma)
          }
        }
      }
    }
  }

  /** Sample every `everyNth` frame of each video (duration/fps from
    * metadata; defaults 10s @ 25fps). flatMap 1→N — a generator, so rows
    * scale with sampled frames, not videos.
    */
  def sampleFrames(videos: Dataset[MediaItem], everyNth: Int): Dataset[FrameRef] = {
    require(everyNth >= 1)
    implicit val enc = Encoders.product[FrameRef]
    videos.flatMap { v =>
      val fps = v.meta.get("fps").flatMap(_.toDoubleOption).getOrElse(25.0)
      val durationMs = v.meta.get("duration_ms").flatMap(_.toLongOption).getOrElse(10000L)
      val nFrames = (durationMs / 1000.0 * fps).toInt
      (0 until nFrames by everyNth).map(i =>
        FrameRef(v.media_id, i, (i / fps * 1000).toLong))
    }
  }
}
