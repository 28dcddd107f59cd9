package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Perceptual image near-duplicate detection — the image analog of the
  * text dedup family (dd02/dd04): web-scale image corpora are full of
  * re-encodes, brightness-shifted copies, and thumbnail re-uploads that
  * byte-level dedup (distinct on content) cannot see. The standard
  * first-pass signal is a difference hash (dHash): downscale to a tiny
  * luma grid and keep only the sign of each horizontal neighbor
  * difference — 64 bits per image, invariant under global brightness /
  * contrast shifts and any resize that preserves the gradient
  * structure. Near-duplicates are then pairs within a small Hamming
  * distance, found at scale by band blocking (the dd04 SimHash
  * discipline): split the 64 bits into `nBands` bands; any pair with
  * Hamming distance < nBands collides on at least one full band
  * (pigeonhole), so an equi-join on (band, band value) has guaranteed
  * recall and never goes all-pairs.
  *
  * Determinism contract (what makes the mm03 VALUES oracle possible):
  * decode is the JDK's own lossless PNG path, luma is integer Rec.601
  * milli-weights (299 R + 587 G + 114 B), grid cells are the integer
  * partition `cell = (coord * grid) / extent`, and the neighbor
  * comparison is the exact cross-multiplied integer `sumL * nR <
  * sumR * nL` — no floating point anywhere, so the hash of a given
  * payload is bit-identical on every JVM.
  */
object ImageHash {

  /** dHash grid: 9 luma columns x 8 rows -> 8 comparisons per row = 64
    * bits. Bit `r * 8 + c` is set iff cell (r, c) is strictly darker
    * than its right neighbor (r, c+1). */
  val GridW = 9
  val GridH = 8

  case class HashedImage(media_id: Long, dhash: Long)

  /** 64-bit difference hash of an encoded image (any format the JDK
    * decodes — PNG/JPEG/GIF/BMP). Undecodable bytes and images smaller
    * than the 9x8 grid throw IllegalArgumentException — route through
    * the failure path (DLQ, A5) like [[Multimodal.Decoders.imageio]].
    * Images over 16384 px on a side also throw (the exact integer
    * average compare is overflow-safe only below that; downscale such
    * inputs first — at 268 MP they are not candidate training images
    * as-is anyway).
    */
  def dHash64(bytes: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) throw new IllegalArgumentException(
      s"no installed image reader decodes this ${bytes.length}-byte payload")
    val w = img.getWidth
    val h = img.getHeight
    if (w < GridW || h < GridH) throw new IllegalArgumentException(
      s"image ${w}x$h is smaller than the ${GridW}x$GridH dHash grid")
    if (w > 16384 || h > 16384) throw new IllegalArgumentException(
      s"image ${w}x$h exceeds 16384 px; downscale before hashing " +
        "(exact integer compare would overflow)")
    // integer milli-luma sums per grid cell; cell of a pixel is the
    // integer partition (coord * grid) / extent — consecutive groups of
    // near-equal width, every cell non-empty given w>=9, h>=8
    val sums = Array.ofDim[Long](GridH, GridW)
    val counts = Array.ofDim[Long](GridH, GridW)
    val row = new Array[Int](w) // row-bulk fetch, as in Multimodal.meanLuma
    var y = 0
    while (y < h) {
      val gr = y * GridH / h
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val gc = x * GridW / w
        val rgb = row(x)
        val lum = 299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
          114 * (rgb & 0xFF)
        sums(gr)(gc) += lum
        counts(gr)(gc) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var r = 0
    while (r < GridH) {
      var c = 0
      while (c < GridW - 1) {
        // avgL < avgR exactly, without division: sumL/nL < sumR/nR
        // <=> sumL * nR < sumR * nL (all non-negative)
        if (sums(r)(c) * counts(r)(c + 1) < sums(r)(c + 1) * counts(r)(c))
          hash |= 1L << (r * (GridW - 1) + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** Hash a media Dataset — same partition-local batch lifecycle as
    * [[Multimodal.decodeImages]] (one decoder context per partition,
    * bounded batches). */
  def hashImages(items: Dataset[Multimodal.MediaItem]): Dataset[HashedImage] = {
    implicit val enc = Encoders.product[HashedImage]
    items.mapPartitions { it =>
      it.grouped(64).flatMap(_.map(m => HashedImage(m.media_id, dHash64(m.data))))
    }
  }

  /** Near-duplicate pairs by banded Hamming join over dHashes.
    *
    * Input must carry columns `(id, dhash)`; output is
    * `(id_a, id_b, hamming)` with `id_a < id_b` and
    * `hamming <= maxHamming`, ordered.
    *
    * `maxHamming < nBands` is REQUIRED, and is what makes the blocking
    * exact rather than approximate: a pair differing in fewer bits than
    * there are bands leaves at least one band untouched, so the
    * (band, value) equi-join finds every qualifying pair — recall 1 by
    * pigeonhole, not by tuning. Candidates sharing several bands are
    * deduplicated before the popcount verify.
    *
    * `maxBandBucket` is the loud width cap on a single (band, value)
    * bucket — the blocked self-join's quadratic axis (the
    * Baskets/FuzzyJoin/nearDupPairs discipline). Monochrome crawl
    * sludge is the realistic offender: a flat image hashes to all-zero
    * bands, and a few million of them make one bucket own C(N, 2) of
    * the join. The guard is a map-side-combined width aggregate +
    * broadcast raise (band keys are low-cardinality, so a count window
    * would sort the whole corpus — the r17 FuzzyJoin lesson), firing
    * before any pair row materializes. Flat-image floods should be
    * dropped upstream by a quality gate (they are not training data),
    * not admitted via a bigger cap.
    */
  def nearDupPairs(hashes: DataFrame, maxHamming: Int, nBands: Int = 4,
                   maxBandBucket: Int = 1000000): DataFrame = {
    require(nBands >= 2 && 64 % nBands == 0,
      s"nBands must divide 64 and be >= 2, got $nBands")
    require(maxHamming >= 0 && maxHamming < nBands,
      s"maxHamming must be in [0, nBands) for guaranteed recall, " +
        s"got maxHamming=$maxHamming nBands=$nBands")
    require(maxBandBucket >= 1, s"maxBandBucket must be >= 1, got $maxBandBucket")
    val width = 64 / nBands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val bands = (0 until nBands).map(p =>
      shiftrightunsigned(col("dhash"), p * width).bitwiseAND(lit(mask)))
    val banded = hashes.select(col("id"), col("dhash"),
      posexplode(array(bands: _*)).as(Seq("band", "bv")))
    val offend = banded.groupBy("band", "bv")
      .agg(count(lit(1)).as("__w"))
      .filter(col("__w") > maxBandBucket)
    val g = banded.join(broadcast(offend), Seq("band", "bv"), "left")
      .withColumn("id",
        when(col("__w").isNotNull, raise_error(concat(
          lit("ImageHash.nearDupPairs: band "), col("band").cast("string"),
          lit(" value "), col("bv").cast("string"), lit(" holds "),
          col("__w").cast("string"),
          lit(s" images, over maxBandBucket=$maxBandBucket; the in-bucket " +
            "pair join is quadratic in bucket width — drop flat/duplicate-" +
            "heavy sludge upstream or raise the cap deliberately"))))
          .otherwise(col("id")))
      .select("id", "dhash", "band", "bv")
    val a = g.select(col("id").as("id_a"), col("dhash").as("ha"),
      col("band"), col("bv"))
    val b = g.select(col("id").as("id_b"), col("dhash").as("hb"),
      col("band"), col("bv"))
    a.join(b, Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "ha", "hb").distinct() // multi-band collisions
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("id_a", "id_b")
  }
}
