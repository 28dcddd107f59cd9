package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Perceptual audio near-duplicate detection — the audio analog of the
  * image dHash family (mm03): crawled audio corpora are full of
  * re-encodes, gain-normalized copies, and DC-shifted re-uploads that
  * byte-exact dedup cannot see. The fingerprint is the dHash
  * discipline in 1-D: a TIME × LAG grid of difference energies with
  * only the SIGN of each adjacent-lag comparison kept — 64 bits per
  * clip.
  *
  * Geometry: the clip's PCM frames are split into [[Windows]] = 8 time
  * windows by the same integer partition as the image grid
  * (`window = idx * 8 / nFrames`); within each window the energy at
  * lag k is E(w, k) = Σ (s[i] − s[i−k])² over pairs fully inside the
  * window, for k = 1..[[Lags]] = 9; bit `w * 8 + (k−1)` is set iff
  * E(w, k) < E(w, k+1) strictly. E_k = 2(R(0) − R(k)) in
  * autocorrelation terms, so the adjacent-lag comparison reads the
  * local spectral tilt — the autocorrelation-domain stand-in for the
  * band-energy differences of published audio fingerprints (Haitsma &
  * Kalker, "A Highly Robust Audio Fingerprint System", ISMIR 2002),
  * chosen because it stays in EXACT INTEGER arithmetic (samples are
  * ints; differences, squares, and sums of ints are exact), which is
  * what makes a closed-form VALUES oracle possible (the mm03 proof
  * pattern).
  *
  * Invariances (the perceptual point, exact by construction):
  *   - DC offset: differences cancel it — a level-shifted copy hashes
  *     IDENTICALLY (the dHash brightness invariance).
  *   - Uniform gain: scales every energy by the same square factor —
  *     sign comparisons unchanged (the dHash contrast invariance).
  *   - Silence hashes to 0L (no strict inequality anywhere) — the
  *     audio analog of the flat-image sludge the band-bucket guard
  *     exists for.
  *
  * Near-duplicates are pairs within a small Hamming distance, found at
  * scale by the SAME banded blocking as images ([[ImageHash]] — one
  * definition of the banding geometry, guard, and verify): see
  * [[nearDupPairs]]. Band-geometry guidance at corpus scale: band
  * VALUE width is 64/nBands bits, so buckets of a near-uniform hash
  * population average N / 2^(64/nBands) — at 8 bands that is N/256
  * (quadratic trouble at millions of clips, and the maxBandBucket
  * guard will say so loudly); production corpora should prefer
  * nBands = 4 with maxHamming ≤ 3 (re-encode distances in practice)
  * and reserve 8 bands for small/curated sets.
  */
object AudioHash {

  /** Time windows (rows of the grid). */
  val Windows = 8

  /** Lags per window; [[Lags]] − 1 = 8 adjacent comparisons = the 8
    * bits per window. */
  val Lags = 9

  /** Minimum decodable clip length: every window must hold at least
    * one full lag-[[Lags]] pair. */
  val MinFrames: Int = Windows * (Lags + 1)

  /** Overflow bound (documented like the image 16384-px cap): with
    * ≤ [[MaxChannels]] 16-bit channels summed, a squared difference is
    * < 2^38, so a window of < 2^25 terms keeps every energy under
    * 2^63. 2^28 frames / 8 windows = 2^25 — ~9.3 h at 8 kHz; split
    * longer material upstream (it is not a training clip as-is). */
  val MaxFrames: Long = 1L << 28
  val MaxChannels = 8

  case class HashedAudio(media_id: Long, afp: Long)

  /** The fingerprint arithmetic over an already-decoded channel-summed
    * integer sample array — shared by [[afp64]] (the decode path) and
    * fixture specs that generate samples from closed-form formulas, so
    * the WAV encode/decode roundtrip is provably transparent. */
  def fingerprintSamples(mix: Array[Long]): Long = {
    val n = mix.length
    require(n >= MinFrames,
      s"clip of $n frames is shorter than the $MinFrames-frame fingerprint minimum")
    require(n <= MaxFrames,
      s"clip of $n frames exceeds $MaxFrames; split upstream (exact integer " +
        "energies would overflow)")
    val e = Array.ofDim[Long](Windows, Lags + 1) // e(w)(k), k in 1..Lags
    var i = 0
    while (i < n) {
      val w = (i.toLong * Windows / n).toInt
      val lo = math.max(i - Lags, 0)
      var j = i - 1
      while (j >= lo) {
        // pair (i, j) at lag i - j counts only if j is in i's window
        if ((j.toLong * Windows / n).toInt == w) {
          val d = mix(i) - mix(j)
          e(w)(i - j) += d * d
        }
        j -= 1
      }
      i += 1
    }
    var hash = 0L
    var w = 0
    while (w < Windows) {
      var k = 1
      while (k < Lags) {
        if (e(w)(k) < e(w)(k + 1)) hash |= 1L << (w * 8 + (k - 1))
        k += 1
      }
      w += 1
    }
    hash
  }

  /** Validated PCM frame stream — the decode + format-check core shared
    * by the full-clip fingerprint ([[afp64]]) and the segment tier
    * ([[afpSegments64]]), so one support matrix (WAV/AIFF/AU, signed
    * 16-bit either endianness, signed/unsigned 8-bit — the
    * [[Multimodal.Decoders.wav]] contract) and one set of loud
    * IllegalArgumentException routes (DLQ, A5) cover both. Channels are
    * SUMMED per frame (no divide — exact, and gain invariance makes the
    * scale irrelevant). `readMix(dst, want)` fills `dst(0 until got)`
    * with the next channel-summed frames through a bounded I/O buffer
    * — memory per call is O(want), which is what lets the segment
    * path hold one segment at a time. */
  private final class PcmMixReader(bytes: Array[Byte]) {
    import javax.sound.sampled.{AudioFormat, AudioSystem, UnsupportedAudioFileException}
    private val ais =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch {
        case e: UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"no installed audio reader decodes this ${bytes.length}-byte payload", e)
      }
    private val fmt = ais.getFormat
    private val enc = fmt.getEncoding
    private val bits = fmt.getSampleSizeInBits
    private val pcmOk =
      (enc == AudioFormat.Encoding.PCM_SIGNED && (bits == 16 || bits == 8)) ||
        (enc == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8)
    if (!pcmOk) { close(); throw new IllegalArgumentException(
      s"unsupported PCM shape: encoding=$enc bits=$bits") }
    private val channels = fmt.getChannels
    if (channels > MaxChannels) { close(); throw new IllegalArgumentException(
      s"$channels channels exceeds $MaxChannels (exact integer energies " +
        "would overflow); downmix upstream") }
    val nFrames: Long = ais.getFrameLength
    if (nFrames < 0) { close(); throw new IllegalArgumentException(
      "audio stream declares no frame length (unknown data size header)") }
    private val frameBytes = fmt.getFrameSize
    if (frameBytes <= 0) { close(); throw new IllegalArgumentException(
      s"audio stream declares no frame size (getFrameSize=$frameBytes) — " +
        "cannot walk PCM frames") } // NOT_SPECIFIED (-1) would corrupt the walk
    private val sampleBytes = bits / 8
    private val buf = new Array[Byte](frameBytes * 1024)

    /** Fill `dst(0 until want)` with the next channel-summed frames;
      * returns the count delivered (< want only at end of stream).
      * AudioInputStream.read returns whole frames by contract, so no
      * partial-frame carry is needed. */
    def readMix(dst: Array[Long], want: Int): Int = {
      var frame = 0
      while (frame < want) {
        val read = ais.read(buf, 0, // long math: want*frameBytes can pass Int.Max
          math.min(buf.length.toLong, (want - frame).toLong * frameBytes).toInt)
        if (read <= 0) return frame
        var off = 0
        while (off + frameBytes <= read) {
          var acc = 0L
          var c = 0
          while (c < channels) {
            val i = off + c * sampleBytes
            acc +=
              (if (bits == 16) {
                val (lo, hi) = if (fmt.isBigEndian) (buf(i + 1), buf(i)) else (buf(i), buf(i + 1))
                ((hi << 8) | (lo & 0xFF)).toShort.toLong
              } else if (enc == AudioFormat.Encoding.PCM_UNSIGNED) {
                ((buf(i) & 0xFF) - 128).toLong
              } else buf(i).toLong)
            c += 1
          }
          dst(frame) = acc
          frame += 1
          off += frameBytes
        }
      }
      frame
    }

    def close(): Unit = ais.close()
  }

  /** 64-bit fingerprint of a whole encoded clip. Undecodable bytes,
    * compressed codecs, clips shorter than [[MinFrames]] or longer
    * than [[MaxFrames]], and > [[MaxChannels]] channels throw
    * IllegalArgumentException — route through the failure path (DLQ,
    * A5) like undecodable images. Memory is O(frames) — the mix array,
    * 8 B a frame, up to 2 GiB at MaxFrames — because the 8 TIME
    * windows span the whole clip, so the full-clip fingerprint cannot
    * stream (r18 advisory; the old comment claimed the I/O-buffer
    * bound). The O(segFrames) alternative for long material is the
    * segment tier ([[afpSegments64]]), which holds one segment at a
    * time. */
  def afp64(bytes: Array[Byte]): Long = {
    val r = new PcmMixReader(bytes)
    try {
      if (r.nFrames < MinFrames) throw new IllegalArgumentException(
        s"clip of ${r.nFrames} frames is shorter than the $MinFrames-frame " +
          "fingerprint minimum")
      if (r.nFrames > MaxFrames) throw new IllegalArgumentException(
        s"clip of ${r.nFrames} frames exceeds $MaxFrames; split upstream " +
          "(exact integer energies would overflow) or fingerprint segments " +
          "(afpSegments64)")
      val mix = new Array[Long](r.nFrames.toInt)
      val got = r.readMix(mix, mix.length)
      if (got != r.nFrames) throw new IllegalArgumentException(
        s"audio stream truncated: header declares ${r.nFrames} frames, read $got")
      fingerprintSamples(mix)
    } finally r.close()
  }

  /** Per-SEGMENT fingerprints of an encoded clip (au03 — the r18
    * directive): the PCM is cut into consecutive runs of exactly
    * `segFrames` frames and each run fingerprinted independently with
    * the SAME [[fingerprintSamples]] arithmetic — the
    * [[ImageHash.FrameHash]] discipline applied to audio, giving the
    * alignment sweep a position axis the clip-global hash lacks (a
    * trimmed intro shifts every [[afp64]] window boundary; it shifts
    * segment INDICES by a whole number, which the bounded offset sweep
    * recovers).
    *
    * Segments must be EQUAL-length to be comparable at all — the
    * window geometry of [[fingerprintSamples]] scales with its input
    * length, so two different-length slices of identical audio hash
    * differently — hence the fixed `segFrames` cut and the DROPPED
    * under-length tail (a partial tail has no equal-length counterpart
    * to pair with). Trim tolerance is therefore segment-GRANULAR:
    * a copy trimmed by a whole number of segments realigns exactly;
    * sub-segment trims still shift every boundary (the honest limit of
    * this tier — sample-exact alignment would need overlapping
    * segments at replication cost, out of scope). A clip shorter than
    * one segment throws (too short for this tier — DLQ, like afp64's
    * MinFrames). Memory is O(segFrames): one segment buffer, reused.
    */
  def afpSegments64(bytes: Array[Byte], segFrames: Int): Array[Long] = {
    require(segFrames >= MinFrames,
      s"segFrames=$segFrames is shorter than the $MinFrames-frame fingerprint minimum")
    require(segFrames <= MaxFrames,
      s"segFrames=$segFrames exceeds $MaxFrames (exact integer energies would overflow)")
    val r = new PcmMixReader(bytes)
    try {
      if (r.nFrames < segFrames) throw new IllegalArgumentException(
        s"clip of ${r.nFrames} frames is shorter than one $segFrames-frame " +
          "segment — too short for the segment tier (afp64 covers short clips)")
      val seg = new Array[Long](segFrames)
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var total = 0L
      var got = r.readMix(seg, segFrames)
      total += got
      while (got == segFrames) {
        out += fingerprintSamples(seg)
        got = r.readMix(seg, segFrames)
        total += got
      }
      // A short final read is EITHER the legitimate sub-segment tail
      // (stream complete: cumulative frames == the header's count, the
      // remainder < segFrames has no equal-length counterpart to pair
      // with) OR a stream cut mid-data — which afp64 already routes to
      // the DLQ loudly and this tier used to conflate with the tail
      // (r19 advisory): fewer segment hashes, silently.
      if (total != r.nFrames) throw new IllegalArgumentException(
        s"audio stream truncated: header declares ${r.nFrames} frames, read $total")
      out.toArray
    } finally r.close()
  }

  /** Fingerprint a media Dataset. Per-row decode ([[afp64]] carries no
    * reusable decoder context — the hashImages lifecycle). */
  def hashAudio(items: Dataset[Multimodal.MediaItem]): Dataset[HashedAudio] = {
    implicit val enc = Encoders.product[HashedAudio]
    items.mapPartitions { it =>
      it.map(m => HashedAudio(m.media_id, afp64(m.data)))
    }
  }

  /** Near-duplicate pairs by banded Hamming join — LITERALLY
    * [[ImageHash.nearDupPairs]] over the audio fingerprints: the
    * banding geometry, pigeonhole recall precondition
    * (maxHamming < nBands), band-bucket width guard, and popcount
    * verify are hash-source-agnostic, so there is ONE definition (a
    * banding fix lands on images, videos, and audio together).
    * Input carries (id, afp); output (id_a < id_b, hamming), ordered. */
  def nearDupPairs(hashes: DataFrame, maxHamming: Int, nBands: Int = 4,
                   maxBandBucket: Int = 1000000): DataFrame =
    ImageHash.nearDupPairs(
      hashes.withColumnRenamed("afp", "dhash"), maxHamming, nBands, maxBandBucket)

  /** Persisted fingerprint band index — the [[ImageHash.saveDhashIndex]]
    * lifecycle over audio (au02): a crawl re-run should not re-decode
    * last month's clips, so the banded projection persists ONCE as a
    * bucketed path table and each nightly batch joins against it. The
    * index machinery is hash-source-agnostic, so these delegate — one
    * implementation of the save/load/probe lifecycle across the media
    * dedup family. */
  def saveAfpIndex(hashes: DataFrame, path: String, nBands: Int = 4,
                   nBuckets: Int = 8, maxBandBucket: Int = 1000000): Unit =
    ImageHash.saveDhashIndex(hashes.withColumnRenamed("afp", "dhash"),
      path, nBands, nBuckets, maxBandBucket)

  /** Near-dup pairs INVOLVING a new batch of fingerprints, against a
    * [[saveAfpIndex]] corpus: (indexed x new) + (new x new), never
    * (indexed x indexed) — those were emitted at build time. */
  def incrementalNearDupPairs(newHashes: DataFrame, indexPath: String,
                              maxHamming: Int,
                              maxBandBucket: Int = 1000000): DataFrame =
    ImageHash.incrementalNearDupPairs(
      newHashes.withColumnRenamed("afp", "dhash"), indexPath, maxHamming,
      maxBandBucket)

  /** Append a batch's SURVIVORS into a [[saveAfpIndex]] corpus — the
    * nightly lifecycle step after [[incrementalNearDupPairs]] (r19
    * directive #1; machinery is [[ImageHash.appendToDhashIndex]]
    * verbatim, hash-source-agnostic). Contract: ids new to the index. */
  def appendToAfpIndex(newHashes: DataFrame, indexPath: String,
                       maxBandBucket: Int = 1000000): Unit =
    ImageHash.appendToDhashIndex(
      newHashes.withColumnRenamed("afp", "dhash"), indexPath, maxBandBucket)

  /** Compact a [[saveAfpIndex]] corpus after nightly appends (r19
    * directive #2; [[ImageHash.compactDhashIndex]] verbatim). */
  def compactAfpIndex(spark: org.apache.spark.sql.SparkSession,
                      indexPath: String,
                      targetFileBytes: Long = 128L * 1024 * 1024)
      : graft.ingest.Compaction.CompactionStats =
    ImageHash.compactDhashIndex(spark, indexPath, targetFileBytes)

  // ---- offset-tolerant segment tier (au03 — r18 directive #1) -------
  // The clip-global fingerprint above is blind to trims: a copy with a
  // stripped intro or an appended tail shifts every one of the 8
  // window boundaries and misses — exactly the failure mode the
  // aligned video matcher (mm05) had for trimmed clips, closed for
  // video by mm06's bounded alignment sweep. The audio composition is
  // the same two pieces: per-SEGMENT fingerprints ([[afpSegments64]] —
  // the FrameHash shape over PCM) + [[ImageHash.videoNearDupPairsOffset]]
  // over segment positions. The sweep machinery is position-source-
  // agnostic (frame indices and segment indices are both just integer
  // positions), so these delegate — an alignment fix lands on video
  // and audio together.

  case class SegmentHash(media_id: Long, seg_idx: Int, afp: Long)

  /** Segment-fingerprint a media Dataset: flatMap 1→N, rows scale with
    * clip length / segFrames (the [[ImageHash.hashFrames]] lifecycle —
    * per-row decode, nothing to batch). */
  def segmentHashes(items: Dataset[Multimodal.MediaItem],
                    segFrames: Int): Dataset[SegmentHash] = {
    implicit val enc = Encoders.product[SegmentHash]
    items.mapPartitions { it =>
      it.flatMap { m =>
        afpSegments64(m.data, segFrames).iterator.zipWithIndex.map {
          case (h, i) => SegmentHash(m.media_id, i, h)
        }
      }
    }
  }

  /** ALIGNED segment-level near-dup pairs — the video matcher's exact
    * frame-alignment semantics over audio segments (the au03 spec's
    * miss-proof baseline; production trim tolerance is
    * [[nearDupPairsOffset]]). Input (id, seg_idx, afp); output
    * (id_a < id_b, n_matched), ordered. */
  def segmentNearDupPairs(segs: DataFrame, maxHamming: Int,
                          minMatchNum: Int, minMatchDen: Int, nBands: Int = 4,
                          maxBandBucket: Int = 1000000): DataFrame =
    ImageHash.videoNearDupPairs(
      segs.withColumnRenamed("afp", "dhash")
        .withColumnRenamed("seg_idx", "frame_idx"),
      maxHamming, minMatchNum, minMatchDen, nBands, maxBandBucket)

  /** Persisted SEGMENT band index (au04 — the [[saveAfpIndex]]
    * lifecycle for the offset-tolerant tier): a nightly crawl should
    * not re-decode and re-segment history to get trim tolerance. Input
    * carries (id, seg_idx, afp); machinery is
    * [[ImageHash.saveFrameIndex]] verbatim (position-source-agnostic). */
  def saveSegmentIndex(segs: DataFrame, path: String, nBands: Int = 4,
                       nBuckets: Int = 8, maxBandBucket: Int = 1000000): Unit =
    ImageHash.saveFrameIndex(
      segs.withColumnRenamed("afp", "dhash")
        .withColumnRenamed("seg_idx", "frame_idx"),
      path, nBands, nBuckets, maxBandBucket)

  /** Append a batch's SURVIVOR segments into a [[saveSegmentIndex]]
    * corpus (r19 directive #1 — the au05 gate): bands bucketed-append +
    * per-id segment counts append + parent re-bless, all
    * [[ImageHash.appendToFrameIndex]] verbatim (position-source-
    * agnostic). Contract: ids new to the index. */
  def appendToSegmentIndex(newSegs: DataFrame, indexPath: String,
                           maxBandBucket: Int = 1000000): Unit =
    ImageHash.appendToFrameIndex(
      newSegs.withColumnRenamed("afp", "dhash")
        .withColumnRenamed("seg_idx", "frame_idx"),
      indexPath, maxBandBucket)

  /** Compact a [[saveSegmentIndex]] corpus after nightly appends (r19
    * directive #2; [[ImageHash.compactFrameIndex]] verbatim). */
  def compactSegmentIndex(spark: org.apache.spark.sql.SparkSession,
                          indexPath: String,
                          targetFileBytes: Long = 128L * 1024 * 1024)
      : Seq[graft.ingest.Compaction.CompactionStats] =
    ImageHash.compactFrameIndex(spark, indexPath, targetFileBytes)

  /** Offset-tolerant near-dup pairs INVOLVING a new batch of segment
    * fingerprints, against a [[saveSegmentIndex]] corpus: (indexed ×
    * new) + (new × new), never (indexed × indexed) — au04, the au02
    * lifecycle for the trim-tolerant tier. */
  def incrementalNearDupPairsOffset(newSegs: DataFrame, indexPath: String,
                                    maxHamming: Int, minMatchNum: Int,
                                    minMatchDen: Int, maxShift: Int,
                                    maxBandBucket: Int = 1000000): DataFrame =
    ImageHash.incrementalNearDupPairsOffset(
      newSegs.withColumnRenamed("afp", "dhash")
        .withColumnRenamed("seg_idx", "frame_idx"),
      indexPath, maxHamming, minMatchNum, minMatchDen, maxShift, maxBandBucket)

  /** OFFSET-TOLERANT audio near-dup pairs (au03): sweep a BOUNDED set
    * of segment-index alignments in [−maxShift, maxShift] and qualify
    * a pair on its BEST single shift matching ≥ minMatchNum/minMatchDen
    * of the LONGER clip's segments — one consistent alignment, so a
    * trimmed/rotated copy pairs and a shuffled remix (no single
    * alignment) does not. Delegation carries mm06's whole scale shape:
    * constant (2·maxShift+1)× replication with the aligned position in
    * the join key, the band-bucket guard on TRUE positions
    * pre-replication, never clip×clip. Output
    * (id_a < id_b, n_matched, shift) — shift = segments of id_a's
    * intro skipped (negative: id_b's) — ordered. */
  def nearDupPairsOffset(segs: DataFrame, maxHamming: Int,
                         minMatchNum: Int, minMatchDen: Int, maxShift: Int,
                         nBands: Int = 4,
                         maxBandBucket: Int = 1000000): DataFrame =
    ImageHash.videoNearDupPairsOffset(
      segs.withColumnRenamed("afp", "dhash")
        .withColumnRenamed("seg_idx", "frame_idx"),
      maxHamming, minMatchNum, minMatchDen, maxShift, nBands, maxBandBucket)
}
