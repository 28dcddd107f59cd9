package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-modal corpus curation (tp08 — r17 directive #6): the pipeline
  * shape an LLM-data user actually runs over an INTERLEAVED
  * documents + media crawl — each modality goes through its own
  * dedup + quality gates, and the output is one unified survivor
  * manifest the downstream tokenizer/packer consumes.
  *
  *   text:  exact dedup → language ID → quality gate → token floor
  *          ([[graft.operators.TrainingPipeline.curate]] verbatim —
  *          tp01's machinery, not a re-implementation)
  *   image: pixel-floor quality gate → perceptual near-dup dedup
  *          ([[ImageHash.nearDupPairs]] — mm03's machinery)
  *   audio: silence gate (RMS floor over the decoded features) →
  *          perceptual near-dup dedup ([[AudioHash.nearDupPairs]] —
  *          au01's machinery)
  *
  * Stage ORDER is the scale strategy, as everywhere in the dedup
  * family: the cheap map-side gates (pixel floor; text token floor
  * inside curate) run BEFORE the pairwise stage so the banded join
  * sees only gate survivors — the fullDedup lesson applied across
  * modalities.
  *
  * Image survivor rule: an image DROPS iff it has a verified near-dup
  * of LOWER id (pairs carry id_a < id_b, so "appears as id_b in any
  * pair"). This is the first-occurrence convention of the text dedup
  * family — one pass, arrival-order friendly, and on near-dup CLIQUES
  * (re-encode clusters — the realistic case) identical to
  * min-per-component.
  */
object CrossModal {

  /** @param docs      (doc_id, text) corpus rows
    * @param images    (id, dhash, width, height) — already hashed
    *                  ([[ImageHash.hashImages]]) and measured
    *                  ([[Multimodal.decodeImages]]); decode cost is
    *                  paid once upstream, not per stage
    * @param minPixels image quality gate: width·height floor (crawl
    *                  thumbnails/tracking pixels are not training data)
    * @return (modality, item_id) survivors — item_id = doc_id for
    *         text, image id for images — ordered */
  def curate(docs: DataFrame, images: DataFrame,
             langs: Seq[String], minQuality: Double, minTokens: Long,
             minPixels: Long, maxHamming: Int, nBands: Int = 4,
             maxBandBucket: Int = 1000000): DataFrame = {
    require(minPixels >= 1, s"minPixels must be >= 1, got $minPixels")
    val text = graft.operators.TrainingPipeline
      .curate(docs, langs, minQuality, minTokens)
      .select(lit("text").as("modality"), col("doc_id").cast("long").as("item_id"))
    val img = hashedSurvivors(
      images.filter(col("width").cast("long") * col("height") >= minPixels)
        .select("id", "dhash"),
      "image", maxHamming, nBands, maxBandBucket)
    text.unionAll(img).orderBy("modality", "item_id")
  }

  /** The three-modality form: [[curate]] plus an audio branch —
    * (id, afp, rms) rows through a silence gate (RMS floor over the
    * decoded features: silent clips all fingerprint to 0L and are not
    * training data — the flat-image sludge of the audio world) then
    * au01's near-dup dedup under the same first-occurrence rule.
    * `maxHamming`/`nBands` are per-modality: image and audio
    * fingerprints live in different bit geometries. */
  def curate(docs: DataFrame, images: DataFrame, audio: DataFrame,
             langs: Seq[String], minQuality: Double, minTokens: Long,
             minPixels: Long, minRms: Double,
             imageMaxHamming: Int, audioMaxHamming: Int,
             imageNBands: Int, audioNBands: Int,
             maxBandBucket: Int): DataFrame = {
    val textImages = curate(docs, images, langs, minQuality, minTokens,
      minPixels, imageMaxHamming, imageNBands, maxBandBucket)
    val au = hashedSurvivors(
      audio.filter(col("rms") >= minRms)
        .select(col("id"), col("afp").as("dhash")),
      "audio", audioMaxHamming, audioNBands, maxBandBucket)
    textImages.unionAll(au).orderBy("modality", "item_id")
  }

  /** One modality's near-dup survivor branch: banded pairs (mm03/au01
    * machinery — hash-source-agnostic), then the first-occurrence drop
    * rule (anything appearing as the higher id of a verified pair). */
  private def hashedSurvivors(gated: DataFrame, modality: String,
                              maxHamming: Int, nBands: Int,
                              maxBandBucket: Int): DataFrame = {
    val pairs = ImageHash.nearDupPairs(gated, maxHamming, nBands, maxBandBucket)
    gated
      .join(pairs.select(col("id_b").as("id")).distinct(), Seq("id"), "left_anti")
      .select(lit(modality).as("modality"), col("id").cast("long").as("item_id"))
  }
}
