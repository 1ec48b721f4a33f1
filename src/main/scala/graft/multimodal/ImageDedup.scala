package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual image near-duplicate detection — the image-modality
  * member of the dedup menu (text has exact/Jaccard/MinHash/SimHash/
  * span dedup; a multimodal training corpus needs the same pass over
  * its images, where re-encodes, crops and brightness tweaks defeat
  * byte-level hashing). Shape: one batched decode pass emits a 64-bit
  * DCT perceptual hash per asset (Binary.perceptualHashes — payload
  * crosses the wire once), then candidate pairs come from the SAME
  * banded-Hamming kernel SimHash text dedup uses
  * (dedup.SimHashDedup.bandedHammingPairs: pigeonhole band join, no
  * all-pairs comparison, codegen'd HammingDistance verify). At 100 TB
  * the pair search shuffles 8-byte hashes, never pixels.
  *
  * Reference pipeline context: the reference's image stages
  * (main.nf convert/stack, bin/frame_features_image.py) manage frames
  * but ship no image dedup; this is part of the training-data mandate.
  */
object ImageDedup {

  /** Near-duplicate asset pairs (d1 < d2, with their Hamming distance)
    * among the payloads of `df` (expects doc_id + payload from
    * Binary.withPayload). Exact for the radius: bands guarantee recall,
    * the Hamming verify removes false positives. Banding covers all 64
    * bits so every informative AC-sign bit (pHash populates bits 1..63;
    * bit 0 is the always-zero DC slot) participates in candidate
    * discrimination. */
  def nearDupPairs(spark: SparkSession, df: DataFrame,
                   maxHamming: Int = 6): DataFrame =
    graft.dedup.SimHashDedup.bandedHammingPairs(
      Binary.perceptualHashes(spark, df).toDF()
        .select(col("doc_id"), col("phash").as("fp")),
      maxHamming, bits = 64)
}
