package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The multimodal twin of [[graft.text.CorpusBuild]]: a corpus build
  * over ASSETS (payload-carrying documents), composing the r7 media
  * operators the way CorpusBuild composes the text stages — each stage
  * on the previous stage's survivors, so the composition pins stage
  * ORDER, where the real bugs live:
  *
  *   1. image near-duplicate keep — perceptual-hash pairs
  *      ([[ImageDedup]]) closed into clusters, one canonical (min-id)
  *      asset kept per cluster (re-encodes/brightness tweaks of the
  *      same image collapse to one training example);
  *   2. scene-stability gate — assets whose sampled-frame intensity
  *      cuts ([[SceneCut]]) exceed `maxCuts` drop (strobing/corrupt
  *      video a captioning pipeline cannot use);
  *   3. audio silence gate — assets whose mean short-time RMS
  *      ([[Audio.frameFeatures]]) falls below `minRms` drop, as do
  *      assets too short to frame at all (nothing to transcribe);
  *   4. text gate — the SAME qualityKeep rule the text corpus build
  *      uses, so the two builds cannot drift on text semantics.
  *
  * Scale shape: ONE fused decode pass ([[Binary.assetProfiles]])
  * computes every gate's per-asset attributes — the payload crosses
  * the wire ONCE for the whole build. That fusion cannot change the
  * survivor set: stage 1 hashes every asset regardless, and stages
  * 2-4 are per-asset predicates, so gating the profile in stage order
  * equals decoding each stage's survivors separately. The pair search
  * shuffles 8-byte hashes (never pixels) and cluster closure is the
  * log-round CC used everywhere.
  *
  * Expects assets shaped by [[Binary.withPayload]]:
  * (doc_id, text, lang, source, payload).
  */
object MultimodalCorpus {

  def run(assets: DataFrame,
          maxHamming: Int = 6,
          sceneThreshold: Double = 0.5, maxCuts: Long = 2,
          minRms: Double = 24500.0,
          minSharp: Double = 0.0, maxClip: Double = 1.0,
          frameLen: Int = 32, hop: Int = 16, everyK: Int = 2): DataFrame = {
    val spark = assets.sparkSession
    // ONE fused decode pass profiles every asset (phash + cut count +
    // mean RMS — Binary.assetProfiles): stage 1 needs every asset's
    // hash anyway, and stages 2-4 are per-asset predicates over the
    // profile, so the survivor set is identical to decoding each
    // stage's survivors separately — minus two full payload passes.
    val prof = Binary.assetProfiles(spark, assets, sceneThreshold,
        everyK, frameLen, hop).toDF()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // 1. image near-dup canonical keep (8-byte hashes shuffle, never
    // pixels; cluster closure is the log-round CC)
    val pairs = graft.dedup.SimHashDedup.bandedHammingPairs(
      prof.select(col("doc_id"), col("phash").as("fp")), maxHamming, bits = 64)
    val canon = graft.dedup.Dedup.clusters(prof, col("doc_id"), pairs)
      .filter(col("keep") === 1).select("doc_id")
    // 2.-3. scene-stability + audio silence gates on the profile
    // (frameless assets are unmeasurable -> silent); 4. text gate
    // (shared rule — see TextFeatures.qualityKeep)
    // 2.-3b. scene-stability, audio silence, blur (r8: even the
    // SHARPEST sampled frame below the focus floor -> unusable) and
    // clipping (r8: distorted audio) gates on the profile; 4. text
    // gate (shared rule — see TextFeatures.qualityKeep)
    // prof's last readers are in the returned plan (the pair/CC stage
    // materialized the cache); release after the caller's action
    graft.functions.CacheRelease.afterNextExecution(prof)
    assets.join(canon, Seq("doc_id"), "left_semi")
      .join(prof.select(col("doc_id"), col("n_cuts"), col("has_audio"),
        col("avg_rms"), col("max_lap"), col("clip_frac")), Seq("doc_id"))
      .filter(col("n_cuts") <= maxCuts)
      .filter(col("has_audio") && col("avg_rms") >= minRms)
      .filter(col("max_lap") >= minSharp)
      .filter(col("clip_frac") <= maxClip)
      .filter(graft.text.TextFeatures.qualityKeep(col("text")))
      .select(col("doc_id"), col("lang"), col("source"),
        (col("n_cuts") + 1).as("n_scenes"), col("avg_rms"),
        col("max_lap"), col("clip_frac"))
  }
}
