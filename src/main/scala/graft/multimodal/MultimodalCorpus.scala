package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.Numeric

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
  * Scale shape: the pair search shuffles 8-byte hashes (never pixels);
  * scene cuts and the RMS gate aggregate the OUTPUT of batched decode
  * passes, so each surviving payload crosses the wire once per decode
  * pass (hash pass + frame pass + audio pass — fusing them into one
  * decode is the obvious next step a real codec stack would take, and
  * changes nothing downstream of the per-frame rows); cluster closure
  * is the log-round CC used everywhere; the gates themselves are
  * one-aggregate-per-asset joins. Survivor sets persist between stages
  * exactly like CorpusBuild.
  *
  * Expects assets shaped by [[Binary.withPayload]]:
  * (doc_id, text, lang, source, payload).
  */
object MultimodalCorpus {

  def run(assets: DataFrame,
          maxHamming: Int = 6,
          sceneThreshold: Double = 0.5, maxCuts: Long = 2,
          minRms: Double = 24500.0,
          frameLen: Int = 32, hop: Int = 16, everyK: Int = 2): DataFrame = {
    val spark = assets.sparkSession
    // 1. image near-dup canonical keep
    val pairs = ImageDedup.nearDupPairs(spark, assets, maxHamming)
    val canon = graft.dedup.Dedup.clusters(assets, col("doc_id"), pairs)
      .filter(col("keep") === 1).select("doc_id")
    val img = assets.join(canon, Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // 2. scene-stability gate over the batched frame-decode OUTPUT
    val frames = Binary.sampleFrameFeatures(spark, img, everyK = everyK).toDF()
    val stable = SceneCut.cuts(frames, sceneThreshold)
      .groupBy(col("doc_id")).agg(max(col("segment")).as("n_cuts"))
      .filter(col("n_cuts") <= maxCuts)
    val sc = img.join(stable, Seq("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // 3. audio silence gate (assets too short for one frame have no
    // rows and drop at the inner join — nothing measurable = silent)
    val loud = Audio.frameFeatures(spark, sc, frameLen, hop).toDF()
      .groupBy(col("doc_id")).agg(Numeric.davg(col("rms")).as("avg_rms"))
      .filter(col("avg_rms") >= minRms)
    val au = sc.join(loud, Seq("doc_id"))
    // 4. text gate (shared rule — see TextFeatures.qualityKeep)
    au.filter(graft.text.TextFeatures.qualityKeep(col("text")))
      .select(col("doc_id"), col("lang"), col("source"),
        (col("n_cuts") + 1).as("n_scenes"), col("avg_rms"))
  }
}
