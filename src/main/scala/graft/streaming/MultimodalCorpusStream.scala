package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col

import graft.multimodal.{Audio, Binary}

/** One payload-carrying asset on the wire. */
case class AssetIn(doc_id: Long, text: String, lang: String,
                   source: String, payload: Array[Byte])

/** A surviving asset with its media attributes (the batch build's
  * output row shape). */
case class AssetKept(doc_id: Long, lang: String, source: String,
                     n_scenes: Long, avg_rms: Double,
                     max_lap: Double, clip_frac: Double)

/** Streaming form of [[graft.multimodal.MultimodalCorpus]] — the
  * multimodal sibling of CorpusStream: the PER-ASSET stages (scene
  * stability, audio silence, text quality) run on an unbounded asset
  * stream; the corpus-GLOBAL stage (image near-dup canonical keep)
  * is declared batch-only, exactly as CorpusStream declares near-dup
  * clustering and line dedup — transitive corpus state an append
  * stream cannot hold.
  *
  * Every gate here is a pure per-row predicate (an asset arrives
  * WHOLE, so its frames and audio windows derive in-executor from the
  * one payload — no shuffle, no state store, nothing to watermark):
  * the gates commute, so the stream applies the cheap codegen text
  * predicate first and the decode-bearing media gates after, and the
  * surviving SET equals the batch stage order exactly. Per-frame math
  * is shared code with the batch operators (Binary.sampledFrameMeans,
  * Audio.pcmFrameStats) and the RMS average replicates
  * Numeric.davg's decimal-sum contract, so stream and batch agree on
  * every attribute bit-for-bit. */
object MultimodalCorpusStream {

  def filtered(assets: Dataset[AssetIn],
               sceneThreshold: Double = 0.5, maxCuts: Long = 2,
               minRms: Double = 24500.0,
               minSharp: Double = 0.0, maxClip: Double = 1.0,
               frameLen: Int = 32, hop: Int = 16,
               everyK: Int = 2): Dataset[AssetKept] = {
    require(sceneThreshold > 0.0)
    import assets.sparkSession.implicits._
    assets
      .filter(graft.text.TextFeatures.qualityKeep(col("text")))
      .as[AssetIn]
      .mapPartitions { it =>
        it.flatMap { a =>
          // scene-stability gate: cut count over the sampled frame means
          val means = Binary.sampledFrameMeans(a.payload, everyK)
          var cuts = 0L
          var i = 1
          while (i < means.length) {
            if (math.abs(means(i) - means(i - 1)) > sceneThreshold) cuts += 1
            i += 1
          }
          if (cuts > maxCuts) None
          else {
            // blur gate (shared kernel with the batch profile pass) +
            // clipping gate, then the audio silence gate: mean frame
            // RMS via the shared decimal-sum kernel (Audio.meanRms —
            // the Numeric.davg contract); frameless assets are
            // unmeasurable -> silent, sample-less assets -> clipped
            val lap = Binary.maxSampledLapVar(a.payload, everyK)
            val clip = Audio.clipFraction(a.payload, Binary.ClipThreshold)
              .getOrElse(1.0)
            if (lap < minSharp || clip > maxClip) None
            else Audio.meanRms(a.payload, frameLen, hop) match {
              case Some(avg) if avg >= minRms =>
                Some(AssetKept(a.doc_id, a.lang, a.source, cuts + 1, avg,
                  lap, clip))
              case _ => None
            }
          }
        }
      }
  }
}
