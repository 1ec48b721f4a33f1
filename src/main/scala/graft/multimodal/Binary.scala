package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Media metadata produced by the (stubbed) decoder. */
case class MediaMeta(doc_id: Long, kind: String, n_bytes: Int,
                     width: Int, height: Int, n_frames: Int, checksum: Long)

/** Per-sampled-frame features from the (stubbed) frame decoder. The
  * texture energies are REAL 2-D Haar band energies (see Texture) over
  * the stub's fabricated pixel block. */
case class FrameFeature(doc_id: Long, frame_idx: Int, mean_px: Double,
                        tex_lh: Double, tex_hl: Double, tex_hh: Double,
                        checksum: Long)

/** Per-sampled-frame cooccurrence + first-order texture features (the
  * GLCM sibling of FrameFeature; math in Texture.glcmFeatures /
  * firstOrderStats is real). */
case class GlcmFrame(doc_id: Long, frame_idx: Int,
                     glcm_contrast: Double, glcm_homog: Double,
                     glcm_energy: Double, glcm_entropy: Double,
                     glcm_corr: Double,
                     px_mean: Double, px_sd: Double, px_skew: Double,
                     px_iqr: Double)

/** Per-asset perceptual hashes (DCT pHash + gradient dHash) from the
  * (stubbed) first-frame decode; the hash math in Texture is real. */
case class AssetHash(doc_id: Long, phash: Long, dhash: Long)

/** Per-sampled-frame focus measure (see Binary.sampleFrameBlur). */
case class BlurFrame(doc_id: Long, frame_idx: Int, lap_var: Double)

/** One asset's corpus-build profile from the fused single decode pass
  * (see Binary.assetProfiles): perceptual hash, scene-cut count at the
  * profile's threshold, and the mean frame RMS (has_audio = false when
  * the asset is too short to frame). */
case class AssetProfile(doc_id: Long, phash: Long, n_cuts: Long,
                        has_audio: Boolean, avg_rms: Double,
                        max_lap: Double, clip_frac: Double)

/** Multimodal column plumbing (reference: per-frame TIFF handling in
  * bin/frame_features_image.py — load_image / normalise / feature
  * extract). Images/audio/video are opaque `binary` columns with typed
  * metadata; the decode step is a deterministic STUB (image/audio
  * libraries are not in this container) but the Spark-side plumbing —
  * schema, batched per-partition decode, partitioning — is real.
  */
object Binary {

  /** Attach a binary payload column (test harness: text bytes stand in
    * for encoded media). The input-parallelism floor lives at the
    * HEAVY kernels downstream (frame GLCM, asset profiles, perceptual
    * hashes — r17), not here: a blanket floor at this seam measurably
    * taxed the cheap decodes (scene-cut, blur, PCM) with an exchange
    * their kernels never amortize. */
  def withPayload(df: DataFrame): DataFrame =
    df.withColumn("payload", col("text").cast("binary"))
      .withColumn("kind", lit("image/fake"))

  /** Batched decode over partitions. Real decoders amortise codec init
    * per batch exactly like this; here the decode itself is a
    * deterministic fake (dimensions derived from byte stats).
    * STUB: replace `fakeDecode` with a real codec when available. */
  def decodeMeta(spark: SparkSession, df: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col("doc_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch "codec init" would happen here
          batch.iterator.map { case (id, kind, bytes) => fakeDecode(id, kind, bytes) }
        }
      }
  }

  /** Every-kth-frame sampling + per-frame feature extraction in ONE
    * batched pass: each asset's payload crosses the wire once and its
    * sampled frames are decoded in-executor — never an
    * explode-then-join that would ship the payload once per frame (at
    * 100 TB of video the payload copy is the whole cost). Frame count
    * and the per-frame "pixels" come from the same deterministic fake
    * decode as `decodeMeta` (STUB — no codecs in this container); the
    * batching/partitioning/output schema are the real pipeline. */
  def sampleFrameFeatures(spark: SparkSession, df: DataFrame, everyK: Int = 2,
                          batchSize: Int = 64,
                          downsampleBy: Int = 1): Dataset[FrameFeature] = {
    import spark.implicits._
    require(everyK >= 1)
    require(downsampleBy >= 1)
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch codec init would happen here
          batch.iterator.flatMap { case (id, bytes) =>
            val nFrames = stubFrameCount(bytes)
            (0 until nFrames by everyK).iterator
              .map(fi => fakeFrameDecode(id, fi, bytes, downsampleBy))
          }
        }
      }
  }

  /** Blur/focus variant of `sampleFrameFeatures`: the same one-pass
    * batched decode (payload crosses once per asset), per-frame
    * measure = variance of the Laplacian ([[Texture.laplacianVar]] —
    * real math over the stub's pixel block): the image-side quality
    * gate (defocused frames score low and a corpus build cuts them,
    * the blur member of every multimodal filter stack). */
  def sampleFrameBlur(spark: SparkSession, df: DataFrame, everyK: Int = 2,
                      batchSize: Int = 64): Dataset[BlurFrame] = {
    import spark.implicits._
    require(everyK >= 1)
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch codec init would happen here
          batch.iterator.flatMap { case (id, bytes) =>
            val nFrames = stubFrameCount(bytes)
            (0 until nFrames by everyK).iterator.map { fi =>
              val (px, _, _) = fabricatePixels(fi, bytes)
              BlurFrame(id, fi, Texture.laplacianVar(px, FrameDim, FrameDim))
            }
          }
        }
      }
  }

  /** Cooccurrence-texture variant of `sampleFrameFeatures`: the same
    * one-pass batched decode (payload crosses once per asset), but the
    * per-frame extraction is the GLCM/Haralick + first-order family
    * (reference: the cooccurrence members of `extract_static_features`,
    * bin/frame_features_image.py:58-66). Pixel source is the shared
    * deterministic stub; the feature math is real. */
  def sampleFrameGlcm(spark: SparkSession, df: DataFrame, everyK: Int = 2,
                      batchSize: Int = 64, levels: Int = 8): Dataset[GlcmFrame] = {
    import spark.implicits._
    require(everyK >= 1)
    // parallelism floor (r17): the per-frame GLCM kernel below is the
    // expensive per-row work — see Ingest.parallelismFloor
    graft.sources.Ingest.parallelismFloor(
        df.select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch codec init would happen here
          batch.iterator.flatMap { case (id, bytes) =>
            val nFrames = stubFrameCount(bytes)
            (0 until nFrames by everyK).iterator.map { fi =>
              val (px, _, _) = fabricatePixels(fi, bytes)
              val (con, hom, en, ent, cor) =
                Texture.glcmFeatures(px, FrameDim, FrameDim, levels)
              val (m, sd, sk, iqr) = Texture.firstOrderStats(px, px.length)
              GlcmFrame(id, fi, con, hom, en, ent, cor, m, sd, sk, iqr)
            }
          }
        }
      }
  }

  /** Per-asset perceptual hashes over the first frame, produced in the
    * same batched one-pass decode as the other frame paths (the payload
    * crosses the wire exactly once per asset; at 100 TB of media the
    * payload copy is the whole cost). The hash math (Texture.phash64 /
    * dhash64 — DCT median hash and gradient hash) is real and
    * codec-free; only the pixel source is the declared stub. */
  def perceptualHashes(spark: SparkSession, df: DataFrame,
                       batchSize: Int = 64): Dataset[AssetHash] = {
    import spark.implicits._
    // parallelism floor (r17): the DCT/gradient hash kernels are the
    // expensive per-row work — see Ingest.parallelismFloor
    graft.sources.Ingest.parallelismFloor(
        df.select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch codec init would happen here
          batch.iterator.map { case (id, bytes) =>
            val (px, _, _) = fabricatePixels(0, bytes)
            AssetHash(id,
              Texture.phash64(px, FrameDim, FrameDim),
              Texture.dhash64(px, FrameDim, FrameDim))
          }
        }
      }
  }

  /** Per-asset corpus-build profile: everything the multimodal gates
    * need, from ONE batched decode pass — perceptual hash (stage-1
    * pair search), scene-cut count at `sceneThreshold` over the
    * sampled frame means, and the mean frame RMS (None = too short to
    * frame). At 100 TB this is the pass that matters: the payload
    * crosses the wire ONCE for the whole build, where the staged
    * formulation decoded survivors once per gate. Built on the same
    * shared kernels as the streaming gate (sampledFrameMeans,
    * Audio.meanRms), so batch, stream and profile cannot drift. */
  def assetProfiles(spark: SparkSession, df: DataFrame,
                    sceneThreshold: Double, everyK: Int,
                    frameLen: Int, hop: Int,
                    batchSize: Int = 64): Dataset[AssetProfile] = {
    import spark.implicits._
    require(everyK >= 1 && frameLen >= 2 && hop >= 1)
    // parallelism floor (r17): the fused per-asset decode+hash kernel
    // is the expensive per-row work — see Ingest.parallelismFloor
    graft.sources.Ingest.parallelismFloor(
        df.select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch codec init would happen here
          batch.iterator.map { case (id, bytes) =>
            // ONE decode per sampled frame feeds the scene means, the
            // blur measure AND the frame-0 phash block
            val (means, maxLap, px0) = sampledFrameStats(bytes, everyK)
            var cuts = 0L
            var i = 1
            while (i < means.length) {
              if (math.abs(means(i) - means(i - 1)) > sceneThreshold) cuts += 1
              i += 1
            }
            val rms = Audio.meanRms(bytes, frameLen, hop)
            AssetProfile(id, Texture.phash64(px0, FrameDim, FrameDim),
              cuts, rms.isDefined, rms.getOrElse(0.0), maxLap,
              Audio.clipFraction(bytes, ClipThreshold).getOrElse(1.0))
          }
        }
      }
  }

  /** The stub decoder's frame count — ONE derivation shared by every
    * frame-iterating path (the six hand-copied formulas this replaces
    * would each need the same edit when a real codec lands, and a
    * missed one would silently desynchronize the gates' frame sets). */
  private[graft] def stubFrameCount(bytes: Array[Byte]): Int =
    1 + math.floorMod(bytes.length, 8)

  /** Per-sampled-frame mean pixel values of ONE asset — the scalar the
    * scene-cut detector consumes — via the same stub decode as
    * `sampleFrameFeatures`, shared with the streaming per-asset gate
    * (MultimodalCorpusStream) so the two surfaces cannot drift. */
  private[graft] def sampledFrameMeans(bytes: Array[Byte], everyK: Int): Array[Double] =
    (0 until stubFrameCount(bytes) by everyK)
      .map(fi => fabricatePixels(fi, bytes)._3).toArray

  /** Fused per-sampled-frame stats: ONE decode per frame yields the
    * scene-cut mean, the blur measure, and frame 0's pixel block for
    * the perceptual hash — the shape the profile pass and the
    * streaming gate both consume, so the "one fused decode pass"
    * contract is literal: no frame is decoded twice (with a real
    * codec, decode IS the cost). Returns (means in sample order,
    * max Laplacian variance, frame-0 pixels). */
  private[graft] def sampledFrameStats(bytes: Array[Byte], everyK: Int)
      : (Array[Double], Double, Array[Double]) = {
    val frames = 0 until stubFrameCount(bytes) by everyK
    val means = new Array[Double](frames.length)
    var maxLap = 0.0
    var px0: Array[Double] = null
    var j = 0
    frames.foreach { fi =>
      val (px, _, mean) = fabricatePixels(fi, bytes)
      means(j) = mean
      val v = Texture.laplacianVar(px, FrameDim, FrameDim)
      if (v > maxLap) maxLap = v
      if (fi == 0) px0 = px
      j += 1
    }
    // everyK >= 1 always samples frame 0, but guard the contract
    if (px0 == null) px0 = fabricatePixels(0, bytes)._1
    (means, maxLap, px0)
  }

  private val FrameDim = 8

  /** Clip gate threshold the corpus-build profile uses (91.6% of s16
    * full scale — see Audio.clipStats for why the text-byte stand-in
    * payloads need a sub-98% setting to be non-trivial). */
  private[graft] val ClipThreshold = 30000

  /** Sharpest sampled frame's Laplacian variance — the blur gate's
    * per-asset scalar (if even the sharpest frame is below the focus
    * floor, the asset is unusable). Thin view over the fused
    * [[sampledFrameStats]] pass. */
  private[graft] def maxSampledLapVar(bytes: Array[Byte], everyK: Int): Double =
    sampledFrameStats(bytes, everyK)._2

  /** STUB pixel fabrication shared by both frame-feature paths: an 8x8
    * block derived deterministically from the payload bytes and the
    * frame index stands in for the decoded frame; the texture math
    * downstream is real. Returns (pixels, checksum, mean byte value). */
  private def fabricatePixels(frameIdx: Int, bytes: Array[Byte]): (Array[Double], Long, Double) = {
    var cs = 1469598103934665603L ^ frameIdx.toLong
    var sum = 0L
    var i = 0
    val px = new Array[Double](FrameDim * FrameDim)
    while (i < bytes.length) {
      val p = (bytes(i) & 0xff) ^ (frameIdx & 0xff)
      cs = (cs ^ p) * 1099511628211L
      sum += p
      px(i % px.length) += p
      i += 1
    }
    val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
    (px, cs, mean)
  }

  private def fakeFrameDecode(id: Long, frameIdx: Int, bytes: Array[Byte],
                              downsampleBy: Int): FrameFeature = {
    val (px, cs, mean) = fabricatePixels(frameIdx, bytes)
    // resize between decode and feature extraction (real math; only
    // the pixel source above is the declared stub)
    val (rpx, rw, rh) = Texture.boxDownsample(px, FrameDim, FrameDim, downsampleBy)
    val (lh, hl, hh) = Texture.haar2dEnergies(rpx, rw, rh)
    FrameFeature(id, frameIdx, mean, lh, hl, hh, cs)
  }

  private def fakeDecode(id: Long, kind: String, bytes: Array[Byte]): MediaMeta = {
    var cs = 1469598103934665603L // FNV-1a
    var i = 0
    while (i < bytes.length) { cs = (cs ^ (bytes(i) & 0xff)) * 1099511628211L; i += 1 }
    val w = 16 + math.floorMod(cs, 512).toInt
    val h = 16 + math.floorMod(cs >> 16, 512).toInt
    MediaMeta(id, kind, bytes.length, w, h, stubFrameCount(bytes), cs)
  }
}
