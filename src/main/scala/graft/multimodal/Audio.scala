package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

import graft.functions.Numeric

/** Per-frame features of one audio asset: short-time RMS energy,
  * zero-crossing rate, and peak amplitude — the standard cheap
  * time-domain descriptors (silence/music/speech gating, clipping
  * detection) a corpus build runs before anything model-based. */
case class AudioFrame(doc_id: Long, frame_idx: Int, n_samples: Int,
                      rms: Double, zcr: Double, peak: Int)

/** Per-asset clipping summary (see Audio.clipStats). */
case class ClipStats(doc_id: Long, n_samples: Long, n_clipped: Long,
                     clip_frac: Double)

/** Audio-side multimodal plumbing. Unlike the image path (whose codecs
  * are not in this container and whose decode is therefore a declared
  * stub), raw PCM needs no codec: the byte-to-sample conversion here
  * IS the real decode for s16le data (a WAV `data` chunk, the wire
  * format every audio toolchain bottoms out in), and the framing +
  * feature math is the real computation. The test harness feeds text
  * bytes as stand-in payloads; the operator treats any byte stream as
  * PCM, which is exactly what it would do in production.
  *
  * Scale shape mirrors [[Binary]]: one batched `mapPartitions` pass —
  * each payload crosses the wire once and fans out to its frames
  * in-executor (never explode-then-join, which would ship the payload
  * once per frame); per-batch init amortizes the way a real
  * resampler/codec setup would. Per-frame sums run in fixed sample
  * order, so results are partitioning-invariant (spec-pinned).
  */
object Audio {

  /** Frame the payload as s16le PCM (`frameLen` samples every `hop`)
    * and emit per-frame (rms, zcr, peak). A trailing odd byte is
    * ignored; assets shorter than one frame emit nothing. rms rounds
    * via the shared contract at 4 decimals, zcr at 6. */
  def frameFeatures(spark: SparkSession, df: DataFrame,
                    frameLen: Int = 256, hop: Int = 128,
                    batchSize: Int = 64): Dataset[AudioFrame] = {
    import spark.implicits._
    require(frameLen >= 2 && hop >= 1)
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch decoder/resampler init would happen here
          batch.iterator.flatMap { case (id, bytes) =>
            (0 until frameCount(bytes, frameLen, hop)).iterator.map { fi =>
              val (rms, zcr, peak) = pcmFrameStats(bytes, fi, frameLen, hop)
              AudioFrame(id, fi, frameLen, rms, zcr, peak)
            }
          }
        }
      }
  }

  /** Per-asset clipping stats over ALL samples (unframed): sample
    * count, count at-or-above `threshold` in magnitude, and the
    * clipped fraction — the audio-side junk gate (a recording that
    * spends a visible fraction of its samples at full scale is
    * distorted; corpus builds cut on clip_frac). Default threshold
    * 32256 = 98.4% of s16 full scale. Same batched one-pass shape as
    * [[frameFeatures]]; integer counts, so the DuckDB oracle replays
    * the identical s16le decode exactly. */
  def clipStats(spark: SparkSession, df: DataFrame,
                threshold: Int = 32256, batchSize: Int = 64): Dataset[ClipStats] = {
    import spark.implicits._
    require(threshold > 0)
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            val (n, clipped) = clipCounts(bytes, threshold)
            if (n == 0) Iterator.empty
            else Iterator.single(ClipStats(id, n.toLong, clipped,
              Numeric.croundD(clipped.toDouble / n, 6)))
          }
        }
      }
  }

  /** Core clip counter: (sample count, samples at/above `threshold` in
    * magnitude). Shared by [[clipStats]] and the corpus-build gates
    * (batch + streaming) so the surfaces cannot drift. */
  private[graft] def clipCounts(bytes: Array[Byte], threshold: Int): (Int, Long) = {
    val n = bytes.length / 2
    var clipped = 0L
    var i = 0
    while (i < n) {
      val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
      val a = if (s < 0) -s else s
      if (a >= threshold) clipped += 1
      i += 1
    }
    (n, clipped)
  }

  /** Clipped fraction under the shared rounding contract — None when
    * the asset has no full sample (unmeasurable). */
  private[graft] def clipFraction(bytes: Array[Byte], threshold: Int): Option[Double] = {
    val (n, clipped) = clipCounts(bytes, threshold)
    if (n == 0) None else Some(Numeric.croundD(clipped.toDouble / n, 6))
  }

  /** Number of hop-overlapped frames the payload yields (trailing odd
    * byte ignored; sub-frame assets yield none). */
  private[graft] def frameCount(bytes: Array[Byte], frameLen: Int, hop: Int): Int = {
    val n = bytes.length / 2
    if (n < frameLen) 0 else (n - frameLen) / hop + 1
  }

  /** Mean frame RMS of one asset under Numeric.davg's decimal-sum
    * contract (exact decimal(_,4) sum of the 1e-4-rounded frame
    * values, double division, cround 4) — None when the asset is too
    * short to frame. Shared by the batch profile pass
    * (Binary.assetProfiles) and the streaming per-asset gate so the
    * surfaces cannot drift. */
  private[graft] def meanRms(bytes: Array[Byte], frameLen: Int,
                             hop: Int): Option[Double] = {
    val nF = frameCount(bytes, frameLen, hop)
    if (nF == 0) None
    else {
      var acc = java.math.BigDecimal.ZERO
      var fi = 0
      while (fi < nF) {
        acc = acc.add(new java.math.BigDecimal(
            java.lang.Double.toString(pcmFrameStats(bytes, fi, frameLen, hop)._1))
          .setScale(4, java.math.RoundingMode.HALF_UP))
        fi += 1
      }
      Some(Numeric.croundD(acc.doubleValue() / nF, 4))
    }
  }

  /** The per-frame kernel — (rms rounded at 4, zcr at 6, peak) of frame
    * `fi` — shared by the batch decode pass above and the streaming
    * per-asset gate (MultimodalCorpusStream), so the two surfaces
    * cannot drift on sample decode or rounding. */
  private[graft] def pcmFrameStats(bytes: Array[Byte], fi: Int,
                                   frameLen: Int, hop: Int): (Double, Double, Int) = {
    var sumSq = 0.0
    var zc = 0
    var peak = 0
    var prev = 0
    var i = 0
    while (i < frameLen) {
      val off = 2 * (fi * hop + i)
      val s = ((bytes(off) & 0xff) | (bytes(off + 1) << 8)).toShort.toInt
      sumSq += s.toDouble * s.toDouble
      val a = if (s < 0) -s else s
      if (a > peak) peak = a
      if (i > 0 && prev * s < 0) zc += 1
      prev = s
      i += 1
    }
    (Numeric.croundD(math.sqrt(sumSq / frameLen), 4),
      Numeric.croundD(zc.toDouble / (frameLen - 1), 6),
      peak)
  }

  /** Energy-contour audio fingerprinting — the audio-side near-dup
    * detector (the pHash analog of 23b): the fingerprint packs the
    * SIGNS of successive frame-energy deltas (bit i = rms rose from
    * frame i to i+1) over the first `bits`+1 frames, MSB-first — the
    * loudness contour, which survives gain changes badly but
    * re-encodes and container changes well, the classic
    * Shazam-family shape reduced to its time-domain core. Equal
    * contours (same n_bits, same fp) group as duplicates with the
    * engine's canonical min-id contract.
    *
    * Scale shape: the frame filter bounds the per-asset collect at
    * `bits`+1 rows BEFORE the one doc-grain aggregate (never an
    * unbounded collect), packing is an in-row fold, and the dup
    * grouping is a window over the (n_bits, fp) grain — 8-byte keys
    * end to end. The delta compares the ALREADY-ROUNDED rms, so
    * engines agree at every bit. Assets shorter than two frames
    * fingerprint as (n_bits 0, fp 0) — defined; assets with no
    * frames emit nothing (the frameFeatures contract).
    *
    * Evidence floor: an asset with a SHORT contour carries too few
    * delta bits to support a duplicate claim — at n_bits=0 every
    * sub-2-frame asset shares (0, 0), and at n_bits=1 unrelated
    * assets collide half the time. Assets with n_bits < `minBits`
    * (default bits/2, min 1) therefore emit dup_of = doc_id and
    * is_dup = 0: no claim, rather than a claim with no evidence.
    * Their (n_bits, fp) columns still ride out for callers that
    * want to group short assets under their own policy. */
  def rmsFingerprint(frames: DataFrame, bits: Int = 12,
      minBits: Int = -1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 62, "bits must be in [1, 62]")
    val mb = if (minBits >= 0) minBits else math.max(1, bits / 2)
    val packed = frames.filter(col("frame_idx") <= bits)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("frame_idx"), col("rms"))))
        .as("_fr"))
      .select(col("doc_id"),
        (size(col("_fr")) - 1).cast("int").as("n_bits"),
        when(size(col("_fr")) < 2, lit(0L))
          .otherwise(aggregate(sequence(lit(1), size(col("_fr")) - 1),
            lit(0L), (acc, i) => acc * 2 +
              when(element_at(col("_fr"), i + 1)("rms") >
                element_at(col("_fr"), i)("rms"), lit(1L))
                .otherwise(lit(0L))))
          .as("fp"))
    val w = Window.partitionBy(col("n_bits"), col("fp"))
    packed
      .withColumn("dup_of",
        when(col("n_bits") >= mb, min(col("doc_id")).over(w))
          .otherwise(col("doc_id")))
      .withColumn("is_dup", (col("doc_id") =!= col("dup_of")).cast("int"))
  }

  /** Energy-threshold voice-activity segmentation — silence removal,
    * the canonical audio curation step: frames at or above `rmsGate`
    * are active, and runs of CONSECUTIVE active frame indexes merge
    * into segments (the gaps-and-islands shape shared with
    * [[graft.text.SpanDedup]]'s island pass). Operates on
    * [[frameFeatures]]' output — the gate compares the frame's
    * ALREADY-ROUNDED rms, so engines cannot disagree at the boundary.
    * Output per segment: (doc_id, seg, start_frame, end_frame,
    * n_frames, mean_rms), seg numbering active islands 1..m in frame
    * order. Scale shape: one doc-grain window pass over the active
    * sliver + one segment-grain aggregate — frames per asset are
    * bounded by asset length, so the window never sees unbounded
    * groups; mean_rms rides decimal(28,8). */
  def vadSegments(frames: DataFrame, rmsGate: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames.filter(col("rms") >= rmsGate)
      .withColumn("_prev", lag(col("frame_idx"), 1).over(w))
      .withColumn("_new",
        (col("_prev").isNull || col("frame_idx") =!= col("_prev") + 1)
          .cast("int"))
      .withColumn("seg", sum(col("_new")).over(w))
      .groupBy(col("doc_id"), col("seg"))
      .agg(min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_frames"),
        Numeric.davg(col("rms"), 8, 4).as("mean_rms"))
  }
}
