package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.{ATail, KalmanAdaptive, KalmanLink, KTail}

/** Per-video Kalman-gated tracker state: open tails keyed by the tail
  * spot id. Bounded by cells in flight (tails idle past `gapFrames`
  * are closed). */
case class KalmanVidState(tails: Map[Long, KTail])

/** Per-video ADAPTIVE (full-covariance) Kalman tracker state. */
case class KalmanAdaptiveVidState(tails: Map[Long, ATail])

/** Constant-velocity (Kalman-style) gated tracking — the prediction
  * end of the reference's tracker menu (track_images.py:95-100,
  * Kalman/AdvancedKalman): each open track predicts its next position
  * from its velocity estimate, and arriving spots link to the tail
  * whose PREDICTION is nearest (within `maxDist`), not to the last
  * observed position. Crossing cells keep their identities where plain
  * NN linking swaps them — the classic case the Kalman tracker exists
  * for.
  *
  * Prediction needs track identity, and identity is inherently
  * sequential per video — so the natural distributed home is the same
  * keyed streaming state machine as [[LinkTrackStream]] (parallel
  * across videos at 100 TB, sequential per video like the reference).
  * The per-frame transition is [[graft.operators.KalmanLink.step]],
  * SHARED with the batch operator ([[KalmanLink.tracks]]) so the two
  * forms agree by construction; simplifications (fixed gain, no
  * covariance) are declared there.
  *
  * Division semantics match the rest of the engine: when two spots
  * claim one tail, the min-id spot continues the track and the others
  * start fresh tracks (velocity reset). Unclaimed arrivals start
  * fresh tracks. Tails idle for more than `gapFrames` frames close.
  * Same arrival contract as the other streaming trackers.
  * `idleTimeoutMs` > 0 expires the state of videos that stop producing
  * frames (processing-time timeout); 0 disables (parity tests).
  */
object KalmanStream {

  def kalmanTracksStream(spots: Dataset[SpotPos], maxDist: Double,
                         gapFrames: Int = 1,
                         idleTimeoutMs: Long = 3600000L): Dataset[TrackSpotOut] = {
    require(maxDist > 0.0 && gapFrames >= 1)
    import spots.sparkSession.implicits._
    val maxD2 = maxDist * maxDist
    val conf = if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
               else GroupStateTimeout.NoTimeout
    spots.groupByKey(_.video_id)
      .flatMapGroupsWithState[KalmanVidState, TrackSpotOut](OutputMode.Append, conf) {
        (video: Long, rows: Iterator[SpotPos], state: GroupState[KalmanVidState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var tails = state.getOption.map(_.tails).getOrElse(Map.empty[Long, KTail])
            val out = Seq.newBuilder[TrackSpotOut]
            val byFrame = rows.toArray.groupBy(_.frame).toArray.sortBy(_._1)
            byFrame.foreach { case (frame, arrivals) =>
              val (nt, assigned) = KalmanLink.step(tails, frame,
                arrivals.map(s => (s.id, s.x, s.y)), maxD2, gapFrames)
              tails = nt
              assigned.foreach { case (id, track) =>
                out += TrackSpotOut(video, id, track)
              }
            }
            if (tails.nonEmpty) {
              state.update(KalmanVidState(tails))
              if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            } else state.remove()
            out.result().iterator
          }
      }
  }

  /** Streaming form of the ADAPTIVE (full-covariance) Kalman tracker —
    * same keying/contract as [[kalmanTracksStream]], per-frame
    * transition shared with [[graft.operators.KalmanAdaptive.tracks]]
    * (KalmanAdaptive.step), where the gain adapts: consistent
    * observations shrink the covariance so a noisy centroid barely
    * moves the prediction (the AdvancedKalman analogue). */
  def adaptiveTracksStream(spots: Dataset[SpotPos], maxDist: Double,
                           gapFrames: Int = 1,
                           processNoise: Double = 0.5,
                           measurementNoise: Double = 1.0,
                           initVelStd: Double = 10.0,
                           idleTimeoutMs: Long = 3600000L): Dataset[TrackSpotOut] = {
    require(maxDist > 0.0 && gapFrames >= 1)
    import spots.sparkSession.implicits._
    val maxD2 = maxDist * maxDist
    val conf = if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
               else GroupStateTimeout.NoTimeout
    spots.groupByKey(_.video_id)
      .flatMapGroupsWithState[KalmanAdaptiveVidState, TrackSpotOut](
        OutputMode.Append, conf) {
        (video: Long, rows: Iterator[SpotPos], state: GroupState[KalmanAdaptiveVidState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var tails = state.getOption.map(_.tails).getOrElse(Map.empty[Long, ATail])
            val out = Seq.newBuilder[TrackSpotOut]
            val byFrame = rows.toArray.groupBy(_.frame).toArray.sortBy(_._1)
            byFrame.foreach { case (frame, arrivals) =>
              val (nt, assigned) = KalmanAdaptive.step(tails, frame,
                arrivals.map(s => (s.id, s.x, s.y)), maxD2, gapFrames,
                processNoise, measurementNoise, initVelStd)
              tails = nt
              assigned.foreach { case (id, track) =>
                out += TrackSpotOut(video, id, track)
              }
            }
            if (tails.nonEmpty) {
              state.update(KalmanAdaptiveVidState(tails))
              if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            } else state.remove()
            out.result().iterator
          }
      }
  }
}
