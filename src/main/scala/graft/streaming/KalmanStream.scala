package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An open track tail with its motion estimate: last observed position
  * plus per-frame velocity (constant-velocity model). */
case class KTail(track: Long, frame: Long, x: Double, y: Double,
                 vx: Double, vy: Double)

/** Per-video Kalman-gated tracker state: open tails keyed by the tail
  * spot id. Bounded by cells in flight (tails idle past `gapFrames`
  * are closed). */
case class KalmanVidState(tails: Map[Long, KTail])

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
  * Simplifications vs a full Kalman filter, stated honestly: the gain
  * is fixed (velocity = last displacement / frame gap, no covariance
  * tracking) — the constant-velocity NearestNeighbor-with-prediction
  * core, which is the part that changes linking decisions.
  *
  * Division semantics match the rest of the engine: when two spots
  * claim one tail, the min-id spot continues the track and the others
  * start fresh tracks (velocity reset). Unclaimed arrivals start
  * fresh tracks. Tails idle for more than `gapFrames` frames close.
  * Same arrival contract as the other streaming trackers.
  */
object KalmanStream {

  def kalmanTracksStream(spots: Dataset[SpotPos], maxDist: Double,
                         gapFrames: Int = 1): Dataset[TrackSpotOut] = {
    require(maxDist > 0.0 && gapFrames >= 1)
    import spots.sparkSession.implicits._
    val maxD2 = maxDist * maxDist
    spots.groupByKey(_.video_id)
      .flatMapGroupsWithState[KalmanVidState, TrackSpotOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (video: Long, rows: Iterator[SpotPos], state: GroupState[KalmanVidState]) =>
          var tails = state.getOption.map(_.tails).getOrElse(Map.empty[Long, KTail])
          val out = Seq.newBuilder[TrackSpotOut]
          val byFrame = rows.toArray.groupBy(_.frame).toArray.sortBy(_._1)
          byFrame.foreach { case (frame, arrivals) =>
            tails = tails.filter { case (_, t) => t.frame >= frame - gapFrames }
            // each spot picks the tail whose prediction is nearest
            val picks: Map[Long, Long] = arrivals.iterator.flatMap { s =>
              val cands = tails.toArray.flatMap { case (tid, t) =>
                val dt = (frame - t.frame).toDouble
                val px = t.x + t.vx * dt
                val py = t.y + t.vy * dt
                val d2 = (s.x - px) * (s.x - px) + (s.y - py) * (s.y - py)
                if (d2 <= maxD2) Some((d2, tid)) else None
              }
              if (cands.isEmpty) None else Some(s.id -> cands.min._2)
            }.toMap
            // min-id spot continues a claimed tail; extras start fresh
            val winners: Map[Long, Long] = picks.toArray.groupBy(_._2)
              .map { case (tid, ss) => (ss.map(_._1).min, tid) }
            arrivals.foreach { s =>
              winners.get(s.id).map(tails) match {
                case Some(t) =>
                  val dt = (frame - t.frame).toDouble
                  out += TrackSpotOut(video, s.id, t.track)
                  tails -= winners(s.id)
                  tails += (s.id -> KTail(t.track, frame, s.x, s.y,
                    (s.x - t.x) / dt, (s.y - t.y) / dt))
                case None =>
                  out += TrackSpotOut(video, s.id, s.id)
                  tails += (s.id -> KTail(s.id, frame, s.x, s.y, 0.0, 0.0))
              }
            }
          }
          if (tails.nonEmpty) state.update(KalmanVidState(tails)) else state.remove()
          out.result().iterator
      }
  }
}
