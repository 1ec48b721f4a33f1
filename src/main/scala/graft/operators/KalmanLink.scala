package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** An open track tail with its motion estimate: last observed position
  * plus per-frame velocity (constant-velocity model). */
case class KTail(track: Long, frame: Long, x: Double, y: Double,
                 vx: Double, vy: Double)

/** Constant-velocity (Kalman-style) gated linking — the BATCH form of
  * the prediction tracker (reference: bin/track_images.py:95-100, the
  * Kalman/AdvancedKalman factories): each open track predicts its next
  * position from its velocity estimate and arriving spots link to the
  * nearest PREDICTION within `maxDist`. Crossing cells keep their
  * identities where last-position NN linking swaps them.
  *
  * Tracking state is inherently sequential per video, so the batch
  * operator cogroups by video (ONE shuffle) and replays frames in
  * order — at 100 TB parallelism comes from millions of independent
  * videos while per-video work is bounded by one timelapse, the same
  * shape as [[TrackAssignment.divisionAwareByVideo]]. The per-frame
  * transition ([[KalmanLink.step]]) is SHARED with the streaming form
  * ([[graft.streaming.KalmanStream]]), so batch/stream parity holds by
  * construction and is additionally spec-pinned.
  *
  * Simplifications vs a full Kalman filter, stated honestly: fixed
  * gain (velocity = last displacement / frame gap, no covariance
  * tracking) — the constant-velocity prediction core, which is the
  * part that changes linking decisions.
  */
object KalmanLink {

  /** One frame of the tracker: expire idle tails, link arrivals to the
    * nearest prediction (min (d², tail id)), continue claimed tracks
    * via the min-id claimant (extras and unclaimed spots start fresh
    * tracks, velocity reset). Returns the new tails and the
    * (spot, track) assignments of this frame. Shared verbatim by the
    * batch and streaming operators. */
  private[graft] def step(tails0: Map[Long, KTail], frame: Long,
                          arrivals: Array[(Long, Double, Double)],
                          maxD2: Double, gapFrames: Int)
      : (Map[Long, KTail], Seq[(Long, Long)]) = {
    var tails = tails0.filter { case (_, t) => t.frame >= frame - gapFrames }
    val out = Seq.newBuilder[(Long, Long)]
    // each spot picks the tail whose prediction is nearest
    val picks: Map[Long, Long] = arrivals.iterator.flatMap { case (id, x, y) =>
      val cands = tails.toArray.flatMap { case (tid, t) =>
        val dt = (frame - t.frame).toDouble
        val px = t.x + t.vx * dt
        val py = t.y + t.vy * dt
        val d2 = (x - px) * (x - px) + (y - py) * (y - py)
        if (d2 <= maxD2) Some((d2, tid)) else None
      }
      if (cands.isEmpty) None else Some(id -> cands.min._2)
    }.toMap
    // min-id spot continues a claimed tail; extras start fresh
    val winners: Map[Long, Long] = picks.toArray.groupBy(_._2)
      .map { case (tid, ss) => (ss.map(_._1).min, tid) }
    arrivals.foreach { case (id, x, y) =>
      winners.get(id).map(tails) match {
        case Some(t) =>
          val dt = (frame - t.frame).toDouble
          out += ((id, t.track))
          tails -= winners(id)
          tails += (id -> KTail(t.track, frame, x, y,
            (x - t.x) / dt, (y - t.y) / dt))
        case None =>
          out += ((id, id))
          tails += (id -> KTail(id, frame, x, y, 0.0, 0.0))
      }
    }
    (tails, out.result())
  }

  /** Batch Kalman-gated tracking over spots (id, frame, x, y): one
    * cogroup-per-video shuffle, sequential frame replay per video.
    * Output: (id, track_id) for EVERY spot (an unlinked spot is its
    * own track — same emission rule as the streaming form). */
  def tracks(spots: DataFrame, id: Column, frame: Column, x: Column, y: Column,
             maxDist: Double, gapFrames: Int, videoOf: Long => Long): DataFrame = {
    require(maxDist > 0.0 && gapFrames >= 1)
    val spark = spots.sparkSession
    import spark.implicits._
    val maxD2 = maxDist * maxDist
    spots.select(id.cast("long").as("id"), frame.cast("long").as("frame"),
        x.cast("double").as("x"), y.cast("double").as("y"))
      .as[(Long, Long, Double, Double)]
      .groupByKey(s => videoOf(s._1))
      .flatMapGroups { (_, it) =>
        val byFrame = it.toArray.groupBy(_._2).toArray.sortBy(_._1)
        var tails = Map.empty[Long, KTail]
        val out = Seq.newBuilder[(Long, Long)]
        byFrame.foreach { case (f, rows) =>
          val arrivals = rows.map(r => (r._1, r._3, r._4))
          val (nt, assigned) = step(tails, f, arrivals, maxD2, gapFrames)
          tails = nt
          out ++= assigned
        }
        out.result().iterator
      }
      .toDF("id", "track_id")
  }
}
