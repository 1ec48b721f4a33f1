package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Combined per-video state for the one-stage streaming tracker:
  * the gap window's spots (linking candidates) and the open chain
  * tails (track continuation). Both bounded by cells in flight. */
case class LinkTrackState(recent: Array[RecentSpot], tails: Map[Long, TailInfo])

/** The WHOLE tracker as one streaming stage: positions in, track
  * assignments out. Fuses [[LinkStream]] (NN linking against the gap
  * window) and [[TrackStream]] (division-aware continuation decisions)
  * into a single `flatMapGroupsWithState` keyed by video — Spark
  * restricts chaining several stateful operators in one append query,
  * and the two state machines share the frame cadence anyway, so one
  * combined state is both legal and cheaper (one shuffle, one state
  * store).
  *
  * Semantics = batch `SpotLink.nearest` edges fed to
  * `TrackAssignment.divisionAware`, restricted to NN linking's
  * structure: each child has at most one parent (merge suppression is
  * vacuous) and a parent's track continues via its first-arriving
  * (then min-id) child; every spot gets an assignment (isolated spots
  * are their own track — same emission rule as TrackStream). The
  * parity spec compares induced partitions against the batch
  * composition.
  *
  * Same arrival contract as the other streaming trackers: frames of a
  * video ascend across micro-batches and no single (video, frame) is
  * split across batches. Candidate ranking quantizes d² exactly like
  * the batch operator ([[graft.operators.SpotLink.D2Scale]]).
  *
  * State is bounded by the gap window on BOTH components: a tail older
  * than `gapFrames` can never be continued (a surviving link's parent
  * is always inside the gap window), so tails prune with the same
  * window as the linking candidates — per-video state is cells in
  * flight, independent of video length. `idleTimeoutMs` > 0 expires
  * whole videos that stop producing frames (processing-time timeout);
  * 0 disables (parity tests).
  */
object LinkTrackStream {

  def nearestTracksStream(spots: Dataset[SpotPos], maxDist: Double,
                          gapFrames: Int = 1,
                          idleTimeoutMs: Long = 3600000L): Dataset[TrackSpotOut] = {
    require(maxDist > 0.0 && gapFrames >= 1)
    import spots.sparkSession.implicits._
    val maxD2 = maxDist * maxDist
    val conf = if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
               else GroupStateTimeout.NoTimeout
    spots.groupByKey(_.video_id)
      .flatMapGroupsWithState[LinkTrackState, TrackSpotOut](OutputMode.Append, conf) {
        (video: Long, rows: Iterator[SpotPos], state: GroupState[LinkTrackState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
          var recent = state.getOption.map(_.recent).getOrElse(Array.empty[RecentSpot])
          var tails = state.getOption.map(_.tails).getOrElse(Map.empty[Long, TailInfo])
          val out = Seq.newBuilder[TrackSpotOut]
          val byFrame = rows.toArray.groupBy(_.frame).toArray.sortBy(_._1)
          byFrame.foreach { case (frame, arrivals) =>
            val window = recent.filter(r => r.frame >= frame - gapFrames && r.frame < frame)
            // 1. link: best parent per arriving spot (gap, quantized d2, src)
            val linked: Map[Long, Long] = arrivals.iterator.flatMap { s =>
              val cands = window.flatMap { p =>
                val d2 = (s.x - p.x) * (s.x - p.x) + (s.y - p.y) * (s.y - p.y)
                if (d2 <= maxD2)
                  Some((frame - p.frame,
                    math.floor(d2 * LinkStream.D2Scale + 0.5).toLong, p.id))
                else None
              }
              if (cands.isEmpty) None else Some(s.id -> cands.min._3)
            }.toMap
            // 2. continuation: a parent's track goes to its min-id child
            //    in THIS frame — the first frame any child appeared
            //    (parents whose first child came earlier already left
            //    `tails`, so their later children start fresh tracks)
            val firstChild: Map[Long, Long] = linked.toArray.groupBy(_._2)
              .map { case (p, cs) => (p, cs.map(_._1).min) }
            val survives: Map[Long, Long] = firstChild.collect {
              case (p, c) if tails.contains(p) => (c, tails(p).track)
            }
            tails --= firstChild.keysIterator
            arrivals.foreach { s =>
              val track = survives.getOrElse(s.id, s.id)
              out += TrackSpotOut(video, s.id, track)
              tails += (s.id -> TailInfo(track, s.frame))
            }
            recent = (window ++ arrivals.map(s => RecentSpot(s.frame, s.id, s.x, s.y)))
              .filter(r => r.frame > frame - gapFrames)
            // a tail outside the gap window can never be continued
            // (its spot is no longer a linking candidate), so pruning
            // here is output-identical and keeps state bounded
            tails = tails.filter { case (_, t) => t.frame > frame - gapFrames }
          }
          if (recent.nonEmpty || tails.nonEmpty) {
            state.update(LinkTrackState(recent, tails))
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
          } else state.remove()
          out.result().iterator
          }
      }
  }
}
