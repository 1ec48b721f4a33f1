package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One spot arrival for streaming track assignment: the spot plus ALL
  * its in-edges. Lineage edges always point from an earlier frame to a
  * later one, so a spot's parents are fully known the moment its frame
  * arrives — the natural streaming unit of the reference's
  * frame-by-frame model (TrackMate emits edges with their target spot;
  * parse_xml.py:104-113 materialises exactly this adjacency). */
case class SpotArrival(video_id: Long, frame: Long, id: Long,
                       parents: Array[Long], parent_frames: Array[Long])

/** A spot's track assignment, emitted as soon as its frame is processed. */
case class TrackSpotOut(video_id: Long, id: Long, track_id: Long)

/** An undecided chain tail: the track it would extend and the frame it
  * arrived in (for horizon pruning). */
case class TailInfo(track: Long, frame: Long)

/** Per-video track-assignment state: spots that have arrived but not
  * yet made their continuation decision (first frame in which any of
  * their children appears). Bounded by cells-in-flight per video, not
  * by video length — decided parents leave the map immediately. */
case class TrackVidState(tails: Map[Long, TailInfo])

/** Streaming division-aware track assignment — the incremental form of
  * `operators.TrackAssignment.divisionAware` (reference semantics:
  * parse_xml.py:124-163 — first child continues the parent's track,
  * extra children start fresh tracks, merges are suppressed).
  *
  * The batch operator makes two deterministic local choices per spot
  * (continuing parent = (max frame, min id) in-edge; continuing child =
  * (min frame, min id) out-edge). Both choices become ONE-FRAME-LOOKAHEAD-
  * FREE under frame-ordered arrival: a spot's parents are all in the
  * past when it arrives, and a parent's first child is, by definition,
  * in the first future frame where any of its children appears. So the
  * whole assignment runs as keyed streaming state with no reprocessing:
  * tracks extend forward exactly as the reference's frame-by-frame
  * traversal does.
  *
  * Keying: `video_id`. Tracks never cross videos (the reference runs
  * one timelapse per pipeline invocation), so per-video state is the
  * correct unit — at 100 TB the corpus is millions of videos and the
  * operator parallelises across them, while within a video the state is
  * just the open chain tails (bounded by cells visible in recent
  * frames, independent of video length).
  *
  * Labels: a track is labeled by its HEAD spot id, assigned when the
  * track starts and extended forward — the only labeling an append-mode
  * stream can emit (the batch operator's min-id-per-segment relabel
  * needs the whole segment; the induced PARTITION of spots into tracks
  * is identical, which the parity spec asserts after canonical
  * relabeling). Unlike the batch operator (which mirrors the
  * reference's drop of edge-less spots, parse_xml.py:115-118), every
  * arriving spot gets an assignment — an isolated spot is its own
  * one-spot track.
  *
  * Contract: micro-batches may split a video across batches arbitrarily
  * but must not split a single FRAME of one video across two batches
  * (a frame is the atomic arrival unit of the model; within a batch,
  * frames are processed in ascending order, so multi-frame batches are
  * fine — the whole-video batch run equals the frame-at-a-time run).
  *
  * `horizonFrames` bounds state for gap-closing trackers: a tail whose
  * spot is more than `horizonFrames` behind the newest frame processed
  * in a batch can no longer be continued (TrackMate's gap-closing max
  * frame gap); it is dropped from state. Unbounded by default so the
  * parity spec can compare against the batch operator exactly.
  * `idleTimeoutMs` > 0 expires the state of videos that stop producing
  * frames (processing-time timeout); 0 disables (parity tests).
  */
object TrackStream {

  def divisionAwareStream(spots: Dataset[SpotArrival],
                          horizonFrames: Long = Long.MaxValue,
                          idleTimeoutMs: Long = 3600000L): Dataset[TrackSpotOut] = {
    import spots.sparkSession.implicits._
    val conf = if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
               else GroupStateTimeout.NoTimeout
    spots.groupByKey(_.video_id)
      .flatMapGroupsWithState[TrackVidState, TrackSpotOut](OutputMode.Append, conf) {
        (video: Long, rows: Iterator[SpotArrival], state: GroupState[TrackVidState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
          var tails = state.getOption.map(_.tails).getOrElse(Map.empty[Long, TailInfo])
          val out = Seq.newBuilder[TrackSpotOut]
          // frames strictly ascend within the batch (and across batches,
          // by the arrival contract); each frame is decided atomically
          val byFrame = rows.toArray.groupBy(_.frame).toArray.sortBy(_._1)
          byFrame.foreach { case (frame, arrivals) =>
            // continuing parent per spot: (max frame, min id) in-edge
            val chosen: Map[Long, Long] = arrivals.iterator.flatMap { s =>
              if (s.parents.isEmpty) None
              else {
                val best = s.parents.indices.minBy(i => (-s.parent_frames(i), s.parents(i)))
                Some(s.id -> s.parents(best))
              }
            }.toMap
            // a parent's first child is its min-id child in THIS frame —
            // the first frame in which any of its children appears — over
            // ALL children, continuing or not (parse_xml.py:157-158: a
            // first child claimed by a merge still ends the parent's
            // track; later children never continue it)
            val firstChild: Map[Long, Long] = arrivals.iterator
              .flatMap(s => s.parents.iterator.map(p => (p, s.id)))
              .toArray.groupBy(_._1).map { case (p, cs) => (p, cs.map(_._2).min) }
            val survives: Map[Long, Long] = firstChild.collect {
              case (p, c) if tails.contains(p) && chosen.get(c).contains(p) =>
                (c, tails(p).track)
            }
            // every referenced parent has now made its decision
            tails --= firstChild.keysIterator
            arrivals.foreach { s =>
              val track = survives.getOrElse(s.id, s.id)
              out += TrackSpotOut(video, s.id, track)
              tails += (s.id -> TailInfo(track, s.frame))
            }
            if (horizonFrames != Long.MaxValue)
              tails = tails.filter { case (_, t) => t.frame >= frame - horizonFrames }
          }
          if (tails.nonEmpty) {
            state.update(TrackVidState(tails))
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
          } else state.remove()
          out.result().iterator
          }
      }
  }
}
