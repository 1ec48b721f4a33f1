package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One positioned spot arrival for streaming NN linking. */
case class SpotPos(video_id: Long, frame: Long, id: Long, x: Double, y: Double)

/** A linking decision, emitted the moment the child's frame is processed. */
case class LinkOut(video_id: Long, src: Long, dst: Long, gap: Long, dist: Double)

/** One retained candidate parent (a spot from the last `gapFrames`
  * frames of its video). */
case class RecentSpot(frame: Long, id: Long, x: Double, y: Double)

/** Per-video linker state: the spots of the last `gapFrames` frames —
  * bounded by cells visible in the gap window, independent of video
  * length. */
case class LinkVidState(recent: Array[RecentSpot])

/** Streaming spot linking — the incremental form of
  * `operators.SpotLink.nearest` (the tracker itself, running on the
  * reference's frame-by-frame arrival model). Each arriving spot
  * immediately picks its nearest predecessor among the previous
  * `gapFrames` frames within `maxDist`, ordered by (gap, squared
  * distance, source id) — bit-identical selection to the batch
  * operator, so batch output is the parity oracle.
  *
  * Keying: `video_id` — linking never crosses videos (one timelapse
  * per tracking run), so at 100 TB the operator parallelises across
  * millions of videos while per-video state is just the gap window's
  * spots. Within a frame the candidates are the PREVIOUS frames only,
  * so arrival order inside a batch doesn't matter as long as no single
  * (video, frame) is split across micro-batches and frames ascend
  * across batches — the same contract as TrackStream.
  *
  * The emitted edges feed `TrackStream.divisionAwareStream` downstream
  * (its SpotArrival carries a spot's in-edges, which this operator has
  * fully determined by the end of the spot's frame), closing the
  * streaming chain positions -> edges -> tracks.
  *
  * Candidate ranking quantizes d² exactly like the batch operator
  * ([[graft.operators.SpotLink.D2Scale]]) so the parity is
  * bit-identical. `idleTimeoutMs` > 0 expires the state of videos that
  * stop producing frames (a finished timelapse) via processing-time
  * timeout — without it, the final gap window of every completed video
  * would sit in the state store forever; 0 disables (parity tests).
  */
object LinkStream {

  private[streaming] val D2Scale = graft.operators.SpotLink.D2Scale

  def nearestStream(spots: Dataset[SpotPos], maxDist: Double,
                    gapFrames: Int = 1,
                    idleTimeoutMs: Long = 3600000L): Dataset[LinkOut] = {
    require(maxDist > 0.0 && gapFrames >= 1)
    import spots.sparkSession.implicits._
    val maxD2 = maxDist * maxDist
    val conf = if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
               else GroupStateTimeout.NoTimeout
    spots.groupByKey(_.video_id)
      .flatMapGroupsWithState[LinkVidState, LinkOut](OutputMode.Append, conf) {
        (video: Long, rows: Iterator[SpotPos], state: GroupState[LinkVidState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
          var recent = state.getOption.map(_.recent).getOrElse(Array.empty[RecentSpot])
          val out = Seq.newBuilder[LinkOut]
          val byFrame = rows.toArray.groupBy(_.frame).toArray.sortBy(_._1)
          byFrame.foreach { case (frame, arrivals) =>
            val window = recent.filter(r => r.frame >= frame - gapFrames && r.frame < frame)
            arrivals.foreach { s =>
              val cands = window.flatMap { p =>
                val d2 = (s.x - p.x) * (s.x - p.x) + (s.y - p.y) * (s.y - p.y)
                if (d2 <= maxD2)
                  Some((frame - p.frame, math.floor(d2 * D2Scale + 0.5).toLong, p.id))
                else None
              }
              if (cands.nonEmpty) {
                val (g, q, src) = cands.min
                out += LinkOut(video, src, s.id, g,
                  graft.functions.Numeric.croundD(math.sqrt(q / D2Scale), 4))
              }
            }
            recent = (window ++ arrivals.map(s => RecentSpot(s.frame, s.id, s.x, s.y)))
              .filter(r => r.frame > frame - gapFrames)
          }
          if (recent.nonEmpty) {
            state.update(LinkVidState(recent))
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
          } else state.remove()
          out.result().iterator
          }
      }
  }
}
