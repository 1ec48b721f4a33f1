package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One sampled frame on the wire (the decode pass's output row). */
case class FrameIn(doc_id: Long, frame_idx: Int, mean_px: Double)

/** Scene-cut decision for one frame. `delta` is None on the asset's
  * first frame ever seen (matching the batch operator's NULL lag). */
case class CutOut(doc_id: Long, frame_idx: Int, delta: Option[Double],
                  is_cut: Boolean, segment: Long)

/** Last-seen frame per asset carried across micro-batches. */
case class CutState(lastIdx: Int, lastMean: Double, segments: Long)

/** Streaming scene-cut detection — [[graft.multimodal.SceneCut]] on an
  * unbounded frame stream: state per asset is ONE (last frame, scene
  * counter) pair, so memory is bounded by LIVE assets, not stream
  * length — `idleTimeoutMs` > 0 expires the state of assets that stop
  * producing frames (a finished video's entry would otherwise live for
  * the stream's lifetime; 0 disables expiry for drain-style parity
  * tests, the same contract as the stateful trackers). Frames are
  * processed in frame_idx order within each micro-batch (the same
  * in-batch sort the movement stream uses); monotone arrival across
  * batches is the decode source's contract, ENFORCED — an out-of-order
  * frame fails fast instead of silently mis-segmenting. */
object SceneCutStream {

  def cuts(frames: Dataset[FrameIn], threshold: Double,
           idleTimeoutMs: Long = 3600000L): Dataset[CutOut] = {
    require(threshold > 0.0)
    import frames.sparkSession.implicits._
    val conf = if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
               else GroupStateTimeout.NoTimeout
    frames.groupByKey(_.doc_id)
      .flatMapGroupsWithState[CutState, CutOut](OutputMode.Append, conf) {
        (doc: Long, rows: Iterator[FrameIn], state: GroupState[CutState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
          val sorted = rows.toArray.sortBy(_.frame_idx)
          var cur = state.getOption
          val out = sorted.map { f =>
            val (delta, isCut) = cur match {
              case None => (None: Option[Double], false)
              case Some(s) =>
                if (f.frame_idx <= s.lastIdx)
                  throw new IllegalStateException(
                    s"out-of-order frame for asset $doc: frame_idx " +
                      s"${f.frame_idx} after ${s.lastIdx} — the decode " +
                      "source's monotone-arrival contract is violated")
                val d = f.mean_px - s.lastMean
                (Some(d), math.abs(d) > threshold)
            }
            val segments = cur.map(_.segments).getOrElse(0L) + (if (isCut) 1L else 0L)
            cur = Some(CutState(f.frame_idx, f.mean_px, segments))
            CutOut(doc, f.frame_idx, delta, isCut, segments)
          }
          cur.foreach(state.update)
          if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
          out.iterator
          }
      }
  }
}
