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
  * counter) pair, so memory is bounded by live assets, not stream
  * length. Frames are processed in frame_idx order within each
  * micro-batch (the same in-batch sort the movement stream uses);
  * monotone arrival across batches is the declared contract — the
  * decode source emits an asset's frames in order. */
object SceneCutStream {

  def cuts(frames: Dataset[FrameIn], threshold: Double): Dataset[CutOut] = {
    require(threshold > 0.0)
    import frames.sparkSession.implicits._
    frames.groupByKey(_.doc_id)
      .flatMapGroupsWithState[CutState, CutOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (doc: Long, rows: Iterator[FrameIn], state: GroupState[CutState]) =>
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
          out.iterator
      }
  }
}
