package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One spot of a streaming timelapse feed: video, track, frame,
  * position — the LinkTrackStream output shape, one row per tracked
  * cell per frame. */
case class IaSpot(video: Long, t: Long, f: Long, x: Double, y: Double)

/** One per-track step row retained in state (position at `f` plus the
  * step displacement INTO `f`). */
case class IaStep(f: Long, x: Double, y: Double, dx: Double, dy: Double)

/** One track's history: last observed position (for the next step)
  * and the step series so a pair that first comes NEAR late in the
  * video can backfill its score over the frames it already shared. */
case class IaTrack(t: Long, lastF: Long, lastX: Double, lastY: Double,
                   steps: Seq[IaStep])

/** One candidate pair's running accumulators. The three sums mirror
  * the batch operator's decimal-quantized `dsum(_, 8)` exactly — each
  * term is quantized to scale 8 (HALF_UP, Spark's double→decimal cast)
  * and added exactly, carried here as plain strings so the state
  * encoding cannot lose precision. */
case class IaAcc(u1: Long, u2: Long, n: Long, minD: Double,
                 s: String, sa: String, sb: String)

case class IaState(tracks: Seq[IaTrack], accs: Seq[IaAcc])

/** One scored interaction pair (update-mode changelog row: the latest
  * emission per (video, u1, u2) is the pair's current score). */
case class IaOut(video: Long, u1: Long, u2: Long, n_shared: Long,
                 min_dist: Double, dir_corr: Double)

/** STREAMING track-interaction detection — the unbounded twin of
  * [[graft.operators.Interaction.pairs]] (the one heavy per-frame
  * CellPhe operator that had no streaming face): tracked spots arrive
  * frame by frame per video, and each micro-batch updates the
  * directional-correlation score of every near pair instead of
  * re-running the per-frame-pair grid join over the whole corpus per
  * refresh.
  *
  * Semantics are the batch operator's, re-expressed incrementally:
  *  - steps are per-track frame-ordered deltas (lag over observed
  *    frames, gaps included), exactly the batch window formulation;
  *  - a pair becomes a CANDIDATE at the first frame both tracks sit
  *    within `maxDist` (the same grid cells + 3x3 probe, evaluated
  *    in-memory inside the video's state group), at which point its
  *    score BACKFILLS over the shared step frames already in the
  *    tracks' histories — the batch operator scores candidates over
  *    their FULL shared series, so late proximity must not truncate;
  *  - thereafter every shared step frame updates the accumulators
  *    incrementally: count, min same-frame distance over shared STEP
  *    frames, and the three decimal-quantized correlation sums
  *    (scale 8, HALF_UP — bit-compatible with the batch `dsum`, and
  *    order-independent, which is what makes stream == batch EXACT
  *    rather than approximate).
  * Pairs at `n_shared >= minShared` emit an updated row per touched
  * micro-batch (update-mode changelog; the last row per pair is the
  * final score — the parity spec pins it against the batch operator
  * over the same spots).
  *
  * Scale shape: state is keyed per VIDEO (interactions never cross
  * timelapses — the physical statement the batch query's coordinate
  * layout implies), so at 100 TB the stream shuffles each spot once
  * to its video's group and parallelism comes from millions of
  * videos. Per-video state is the track step histories (bounded by
  * the timelapse length — the same per-video memory the reference's
  * own frame loop holds) plus one accumulator row per near pair. The
  * degenerate-density contract is carried over from the batch
  * operator: a frame cell exceeding `maxCellOccupancy` spots
  * fail-fasts before its quadratic pairing.
  *
  * Delivery contract (the frame-by-frame model every tracker stream
  * here assumes): per video, frames arrive in order and whole —
  * rows within a micro-batch are sorted by frame before folding. */
object InteractionStream {

  private def q8(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x).setScale(8, java.math.RoundingMode.HALF_UP)

  def pairsStream(spots: Dataset[IaSpot], maxDist: Double,
                  minShared: Int = 3,
                  maxCellOccupancy: Int = 2048): Dataset[IaOut] = {
    require(maxDist > 0.0, "maxDist must be positive")
    require(minShared >= 1, "minShared must be >= 1")
    require(maxCellOccupancy >= 1, "maxCellOccupancy must be >= 1")
    import spots.sparkSession.implicits._
    spots.groupByKey(_.video)
      .flatMapGroupsWithState[IaState, IaOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (video: Long, rows: Iterator[IaSpot], state: GroupState[IaState]) =>
          val tracks = scala.collection.mutable.HashMap.empty[Long, IaTrack]
          val accs = scala.collection.mutable.HashMap.empty[(Long, Long), IaAcc]
          state.getOption.foreach { st =>
            st.tracks.foreach(tr => tracks(tr.t) = tr)
            st.accs.foreach(a => accs((a.u1, a.u2)) = a)
          }
          val touched = scala.collection.mutable.HashSet.empty[(Long, Long)]

          def addTerm(a: IaAcc, fa: IaStep, fb: IaStep): IaAcc = {
            val d = math.sqrt((fa.x - fb.x) * (fa.x - fb.x) +
              (fa.y - fb.y) * (fa.y - fb.y))
            IaAcc(a.u1, a.u2, a.n + 1, math.min(a.minD, d),
              new java.math.BigDecimal(a.s)
                .add(q8(fa.dx * fb.dx + fa.dy * fb.dy)).toPlainString,
              new java.math.BigDecimal(a.sa)
                .add(q8(fa.dx * fa.dx + fa.dy * fa.dy)).toPlainString,
              new java.math.BigDecimal(a.sb)
                .add(q8(fb.dx * fb.dx + fb.dy * fb.dy)).toPlainString)
          }
          val zero = java.math.BigDecimal.ZERO.toPlainString

          // fold the batch frame by frame (streams may batch frames)
          rows.toArray.groupBy(_.f).toSeq.sortBy(_._1).foreach { case (f, fr) =>
            // 1. steps into this frame + history update
            val stepped = scala.collection.mutable.HashMap.empty[Long, IaStep]
            fr.foreach { sp =>
              tracks.get(sp.t) match {
                case Some(tr) =>
                  val st = IaStep(f, sp.x, sp.y, sp.x - tr.lastX, sp.y - tr.lastY)
                  stepped(sp.t) = st
                  tracks(sp.t) = IaTrack(sp.t, f, sp.x, sp.y, tr.steps :+ st)
                case None =>
                  tracks(sp.t) = IaTrack(sp.t, f, sp.x, sp.y, Nil)
              }
            }
            // 2. near pairs at this frame (grid + 3x3 probe, the batch
            // operator's phase 1 in-memory; same fail-fast contract)
            def cell(v: Double): Long = math.floor(v / maxDist).toLong
            val grid = fr.groupBy(sp => (cell(sp.x), cell(sp.y)))
            grid.foreach { case ((cx, cy), spotsIn) =>
              if (spotsIn.length > maxCellOccupancy)
                throw new IllegalStateException(
                  s"InteractionStream: ${spotsIn.length} spots share one " +
                    s"maxDist cell at frame $f (cell $cx,$cy) exceeding " +
                    s"maxCellOccupancy=$maxCellOccupancy — a degenerate-" +
                    "dense cell goes quadratic; shrink maxDist, pre-filter " +
                    "the frame, or raise the cap explicitly")
              ()
            }
            val near = scala.collection.mutable.HashSet.empty[(Long, Long)]
            fr.foreach { a =>
              val (cx, cy) = (cell(a.x), cell(a.y))
              for {
                ox <- -1L to 1L; oy <- -1L to 1L
                bs <- grid.get((cx + ox, cy + oy)).iterator
                b <- bs
                if a.t < b.t
                if (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <=
                  maxDist * maxDist
              } near.add((a.t, b.t))
            }
            // 3. NEW candidates backfill over the shared step history
            // (which already includes this frame's steps); pairs known
            // from earlier frames take this frame's increment only
            val backfilled = scala.collection.mutable.HashSet.empty[(Long, Long)]
            near.foreach { case (t1, t2) =>
              if (!accs.contains((t1, t2))) {
                var acc = IaAcc(t1, t2, 0L, Double.MaxValue, zero, zero, zero)
                val s2 = tracks(t2).steps.map(s => s.f -> s).toMap
                tracks(t1).steps.foreach(s1 =>
                  s2.get(s1.f).foreach(s2f => acc = addTerm(acc, s1, s2f)))
                accs((t1, t2)) = acc
                backfilled.add((t1, t2))
                touched.add((t1, t2))
                ()
              }
            }
            accs.keys.toArray.foreach { case key @ (t1, t2) =>
              if (!backfilled.contains(key)) {
                (stepped.get(t1), stepped.get(t2)) match {
                  case (Some(s1), Some(s2)) =>
                    accs(key) = addTerm(accs(key), s1, s2)
                    touched.add(key)
                    ()
                  case _ =>
                }
              }
            }
          }

          state.update(IaState(tracks.values.toSeq, accs.values.toSeq))
          touched.iterator.flatMap { key =>
            val a = accs(key)
            if (a.n < minShared) None
            else {
              val sa = new java.math.BigDecimal(a.sa).doubleValue()
              val sb = new java.math.BigDecimal(a.sb).doubleValue()
              val s = new java.math.BigDecimal(a.s).doubleValue()
              val corr =
                if (sa > 0.0 && sb > 0.0) s / (math.sqrt(sa) * math.sqrt(sb))
                else 0.0
              Some(IaOut(video, a.u1, a.u2, a.n,
                graft.functions.Numeric.croundD(a.minD, 4),
                graft.functions.Numeric.croundD(corr, 6)))
            }
          }
      }
  }
}
